"""Safety-checker slot: None-compatible (reference mode) + blocklist stand-in."""
import numpy as np

from sdbc_tpu.models.safety import BlocklistSafetyChecker, apply_safety_checker


def test_none_checker_passthrough():
    imgs = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32)
    out, flags = apply_safety_checker(None, imgs, ["a", "b"])
    np.testing.assert_array_equal(out, imgs)
    assert flags == [False, False]


def test_blocklist_blacks_out_flagged():
    imgs = np.ones((2, 8, 8, 3), np.float32)
    checker = BlocklistSafetyChecker(["forbidden"])
    out, flags = apply_safety_checker(
        checker, imgs, ["a nice cover", "a FORBIDDEN thing"])
    assert flags == [False, True]
    np.testing.assert_array_equal(out[0], 1.0)
    np.testing.assert_array_equal(out[1], 0.0)
    # original array untouched
    np.testing.assert_array_equal(imgs[1], 1.0)


def test_no_prompts_no_flags():
    imgs = np.ones((1, 4, 4, 3), np.float32)
    out, flags = apply_safety_checker(BlocklistSafetyChecker(["x"]), imgs)
    assert flags == [False]


# ---------------------------------------------------------------------------
# CLIP-vision checker (full StableDiffusionSafetyChecker semantics)


def _tiny_vision():
    import jax

    from sdbc_tpu.models.clip import CLIPVisionConfig, vision_init

    cfg = CLIPVisionConfig.tiny()
    return cfg, vision_init(jax.random.key(0), cfg)


def test_clip_vision_parity_vs_transformers():
    """The JAX vision tower reproduces transformers.CLIPVisionModel
    numerically (random weights, ported) — last hidden AND pooled."""
    import torch
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    import jax.numpy as jnp

    from sdbc_tpu.models.clip import CLIPVisionConfig, vision_apply
    from sdbc_tpu.models.port import port_clip_vision

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, image_size=32, patch_size=8)
    torch.manual_seed(3)
    hf = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = port_clip_vision(sd)

    rng = np.random.default_rng(5)
    pix = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(
            pix.transpose(0, 3, 1, 2)))
    cfg = CLIPVisionConfig.tiny()
    hid, pooled = vision_apply(params, jnp.asarray(pix), cfg)
    np.testing.assert_allclose(np.asarray(hid),
                               ref.last_hidden_state.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(), atol=2e-5)


def test_clip_safety_checker_flags_and_adjustment():
    """Concept thresholds flag exactly the matching image; a special-care
    hit tightens the concept threshold by 0.01 (the checker's adjustment)."""
    import jax
    import jax.numpy as jnp

    from sdbc_tpu.models.safety import ClipSafetyChecker
    from sdbc_tpu.ops import nn

    cfg, vision = _tiny_vision()
    proj = nn.init_linear(jax.random.key(1), cfg.hidden, 8, use_bias=False)
    rng = np.random.default_rng(9)
    img_a = rng.random((1, 32, 32, 3)).astype(np.float32)
    img_b = rng.random((1, 32, 32, 3)).astype(np.float32)

    base = {
        "vision": vision, "visual_projection": proj,
        "concept_embeds": jnp.zeros((2, 8)),
        "concept_weights": jnp.ones((2,)),
        "special_care_embeds": jnp.zeros((1, 8)),
        "special_care_weights": jnp.ones((1,)),
    }
    checker = ClipSafetyChecker(base, cfg)
    # probe embeddings through the real tower (scores with zero concepts
    # are all -1: cos(x, 0-guarded) never exceeds the unit thresholds)
    out, flags = checker(np.concatenate([img_a, img_b]), None)
    assert flags == [False, False]

    # embed img_a's own projected embedding as concept 0 → cos = 1 for A
    from sdbc_tpu.models.clip import vision_apply
    from sdbc_tpu.models.safety import clip_preprocess

    def embed(img):
        _, pooled = vision_apply(vision, jnp.asarray(
            clip_preprocess(img, cfg.image_size)), cfg)
        e = nn.linear(proj, pooled)
        return np.asarray(e / jnp.linalg.norm(e, axis=-1, keepdims=True))[0]

    e_a, e_b = embed(img_a), embed(img_b)
    cos_ab = float(e_a @ e_b)
    assert cos_ab < 0.999  # distinct images embed distinctly
    thr = (1.0 + cos_ab) / 2.0
    params = dict(base)
    params["concept_embeds"] = jnp.asarray(e_a[None])
    params["concept_weights"] = jnp.asarray([thr])
    checker = ClipSafetyChecker(params, cfg)
    out, flags = checker(np.concatenate([img_a, img_b]), None)
    assert flags == [True, False]
    np.testing.assert_array_equal(out[0], 0.0)   # flagged → blacked
    assert out[1].max() > 0                       # clean image untouched

    # special-care adjustment: put B's embedding in the special table with
    # a threshold it exceeds, and set the concept threshold so B's concept
    # score is within 0.01 below zero — the +0.01 adjustment must flip it
    concept_b = float(e_b @ e_a)  # B's cos against the concept (= cos_ab)
    params2 = dict(params)
    params2["special_care_embeds"] = jnp.asarray(e_b[None])
    params2["special_care_weights"] = jnp.asarray([0.9])  # B hits (cos=1)
    params2["concept_weights"] = jnp.asarray([concept_b + 0.005])
    checker2 = ClipSafetyChecker(params2, cfg)
    _, flags2 = checker2(np.concatenate([img_a, img_b]), None)
    assert flags2[1] is True  # only flips with the 0.01 adjustment
    # without the special-care hit the same threshold does NOT flag B
    params3 = dict(params2)
    params3["special_care_weights"] = jnp.asarray([1.5])  # unreachable
    _, flags3 = ClipSafetyChecker(params3, cfg)(
        np.concatenate([img_a, img_b]), None)
    assert flags3[1] is False


def test_port_safety_checker_schema():
    """A synthetic HF-schema StableDiffusionSafetyChecker state dict ports
    and runs end-to-end (vision nested under vision_model.vision_model)."""
    import torch
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModel

    from sdbc_tpu.models.clip import CLIPVisionConfig
    from sdbc_tpu.models.port import port_safety_checker
    from sdbc_tpu.models.safety import ClipSafetyChecker

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, image_size=32, patch_size=8)
    torch.manual_seed(11)
    hf = CLIPVisionModel(hf_cfg)
    rng = np.random.default_rng(13)
    sd = {f"vision_model.{k}": v.numpy()
          for k, v in hf.state_dict().items()}
    sd["visual_projection.weight"] = rng.normal(
        size=(8, 32)).astype(np.float32)
    sd["concept_embeds"] = rng.normal(size=(17, 8)).astype(np.float32)
    sd["concept_embeds_weights"] = np.full((17,), 2.0, np.float32)
    sd["special_care_embeds"] = rng.normal(size=(3, 8)).astype(np.float32)
    sd["special_care_embeds_weights"] = np.full((3,), 2.0, np.float32)

    params = port_safety_checker(sd)
    checker = ClipSafetyChecker(params, CLIPVisionConfig.tiny())
    imgs = rng.random((2, 48, 48, 3)).astype(np.float32)  # resize path
    out, flags = checker(imgs, None)
    assert out.shape == imgs.shape
    assert flags == [False, False]  # thresholds 2.0 > any cosine


def test_sdpipeline_safety_slot(tiny_cfg, tiny_params):
    """SDPipeline applies the checker to decoded outputs (prompt-aware) and
    records last_nsfw_flags; decode=False skips it."""
    import jax.numpy as jnp

    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline

    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    checker = BlocklistSafetyChecker(["bad"])
    p = SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32,
                   safety_checker=checker)
    out = p(["a bad cover", "a nice cover"], height=32, width=32,
            num_inference_steps=2)
    assert p.last_nsfw_flags == [True, False]
    np.testing.assert_array_equal(out[0], 0.0)
    assert out[1].max() > 0
    lat = p(["a bad cover"], height=32, width=32, num_inference_steps=2,
            decode=False)
    assert lat.shape[-1] == tiny_cfg.unet.in_channels  # checker skipped
