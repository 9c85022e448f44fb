"""SDXL family tests: dual-encoder conditioning, pooled projection parity
with transformers, depth-stacked transformer blocks, text_time addition
embedding (plain + hoisted), port/export roundtrip, pipeline wiring.

The reference tops out at SD-1.5 (finetune_sd.py:81, inference.py:421);
SDXL is a beyond-reference family on the same TPU-native engine.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.diffusion.pipeline import PipelineConfig, SDPipeline, sample
from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.models import clip, port, unet, vae
from sdbc_tpu.utils.prng import per_sample_fixed_latents


@pytest.fixture(scope="module")
def xl_cfg():
    return PipelineConfig.tiny_xl()


@pytest.fixture(scope="module")
def xl_params(xl_cfg):
    ks = jax.random.split(jax.random.key(7), 4)
    return {"text_encoder": clip.init(ks[0], xl_cfg.clip),
            "text_encoder_2": clip.init(ks[1], xl_cfg.clip2),
            "unet": unet.init(ks[2], xl_cfg.unet),
            "vae": vae.init(ks[3], xl_cfg.vae)}


@pytest.fixture(scope="module")
def xl_pipe(xl_cfg, xl_params):
    tok = CLIPTokenizer.fallback(xl_cfg.clip.vocab_size)
    return SDPipeline(xl_params, xl_cfg, tok, compute_dtype=jnp.float32)


# ------------------------------------------------------- encoder parity

def test_clip_with_projection_parity_with_transformers(xl_cfg):
    """apply_with_pooled vs transformers CLIPTextModelWithProjection: the
    penultimate hidden state (no final LN) and the projected pooled output
    must both match — true cross-implementation parity."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    c = xl_cfg.clip2
    hf_cfg = HFConfig(
        vocab_size=c.vocab_size, hidden_size=c.hidden,
        intermediate_size=c.mlp, num_hidden_layers=c.layers,
        num_attention_heads=c.heads, max_position_embeddings=c.ctx,
        hidden_act=c.act, layer_norm_eps=c.eps,
        projection_dim=c.projection_dim,
        eos_token_id=c.vocab_size - 1)
    torch.manual_seed(0)
    model = CLIPTextModelWithProjection(hf_cfg).eval()
    params = port.port_clip_text(
        {k: v.numpy() for k, v in model.state_dict().items()})
    assert "text_projection" in params

    # eos (vocab-1) is also the max id, so both HF pooling generations
    # (argmax-of-ids in 4.29, first-eos later) pick the same position
    eos = c.vocab_size - 1
    ids = np.array([[1, 5, 9, eos] + [0] * (c.ctx - 4),
                    [3, 7, eos] + [0] * (c.ctx - 3)], np.int64)
    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids),
                    output_hidden_states=True)
    ref_hidden = out.hidden_states[-2].numpy()  # penultimate, un-normed
    ref_pooled = out.text_embeds.numpy()

    hidden, pooled = clip.apply_with_pooled(
        params, jnp.asarray(ids, jnp.int32), c, skip_layers=1, eot_id=eos)
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=2e-4)


def test_final_ln_flag_matches_hidden_states(xl_cfg):
    """final_ln=False == transformers hidden_states[-1-skip] (raw)."""
    c = xl_cfg.clip
    params = clip.init(jax.random.key(1), c)
    ids = jnp.ones((1, c.ctx), jnp.int32)
    raw = clip.apply(params, ids, c, skip_layers=1, final_ln=False)
    normed = clip.apply(params, ids, c, skip_layers=1)
    assert not np.allclose(np.asarray(raw), np.asarray(normed))


# --------------------------------------------- depth-stacked transformers

def test_depth_stack_equals_sequential_blocks(xl_cfg, xl_params):
    """The scanned depth-2 transformer == applying its two blocks one after
    the other through a flat layout (same math, one compiled body)."""
    blk = xl_params["unet"]["down"][1]["attns"][0]
    assert "blocks" in blk
    x = jax.random.normal(jax.random.key(3), (2, 4, 4, 64))
    ctx = jax.random.normal(jax.random.key(4),
                            (2, 16, xl_cfg.unet.cross_attention_dim))
    stacked = unet._transformer(blk, x, ctx, 4, 8, attn_impl="xla")

    shared = {"norm": blk["norm"], "proj_in": blk["proj_in"],
              "proj_out": blk["proj_out"]}
    b0 = jax.tree.map(lambda a: a[0], blk["blocks"])
    b1 = jax.tree.map(lambda a: a[1], blk["blocks"])
    y = unet._tfm_in(shared, x, 8)
    y = unet._basic_block(b0, y, ctx, 4, "xla")
    y = unet._basic_block(b1, y, ctx, 4, "xla")
    manual = unet._tfm_out(shared, y, x)
    np.testing.assert_allclose(np.asarray(stacked), np.asarray(manual),
                               atol=1e-5)


# ------------------------------------------------ addition embedding hoist

def test_temb_hoist_matches_plain_added_cond(xl_cfg, xl_params):
    """Sampling's hoisted (T, N, 1, 1, cout) tables == the unhoisted
    added_cond path, per step."""
    cfg = xl_cfg.unet
    p = xl_params["unet"]
    ts = jnp.asarray([7, 3, 1], jnp.int32)
    lat = jax.random.normal(jax.random.key(5), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(6),
                            (2, 16, cfg.cross_attention_dim))
    added = jax.random.normal(jax.random.key(8), (2, cfg.addition_embed_dim))
    tables = unet.precompute_temb(p, ts, cfg, dtype=jnp.float32,
                                  added_cond=added)
    for i in range(3):
        tb = jnp.full((2,), ts[i], jnp.int32)
        a = unet.apply(p, lat, tb, ctx, cfg, added_cond=added)
        b = unet.apply(p, lat, tb, ctx, cfg,
                       temb_proj=unet.index_temb(tables, i))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_apply_guards(xl_cfg, xl_params):
    cfg = xl_cfg.unet
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 16, cfg.cross_attention_dim))
    t = jnp.array([1])
    with pytest.raises(ValueError, match="added_cond"):
        unet.apply(xl_params["unet"], lat, t, ctx, cfg)
    with pytest.raises(ValueError, match="added_cond"):
        unet.precompute_temb(xl_params["unet"], t, cfg)


# -------------------------------------------------------- port round trip

def test_sdxl_export_port_roundtrip(tmp_path, xl_cfg, xl_params):
    d = str(tmp_path / "xl")
    port.export_diffusers_checkpoint(xl_params, xl_cfg, d)
    cfg2 = port.pipeline_config_from_diffusers(d)
    assert cfg2.unet == xl_cfg.unet
    assert cfg2.clip2 == xl_cfg.clip2
    assert cfg2.vae == xl_cfg.vae
    back = port.port_diffusers_checkpoint(d)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(xl_params)
    for a, b in zip(jax.tree_util.tree_leaves(xl_params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sdxl_model_index_class(tmp_path, xl_cfg, xl_params):
    import json
    import os

    d = str(tmp_path / "xl2")
    port.export_diffusers_checkpoint(xl_params, xl_cfg, d)
    with open(os.path.join(d, "model_index.json")) as f:
        idx = json.load(f)
    assert idx["_class_name"] == "StableDiffusionXLPipeline"
    assert idx["text_encoder_2"] == ["transformers",
                                     "CLIPTextModelWithProjection"]
    # the UNet config records the SDXL-specific fields
    with open(os.path.join(d, "unet", "config.json")) as f:
        uc = json.load(f)
    assert uc["addition_embed_type"] == "text_time"
    assert uc["transformer_layers_per_block"] == [1, 2]
    assert uc["use_linear_projection"] is True


def test_linear_projection_port(tmp_path, xl_cfg, xl_params):
    """A state dict with 2-D (linear) proj_in/out — the real SDXL layout —
    ports into the same forward as the conv layout."""
    sd = port.export_unet(xl_params["unet"])
    # exported depth-2 transformers already use the linear layout; sanity:
    assert any(k.endswith("proj_in.weight") and sd[k].ndim == 2 for k in sd)
    back = port.port_unet(sd)
    cfg = xl_cfg.unet
    lat = jax.random.normal(jax.random.key(9), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(10),
                            (1, 16, cfg.cross_attention_dim))
    added = jnp.ones((1, cfg.addition_embed_dim))
    t = jnp.array([5])
    a = unet.apply(xl_params["unet"], lat, t, ctx, cfg, added_cond=added)
    b = unet.apply(back, lat, t, ctx, cfg, added_cond=added)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ------------------------------------------------------------- training

def _xl_batch(cfg, accum=1, micro=2):
    return {
        "pixel_values": jax.random.normal(
            jax.random.key(11), (accum, micro, 32, 32, 3)) * 0.5,
        "input_ids": jnp.ones((accum, micro, cfg.clip.ctx), jnp.int32),
        "input_ids_2": jnp.ones((accum, micro, cfg.clip2.ctx), jnp.int32),
    }


def test_sdxl_train_step_loss_decreases(xl_cfg, xl_params):
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step)

    tcfg = TrainConfig(train_unet=True, train_text_encoder=True,
                       dual_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=100)
    assert tcfg.trainable_keys() == ("unet", "text_encoder",
                                     "text_encoder_2")
    state = init_train_state(xl_params, tcfg, compute_dtype=jnp.float32)
    assert set(state.trainable) == {"unet", "text_encoder", "text_encoder_2"}
    step = make_train_step(xl_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _xl_batch(xl_cfg)
    losses = []
    key = jax.random.key(42)
    for _ in range(5):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # the second encoder actually trains (its grads flow through the
    # concatenated context AND the pooled text_time embedding)
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          xl_params["text_encoder_2"],
                          state.trainable["text_encoder_2"])
    assert max(jax.tree_util.tree_leaves(deltas)) > 0


def test_sdxl_train_missing_ids2_rejected(xl_cfg, xl_params):
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step)

    tcfg = TrainConfig(train_unet=True, train_text_encoder=False,
                       dual_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=10)
    state = init_train_state(xl_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(xl_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _xl_batch(xl_cfg)
    del batch["input_ids_2"]
    with pytest.raises(ValueError, match="input_ids_2"):
        step(state, batch, jax.random.key(0))


def test_sdxl_textual_inversion_trains_both_tables(xl_cfg, xl_params):
    """SDXL TI: BOTH encoders' placeholder rows train (shared appended
    ids), the frozen bases stay untouched, and the merged tree extends
    both tables.  A prompt without the placeholder gives (near-)zero
    gradient to both row blocks."""
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step, merged_params)

    vocab = xl_cfg.clip.vocab_size
    tcfg = TrainConfig(train_unet=False, train_text_encoder=False,
                       dual_text_encoder=True, grad_accum=1,
                       learning_rate=1e-2, num_examples=100,
                       ti_token="<xl-style>", ti_vectors=1)
    state = init_train_state(xl_params, tcfg, compute_dtype=jnp.float32,
                             ti_init_ids=[5])
    assert set(state.trainable) == {"ti"}
    assert state.trainable["ti"]["rows"].shape == (1, xl_cfg.clip.hidden)
    assert state.trainable["ti"]["rows2"].shape == (1, xl_cfg.clip2.hidden)
    step = make_train_step(xl_cfg, tcfg, compute_dtype=jnp.float32)

    batch = _xl_batch(xl_cfg)
    # put the placeholder id into both tokenizers' streams (shared id)
    batch["input_ids"] = batch["input_ids"].at[..., 3].set(vocab)
    batch["input_ids_2"] = batch["input_ids_2"].at[..., 3].set(vocab)
    r0 = np.asarray(state.trainable["ti"]["rows"]).copy()
    r20 = np.asarray(state.trainable["ti"]["rows2"]).copy()
    losses = []
    for _ in range(4):
        state, m = step(state, batch, jax.random.key(42))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.abs(np.asarray(state.trainable["ti"]["rows"]) - r0).max() > 0
    assert np.abs(np.asarray(state.trainable["ti"]["rows2"]) - r20).max() > 0
    # frozen bases untouched; merged tree extends BOTH tables
    for comp in ("text_encoder", "text_encoder_2"):
        np.testing.assert_array_equal(
            np.asarray(state.frozen[comp]["token_embedding"]["table"]),
            np.asarray(xl_params[comp]["token_embedding"]["table"]))
    mp = merged_params(state)
    assert mp["text_encoder"]["token_embedding"]["table"].shape[0] \
        == vocab + 1
    assert mp["text_encoder_2"]["token_embedding"]["table"].shape[0] \
        == xl_cfg.clip2.vocab_size + 1

    # no-placeholder batch: both row blocks stay (decay-bounded) put
    state2 = init_train_state(xl_params, tcfg, compute_dtype=jnp.float32)
    q0 = np.asarray(state2.trainable["ti"]["rows"]).copy()
    q20 = np.asarray(state2.trainable["ti"]["rows2"]).copy()
    state2, _ = step(state2, _xl_batch(xl_cfg), jax.random.key(0))
    bound = max(np.abs(q0).max(), np.abs(q20).max()) * 1e-2 * 1e-4 * 2
    assert np.abs(np.asarray(state2.trainable["ti"]["rows"]) - q0).max() \
        <= bound + 1e-12
    assert np.abs(np.asarray(state2.trainable["ti"]["rows2"]) - q20).max() \
        <= bound + 1e-12


def test_refiner_ti_rejected(rf_cfg, rf_params):
    from sdbc_tpu.train.trainer import TrainConfig, init_train_state

    with pytest.raises(ValueError, match="refiner"):
        init_train_state(rf_params,
                         TrainConfig(dual_text_encoder=True, refiner=True,
                                     ti_token="<s>"),
                         compute_dtype=jnp.float32)


def test_sdxl_lora_trains(xl_cfg, xl_params):
    """LoRA adapters cover the depth-stacked SDXL attention projections
    (the flat-dict broadcast handles the extra leading depth dim) and the
    second encoder; one step moves the loss with the base frozen."""
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step, merged_params)

    tcfg = TrainConfig(train_unet=True, train_text_encoder=True,
                       dual_text_encoder=True, grad_accum=1, lora_rank=2,
                       learning_rate=1e-2, num_examples=100)
    state = init_train_state(xl_params, tcfg, compute_dtype=jnp.float32)
    assert set(state.trainable) == {"lora"}
    # adapters exist for both encoders and the stacked UNet blocks
    keys = state.trainable["lora"].keys()
    assert any(k.startswith("text_encoder_2.") for k in keys)
    assert any(".blocks." in k for k in keys)
    step = make_train_step(xl_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _xl_batch(xl_cfg)
    key = jax.random.key(1)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    merged = merged_params(state, tcfg)
    assert set(merged) == set(xl_params)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sdxl_dp_train_step_over_mesh(xl_cfg, xl_params):
    """The mesh batch sharding covers input_ids_2 (regression: the DP spec
    once listed only pixel_values/input_ids, so SDXL under a mesh failed
    with a pytree-structure error before the first step)."""
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh, replicate_tree
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step)

    tcfg = TrainConfig(train_unet=True, train_text_encoder=False,
                       dual_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=100)
    mesh = make_mesh(MeshConfig(data=8))
    state = replicate_tree(
        init_train_state(xl_params, tcfg, compute_dtype=jnp.float32), mesh)
    step = make_train_step(xl_cfg, tcfg, mesh=mesh, dp_size=8,
                           compute_dtype=jnp.float32)
    batch = _xl_batch(xl_cfg, micro=8)
    state, m = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_sdxl_checkpoint_roundtrip(tmp_path, xl_cfg, xl_params):
    """utils/checkpoint carries text_encoder_2 + clip2 config through the
    orbax layout (COMPONENTS + config_to_json/from_json)."""
    from sdbc_tpu.utils import checkpoint as ck

    path = str(tmp_path / "ckpt")
    ck.save_pipeline(path, xl_params, xl_cfg)
    params2, cfg2 = ck.load_pipeline(path)
    assert cfg2.clip2 == xl_cfg.clip2
    assert set(params2) == set(xl_params)
    for a, b in zip(jax.tree_util.tree_leaves(xl_params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------- pipeline

def test_sdxl_pipeline_samples(xl_pipe):
    lat = per_sample_fixed_latents(1, (4, 16, 16), seed=11)
    out = xl_pipe(["a book cover"], height=32, width=32,
                  num_inference_steps=2, latents=lat)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_sdxl_negative_prompt_changes_output(xl_pipe):
    lat = per_sample_fixed_latents(1, (4, 16, 16), seed=12)
    a = xl_pipe(["a cover"], height=32, width=32, num_inference_steps=2,
                latents=lat)
    b = xl_pipe(["a cover"], negative_prompt="blurry", height=32, width=32,
                num_inference_steps=2, latents=lat)
    assert not np.allclose(a, b)


def test_sdxl_time_ids_change_output(xl_cfg, xl_params, xl_pipe):
    """Micro-conditioning is live: different time_ids → different images."""
    tok = xl_pipe.tokenizer
    ids = jnp.asarray(xl_pipe.tokenize(["a cover"]))
    ids2 = jnp.asarray(xl_pipe.tokenize2(["a cover"]))
    un = jnp.asarray(xl_pipe.tokenize([""]))
    un2 = jnp.asarray(xl_pipe.tokenize2([""]))
    lat = jax.random.normal(jax.random.key(13), (1, 8, 8, 4))
    kw = dict(cfg=xl_cfg, num_inference_steps=2, compute_dtype=jnp.float32,
              cond_ids2=ids2, uncond_ids2=un2)
    a = sample(xl_params, ids, un, lat, jax.random.key(0), 7.5,
               time_ids=jnp.asarray([[32., 32, 0, 0, 32, 32]]), **kw)
    b = sample(xl_params, ids, un, lat, jax.random.key(0), 7.5,
               time_ids=jnp.asarray([[64., 64, 16, 16, 32, 32]]), **kw)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sdxl_missing_ids2_rejected(xl_cfg, xl_params, xl_pipe):
    ids = jnp.asarray(xl_pipe.tokenize(["a"]))
    lat = jnp.zeros((1, 8, 8, 4))
    with pytest.raises(ValueError, match="cond_ids2"):
        sample(xl_params, ids, ids, lat, jax.random.key(0), 7.5,
               cfg=xl_cfg, num_inference_steps=2,
               compute_dtype=jnp.float32)


def test_sdxl_prompt_weighting(xl_pipe):
    """Emphasis syntax is live for the dual encoders: a weighted prompt
    diverges from the identical plain prompt on fixed latents, and a
    weight of 1.0 is a no-op."""
    lat = per_sample_fixed_latents(1, (4, 16, 16), seed=21)
    kw = dict(height=32, width=32, num_inference_steps=2, latents=lat,
              prompt_weighting=True)
    plain = xl_pipe(["a big cover"], **kw)
    boosted = xl_pipe(["a (big:1.8) cover"], **kw)
    unit = xl_pipe(["a (big:1.0) cover"], **kw)
    assert np.isfinite(boosted).all()
    assert not np.allclose(plain, boosted)
    np.testing.assert_allclose(plain, unit, atol=1e-5)


def test_sdxl_long_prompt_chunks(xl_pipe):
    """A prompt beyond the tiny 16-token context chunks into k windows and
    still samples (pooled comes from the first window)."""
    lat = per_sample_fixed_latents(1, (4, 16, 16), seed=22)
    long_prompt = "a " + " ".join(f"word{i}" for i in range(40)) + " cover"
    out = xl_pipe([long_prompt], height=32, width=32, num_inference_steps=2,
                  latents=lat, prompt_weighting=True)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_encode_text_xl_chunked_pooled_from_first_window(xl_cfg, xl_params):
    """k=2 chunked encode: the pooled output equals the single-window
    pooled of window 0 exactly; the context doubles in sequence length."""
    from sdbc_tpu.diffusion.pipeline import encode_text_xl

    c = xl_cfg.clip
    eos = c.vocab_size - 1
    w0 = np.array([1, 5, eos] + [0] * (c.ctx - 3), np.int32)
    w1 = np.array([2, 7, eos] + [0] * (c.ctx - 3), np.int32)
    single = jnp.asarray(w0[None])
    double = jnp.asarray(np.concatenate([w0, w1])[None])
    ctx1, p1 = encode_text_xl(xl_params, single, single, xl_cfg,
                              compute_dtype=jnp.float32)
    ctx2, p2 = encode_text_xl(xl_params, double, double, xl_cfg,
                              compute_dtype=jnp.float32)
    assert ctx2.shape == (1, 2 * c.ctx, ctx1.shape[-1])
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    # each window is encoded independently: window 0 of the chunked
    # context == the single-window context
    np.testing.assert_allclose(np.asarray(ctx2[:, :c.ctx]),
                               np.asarray(ctx1), atol=1e-6)


def test_sdxl_img2img(xl_pipe):
    img = np.full((1, 32, 32, 3), 0.5, np.float32)
    out = xl_pipe.img2img(["a cover"], img, strength=0.6,
                          num_inference_steps=3)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_pooled_eot_derived_from_vocab(xl_cfg, xl_params):
    """apply_with_pooled's default eot derives from cfg.vocab_size
    (regression: a hard-coded 49407 silently pooled BOS — constant across
    prompts — for the tiny 1000-vocab family)."""
    c = xl_cfg.clip2
    eos = c.vocab_size - 1
    a = np.array([[1, 5, eos] + [0] * (c.ctx - 3)], np.int32)
    b = np.array([[2, 7, 4, eos] + [0] * (c.ctx - 4)], np.int32)
    _, pa = clip.apply_with_pooled(xl_params["text_encoder_2"],
                                   jnp.asarray(a), c)
    _, pb = clip.apply_with_pooled(xl_params["text_encoder_2"],
                                   jnp.asarray(b), c)
    assert not np.allclose(np.asarray(pa), np.asarray(pb))
    # explicit eot == the derived default
    _, pe = clip.apply_with_pooled(xl_params["text_encoder_2"],
                                   jnp.asarray(a), c, eot_id=eos)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pe))


def test_encode_text_xl_ctx_mismatch_rejected(xl_cfg, xl_params):
    from sdbc_tpu.diffusion.pipeline import encode_text_xl

    ids = jnp.ones((1, xl_cfg.clip.ctx), jnp.int32)
    ids2 = jnp.ones((1, xl_cfg.clip.ctx + 2), jnp.int32)
    with pytest.raises(ValueError, match="contexts differ"):
        encode_text_xl(xl_params, ids, ids2, xl_cfg,
                       compute_dtype=jnp.float32)


def test_dual_flag_desync_rejected(xl_cfg, xl_params, tiny_cfg):
    """make_train_step fails loudly when TrainConfig.dual_text_encoder
    disagrees with cfg.clip2 (either direction)."""
    from sdbc_tpu.train.trainer import TrainConfig, make_train_step

    with pytest.raises(ValueError, match="dual_text_encoder"):
        make_train_step(xl_cfg, TrainConfig(dual_text_encoder=False),
                        compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="dual_text_encoder"):
        make_train_step(tiny_cfg, TrainConfig(dual_text_encoder=True),
                        compute_dtype=jnp.float32)


def test_sdxl_inpaint(xl_pipe):
    """Inpainting shares the SDXL graph: masked region regenerates, the
    unmasked region survives (same contract as the SD-1.x inpaint test)."""
    img = np.full((1, 32, 32, 3), 0.5, np.float32)
    mask = np.zeros((1, 32, 32, 1), np.float32)
    mask[:, :16] = 1.0  # regenerate the top half
    out = xl_pipe.inpaint(["a cover"], img, mask, num_inference_steps=3)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


# ------------------------------------------------------- SDXL ControlNet

@pytest.fixture(scope="module")
def xl_cn(xl_cfg, xl_params):
    from sdbc_tpu.models import controlnet as cn_mod

    cfg = xl_cfg.with_controlnet()
    params = dict(xl_params)
    params["controlnet"] = cn_mod.from_unet(
        xl_params["unet"], jax.random.key(31), cfg.controlnet)
    assert "add_mlp" in params["controlnet"]
    return cfg, params


def test_sdxl_fresh_controlnet_is_noop(xl_cfg, xl_params, xl_cn):
    """Zero-conv start: the fresh branch's residuals are EXACTLY zero, and
    SDXL sampling with it attached matches the plain SDXL graph to float
    tolerance (the extra subgraph shifts XLA fusion/rounding by an ulp, so
    bitwise equality — which the SD-1.x twin test happens to get — is not
    guaranteed; the semantic no-op is the residual check)."""
    from sdbc_tpu.models import controlnet as cn_mod
    from sdbc_tpu.diffusion.pipeline import encode_text_xl, _xl_added_cond

    cn_cfg, cn_params = xl_cn
    ids = jnp.ones((2, xl_cfg.clip.ctx), jnp.int32)
    ctx, pooled = encode_text_xl(cn_params, ids, ids, cn_cfg, jnp.float32)
    added = _xl_added_cond(pooled, jnp.zeros((2, 6)),
                           cn_cfg.unet.addition_time_embed_dim)
    cond = cn_mod.embed_cond(cn_params["controlnet"],
                             jnp.zeros((2, 16, 16, 3)), cn_cfg.controlnet)
    dr, mr = cn_mod.apply(cn_params["controlnet"], jnp.zeros((2, 8, 8, 4)),
                          jnp.zeros((2,)), ctx, cond, cn_cfg.controlnet,
                          added_cond=added)
    for r in list(dr) + [mr]:
        assert float(jnp.max(jnp.abs(r))) == 0.0

    tok = CLIPTokenizer.fallback(xl_cfg.clip.vocab_size)
    base = SDPipeline(xl_params, xl_cfg, tok, compute_dtype=jnp.float32)
    cn = SDPipeline(cn_params, cn_cfg, tok, compute_dtype=jnp.float32)
    lat = per_sample_fixed_latents(1, (4, 16, 16), seed=33)
    ctrl = np.random.RandomState(5).rand(1, 32, 32, 3).astype(np.float32)
    a = base(["a cover"], height=32, width=32, num_inference_steps=2,
             latents=lat)
    b = cn(["a cover"], height=32, width=32, num_inference_steps=2,
           latents=lat, control_image=ctrl)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sdxl_controlnet_temb_hoist_matches(xl_cn):
    """ControlNet precompute_temb with added_cond == the unhoisted branch
    forward, step by step (the SDXL sampling loop bakes the addition
    embedding into the hoisted tables)."""
    from sdbc_tpu.models import controlnet as cn_mod

    cn_cfg, cn_params = xl_cn
    cn = cn_params["controlnet"]
    ucfg = cn_cfg.unet
    ts = jnp.asarray([9.0, 4.0], jnp.float32)
    added = jax.random.normal(jax.random.key(34),
                              (2, ucfg.addition_embed_dim))
    tables = cn_mod.precompute_temb(cn, ts, cn_cfg.controlnet,
                                    dtype=jnp.float32, added_cond=added)
    lat = jax.random.normal(jax.random.key(35), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(36),
                            (2, 16, ucfg.cross_attention_dim))
    cond = cn_mod.embed_cond(cn, np.full((2, 16, 16, 3), 0.5, np.float32),
                             cn_cfg.controlnet)
    for i in range(2):
        tb = jnp.full((2,), ts[i], jnp.float32)
        a = cn_mod.apply(cn, lat, tb, ctx, cond, cn_cfg.controlnet,
                         added_cond=added)
        b = cn_mod.apply(cn, lat, tb, ctx, cond, cn_cfg.controlnet,
                         temb_proj=unet.index_temb(tables, i))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5)


def test_sdxl_controlnet_trains(xl_cn):
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step)

    cn_cfg, cn_params = xl_cn
    tcfg = TrainConfig(train_controlnet=True, train_unet=False,
                       train_text_encoder=False, dual_text_encoder=True,
                       control_hint="image", grad_accum=1,
                       learning_rate=1e-3, num_examples=100)
    state = init_train_state(cn_params, tcfg, compute_dtype=jnp.float32)
    assert set(state.trainable) == {"controlnet"}
    step = make_train_step(cn_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _xl_batch(cn_cfg)
    losses = []
    for _ in range(3):
        state, m = step(state, batch, jax.random.key(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # the branch actually moved (zero convs get gradients through the
    # injected residuals)
    z0 = cn_params["controlnet"]["zero_mid"]["w"]
    z1 = state.trainable["controlnet"]["zero_mid"]["w"]
    assert float(jnp.max(jnp.abs(z1 - z0))) > 0


def test_sdxl_controlnet_config_from_diffusers():
    """An SDXL ControlNet config.json (diffusers controlnet-canny-sdxl
    layout: 3 blocks, per-block transformer depth, text_time addition
    embedding) parses into a UNetConfig carrying the SDXL fields."""
    cfg = port.controlnet_config_from_diffusers({
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "block_out_channels": [320, 640, 1280],
        "transformer_layers_per_block": [1, 2, 10],
        "attention_head_dim": [5, 10, 20],
        "cross_attention_dim": 2048,
        "addition_embed_type": "text_time",
        "projection_class_embeddings_input_dim": 2816,
        "addition_time_embed_dim": 256,
        "conditioning_embedding_out_channels": [16, 32, 96, 256],
    })
    u = cfg.unet
    assert u.cross_attn_blocks == (False, True, True)
    assert u.transformer_depth == (1, 2, 10)
    assert u.attention_heads == (5, 10, 20)
    assert u.addition_embed_dim == 2816
    assert u.addition_time_embed_dim == 256
    assert u.cross_attention_dim == 2048


def test_sdxl_controlnet_port_roundtrip(xl_cn):
    cn_cfg, cn_params = xl_cn
    sd = port.export_controlnet(cn_params["controlnet"])
    assert "add_embedding.linear_1.weight" in sd
    back = port.port_controlnet(sd)
    assert jax.tree_util.tree_structure(back) == \
        jax.tree_util.tree_structure(cn_params["controlnet"])
    for a, b in zip(jax.tree_util.tree_leaves(cn_params["controlnet"]),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ------------------------------------------------- SDXL tensor parallelism

def test_sdxl_validate_tp_envelope():
    """SDXL-base TP envelope: level 0 declares 5 nominal heads but carries
    no transformer, so only the attention levels (10, 20) + the mid (20)
    and the two encoders (CLIP-L 12, bigG 20) constrain the axis — m=2
    shards everything; m=4 is rejected by level 1's 10 heads."""
    from sdbc_tpu.parallel.specs import validate_tp

    cfg = PipelineConfig.sdxl()
    assert validate_tp(cfg, 2) == ()
    with pytest.raises(ValueError, match="attention level"):
        validate_tp(cfg, 4)


def test_sdxl_tp_sampling_matches_replicated(xl_cfg, xl_params):
    """2-way TP SDXL sampling (both encoders + the depth-stacked scanned
    UNet blocks model-sharded) == the replicated graph."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdbc_tpu.parallel import specs as S
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=4, model=2))
    assert S.validate_tp(xl_cfg, 2) == ()
    sp = S.tp_specs(xl_params, mesh)
    leaves = lambda t: jax.tree.leaves(t, is_leaf=lambda x: isinstance(x, P))
    assert any(s != P() for s in leaves(sp["text_encoder_2"]))
    # the stacked (scanned) SDXL transformer blocks shard on their LAST
    # dims — the depth axis stays unsharded
    stacked = sp["unet"]["down"][1]["attns"][0]["blocks"]["attn1"]["q"]["w"]
    assert stacked == P(None, None, "model")

    b = 4
    cond = jnp.ones((b, xl_cfg.clip.ctx), jnp.int32)
    uncond = jnp.zeros((b, xl_cfg.clip.ctx), jnp.int32)
    lat = jax.random.normal(jax.random.key(0), (b, 8, 8, 4), jnp.float32)
    ref = sample(xl_params, cond, uncond, lat, jax.random.key(1), 7.5,
                 cfg=xl_cfg, num_inference_steps=2,
                 compute_dtype=jnp.float32, cond_ids2=cond,
                 uncond_ids2=uncond)

    tp_params = S.shard_tree(xl_params, mesh, sp)
    shard = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1)))))
    out = sample(tp_params, shard(cond), shard(uncond), shard(lat),
                 jax.random.key(1), 7.5, cfg=xl_cfg,
                 num_inference_steps=2, compute_dtype=jnp.float32,
                 cond_ids2=shard(cond), uncond_ids2=shard(uncond))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sdxl_tp_dp_train_step_matches_single_device(xl_cfg, xl_params):
    """One SDXL train step on a (data=4, model=2) mesh with TP-sharded
    state == the single-device step (loss + post-update params)."""
    from sdbc_tpu.parallel import specs as S
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step)

    tcfg = TrainConfig(train_unet=True, train_text_encoder=True,
                       dual_text_encoder=True, grad_accum=1,
                       learning_rate=1e-4, num_examples=100)
    batch = {
        "pixel_values": jax.random.normal(jax.random.key(0),
                                          (1, 4, 32, 32, 3)) * 0.5,
        "input_ids": jnp.ones((1, 4, xl_cfg.clip.ctx), jnp.int32),
        "input_ids_2": jnp.ones((1, 4, xl_cfg.clip2.ctx), jnp.int32),
    }
    key = jax.random.key(5)

    s_single = init_train_state(xl_params, tcfg, compute_dtype=jnp.float32)
    s1, m1 = make_train_step(xl_cfg, tcfg, compute_dtype=jnp.float32)(
        s_single, batch, key)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    s_tp = init_train_state(xl_params, tcfg, compute_dtype=jnp.float32)
    s_tp = S.shard_tree(s_tp, mesh, S.tp_specs(s_tp, mesh))
    step = make_train_step(xl_cfg, tcfg, mesh=mesh, dp_size=4,
                           compute_dtype=jnp.float32)
    s1_tp, m_tp = step(s_tp, batch, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m_tp["loss"]),
                               rtol=1e-4)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(s1.trainable)
    flat_t = jax.tree.leaves(s1_tp.trainable)
    for (path, a), b in zip(flat_s, flat_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=2e-5, err_msg=str(path))


def test_sdxl_spatial_pipeline_matches_unsharded(xl_cfg, xl_params):
    """SDPipeline(mesh=..., spatial=True) with the SDXL family: a batch-1
    prompt runs with latent rows sharded over all 8 devices (dual-encoder
    conditioning replicated) and matches the single-device pipeline."""
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh

    tok = CLIPTokenizer.fallback(xl_cfg.clip.vocab_size)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=7)
    ref_pipe = SDPipeline(xl_params, xl_cfg, tok,
                          compute_dtype=jnp.float32, attn_impl="xla")
    ref = ref_pipe("a book cover", **kw)

    mesh = make_mesh(MeshConfig(data=8))
    sp_pipe = SDPipeline(xl_params, xl_cfg, tok,
                         compute_dtype=jnp.float32, mesh=mesh, spatial=True)
    out = sp_pipe("a book cover", **kw)
    assert out.shape == ref.shape == (1, 32, 32, 3)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sdxl_sdpipeline_tp_serving(xl_cfg, xl_params):
    """SDPipeline(mesh=...) — the CLI serving path — matches the
    single-device SDXL pipeline under a (data=4, model=2) mesh (both
    encoders and the stacked UNet blocks model-sharded)."""
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh

    tok = CLIPTokenizer.fallback(xl_cfg.clip.vocab_size)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    prompts = ["a book cover"] * 4
    ref = SDPipeline(xl_params, xl_cfg, tok,
                     compute_dtype=jnp.float32)(prompts, **kw)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    out = SDPipeline(xl_params, xl_cfg, tok, compute_dtype=jnp.float32,
                     mesh=mesh)(prompts, **kw)
    np.testing.assert_allclose(out, ref, atol=1e-4)


# ------------------------------------------------------------ SDXL refiner

@pytest.fixture(scope="module")
def rf_cfg():
    return PipelineConfig.tiny_xl_refiner()


@pytest.fixture(scope="module")
def rf_params(rf_cfg):
    ks = jax.random.split(jax.random.key(17), 3)
    return {"text_encoder_2": clip.init(ks[0], rf_cfg.clip2),
            "unet": unet.init(ks[1], rf_cfg.unet),
            "vae": vae.init(ks[2], rf_cfg.vae)}


@pytest.fixture(scope="module")
def rf_pipe(rf_cfg, rf_params):
    tok = CLIPTokenizer.fallback(rf_cfg.clip.vocab_size)
    return SDPipeline(rf_params, rf_cfg, tok, compute_dtype=jnp.float32)


def test_refiner_config_shape():
    """The real refiner preset carries the published layout: single bigG
    encoder, 1280-d context, 4 levels with attention on the middle two,
    2560-d text_time addition (1280 pooled + 5x256 aesthetic ids)."""
    cfg = PipelineConfig.sdxl_refiner()
    assert cfg.refiner and cfg.is_sdxl
    assert cfg.clip is cfg.clip2
    u = cfg.unet
    assert u.block_out_channels == (384, 768, 1536, 1536)
    assert u.cross_attn_blocks == (False, True, True, False)
    assert u.cross_attention_dim == 1280 == cfg.clip2.hidden
    assert u.addition_embed_dim == 2560 == cfg.clip2.projection_dim + 5 * 256
    assert u.depth_per_level == (4, 4, 4, 4)
    assert u.heads_per_level == (6, 12, 24, 24)


def test_refiner_text2img(rf_pipe):
    out = rf_pipe(["a book cover"], height=32, width=32,
                  num_inference_steps=3)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_refiner_aesthetic_score_conditions(rf_pipe):
    """The aesthetic score feeds the addition embedding: changing it (same
    seed, same graph — traced scalar) changes the output."""
    kw = dict(height=32, width=32, num_inference_steps=2, seed=5)
    a = rf_pipe(["a cover"], aesthetic_score=6.0, **kw)
    b = rf_pipe(["a cover"], aesthetic_score=0.0, **kw)
    c = rf_pipe(["a cover"], aesthetic_score=6.0, **kw)
    np.testing.assert_array_equal(a, c)  # same score reproduces exactly
    assert np.abs(a - b).max() > 1e-6


def test_refiner_img2img(rf_pipe):
    """The canonical base→refiner flow: refine an existing image with
    moderate strength (diffusers StableDiffusionXLImg2ImgPipeline with a
    refiner checkpoint)."""
    img = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    out = rf_pipe.img2img(["a cover"], img, strength=0.5,
                          num_inference_steps=4)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_refiner_rejects_time_ids_and_flag_desync(rf_cfg, rf_params):
    from sdbc_tpu.train.trainer import TrainConfig, make_train_step

    ids = jnp.ones((1, rf_cfg.clip.ctx), jnp.int32)
    lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
    with pytest.raises(ValueError, match="aesthetic_score"):
        sample(rf_params, ids, ids, lat, jax.random.key(0), 7.5,
               cfg=rf_cfg, num_inference_steps=2,
               compute_dtype=jnp.float32, cond_ids2=ids, uncond_ids2=ids,
               time_ids=jnp.zeros((1, 6)))
    # TrainConfig.refiner must mirror cfg.refiner (same desync discipline
    # as dual_text_encoder)
    with pytest.raises(ValueError, match="refiner"):
        make_train_step(rf_cfg, TrainConfig(dual_text_encoder=True),
                        compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="implies dual_text_encoder"):
        make_train_step(rf_cfg, TrainConfig(refiner=True),
                        compute_dtype=jnp.float32)


def test_refiner_train_step_loss_decreases(rf_cfg, rf_params):
    """Refiner fine-tuning: one encoder (text_encoder_2) + UNet train; the
    loss conditions on the 5-id aesthetic tuple."""
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step)

    tcfg = TrainConfig(train_unet=True, train_text_encoder=True,
                       dual_text_encoder=True, refiner=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=100)
    assert tcfg.trainable_keys() == ("unet", "text_encoder_2")
    state = init_train_state(rf_params, tcfg, compute_dtype=jnp.float32)
    assert set(state.trainable) == {"unet", "text_encoder_2"}
    step = make_train_step(rf_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _xl_batch(rf_cfg)
    losses = []
    key = jax.random.key(42)
    for _ in range(5):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    t0 = rf_params["text_encoder_2"]["token_embedding"]["table"]
    t1 = state.trainable["text_encoder_2"]["token_embedding"]["table"]
    assert float(jnp.max(jnp.abs(t1 - t0))) > 0


def test_refiner_dir_config_inference(tmp_path):
    """A diffusers SDXL-refiner dir (text_encoder_2 present, text_encoder
    ABSENT — diffusers saves it null) infers a refiner PipelineConfig:
    single-encoder context, refiner=True, clip = clip2."""
    import json
    import os

    root = str(tmp_path)
    cfgs = {
        "unet": {
            "in_channels": 4, "out_channels": 4,
            "block_out_channels": [32, 64], "layers_per_block": 1,
            "cross_attention_dim": 32, "attention_head_dim": [4, 4],
            "norm_num_groups": 8, "transformer_layers_per_block": 2,
            "addition_embed_type": "text_time",
            "projection_class_embeddings_input_dim": 36,
            "addition_time_embed_dim": 4,
            "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D"],
            "up_block_types": ["CrossAttnUpBlock2D", "UpBlock2D"],
        },
        "text_encoder_2": {
            "vocab_size": 1000, "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 64,
            "max_position_embeddings": 16, "projection_dim": 16,
            "architectures": ["CLIPTextModelWithProjection"],
        },
    }
    for comp, c in cfgs.items():
        os.makedirs(os.path.join(root, comp))
        with open(os.path.join(root, comp, "config.json"), "w") as f:
            json.dump(c, f)

    cfg = port.pipeline_config_from_diffusers(root)
    assert cfg.refiner
    assert cfg.is_sdxl
    assert cfg.clip == cfg.clip2
    assert cfg.clip2.projection_dim == 16
    assert cfg.unet.addition_embed_dim == 36


def test_denoising_split_equals_full_run(xl_pipe):
    """Ensemble handoff invariant: denoising_end=0.5 + resume with
    denoising_start=0.5 on the SAME model reproduces the uninterrupted
    run (same grid, raw-latent handoff, no re-noising) — the structural
    guarantee the base→refiner ensemble rests on."""
    kw = dict(height=32, width=32, num_inference_steps=4)
    lat = per_sample_fixed_latents(1, (4, 16, 16), seed=41)
    full = xl_pipe(["a cover"], latents=lat, **kw)
    half = xl_pipe(["a cover"], latents=lat, decode=False,
                   denoising_end=0.5, **kw)
    resumed = xl_pipe(["a cover"], latents=half, denoising_start=0.5, **kw)
    # two compiled graphs (0..4 vs 0..2 + 2..4): float wobble only
    np.testing.assert_allclose(resumed, full, atol=1e-5)


def test_base_to_refiner_ensemble(xl_pipe, rf_pipe):
    """The SDXL ensemble-of-expert-denoisers serving flow: the base model
    runs the high-noise 80%, hands raw latents to the refiner for the
    low-noise tail (diffusers denoising_end/denoising_start protocol)."""
    kw = dict(height=32, width=32, num_inference_steps=5)
    lat = xl_pipe(["a cover"], decode=False, denoising_end=0.8, seed=9,
                  **kw)
    assert lat.shape == (1, 16, 16, 4)
    out = rf_pipe(["a cover"], latents=lat, denoising_start=0.8,
                  aesthetic_score=6.0, **kw)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_denoising_start_guards(xl_pipe):
    img = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="requires latents"):
        xl_pipe(["a"], height=32, width=32, num_inference_steps=2,
                denoising_start=0.5)
    with pytest.raises(ValueError, match="cannot combine with init_image"):
        xl_pipe(["a"], height=32, width=32, num_inference_steps=2,
                denoising_start=0.5, init_image=img,
                latents=per_sample_fixed_latents(1, (4, 16, 16), seed=1))


def test_ensemble_pipeline_equals_manual_two_stage(xl_pipe, rf_pipe):
    """EnsemblePipeline == the explicit decode=False / denoising_start
    two-call protocol, bit for bit (same graphs, same inputs)."""
    from sdbc_tpu.diffusion.pipeline import EnsemblePipeline

    ens = EnsemblePipeline(xl_pipe, rf_pipe, handoff=0.6)
    kw = dict(height=32, width=32, num_inference_steps=5, seed=13)
    got = ens(["a cover"], **kw)
    lat = xl_pipe(["a cover"], decode=False, denoising_end=0.6, **kw)
    want = rf_pipe(["a cover"], latents=lat, denoising_start=0.6, **kw)
    np.testing.assert_array_equal(got, want)
    assert np.isfinite(got).all()


def test_ensemble_pipeline_guards(xl_pipe, rf_pipe):
    from sdbc_tpu.diffusion.pipeline import EnsemblePipeline

    with pytest.raises(ValueError, match="must be a refiner"):
        EnsemblePipeline(xl_pipe, xl_pipe)
    with pytest.raises(ValueError, match="base slot"):
        EnsemblePipeline(rf_pipe, rf_pipe)
    ens = EnsemblePipeline(xl_pipe, rf_pipe)
    with pytest.raises(ValueError, match="inpaint"):
        ens(["a"], height=32, width=32, num_inference_steps=2,
            mask_image=np.ones((1, 16, 16, 1), np.float32),
            init_image=np.zeros((1, 32, 32, 3), np.float32))


def test_ensemble_scheduler_mismatch_rejected(xl_cfg, xl_params, rf_pipe):
    import dataclasses as dc

    from sdbc_tpu.diffusion.pipeline import EnsemblePipeline

    tok = CLIPTokenizer.fallback(xl_cfg.clip.vocab_size)
    base_dpm = SDPipeline(xl_params, dc.replace(xl_cfg, scheduler="dpm"),
                          tok, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="share the schedule"):
        EnsemblePipeline(base_dpm, rf_pipe)


def test_refiner_config_checkpoint_roundtrip(rf_cfg):
    """The refiner flag must survive config (de)serialization — losing it
    makes a served checkpoint look dual-encoder and crash on the missing
    text_encoder (caught driving the train->serve cycle)."""
    import json

    from sdbc_tpu.utils.checkpoint import config_from_json, config_to_json

    back = config_from_json(json.loads(json.dumps(config_to_json(rf_cfg))))
    assert back == rf_cfg
    assert back.refiner


def test_sdxl_cfg_interval_cond_only_slice(xl_pipe):
    """cfg_interval=(0,0) equals guidance_scale=1: exercises the cond-only
    branch's slicing of the (2B, 1, 1, c) SDXL temb tables (the uncond⧺cond
    stack's second half must be the cond rows)."""
    lat = per_sample_fixed_latents(2, (4, 16, 16), seed=31)
    gs1 = xl_pipe(["a", "b"], height=32, width=32, num_inference_steps=3,
                  latents=lat, guidance_scale=1.0)
    off = xl_pipe(["a", "b"], height=32, width=32, num_inference_steps=3,
                  latents=lat, cfg_interval=(0.0, 0.0))
    np.testing.assert_allclose(gs1, off, atol=1e-5)
