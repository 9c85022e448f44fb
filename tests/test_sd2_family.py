"""SD-2.x model-family support (beyond the reference's SD-1.5 engines).

The reference pins SD-1.5 (finetune_sd.py:322-336); this framework also
loads/runs the SD-2.x family: per-level UNet attention head counts
(head_dim stays 64 so heads vary with channel width: 5/10/20/20),
the OpenCLIP-shape text encoder saved by diffusers (exact-erf gelu,
23 layers, hidden 1024), v-prediction sampling, the "!" pad token
(id 0 — pad ids DO feed cross-attention in SD, so the declared token
matters), and config.json inference for the SD-2 layout
(reference's load_model: utils.py:181-230).

These tests exercise tiny analogs of each structural difference; the
full-size presets are shape-checked only.
"""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import PipelineConfig, SDPipeline
from sdbc_tpu.models import clip, port, unet
from sdbc_tpu.parallel.specs import validate_tp
from sdbc_tpu.utils.prng import per_sample_fixed_latents


def _sd2ify(cfg: PipelineConfig) -> PipelineConfig:
    """Tiny analog of SD-2's structural differences vs SD-1.x."""
    return dataclasses.replace(
        cfg,
        clip=dataclasses.replace(cfg.clip, act="gelu"),
        unet=dataclasses.replace(cfg.unet, attention_heads=(2, 4)),
        schedule=dataclasses.replace(cfg.schedule,
                                     prediction_type="v_prediction"))


# ---------------------------------------------------------------------------
# presets


def test_sd21_preset_fields():
    cfg = PipelineConfig.sd21()
    assert cfg.unet.attention_heads == (5, 10, 20, 20)
    assert cfg.unet.heads_per_level == (5, 10, 20, 20)
    # head_dim stays 64 at every level
    for ch, h in zip(cfg.unet.block_out_channels, cfg.unet.heads_per_level):
        assert ch // h == 64
    assert cfg.unet.cross_attention_dim == 1024
    assert cfg.clip.hidden == 1024 and cfg.clip.layers == 23
    assert cfg.clip.act == "gelu"
    assert cfg.schedule.prediction_type == "v_prediction"
    # 512 -base checkpoints are epsilon
    assert PipelineConfig.sd21(
        prediction_type="epsilon").schedule.prediction_type == "epsilon"


def test_heads_per_level_normalization():
    assert unet.UNetConfig.sd15().heads_per_level == (8, 8, 8, 8)
    bad = dataclasses.replace(unet.UNetConfig.sd15(),
                              attention_heads=(5, 10))
    with pytest.raises(ValueError, match="one entry per block"):
        bad.heads_per_level


# ---------------------------------------------------------------------------
# per-level heads through the UNet


def _per_level_unet_cfg():
    return unet.UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                           cross_attention_dim=32, attention_heads=(2, 4),
                           norm_groups=8, cross_attn_blocks=(True, True))


def test_per_level_heads_forward_and_port_roundtrip():
    cfg = _per_level_unet_cfg()
    params = unet.init(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 7, 32), jnp.float32)
    t = jnp.array([42])
    a = unet.apply(params, lat, t, ctx, cfg)
    assert a.shape == lat.shape and bool(jnp.isfinite(a).all())
    # head count is an apply-time reshape, not a weight shape: the
    # diffusers-layout export→port roundtrip must be exact per-level too
    back = port.port_unet(port.export_unet(params))
    b = unet.apply(back, lat, t, ctx, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_per_level_heads_differ_from_uniform():
    """(2, 4) heads is genuinely different math from uniform 4 heads at
    level 0 — guards against the tuple silently collapsing to one count."""
    cfg_pl = _per_level_unet_cfg()
    cfg_u = dataclasses.replace(cfg_pl, attention_heads=4)
    params = unet.init(jax.random.key(0), cfg_pl)  # same weight shapes
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(2), (1, 7, 32), jnp.float32)
    t = jnp.array([42])
    a = unet.apply(params, lat, t, ctx, cfg_pl)
    b = unet.apply(params, lat, t, ctx, cfg_u)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_per_level_pack_heads_equivalence():
    cfg = _per_level_unet_cfg()
    params = unet.init(jax.random.key(3), cfg)
    packed = unet.pack_attention_heads(params, cfg, pad_to=64)
    # level 0: 2 heads × dim 32 → hd 16 → packed to 64
    tfm = packed["down"][0]["attns"][0]
    assert tfm["attn1"]["q"]["w"].shape == (32, 2 * 64)
    # level 1: 4 heads × dim 64 → hd 16 → packed to 64
    tfm1 = packed["down"][1]["attns"][0]
    assert tfm1["attn1"]["q"]["w"].shape == (64, 4 * 64)
    lat = jax.random.normal(jax.random.key(4), (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.key(5), (2, 7, 32), jnp.float32)
    t = jnp.array([10, 500], jnp.int32)
    ref = unet.apply(params, lat, t, ctx, cfg)
    out = unet.apply(packed, lat, t, ctx, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_validate_tp_per_level_heads(tiny_cfg):
    cfg = dataclasses.replace(tiny_cfg,
                              unet=dataclasses.replace(
                                  tiny_cfg.unet, attention_heads=(2, 4)))
    assert validate_tp(cfg, 2) == ()  # 2 divides (2, 4) and clip heads 4
    with pytest.raises(ValueError, match="every attention level"):
        validate_tp(cfg, 4)  # 4 does not divide level-0's 2 heads


# ---------------------------------------------------------------------------
# OpenCLIP-style text encoder (exact-erf gelu)


def test_clip_gelu_act_differs_from_quick_gelu(tiny_cfg):
    c_quick = tiny_cfg.clip
    c_gelu = dataclasses.replace(c_quick, act="gelu")
    params = clip.init(jax.random.key(0), c_quick)  # same weight shapes
    ids = jnp.asarray([[1, 5, 9, 2] + [0] * (c_quick.ctx - 4)], jnp.int32)
    a = clip.apply(params, ids, c_quick)
    b = clip.apply(params, ids, c_gelu)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="hidden_act"):
        clip.apply(params, ids, dataclasses.replace(c_quick, act="nope"))


def test_clip_gelu_parity_with_transformers(tiny_cfg):
    """Cross-implementation parity for the SD-2-style text encoder: our
    act="gelu" path vs transformers CLIPTextModel(hidden_act="gelu")."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    c = dataclasses.replace(tiny_cfg.clip, act="gelu")
    hf_cfg = HFConfig(
        vocab_size=c.vocab_size, hidden_size=c.hidden,
        intermediate_size=c.mlp, num_hidden_layers=c.layers,
        num_attention_heads=c.heads, max_position_embeddings=c.ctx,
        hidden_act="gelu", layer_norm_eps=c.eps)
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = port.port_clip_text(sd)
    ids = np.array([[1, 5, 9, 2] + [0] * (c.ctx - 4)], np.int64)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip.apply(params, jnp.asarray(ids, jnp.int32), c))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


# ---------------------------------------------------------------------------
# diffusers config.json inference for the SD-2 layout


def test_unet_config_from_diffusers_sd2_layout():
    cfg = port.unet_config_from_diffusers({
        "block_out_channels": [320, 640, 1280, 1280],
        "attention_head_dim": [5, 10, 20, 20],
        "cross_attention_dim": 1024,
        "down_block_types": ["CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D",
                           "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"],
    })
    assert cfg.attention_heads == (5, 10, 20, 20)
    assert cfg.cross_attention_dim == 1024
    # a uniform list (SD-1.x saved by newer diffusers) collapses to an int
    cfg_u = port.unet_config_from_diffusers({"attention_head_dim": [8, 8, 8, 8]})
    assert cfg_u.attention_heads == 8


def test_clip_config_from_diffusers_hidden_act():
    c = port.clip_config_from_diffusers({"hidden_size": 1024,
                                         "num_hidden_layers": 23,
                                         "num_attention_heads": 16,
                                         "intermediate_size": 4096,
                                         "hidden_act": "gelu"})
    assert c.act == "gelu" and c.hidden == 1024 and c.layers == 23


# ---------------------------------------------------------------------------
# "!" pad token


@pytest.fixture(scope="module")
def sd2_tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sd2tok")
    vocab = {"!": 0}
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    vocab["!</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    with open(d / "special_tokens_map.json", "w") as f:
        json.dump({"pad_token": "!"}, f)  # SD-2 declares "!" (id 0)
    return str(d)


def test_tokenizer_declared_pad_token(sd2_tok_dir):
    tok = CLIPTokenizer.from_pretrained(sd2_tok_dir)
    assert tok.pad_id == 0
    ids = tok.encode("ab", max_length=8)
    assert ids[0] == tok.bot_id
    assert tok.eot_id in ids
    eot_pos = ids.index(tok.eot_id)
    assert ids[eot_pos + 1:] == [0] * (8 - eot_pos - 1)
    # pads are dropped on decode (HF skip_special_tokens behavior)
    assert "!" not in tok.decode(ids)
    # AddedToken-dict serialization also accepted
    with open(os.path.join(sd2_tok_dir, "special_tokens_map.json"), "w") as f:
        json.dump({"pad_token": {"content": "!"}}, f)
    assert CLIPTokenizer.from_pretrained(sd2_tok_dir).pad_id == 0


def test_tokenizer_pad_default_stays_eot(tmp_path):
    """No declared pad token (or SD-1.x's <|endoftext|>) keeps EOT padding —
    the reference protocol (utils.py:148-154) is unchanged."""
    vocab = {"a": 0, "a</w>": 1, "<|startoftext|>": 2, "<|endoftext|>": 3}
    with open(tmp_path / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tmp_path / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    tok = CLIPTokenizer.from_pretrained(str(tmp_path))
    assert tok.pad_id == tok.eot_id
    with open(tmp_path / "tokenizer_config.json", "w") as f:
        json.dump({"pad_token": "<|endoftext|>"}, f)
    tok = CLIPTokenizer.from_pretrained(str(tmp_path))
    assert tok.pad_id == tok.eot_id
    assert CLIPTokenizer.fallback(100).pad_id == \
        CLIPTokenizer.fallback(100).eot_id


# ---------------------------------------------------------------------------
# end-to-end: tiny SD-2 analog samples finitely (v-pred + per-level heads
# + gelu text encoder), plain and with DeepCache


def test_sd2_style_end_to_end_sample(tiny_cfg, tiny_params):
    cfg = _sd2ify(tiny_cfg)
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    pipe = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=11)
    a = pipe(["a book cover"], num_inference_steps=3, latents=lat)
    # tiny VAE downscale factor is 2: 8×8 latents decode to 16×16 images
    assert a.shape == (1, 16, 16, 3) and np.isfinite(a).all()
    b = pipe(["a book cover"], num_inference_steps=4, latents=lat,
             cache_interval=2)
    assert np.isfinite(b).all()
