"""ControlNet tests (tiny configs): zero-init no-op, residual wiring, scale.

Beyond-reference model family (the reference pins plain SD-1.5,
finetune_sd.py:322-336); behavior is checked against the arXiv:2302.05543
protocol — a fresh `from_unet` ControlNet must reproduce the base model
bit-for-bit, and the conditioning must flow once trained convs are nonzero.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import PipelineConfig, SDPipeline, sample
from sdbc_tpu.models import controlnet, unet
from sdbc_tpu.utils.prng import per_sample_fixed_latents


@pytest.fixture(scope="module")
def cn_cfg(tiny_cfg) -> PipelineConfig:
    cfg = tiny_cfg.with_controlnet()
    assert cfg.controlnet.spatial_reduction == cfg.vae_scale
    return cfg


@pytest.fixture(scope="module")
def cn_params(cn_cfg, tiny_params):
    cn = controlnet.from_unet(tiny_params["unet"], jax.random.key(7),
                              cn_cfg.controlnet)
    return {**tiny_params, "controlnet": cn}


@pytest.fixture(scope="module")
def cn_pipe(cn_cfg, cn_params):
    tok = CLIPTokenizer.fallback(cn_cfg.clip.vocab_size)
    return SDPipeline(cn_params, cn_cfg, tok, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def base_pipe(tiny_cfg, tiny_params):
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    return SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32)


def _control(b=1, size=16):
    rng = np.random.RandomState(3)
    return rng.rand(b, size, size, 3).astype(np.float32)


def test_embed_cond_spatial_reduction(cn_cfg, cn_params):
    out = controlnet.embed_cond(cn_params["controlnet"],
                                jnp.asarray(_control(2, 16)),
                                cn_cfg.controlnet)
    # f2 VAE: 16² control image → 8² latent grid at ch0 width
    assert out.shape == (2, 8, 8, cn_cfg.unet.block_out_channels[0])
    # zero-init final projection: a fresh embedder contributes nothing
    assert np.all(np.asarray(out) == 0.0)


def test_residual_count_and_channels(cn_cfg, cn_params, tiny_cfg):
    ucfg = cn_cfg.unet
    ctx = jnp.zeros((2, tiny_cfg.clip.ctx, tiny_cfg.clip.hidden), jnp.float32)
    lat = jnp.zeros((2, 8, 8, ucfg.in_channels), jnp.float32)
    emb = controlnet.embed_cond(cn_params["controlnet"],
                                jnp.asarray(_control(2, 16)),
                                cn_cfg.controlnet)
    down, mid = controlnet.apply(cn_params["controlnet"], lat,
                                 jnp.zeros((2,), jnp.float32), ctx, emb,
                                 cn_cfg.controlnet)
    chans = controlnet._skip_channels(ucfg)
    assert len(down) == controlnet.num_skips(ucfg) == len(chans)
    for r, c in zip(down, chans):
        assert r.shape[-1] == c
    assert mid.shape[-1] == ucfg.block_out_channels[-1]
    # the residuals must be consumable by the UNet skip-injection path
    out = unet.apply(cn_params["unet"], lat, jnp.zeros((2,), jnp.int32), ctx,
                     ucfg, control_residuals=(down, mid))
    assert out.shape == lat.shape


def test_fresh_controlnet_is_exact_noop(cn_pipe, base_pipe):
    """from_unet zero convs ⇒ injected residuals are exactly zero ⇒ the
    controlled sample equals the plain one (the arXiv:2302.05543 training
    start guarantee)."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=11)
    a = base_pipe(["a book"], height=16, width=16, num_inference_steps=3,
                  latents=lat)
    b = cn_pipe(["a book"], height=16, width=16, num_inference_steps=3,
                latents=lat, control_image=_control())
    np.testing.assert_allclose(a, b, atol=1e-6)


def _perturbed(cn_params):
    p = jax.tree_util.tree_map(lambda x: x, cn_params)
    cn = dict(p["controlnet"])
    cn["zero_mid"] = {"w": cn["zero_mid"]["w"] + 0.1,
                      "b": cn["zero_mid"]["b"] + 0.05}
    cn["zero_down"] = [{"w": z["w"] + 0.1, "b": z["b"]}
                       for z in cn["zero_down"]]
    # the conditioning embedder's final projection is also zero-init; give
    # it weight so the control IMAGE (not just the latent) reaches the UNet
    ce = dict(cn["cond_embedding"])
    ce["conv_out"] = {"w": ce["conv_out"]["w"] + 0.1,
                      "b": ce["conv_out"]["b"]}
    cn["cond_embedding"] = ce
    return {**p, "controlnet": cn}


def test_conditioning_flows_and_scale(cn_cfg, cn_params):
    """Nonzero output convs: the control image changes the sample; scale=0
    recovers the base model without recompiling the zero-residual graph."""
    tok = CLIPTokenizer.fallback(cn_cfg.clip.vocab_size)
    pipe = SDPipeline(_perturbed(cn_params), cn_cfg, tok,
                      compute_dtype=jnp.float32)
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=5)
    base = pipe(["x"], height=16, width=16, num_inference_steps=3,
                latents=lat)
    on = pipe(["x"], height=16, width=16, num_inference_steps=3, latents=lat,
              control_image=_control())
    off = pipe(["x"], height=16, width=16, num_inference_steps=3, latents=lat,
               control_image=_control(), controlnet_scale=0.0)
    assert not np.allclose(base, on)
    np.testing.assert_allclose(base, off, atol=1e-6)
    # different control image ⇒ different sample
    other = np.clip(_control() + 0.3, 0.0, 1.0)
    on2 = pipe(["x"], height=16, width=16, num_inference_steps=3,
               latents=lat, control_image=other)
    assert not np.allclose(on, on2)


def test_control_image_tiles_over_batch(cn_pipe):
    imgs = cn_pipe(["a", "b", "c"], height=16, width=16,
                   num_inference_steps=2, control_image=_control())
    assert imgs.shape == (3, 16, 16, 3)


def test_control_without_params_rejected(base_pipe):
    with pytest.raises(ValueError, match="controlnet"):
        base_pipe(["x"], height=16, width=16, num_inference_steps=2,
                  control_image=_control())


def test_control_with_deepcache_rejected(cn_pipe):
    with pytest.raises(ValueError, match="cache_interval"):
        cn_pipe(["x"], height=16, width=16, num_inference_steps=4,
                cache_interval=2, control_image=_control())


def test_other_schedulers_accept_control(cn_cfg, cn_params):
    tok = CLIPTokenizer.fallback(cn_cfg.clip.vocab_size)
    for sched in ("dpm", "euler_a"):
        cfg = dataclasses.replace(cn_cfg, scheduler=sched)
        pipe = SDPipeline(_perturbed(cn_params), cfg,
                          tok, compute_dtype=jnp.float32)
        imgs = pipe(["x"], height=16, width=16, num_inference_steps=2,
                    control_image=_control())
        assert np.all(np.isfinite(imgs))


def _residuals(cn, cn_cfg, lat, ctx):
    emb = controlnet.embed_cond(cn, jnp.asarray(_control(1, 16)),
                                cn_cfg.controlnet)
    return controlnet.apply(cn, lat, jnp.zeros((1,), jnp.float32), ctx, emb,
                            cn_cfg.controlnet)


def test_export_port_roundtrip(cn_cfg, cn_params, tiny_cfg):
    """export_controlnet → port_controlnet reproduces the forward exactly
    (the same interop proof used for UNet/VAE/CLIP — diffusers itself is
    not installed in this image)."""
    from sdbc_tpu.models import port

    cn = _perturbed(cn_params)["controlnet"]
    back = port.port_controlnet(port.export_controlnet(cn))
    lat = jax.random.normal(jax.random.key(0),
                            (1, 8, 8, cn_cfg.unet.in_channels))
    ctx = jax.random.normal(jax.random.key(1),
                            (1, tiny_cfg.clip.ctx, tiny_cfg.clip.hidden))
    d1, m1 = _residuals(cn, cn_cfg, lat, ctx)
    d2, m2 = _residuals(back, cn_cfg, lat, ctx)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_load_controlnet_dir(cn_cfg, cn_params, tiny_cfg, tmp_path):
    """A diffusers-layout ControlNet dir (config.json + safetensors) loads
    into the same params and an equal config."""
    import json

    from safetensors.numpy import save_file

    from sdbc_tpu.models import port

    cn = _perturbed(cn_params)["controlnet"]
    u = cn_cfg.unet
    d = tmp_path / "controlnet"
    d.mkdir()
    save_file(port.export_controlnet(cn), str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps({
        "in_channels": u.in_channels,
        "block_out_channels": list(u.block_out_channels),
        "layers_per_block": u.layers_per_block,
        "cross_attention_dim": u.cross_attention_dim,
        "attention_head_dim": u.attention_heads,
        "norm_num_groups": u.norm_groups,
        "down_block_types": ["CrossAttnDownBlock2D" if c else "DownBlock2D"
                             for c in u.cross_attn_blocks],
        "conditioning_embedding_out_channels":
            list(cn_cfg.controlnet.conditioning_channels),
    }))
    params, cfg = port.load_controlnet(str(tmp_path))  # finds the subfolder
    assert cfg == cn_cfg.controlnet
    lat = jax.random.normal(jax.random.key(3),
                            (1, 8, 8, u.in_channels))
    ctx = jax.random.normal(jax.random.key(4),
                            (1, tiny_cfg.clip.ctx, tiny_cfg.clip.hidden))
    d1, m1 = _residuals(cn, cn_cfg, lat, ctx)
    d2, m2 = _residuals(params, cn_cfg, lat, ctx)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _train_batch(cfg, accum=1, micro=2):
    return {
        "pixel_values": jnp.clip(jax.random.normal(
            jax.random.key(11), (accum, micro, 16, 16, 3)) * 0.5, -1, 1),
        "input_ids": jnp.ones((accum, micro, cfg.clip.ctx), jnp.int32),
    }


def test_training_hints():
    px = jnp.clip(jax.random.normal(jax.random.key(0), (2, 16, 16, 3)), -1, 1)
    e = controlnet.training_hint(px, "edges")
    assert e.shape == (2, 16, 16, 3)
    assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0
    i = controlnet.training_hint(px, "image")
    np.testing.assert_allclose(np.asarray(i),
                               np.asarray(px) * 0.5 + 0.5, atol=1e-6)
    with pytest.raises(ValueError, match="unknown control hint"):
        controlnet.training_hint(px, "depth")


def test_fresh_controlnet_training_loss_equals_base(cn_cfg, cn_params,
                                                    tiny_cfg, tiny_params):
    """Step-0 guarantee on the TRAINING objective: a fresh from_unet
    ControlNet's residuals are exactly zero, so the controlled loss equals
    the plain fine-tuning loss bit-for-bit (same key → same RNG splits)."""
    from sdbc_tpu.diffusion import schedulers as sched_mod
    from sdbc_tpu.train import trainer

    sched = sched_mod.make_schedule(tiny_cfg.schedule)
    batch = jax.tree.map(lambda x: x[0], _train_batch(tiny_cfg))
    key = jax.random.key(7)
    base_t = TrainConfig = trainer.TrainConfig
    l_base = trainer.diffusion_loss(
        {"unet": tiny_params["unet"]},
        {k: v for k, v in tiny_params.items() if k != "unet"},
        batch, key, tiny_cfg,
        base_t(train_unet=True, train_text_encoder=False),
        sched, compute_dtype=jnp.float32)
    l_cn = trainer.diffusion_loss(
        {"controlnet": cn_params["controlnet"]},
        {k: v for k, v in tiny_params.items()},
        batch, key, cn_cfg,
        base_t(train_controlnet=True, train_unet=False,
               train_text_encoder=False),
        sched, compute_dtype=jnp.float32)
    np.testing.assert_allclose(float(l_base), float(l_cn), rtol=1e-6)


def test_controlnet_train_step(cn_cfg, cn_params, tiny_params):
    """One optimizer step trains ONLY the branch: the zero convs move off
    zero (gradients flow through the injection) and the base stays frozen."""
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step, merged_params)

    tcfg = TrainConfig(train_controlnet=True, train_unet=False,
                       train_text_encoder=False, grad_accum=1,
                       learning_rate=1e-3, num_examples=100)
    state = init_train_state(cn_params, tcfg, compute_dtype=jnp.float32)
    assert set(state.trainable) == {"controlnet"}
    assert set(state.frozen) == {"text_encoder", "unet", "vae"}
    step = make_train_step(cn_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _train_batch(cn_cfg)
    key = jax.random.key(42)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    zd = state.trainable["controlnet"]["zero_down"]
    assert max(float(jnp.max(jnp.abs(z["w"]))) for z in zd) > 0
    assert float(jnp.max(jnp.abs(
        state.trainable["controlnet"]["zero_mid"]["w"]))) > 0
    # fixed batch + key: the branch must be learning
    assert losses[-1] < losses[0], losses
    assert set(merged_params(state, tcfg)) == {"text_encoder", "unet", "vae",
                                               "controlnet"}


def test_controlnet_training_guards(cn_cfg, cn_params, tiny_params):
    from sdbc_tpu.train.trainer import TrainConfig, init_train_state

    with pytest.raises(ValueError, match="freezes the whole base"):
        init_train_state(cn_params,
                         TrainConfig(train_controlnet=True, train_unet=True,
                                     train_text_encoder=False),
                         compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="params\\['controlnet'\\]"):
        init_train_state(tiny_params,
                         TrainConfig(train_controlnet=True, train_unet=False,
                                     train_text_encoder=False),
                         compute_dtype=jnp.float32)


def test_sd15_with_controlnet_shapes():
    cfg = PipelineConfig.sd15().with_controlnet()
    assert cfg.controlnet.conditioning_channels == (16, 32, 96, 256)
    assert cfg.controlnet.spatial_reduction == 8
    assert controlnet.num_skips(cfg.unet) == 12  # diffusers SD-1.5 parity


def test_with_controlnet_deep_vae_ramp():
    """f16 (5-level) VAE: the ramp extends so spatial_reduction still
    equals vae_scale (regression: n>4 silently produced a len-4 ramp)."""
    from sdbc_tpu.models.vae import VAEConfig

    deep_vae = dataclasses.replace(
        VAEConfig.sd15(), block_out_channels=(128, 256, 512, 512, 512))
    cfg = dataclasses.replace(PipelineConfig.sd15(), vae=deep_vae)
    cn = cfg.with_controlnet()
    assert cn.vae_scale == 16
    assert cn.controlnet.spatial_reduction == 16
    assert cn.controlnet.conditioning_channels == (16, 32, 96, 256, 256)


def test_precompute_temb_matches_unhoisted(cn_cfg, cn_params):
    """controlnet.precompute_temb tables == the in-graph time MLP path,
    step by step (the sampling loop hoists them via pipeline._hoist_tproj)."""
    cn = cn_params["controlnet"]
    ts = jnp.asarray([9.0, 5.0, 1.0], jnp.float32)
    tables = controlnet.precompute_temb(cn, ts, cn_cfg.controlnet,
                                        dtype=jnp.float32)
    lat = jax.random.normal(jax.random.key(21), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(22),
                            (2, 16, cn_cfg.unet.cross_attention_dim))
    cond = controlnet.embed_cond(cn, np.full((2, 16, 16, 3), 0.5, np.float32),
                                 cn_cfg.controlnet)
    for i in range(3):
        tb = jnp.full((2,), ts[i], jnp.float32)
        a = controlnet.apply(cn, lat, tb, ctx, cond, cn_cfg.controlnet)
        b = controlnet.apply(cn, lat, tb, ctx, cond, cn_cfg.controlnet,
                             temb_proj=unet.index_temb(tables, i))
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb) > 0
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5)


# --------------------------------------------------------- multi-ControlNet

@pytest.fixture(scope="module")
def multi_cn_params(cn_cfg, tiny_params):
    """Two independent branches: one trained-looking (nonzero zero-convs),
    one fresh (exact no-op)."""
    cn1 = controlnet.from_unet(tiny_params["unet"], jax.random.key(7),
                               cn_cfg.controlnet)
    # give branch 1 nonzero output convs so it actually contributes
    cn1 = dict(cn1)
    cn1["zero_mid"] = jax.tree.map(
        lambda a: a + 0.01 * jax.random.normal(jax.random.key(8), a.shape),
        cn1["zero_mid"])
    cn2 = controlnet.from_unet(tiny_params["unet"], jax.random.key(9),
                               cn_cfg.controlnet)
    return cn1, cn2


def test_multi_controlnet_zero_scale_matches_single(cn_cfg, tiny_params,
                                                    multi_cn_params):
    """[cn1 @ 1.0, cn2 @ 0.0] == cn1 alone: the residual sum is linear in
    the per-branch conditioning scales."""
    cn1, cn2 = multi_cn_params
    tok = CLIPTokenizer.fallback(cn_cfg.clip.vocab_size)
    kw = dict(height=32, width=32, num_inference_steps=2, seed=5)
    ctrl = _control(1, 32)

    single = SDPipeline({**tiny_params, "controlnet": cn1}, cn_cfg, tok,
                        compute_dtype=jnp.float32)
    a = single(["a cover"], control_image=ctrl, controlnet_scale=1.0, **kw)

    multi = SDPipeline({**tiny_params, "controlnet": [cn1, cn2]}, cn_cfg,
                       tok, compute_dtype=jnp.float32)
    b = multi(["a cover"], control_image=[ctrl, _control(1, 32)],
              controlnet_scale=[1.0, 0.0], **kw)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_multi_controlnet_fresh_branches_are_noop(cn_cfg, tiny_params,
                                                  base_pipe):
    """Two FRESH branches attached together still reproduce the base
    model (each branch's zero convs inject exact zeros, and 0 + 0 = 0)."""
    cn_a = controlnet.from_unet(tiny_params["unet"], jax.random.key(11),
                                cn_cfg.controlnet)
    cn_b = controlnet.from_unet(tiny_params["unet"], jax.random.key(12),
                                cn_cfg.controlnet)
    tok = CLIPTokenizer.fallback(cn_cfg.clip.vocab_size)
    kw = dict(height=32, width=32, num_inference_steps=2)
    lat = per_sample_fixed_latents(1, (4, 16, 16), seed=21)
    ref = base_pipe(["a cover"], latents=lat, **kw)
    multi = SDPipeline({**tiny_params, "controlnet": [cn_a, cn_b]}, cn_cfg,
                       tok, compute_dtype=jnp.float32)
    out = multi(["a cover"], latents=lat,
                control_image=[_control(1, 32), _control(1, 32)], **kw)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_multi_controlnet_count_mismatch_rejected(cn_cfg, tiny_params,
                                                  multi_cn_params):
    cn1, cn2 = multi_cn_params
    tok = CLIPTokenizer.fallback(cn_cfg.clip.vocab_size)
    multi = SDPipeline({**tiny_params, "controlnet": [cn1, cn2]}, cn_cfg,
                       tok, compute_dtype=jnp.float32)
    kw = dict(height=32, width=32, num_inference_steps=2)
    with pytest.raises(ValueError, match="control images for 2"):
        multi(["a cover"], control_image=_control(1, 32), **kw)
    with pytest.raises(ValueError, match="scales for 2"):
        multi(["a cover"], control_image=[_control(1, 32), _control(1, 32)],
              controlnet_scale=[1.0, 0.5, 0.2], **kw)


def test_multi_controlnet_training_rejected(cn_cfg, tiny_params,
                                            multi_cn_params):
    from sdbc_tpu.train.trainer import TrainConfig, init_train_state

    cn1, cn2 = multi_cn_params
    with pytest.raises(ValueError, match="ONE branch"):
        init_train_state(
            {**tiny_params, "controlnet": [cn1, cn2]},
            TrainConfig(train_controlnet=True, train_unet=False,
                        train_text_encoder=False),
            compute_dtype=jnp.float32)
