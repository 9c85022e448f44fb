"""Head-packing (pad self-attn head_dim to 64 in the projection weights).

The sampling fast path pads SD's 40-wide 64²-level heads to lane-friendly
64 inside W_q/k/v/o (models/unet.py::pack_attention_heads); the math is
exact — zero columns contribute zero to QKᵀ/PV and the softmax scale stays
the logical head dim's rsqrt.  Covers the transform, the shape-inferring
_mha read path, and the end-to-end sampling graph (reference engine
attention layout: diffusers UNet2DConditionModel, finetune_sd.py:328-330).
"""
import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.diffusion.pipeline import PipelineConfig, sample
from sdbc_tpu.models import unet
from sdbc_tpu.ops.attention import xla_attention


def test_kernel_packed_head_semantics():
    """flash kernel with zero-padded d=64 heads + logical scale == exact
    attention at d=40 (the packed layout's kernel-side contract)."""
    from sdbc_tpu.ops.flash_attention import flash_attention_fixed

    b, h, s, hd, hd_pad = 1, 2, 256, 40, 64
    q = jax.random.normal(jax.random.key(0), (b, h, s, hd), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, h, s, hd), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, h, s, hd), jnp.float32)
    pad = ((0, 0), (0, 0), (0, 0), (0, hd_pad - hd))
    out = flash_attention_fixed(jnp.pad(q, pad), jnp.pad(k, pad),
                                jnp.pad(v, pad), scale=hd ** -0.5)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out[..., :hd]), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    # padded tail columns stay exactly zero (v's pad columns are zero)
    assert float(jnp.abs(out[..., hd:]).max()) == 0.0


def _tiny_params_cfg():
    cfg = PipelineConfig.tiny()
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    from sdbc_tpu.models import clip, vae
    params = {"text_encoder": clip.init(k1, cfg.clip),
              "unet": unet.init(k2, cfg.unet),
              "vae": vae.init(k3, cfg.vae)}
    return params, cfg


def test_pack_transform_shapes_and_zeros():
    params, cfg = _tiny_params_cfg()
    heads = cfg.unet.attention_heads
    packed = unet.pack_attention_heads(params["unet"], cfg.unet, pad_to=64)

    tfm = packed["down"][0]["attns"][0]
    dim = params["unet"]["down"][0]["attns"][0]["attn1"]["q"]["w"].shape[0]
    hd = dim // heads
    assert hd < 64  # tiny config levels are sub-64 → all packed
    assert tfm["attn1"]["q"]["w"].shape == (dim, heads * 64)
    assert tfm["attn1"]["o"]["w"].shape == (heads * 64, dim)
    # cross-attention untouched
    assert tfm["attn2"]["q"]["w"].shape == (dim, dim)
    # pad region is zero
    w = tfm["attn1"]["q"]["w"].reshape(dim, heads, 64)
    assert float(jnp.abs(w[:, :, hd:]).max()) == 0.0
    # original tree untouched (pure transform)
    assert params["unet"]["down"][0]["attns"][0]["attn1"]["q"]["w"].shape \
        == (dim, dim)


def test_unet_apply_packed_equivalence():
    """unet.apply on packed params == unpacked (the _mha shape-inferred
    read path), on both the inference and xla dispatches."""
    params, cfg = _tiny_params_cfg()
    packed = unet.pack_attention_heads(params["unet"], cfg.unet, pad_to=64)

    lat = jax.random.normal(jax.random.key(3), (2, 8, 8, 4), jnp.float32)
    t = jnp.array([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(4),
                            (2, cfg.clip.ctx, cfg.unet.cross_attention_dim),
                            jnp.float32)
    for impl in ("xla", "inference"):
        ref = unet.apply(params["unet"], lat, t, ctx, cfg.unet,
                         attn_impl=impl)
        out = unet.apply(packed, lat, t, ctx, cfg.unet, attn_impl=impl)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)


def test_sample_pack_heads_equivalence():
    """The full sampling graph with pack_heads=True matches pack_heads=False
    (separate jit cache keys — the flag is static)."""
    params, cfg = _tiny_params_cfg()
    b = 1
    cond = jnp.ones((b, cfg.clip.ctx), jnp.int32)
    uncond = jnp.zeros((b, cfg.clip.ctx), jnp.int32)
    lat = jax.random.normal(jax.random.key(5), (b, 8, 8, 4), jnp.float32)
    kw = dict(cfg=cfg, num_inference_steps=3, compute_dtype=jnp.float32)
    ref = sample(params, cond, uncond, lat, jax.random.key(6), 7.5,
                 pack_heads=False, **kw)
    out = sample(params, cond, uncond, lat, jax.random.key(6), 7.5,
                 pack_heads=True, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_sample_pack_heads_with_deepcache_and_img2img():
    """pack_heads composes with the DeepCache trunk cache and the img2img
    t_start/init_image path (the packed tree feeds both unet call sites)."""
    params, cfg = _tiny_params_cfg()
    b = 1
    cond = jnp.ones((b, cfg.clip.ctx), jnp.int32)
    uncond = jnp.zeros((b, cfg.clip.ctx), jnp.int32)
    lat = jax.random.normal(jax.random.key(5), (b, 8, 8, 4), jnp.float32)
    # tiny VAE downscale factor is 2: (16, 16, 3) encodes to the (8, 8, 4)
    # latent grid above
    init = jnp.clip(jax.random.uniform(jax.random.key(7), (b, 16, 16, 3)),
                    0.0, 1.0)
    for kw in (
        dict(num_inference_steps=4, cache_interval=2, cache_tail=1),
        dict(num_inference_steps=4, t_start=2, init_image=init),
    ):
        kw = dict(cfg=cfg, compute_dtype=jnp.float32, **kw)
        ref = sample(params, cond, uncond, lat, jax.random.key(6), 7.5,
                     pack_heads=False, **kw)
        out = sample(params, cond, uncond, lat, jax.random.key(6), 7.5,
                     pack_heads=True, **kw)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=1e-4)
