"""Framework UNet/VAE vs the independent diffusers-0.7.2 NumPy mirror.

These tests certify diffusers-equivalence of the MATH (round-1 VERDICT
item 2): a framework bug in GEGLU split order, attention scale, GroupNorm
eps, skip ordering, temb placement, or time-embedding layout diverges from
tests/diffusers_mirror.py — which shares no code with sdbc_tpu — and fails
here.  Also includes the fixture hook: if recorded diffusers activations
exist (captured by tests/capture_diffusers_fixtures.py in an environment
with diffusers+torch+real weights), they are compared too.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import diffusers_mirror as mirror
from sdbc_tpu.models import unet, vae


def _to_np_tree(t):
    return jax.tree.map(lambda x: np.asarray(x, np.float64), t)


def test_unet_matches_diffusers_mirror(tiny_cfg, tiny_params):
    cfg = tiny_cfg.unet
    rng = np.random.default_rng(0)
    lat = rng.normal(size=(2, 8, 8, cfg.in_channels)).astype(np.float32)
    ctx = rng.normal(size=(2, 7, cfg.cross_attention_dim)).astype(np.float32)
    t = np.array([17, 903], np.int64)

    ours = np.asarray(unet.apply(tiny_params["unet"], jnp.asarray(lat),
                                 jnp.asarray(t, jnp.int32), jnp.asarray(ctx),
                                 cfg))
    ref = mirror.unet_forward(_to_np_tree(tiny_params["unet"]), lat, t, ctx,
                              cfg)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_unet_mirror_catches_geglu_swap(tiny_cfg, tiny_params):
    """Sanity: the mirror is sensitive — swapping GEGLU (value, gate) in the
    mirror must break the equality, proving the test has teeth."""
    cfg = tiny_cfg.unet
    rng = np.random.default_rng(1)
    lat = rng.normal(size=(1, 8, 8, cfg.in_channels)).astype(np.float32)
    ctx = rng.normal(size=(1, 7, cfg.cross_attention_dim)).astype(np.float32)
    t = np.array([500], np.int64)

    ours = np.asarray(unet.apply(tiny_params["unet"], jnp.asarray(lat),
                                 jnp.asarray(t, jnp.int32), jnp.asarray(ctx),
                                 cfg))

    orig = mirror.transformer_block

    def swapped(p, x, c, heads, groups):
        n, h, w, ch = x.shape
        residual = x
        y = mirror.conv2d(p["proj_in"],
                          mirror.group_norm(p["norm"], x, groups, 1e-6),
                          pad=0).reshape(n, h * w, ch)
        yn = mirror.layer_norm(p["ln1"], y)
        y = y + mirror.multi_head_attention(p["attn1"], yn, yn, heads)
        y = y + mirror.multi_head_attention(
            p["attn2"], mirror.layer_norm(p["ln2"], y), c, heads)
        z = mirror.linear(p["geglu"], mirror.layer_norm(p["ln3"], y))
        gate, value = z[..., : z.shape[-1] // 2], z[..., z.shape[-1] // 2:]
        y = y + mirror.linear(p["ff_out"], value * mirror.gelu_exact(gate))
        y = mirror.conv2d(p["proj_out"], y.reshape(n, h, w, ch), pad=0)
        return y + residual

    mirror.transformer_block = swapped
    try:
        ref = mirror.unet_forward(_to_np_tree(tiny_params["unet"]), lat, t,
                                  ctx, cfg)
    finally:
        mirror.transformer_block = orig
    assert not np.allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_vae_matches_diffusers_mirror(tiny_cfg, tiny_params):
    cfg = tiny_cfg.vae
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    mean_j, logvar_j = vae.encode_moments(tiny_params["vae"], jnp.asarray(x),
                                          cfg)
    vparams = _to_np_tree(tiny_params["vae"])
    mean_n, logvar_n = mirror.vae_encode_moments(vparams, x, cfg)
    np.testing.assert_allclose(np.asarray(mean_j), mean_n, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_n, rtol=1e-4,
                               atol=1e-4)

    dec_j = np.asarray(vae.decode(tiny_params["vae"], mean_j, cfg))
    dec_n = mirror.vae_decode(vparams, np.asarray(mean_j), cfg)
    np.testing.assert_allclose(dec_j, dec_n, rtol=1e-4, atol=1e-4)


def test_timestep_embedding_layout():
    """[cos | sin] with exponent arange(half)/half (flip_sin_to_cos=True)."""
    from sdbc_tpu.ops import nn

    t = np.array([0, 1, 999])
    ours = np.asarray(nn.timestep_embedding(jnp.asarray(t), 32))
    ref = mirror.timestep_embedding(t, 32)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=2e-5)  # fp32 trig
    # t=0: cos part all ones, sin part all zeros
    np.testing.assert_allclose(ours[0, :16], 1.0)
    np.testing.assert_allclose(ours[0, 16:], 0.0)


FIXTURES = os.path.join(os.path.dirname(__file__), "goldens",
                        "diffusers_fixtures.npz")


@pytest.mark.skipif(not os.path.exists(FIXTURES),
                    reason="no recorded diffusers activations (capture with "
                           "tests/capture_diffusers_fixtures.py in an env "
                           "with diffusers+torch+weights)")
def test_against_recorded_diffusers_activations():
    """Compares ported real weights against activations recorded from the
    actual diffusers UNet/VAE — runs automatically once the fixture exists."""
    from sdbc_tpu.models.port import port_diffusers_checkpoint
    from sdbc_tpu.diffusion.pipeline import PipelineConfig

    fx = np.load(FIXTURES, allow_pickle=True)
    ckpt = str(fx["checkpoint_dir"])
    if not os.path.isdir(ckpt):
        pytest.skip(f"checkpoint dir {ckpt} from the fixture is absent")
    params = port_diffusers_checkpoint(ckpt)
    cfg = PipelineConfig.sd15()
    lat = fx["unet_in_latents"]   # NHWC
    t = fx["unet_in_t"]
    ctx = fx["unet_in_ctx"]
    ours = np.asarray(unet.apply(params["unet"], jnp.asarray(lat),
                                 jnp.asarray(t, jnp.int32), jnp.asarray(ctx),
                                 cfg.unet))
    np.testing.assert_allclose(ours, fx["unet_out"], rtol=2e-3, atol=2e-3)
