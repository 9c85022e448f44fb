"""Model-level tests: shapes, determinism, masking, remat equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.models import clip, unet, vae


def test_clip_shapes_and_determinism(tiny_cfg, tiny_params):
    cfg = tiny_cfg.clip
    ids = jnp.ones((2, cfg.ctx), jnp.int32)
    h1 = clip.apply(tiny_params["text_encoder"], ids, cfg)
    h2 = clip.apply(tiny_params["text_encoder"], ids, cfg)
    assert h1.shape == (2, cfg.ctx, cfg.hidden)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_clip_causality(tiny_cfg, tiny_params):
    """Changing a later token must not change earlier positions' hidden states."""
    cfg = tiny_cfg.clip
    ids = jnp.ones((1, cfg.ctx), jnp.int32)
    ids2 = ids.at[0, -1].set(5)
    h1 = clip.apply(tiny_params["text_encoder"], ids, cfg)
    h2 = clip.apply(tiny_params["text_encoder"], ids2, cfg)
    np.testing.assert_allclose(np.asarray(h1[:, :-1]), np.asarray(h2[:, :-1]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(h1[:, -1]), np.asarray(h2[:, -1]))


def test_vae_roundtrip_shapes(tiny_cfg, tiny_params):
    cfg = tiny_cfg.vae
    f = tiny_cfg.vae_scale
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    mean, logvar = vae.encode_moments(tiny_params["vae"], x, cfg)
    assert mean.shape == (1, 32 // f, 32 // f, cfg.latent_channels)
    z = vae.sample(mean, logvar, jax.random.key(1))
    y = vae.decode(tiny_params["vae"], z, cfg)
    assert y.shape == x.shape


def test_vae_sample_reparam(tiny_cfg, tiny_params):
    """With logvar → -inf the posterior collapses to its mean."""
    mean = jnp.ones((1, 4, 4, 2))
    logvar = jnp.full((1, 4, 4, 2), -60.0)
    z = vae.sample(mean, jnp.clip(logvar, -30, 20), jax.random.key(2))
    np.testing.assert_allclose(np.asarray(z), 1.0, atol=1e-6)


def test_unet_shapes_and_timestep_sensitivity(tiny_cfg, tiny_params):
    cfg = tiny_cfg.unet
    lat = jax.random.normal(jax.random.key(3), (2, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(4), (2, 16, cfg.cross_attention_dim))
    e1 = unet.apply(tiny_params["unet"], lat, jnp.array([10, 10]), ctx, cfg)
    e2 = unet.apply(tiny_params["unet"], lat, jnp.array([900, 900]), ctx, cfg)
    assert e1.shape == lat.shape
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_unet_context_sensitivity(tiny_cfg, tiny_params):
    """Cross-attention must react to conditioning changes."""
    cfg = tiny_cfg.unet
    lat = jax.random.normal(jax.random.key(5), (1, 8, 8, cfg.in_channels))
    ctx1 = jax.random.normal(jax.random.key(6), (1, 16, cfg.cross_attention_dim))
    ctx2 = ctx1 + 1.0
    t = jnp.array([500])
    e1 = unet.apply(tiny_params["unet"], lat, t, ctx1, cfg)
    e2 = unet.apply(tiny_params["unet"], lat, t, ctx2, cfg)
    assert not np.allclose(np.asarray(e1), np.asarray(e2))


def test_unet_remat_equivalence(tiny_cfg, tiny_params):
    cfg = tiny_cfg.unet
    lat = jax.random.normal(jax.random.key(7), (1, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(8), (1, 16, cfg.cross_attention_dim))
    t = jnp.array([123])
    e1 = unet.apply(tiny_params["unet"], lat, t, ctx, cfg, remat=False)
    e2 = unet.apply(tiny_params["unet"], lat, t, ctx, cfg, remat=True)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_unet_selective_remat_equivalence(tiny_cfg, tiny_params):
    """remat_mode='selective' must match the no-remat forward AND gradients.

    Selective mode keeps flash attention outside the jax.checkpoint regions
    (models/unet.py::_transformer_selective); forward is the same op sequence
    so outputs must agree tightly, and the loss gradient w.r.t. the UNet
    params must match the block-remat path."""
    cfg = tiny_cfg.unet
    lat = jax.random.normal(jax.random.key(7), (2, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(8), (2, 16, cfg.cross_attention_dim))
    t = jnp.array([123, 450])

    def loss(p, mode):
        e = unet.apply(p, lat, t, ctx, cfg, remat=True, remat_mode=mode)
        return jnp.mean(e.astype(jnp.float32) ** 2)

    out_sel = unet.apply(tiny_params["unet"], lat, t, ctx, cfg,
                         remat=True, remat_mode="selective")
    out_ref = unet.apply(tiny_params["unet"], lat, t, ctx, cfg, remat=False)
    np.testing.assert_allclose(np.asarray(out_sel), np.asarray(out_ref),
                               atol=1e-5)

    g_blk = jax.grad(loss)(tiny_params["unet"], "block")
    g_sel = jax.grad(loss)(tiny_params["unet"], "selective")
    from jax.flatten_util import ravel_pytree

    flat_b, _ = ravel_pytree(g_blk)
    flat_s, _ = ravel_pytree(g_sel)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_b),
                               atol=2e-5)


def test_unet_temb_hoist_equivalence(tiny_cfg, tiny_params):
    """precompute_temb + temb_proj == in-graph time-embedding path.

    The sampling fast path hoists the per-ResBlock time projections out of
    the denoise loop (unet.precompute_temb); the math must be identical to
    computing them per call from (N,) timesteps.
    """
    cfg = tiny_cfg.unet
    lat = jax.random.normal(jax.random.key(9), (2, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(jax.random.key(10), (2, 16, cfg.cross_attention_dim))
    ts = jnp.array([7, 123, 900], jnp.int32)  # a 3-step "grid"
    tproj = unet.precompute_temb(tiny_params["unet"], ts, cfg,
                                 dtype=jnp.float32)
    for i in range(ts.shape[0]):
        tb = jnp.full((2,), ts[i], jnp.int32)
        ref = unet.apply(tiny_params["unet"], lat, tb, ctx, cfg)
        out = unet.apply(tiny_params["unet"], lat, tb, ctx, cfg,
                         temb_proj=unet.index_temb(tproj, i))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vae_chunked_encode_decode_equivalence(tiny_cfg, tiny_params):
    """Per-image lax.map VAE encode/decode == whole-batch (the single-chip
    fast path in pipeline.sample / trainer.diffusion_loss; the dispatch
    itself only triggers at device_count==1, so the math is pinned here).
    """
    cfg = tiny_cfg.vae
    p = tiny_params["vae"]
    x = jax.random.normal(jax.random.key(11), (3, 16, 16, 3))
    m_ref, lv_ref = vae.encode_moments(p, x, cfg)
    m_c, lv_c = jax.lax.map(
        lambda i: tuple(m[0] for m in vae.encode_moments(p, i[None], cfg)), x)
    np.testing.assert_allclose(np.asarray(m_c), np.asarray(m_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_c), np.asarray(lv_ref), atol=1e-5)

    lat = jax.random.normal(jax.random.key(12), (3, 4, 4, cfg.latent_channels))
    d_ref = vae.decode(p, lat, cfg)
    d_c = jax.lax.map(lambda l: vae.decode(p, l[None], cfg)[0], lat)
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_ref), atol=1e-5)


def test_fourier_filter_semantics():
    """DC (constant) maps are pure low-frequency: scaled by s exactly.
    A Nyquist checkerboard lives at the spectrum edge: untouched.  s=1 is
    an exact identity up to fp roundoff."""
    from sdbc_tpu.models.unet import fourier_filter

    const = jnp.full((1, 8, 8, 2), 3.0)
    out = fourier_filter(const, 1, 0.25)
    np.testing.assert_allclose(np.asarray(out), 0.75, atol=1e-5)

    yy, xx = np.mgrid[0:8, 0:8]
    checker = jnp.asarray(((-1.0) ** (yy + xx))[None, :, :, None],
                          jnp.float32)
    out2 = fourier_filter(checker, 1, 0.25)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(checker),
                               atol=1e-5)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    out3 = fourier_filter(x, 1, 1.0)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(x), atol=1e-5)


def test_unet_freeu(tiny_cfg, tiny_params):
    """freeu=None == freeu=(1,1,1,1) byte-exactly (unit scales
    short-circuit); real scales change the output and stay finite."""
    cfg = tiny_cfg.unet
    p = tiny_params["unet"]
    lat = jax.random.normal(jax.random.key(3), (1, 8, 8, cfg.in_channels))
    t = jnp.asarray([500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(4),
                            (1, 7, cfg.cross_attention_dim))
    base = unet.apply(p, lat, t, ctx, cfg)
    unit = unet.apply(p, lat, t, ctx, cfg, freeu=(1.0, 1.0, 1.0, 1.0))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(unit))
    on = unet.apply(p, lat, t, ctx, cfg, freeu=unet.FREEU_SD15)
    assert np.isfinite(np.asarray(on)).all()
    assert not np.allclose(np.asarray(base), np.asarray(on))
