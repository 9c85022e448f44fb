"""Hires-fix (two-stage upscale) and latent-space img2img tests.

The reference's engine composes only near the 512² training resolution;
the community hires-fix second pass (absent from the reference, which
samples a single resolution — /root/reference/inference.py:342-351) is
covered here at tiny scale: base pass → latent/image upscale → strength-
bounded img2img finish (diffusion/pipeline.py SDPipeline.hires).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion import schedulers as sched_mod
from sdbc_tpu.diffusion.pipeline import (PipelineConfig, SDPipeline,
                                         img2img_t_start, sample)
from sdbc_tpu.models import vae as vae_mod


@pytest.fixture(scope="module")
def pipe(tiny_cfg, tiny_params):
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    return SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32)


def test_hires_latent_shape_range_deterministic(pipe):
    a = pipe.hires(["a book cover"], height=32, width=32, hires_scale=2.0,
                   hires_strength=0.6, num_inference_steps=4, seed=7)
    b = pipe.hires(["a book cover"], height=32, width=32, hires_scale=2.0,
                   hires_strength=0.6, num_inference_steps=4, seed=7)
    assert a.shape == (1, 32, 32, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)


def test_hires_image_mode(pipe):
    out = pipe.hires(["x"], height=32, width=32, hires_scale=2.0,
                     hires_strength=0.6, hires_mode="image",
                     num_inference_steps=4, seed=7)
    assert out.shape == (1, 32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_hires_modes_and_seeds_differ(pipe):
    kw = dict(height=32, width=32, hires_scale=2.0, hires_strength=0.6,
              num_inference_steps=4)
    a = pipe.hires(["x"], seed=7, **kw)
    b = pipe.hires(["x"], seed=8, **kw)
    c = pipe.hires(["x"], seed=7, hires_mode="image", **kw)
    assert not np.allclose(a, b)  # seed reaches both stages
    assert not np.allclose(a, c)  # VAE roundtrip changes the init


def test_hires_second_stage_grid(pipe):
    """hires_steps resizes the second-stage grid independently."""
    kw = dict(height=32, width=32, hires_scale=2.0, hires_strength=0.6,
              num_inference_steps=4, seed=7)
    a = pipe.hires(["x"], **kw)
    b = pipe.hires(["x"], hires_steps=8, **kw)
    assert not np.allclose(a, b)


def test_init_latents_empty_loop_is_pure_decode(pipe, tiny_cfg):
    """strength below one step → the stage-2 loop is empty and the output
    must be exactly decode(init_latents) — the sharpest end-to-end check
    that init_latents bypasses the VAE encode and re-noising."""
    rng = np.random.RandomState(3)
    lat = rng.randn(1, 16, 16, tiny_cfg.latent_channels).astype(np.float32)
    out = pipe(["x"], height=32, width=32, init_latents=lat, strength=0.01,
               num_inference_steps=4, seed=5)
    dec = vae_mod.decode(pipe.params["vae"],
                         jnp.asarray(lat) / tiny_cfg.vae.scaling_factor,
                         tiny_cfg.vae)
    ref = np.clip(np.asarray(dec, np.float32) / 2.0 + 0.5, 0.0, 1.0)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_init_latents_matches_manual_renoise(pipe, tiny_cfg, tiny_params):
    """sample(init_latents=L, latents=noise, t_start=s) == sample starting
    from the manually noised latent with the handoff (no-init) protocol."""
    steps, strength = 4, 0.5
    s = img2img_t_start(steps, strength, tiny_cfg.schedule.steps_offset)
    assert 0 < s < steps
    rng = np.random.RandomState(0)
    L = jnp.asarray(rng.randn(1, 16, 16, tiny_cfg.latent_channels),
                    jnp.float32)
    noise = jnp.asarray(rng.randn(*L.shape), jnp.float32)
    ids = jnp.zeros((1, tiny_cfg.clip.ctx), jnp.int32)
    key = jax.random.key(11)
    a = sample(tiny_params, ids, ids, noise, key, 7.5, cfg=tiny_cfg,
               num_inference_steps=steps, compute_dtype=jnp.float32,
               init_latents=L, t_start=s)
    sched = sched_mod.make_schedule(tiny_cfg.schedule)
    ts = sched_mod.ddim_timesteps(tiny_cfg.schedule, steps)
    noised = sched_mod.ddpm_add_noise(
        sched, L, noise, jnp.full((1,), ts[s], jnp.int32))
    b = sample(tiny_params, ids, ids, noised, key, 7.5, cfg=tiny_cfg,
               num_inference_steps=steps, compute_dtype=jnp.float32,
               t_start=s)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_hires_rejections(pipe):
    with pytest.raises(ValueError, match="hires_strength"):
        pipe.hires(["x"], height=32, width=32, strength=0.5)
    with pytest.raises(ValueError, match="hires_scale"):
        pipe.hires(["x"], height=32, width=32, hires_scale=1.0)
    with pytest.raises(ValueError, match="hires_mode"):
        pipe.hires(["x"], height=32, width=32, hires_mode="pixel")
    with pytest.raises(ValueError, match="multiple"):
        pipe.hires(["x"], height=40, width=40, num_inference_steps=2)


def test_hires_rejects_pndm(tiny_params):
    cfg = PipelineConfig.tiny("pndm")
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="t_start"):
        p.hires(["x"], height=32, width=32)


def test_init_latents_shape_mismatch_raises(pipe, tiny_cfg):
    lat = np.zeros((1, 8, 8, tiny_cfg.latent_channels), np.float32)
    with pytest.raises(ValueError, match="resize"):
        pipe(["x"], height=32, width=32, init_latents=lat,
             num_inference_steps=2)


def test_init_latents_excludes_init_image(pipe, tiny_cfg):
    lat = np.zeros((1, 16, 16, tiny_cfg.latent_channels), np.float32)
    img = np.zeros((32, 32, 3), np.float32)
    with pytest.raises(ValueError, match="mutually exclusive"):
        pipe(["x"], height=32, width=32, init_latents=lat, init_image=img,
             num_inference_steps=2)
