"""img2img / inpainting pipeline tests (tiny configs, few steps).

The reference's engine (diffusers 0.7.2) ships Img2Img/Inpaint pipelines
alongside the text-to-image one the reference drives; this framework exposes
the same surface on `SDPipeline` (diffusion/pipeline.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import (SDPipeline, img2img_t_start,
                                         preprocess_image, preprocess_mask)
from sdbc_tpu.models import vae as vae_mod


@pytest.fixture(scope="module")
def pipe(tiny_cfg, tiny_params):
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    return SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def init_img():
    return np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)


def test_img2img_shape_range_deterministic(pipe, init_img):
    a = pipe.img2img(["a book cover"], init_img, strength=0.5,
                     num_inference_steps=4, seed=3)
    b = pipe.img2img(["a book cover"], init_img, strength=0.5,
                     num_inference_steps=4, seed=3)
    assert a.shape == (1, 32, 32, 3)
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)


def test_img2img_strength_matters(pipe, init_img):
    a = pipe.img2img(["x"], init_img, strength=0.5, num_inference_steps=4,
                     seed=3)
    b = pipe.img2img(["x"], init_img, strength=1.0, num_inference_steps=4,
                     seed=3)
    assert not np.allclose(a, b)


def test_t_start_map():
    # diffusers get_timesteps arithmetic at offset 0
    assert img2img_t_start(50, 1.0) == 0
    assert img2img_t_start(50, 0.8) == 10
    assert img2img_t_start(50, 0.5) == 25
    assert img2img_t_start(50, 0.01) == 50  # below one step: empty loop
    # offset shifts both ends (diffusers formula)
    assert img2img_t_start(50, 0.8, steps_offset=1) == 10
    with pytest.raises(ValueError):
        img2img_t_start(50, 0.0)
    with pytest.raises(ValueError):
        img2img_t_start(50, 1.5)


def _vae_roundtrip(pipe, init_img, seed):
    """What an empty img2img loop must return: decode(sampled encode)."""
    cfg = pipe.cfg
    _, skey = jax.random.split(jax.random.key(seed))
    k_enc, _ = jax.random.split(skey)
    mean, logvar = vae_mod.encode_moments(
        pipe.params["vae"], jnp.asarray(init_img[None] * 2.0 - 1.0), cfg.vae)
    lat = vae_mod.sample(mean, logvar, k_enc)
    img = vae_mod.decode(pipe.params["vae"], lat, cfg.vae)
    return np.clip(np.asarray(img, np.float32) / 2.0 + 0.5, 0.0, 1.0)


def test_strength_below_one_step_is_vae_roundtrip(pipe, init_img):
    """strength so small the loop is empty → pure VAE encode/decode."""
    out = pipe.img2img(["x"], init_img, strength=0.01,
                       num_inference_steps=4, seed=5)
    np.testing.assert_allclose(out, _vae_roundtrip(pipe, init_img, 5),
                               atol=1e-5)


def test_mask_all_ones_equals_plain_img2img(pipe, init_img):
    """mask=1 everywhere regenerates everything == no mask at all."""
    mask = np.ones((32, 32), np.float32)
    a = pipe.inpaint(["x"], init_img, mask, strength=1.0,
                     num_inference_steps=4, seed=7)
    b = pipe.img2img(["x"], init_img, strength=1.0,
                     num_inference_steps=4, seed=7)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mask_all_zeros_returns_original_latents(pipe, init_img):
    """mask=0 everywhere keeps the init image: the final blend returns the
    clean init latents, so the output is exactly the VAE roundtrip."""
    mask = np.zeros((32, 32), np.float32)
    out = pipe.inpaint(["x"], init_img, mask, strength=1.0,
                       num_inference_steps=4, seed=9)
    np.testing.assert_allclose(out, _vae_roundtrip(pipe, init_img, 9),
                               atol=1e-5)


def test_partial_mask_differs_from_both_extremes(pipe, init_img):
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe.inpaint(["x"], init_img, mask, strength=1.0,
                       num_inference_steps=4, seed=7)
    full = pipe.img2img(["x"], init_img, strength=1.0,
                        num_inference_steps=4, seed=7)
    keep = _vae_roundtrip(pipe, init_img, 7)
    assert not np.allclose(out, full)
    assert not np.allclose(out, keep)


@pytest.mark.parametrize("scheduler", ["dpm", "ddpm", "dpm_sde", "unipc"])
def test_other_schedulers_img2img(tiny_cfg, tiny_params, init_img, scheduler):
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, scheduler=scheduler)
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    out = p.img2img(["x"], init_img, strength=0.5, num_inference_steps=4,
                    seed=1)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()


def test_pndm_img2img_rejected(tiny_cfg, tiny_params, init_img):
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg, scheduler="pndm")
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="PNDM"):
        p.img2img(["x"], init_img, num_inference_steps=4)


def test_mask_requires_init_image(pipe):
    with pytest.raises(ValueError, match="requires init_image"):
        pipe(["x"], mask_image=np.ones((32, 32), np.float32),
             num_inference_steps=2)


def test_batched_img2img_and_bucket_padding(pipe, init_img):
    """3 prompts share one init image; the bucket pads to 4 internally."""
    out = pipe.img2img(["a", "b", "c"], init_img, strength=0.5,
                       num_inference_steps=3, seed=2)
    assert out.shape == (3, 32, 32, 3)
    assert np.isfinite(out).all()
    # prompts actually condition the result
    assert not np.allclose(out[0], out[1])


def test_preprocess_image_contracts():
    u8 = (np.random.RandomState(1).rand(32, 32, 3) * 255).astype(np.uint8)
    arr = preprocess_image(u8, 32, 32)
    assert arr.shape == (1, 32, 32, 3) and arr.dtype == np.float32
    assert arr.max() <= 1.0
    with pytest.raises(ValueError, match="resize"):
        preprocess_image(np.zeros((16, 16, 3), np.float32), 32, 32)
    PIL = pytest.importorskip("PIL.Image")
    pil = PIL.fromarray(u8).resize((17, 23))
    arr2 = preprocess_image(pil, 32, 32)  # auto-resized
    assert arr2.shape == (1, 32, 32, 3)


def test_preprocess_mask_contracts():
    # latent-resolution passthrough
    m = preprocess_mask(np.ones((8, 8), np.float32), 8, 8)
    assert m.shape == (1, 8, 8, 1)
    # pixel-space max-pool: any touched cell regenerates
    px = np.zeros((32, 32), np.float32)
    px[0, 0] = 1.0
    m2 = preprocess_mask(px, 8, 8)
    assert m2[0, 0, 0, 0] == 1.0 and m2.sum() == 1.0
    with pytest.raises(ValueError, match="integer multiple"):
        preprocess_mask(np.zeros((30, 30), np.float32), 8, 8)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        preprocess_mask(np.full((8, 8), 2.0, np.float32), 8, 8)
    # PIL path: white = regenerate
    PIL = pytest.importorskip("PIL.Image")
    pil = PIL.fromarray(np.full((32, 32), 255, np.uint8))
    m3 = preprocess_mask(pil, 8, 8)
    assert m3.shape == (1, 8, 8, 1) and (m3 == 1.0).all()


def test_img2img_with_deepcache_first_step_recomputes(pipe, init_img):
    """DeepCache + img2img: the cache phase is relative to t_start, so the
    first EXECUTED step always recomputes the trunk (a zeroed cache fed to
    the reuse branch would silently corrupt the first cached step).
    strength=0.75 @ 4 steps → t_start=1 (odd) exercises the phase shift."""
    out = pipe.img2img(["x"], init_img, strength=0.75,
                       num_inference_steps=4, seed=11, cache_interval=2)
    assert np.isfinite(out).all()
    # k=1 (cache on, but recompute every step) must equal no cache at all
    a = pipe.img2img(["x"], init_img, strength=0.75,
                     num_inference_steps=4, seed=11, cache_interval=0)
    b = pipe.img2img(["x"], init_img, strength=0.75,
                     num_inference_steps=4, seed=11, cache_interval=1)
    np.testing.assert_allclose(a, b, atol=1e-5)
