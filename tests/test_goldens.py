"""Golden-activation regression tests.

The reference's de-facto regression test is fixed-seed image grids
(SURVEY.md §4 "golden-eyeball evaluation"); here the same idea is made
numeric: recorded activations of every model (tiny config, fixed init seed 0)
plus a full fixed-latent 4-step pipeline image.  Any refactor that changes
model math breaks these.  Regenerate intentionally with
`python tests/gen_goldens.py` if semantics change on purpose (last regen:
steps_offset 1→0 parity fix, which shifts the sampled timestep grid).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.diffusion.pipeline import SDPipeline
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.utils.prng import per_sample_fixed_latents

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens",
                       "tiny_goldens.npz")


@pytest.fixture(scope="module")
def goldens():
    return np.load(GOLDENS)


def test_clip_golden(tiny_cfg, tiny_params, goldens):
    ids = jnp.arange(2 * tiny_cfg.clip.ctx).reshape(2, -1) % \
        tiny_cfg.clip.vocab_size
    h = clip.apply(tiny_params["text_encoder"], ids, tiny_cfg.clip)
    np.testing.assert_allclose(np.asarray(h), goldens["clip_out"], atol=1e-4)


def test_unet_golden(tiny_cfg, tiny_params, goldens):
    lat = jax.random.normal(jax.random.key(10), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(11),
                            (1, tiny_cfg.clip.ctx,
                             tiny_cfg.unet.cross_attention_dim))
    eps = unet.apply(tiny_params["unet"], lat, jnp.array([500]), ctx,
                     tiny_cfg.unet)
    np.testing.assert_allclose(np.asarray(eps), goldens["unet_out"], atol=1e-4)


def test_vae_golden(tiny_cfg, tiny_params, goldens):
    x = jax.random.normal(jax.random.key(12), (1, 32, 32, 3))
    mean, _ = vae.encode_moments(tiny_params["vae"], x, tiny_cfg.vae)
    np.testing.assert_allclose(np.asarray(mean), goldens["vae_mean"],
                               atol=1e-4)
    dec = vae.decode(tiny_params["vae"], mean, tiny_cfg.vae)
    np.testing.assert_allclose(np.asarray(dec), goldens["vae_dec"], atol=1e-4)


def test_pipeline_golden(tiny_cfg, tiny_params, goldens):
    from sdbc_tpu.data.tokenizer import CLIPTokenizer

    pipe = SDPipeline(tiny_params, tiny_cfg,
                      CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size),
                      compute_dtype=jnp.float32)
    latents = per_sample_fixed_latents(1, (4, 8, 8), seed=42)
    img = pipe(["golden prompt"], num_inference_steps=4, latents=latents)
    np.testing.assert_allclose(img, goldens["pipe_img"], atol=1e-3)
