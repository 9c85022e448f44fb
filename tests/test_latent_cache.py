"""Latent-cache training mode: exactness vs on-the-fly encode + loader flow.

--cache_latents precomputes the (deterministic, stop-gradient) VAE posterior
moments once per dataset (reference detaches its per-step encode,
finetune_sd.py:460-462); training from the cache must match the on-the-fly
path for the same PRNG key up to float rounding (the cache encode compiles
as its own jit graph, so XLA fusion differences vs the encode-inside-the-
train-step graph shift the last few ulps — observed max abs diff ~6e-7).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.dataset import DatasetConfig, GoodreadsDataset, make_dataloader
from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.models import vae as vae_mod
from sdbc_tpu.train import latent_cache as lc
from sdbc_tpu.train.trainer import TrainConfig, init_train_state, make_train_step
from tests.data_fixtures import build_fake_dataset


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return build_fake_dataset(str(tmp_path_factory.mktemp("lcds")), n_train=8)


@pytest.fixture(scope="module")
def dataset(data_root, tiny_cfg):
    cfg = DatasetConfig(data_root=data_root, img_size=32,
                        max_length=tiny_cfg.clip.ctx)
    return GoodreadsDataset(cfg, CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size))


@pytest.fixture(scope="module")
def cache_path(dataset, tiny_cfg, tiny_params):
    return lc.build_latent_cache(dataset, tiny_params["vae"], tiny_cfg.vae,
                                 jnp.float32, batch=4, verbose=False)


def test_cache_shapes_and_values(dataset, tiny_cfg, tiny_params, cache_path):
    mean, logvar = lc.open_latent_cache(cache_path)
    f = tiny_cfg.vae_scale
    hw = dataset.cfg.img_size // f
    c = tiny_cfg.vae.latent_channels
    assert mean.shape == (len(dataset), hw, hw, c)
    assert logvar.shape == mean.shape
    # cached moments == direct encode of the same pixels
    pixels = np.stack([dataset[i]["pixel_values"] for i in range(3)])
    m, lv = vae_mod.encode_moments(tiny_params["vae"],
                                   jnp.asarray(pixels, jnp.float32),
                                   tiny_cfg.vae)
    np.testing.assert_allclose(np.asarray(m), mean[:3], atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(lv), logvar[:3], atol=1e-5, rtol=0)


def test_cache_hit_is_reused(dataset, tiny_cfg, tiny_params, cache_path):
    mtime = os.path.getmtime(os.path.join(cache_path, "mean.npy"))
    again = lc.build_latent_cache(dataset, tiny_params["vae"], tiny_cfg.vae,
                                  jnp.float32, batch=4, verbose=False)
    assert again == cache_path
    assert os.path.getmtime(os.path.join(cache_path, "mean.npy")) == mtime


def test_cache_invalidated_by_different_vae(dataset, tiny_cfg, tiny_params,
                                            cache_path):
    other_vae = jax.tree.map(lambda x: x + 1.0, tiny_params["vae"])
    other_path, _ = lc.cache_dir_for(dataset, other_vae, jnp.float32)
    assert other_path != cache_path


def test_cached_step_matches_on_the_fly(dataset, tiny_cfg, tiny_params,
                                        cache_path):
    """Same key, same examples → same loss and update (float-rounding tol)."""
    mean, logvar = lc.open_latent_cache(cache_path)
    idx = [0, 3, 5, 6]
    pixels = np.stack([dataset[i]["pixel_values"] for i in idx])
    ids = np.stack([dataset[i]["input_ids"] for i in idx])

    pix_batch = {
        "pixel_values": jnp.asarray(pixels)[None],       # (1, 4, H, W, 3)
        "input_ids": jnp.asarray(ids)[None],
    }
    lat_batch = {
        "latent_mean": jnp.asarray(mean[idx])[None],
        "latent_logvar": jnp.asarray(logvar[idx])[None],
        "input_ids": jnp.asarray(ids)[None],
    }

    tcfg = TrainConfig(train_unet=True, train_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=10,
                       micro_batch=len(idx))
    key = jax.random.key(7)
    state0 = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    s_pix, m_pix = step(state0, pix_batch, key)

    state0 = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    s_lat, m_lat = step(state0, lat_batch, key)

    assert abs(float(m_pix["loss"]) - float(m_lat["loss"])) < 1e-5
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=0),
        s_pix.trainable, s_lat.trainable)


def test_dataloader_latent_batches(dataset, cache_path, tiny_cfg):
    cached = lc.open_latent_cache(cache_path)
    loader = make_dataloader(dataset, micro_batch=2, grad_accum=2, seed=1,
                             latent_cache=cached)
    batch = next(iter(loader))
    assert set(batch) == {"latent_mean", "latent_logvar", "input_ids"}
    hw = dataset.cfg.img_size // tiny_cfg.vae_scale
    assert batch["latent_mean"].shape == (
        2, 2, hw, hw, tiny_cfg.vae.latent_channels)
    assert batch["input_ids"].shape == (2, 2, dataset.cfg.max_length)
    assert np.isfinite(batch["latent_mean"]).all()


def test_dataloader_latent_batches_sharded(dataset, cache_path):
    """Cache path composes with the mesh loader (global sharded arrays)."""
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig())
    cached = lc.open_latent_cache(cache_path)
    loader = make_dataloader(dataset, micro_batch=8, grad_accum=1, seed=1,
                             mesh=mesh, latent_cache=cached)
    batch = next(iter(loader))
    assert batch["latent_mean"].shape[:2] == (1, 8)
    assert isinstance(batch["latent_mean"], jax.Array)
