"""FID stack tests: activations, streaming stats, Fréchet math, path API."""
import os

import jax
import numpy as np
import pytest

from sdbc_tpu.eval import fid as fid_mod
from sdbc_tpu.models import inception

CFG = inception.InceptionConfig.tiny()


@pytest.fixture(scope="module")
def inc_params():
    return inception.init(jax.random.key(0), CFG)


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    from PIL import Image

    rng = np.random.RandomState(0)
    dirs = []
    for name, offset in (("a", 0), ("b", 60)):
        d = tmp_path_factory.mktemp(name)
        for i in range(8):
            arr = np.clip(rng.randint(0, 200, (40, 40, 3)) + offset,
                          0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
        dirs.append(str(d))
    return dirs


def test_activations_batching_handles_remainder(inc_params):
    imgs = np.random.RandomState(1).randint(0, 255, (7, 32, 32, 3)).astype(
        np.float32)
    acts = fid_mod.get_activations(imgs, inc_params, CFG, batch_size=3)
    assert acts.shape[0] == 7
    # remainder batch must match a full-batch run (no silent drop — the
    # reference's fid.py:90-91 bug is NOT replicated)
    acts_full = fid_mod.get_activations(imgs, inc_params, CFG, batch_size=7)
    np.testing.assert_allclose(acts, acts_full, atol=1e-4)


def test_frechet_identity_and_symmetry():
    rng = np.random.RandomState(2)
    a = rng.randn(300, 8)
    b = rng.randn(300, 8) * 1.5 + 1.0
    mu_a, s_a = a.mean(0), np.cov(a, rowvar=False)
    mu_b, s_b = b.mean(0), np.cov(b, rowvar=False)
    assert abs(fid_mod.calculate_frechet_distance(mu_a, s_a, mu_a, s_a)) < 1e-8
    d_ab = fid_mod.calculate_frechet_distance(mu_a, s_a, mu_b, s_b)
    d_ba = fid_mod.calculate_frechet_distance(mu_b, s_b, mu_a, s_a)
    assert d_ab > 1.0
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-6)


def test_frechet_matches_scipy_sqrtm():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.RandomState(3)
    x = rng.randn(500, 6)
    y = rng.randn(500, 6) + 0.3
    mu1, s1 = x.mean(0), np.cov(x, rowvar=False)
    mu2, s2 = y.mean(0), np.cov(y, rowvar=False)
    ours = fid_mod.calculate_frechet_distance(mu1, s1, mu2, s2)
    # the reference's formulation (fid.py:111-162) via scipy sqrtm
    covmean = scipy_linalg.sqrtm(s1.dot(s2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    ref = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
           - 2 * np.trace(covmean))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_streaming_stats_match_batch_stats(inc_params, image_dirs):
    import pathlib

    files = sorted(pathlib.Path(image_dirs[0]).glob("*.jpg"))
    mu_s, sig_s = fid_mod.activation_statistics_from_files(
        files, inc_params, CFG, batch_size=3, image_size=32)
    from sdbc_tpu.utils.image import decode_and_prepare

    imgs = np.stack([(decode_and_prepare(str(f), 32) + 1) * 127.5
                     for f in files])
    mu_b, sig_b = fid_mod.calculate_activation_statistics(
        imgs, inc_params, CFG, batch_size=8)
    np.testing.assert_allclose(mu_s, mu_b, atol=1e-4)
    np.testing.assert_allclose(sig_s, sig_b, atol=1e-4)


def test_fid_given_paths_dirs_and_npz(inc_params, image_dirs, tmp_path):
    d_same = fid_mod.calculate_fid_given_paths(
        (image_dirs[0], image_dirs[0]), params=inc_params, cfg=CFG,
        batch_size=4, image_size=32)
    assert abs(d_same) < 1e-4
    d_diff = fid_mod.calculate_fid_given_paths(
        (image_dirs[0], image_dirs[1]), params=inc_params, cfg=CFG,
        batch_size=4, image_size=32)
    assert d_diff > d_same
    # npz stats path (reference _handle_path npz branch, fid.py:289-292)
    import pathlib

    files = sorted(pathlib.Path(image_dirs[1]).glob("*.jpg"))
    mu, sigma = fid_mod.activation_statistics_from_files(
        files, inc_params, CFG, batch_size=4, image_size=32)
    npz = tmp_path / "stats.npz"
    np.savez(npz, mu=mu, sigma=sigma)
    d_npz = fid_mod.calculate_fid_given_paths(
        (image_dirs[0], str(npz)), params=inc_params, cfg=CFG,
        batch_size=4, image_size=32)
    np.testing.assert_allclose(d_npz, d_diff, rtol=1e-4)


def test_invalid_path_raises(inc_params):
    with pytest.raises(RuntimeError):
        fid_mod.calculate_fid_given_paths(("/nonexistent", "/nope"),
                                          params=inc_params, cfg=CFG)
