"""FID on TPU: InceptionV3 pool3 activations + Fréchet distance.

Replaces the reference's TF1-session FID stack (fid.py:36-335, SURVEY.md C13):
  - activations come from the JAX InceptionV3 (models/inception.py) in jitted
    fixed-size batches (the reference uses batches of 50 through a TF session,
    fid.py:91-103; remainder batches are padded+masked here instead of being
    silently dropped — reference bug at fid.py:90-91 NOT replicated)
  - the Fréchet distance uses a symmetric eigendecomposition sqrtm
    (TPU/CPU-friendly; no complex scipy.linalg.sqrtm needed):
        tr sqrt(Σ1 Σ2) = tr sqrt(S Σ2 S),  S = sqrtm(Σ1) via eigh
    with the reference's eps-on-diagonal fallback for singular covariances
    (fid.py:143-152)
  - ``_handle_path`` semantics: an image directory or a precomputed
    .npz{mu,sigma} file (fid.py:288-302)
"""
from __future__ import annotations

import functools
import os
import pathlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.models import inception as inception_mod


# ---------------------------------------------------------------------------
# activations


_features = functools.partial(jax.jit, static_argnames=("cfg",))(
    inception_mod.features)


def get_activations(images: np.ndarray, params,
                    cfg: inception_mod.InceptionConfig = None,
                    batch_size: int = 50, verbose: bool = False) -> np.ndarray:
    """images: (N, H, W, 3) RGB in [0, 255] → (N, 2048) pool3 features.

    Fixed-shape jitted batches; the final short batch is zero-padded and
    the pad rows sliced off (per-sample graph: one compile, no remainder
    drop — the reference's remainder-batch bug, fid.py:91 `n_batches *
    batch_size` truncation, not replicated).
    """
    cfg = cfg or inception_mod.InceptionConfig.fid()
    n = images.shape[0]
    out = []
    for start in range(0, n, batch_size):
        chunk = images[start:start + batch_size]
        valid = chunk.shape[0]
        if valid < batch_size:
            pad = np.zeros((batch_size - valid,) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        feats = _features(params, jnp.asarray(chunk), cfg)
        out.append(np.asarray(feats)[:valid])
        if verbose:
            print(f"\rFID activations {start + valid}/{n}", end="", flush=True)
    if verbose:
        print()
    return np.concatenate(out, axis=0)


def calculate_activation_statistics(images: np.ndarray, params,
                                    cfg=None, batch_size: int = 50,
                                    verbose: bool = False):
    acts = get_activations(images, params, cfg, batch_size, verbose)
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def activation_statistics_from_files(files, params, cfg=None,
                                     batch_size: int = 50,
                                     image_size: int = 512,
                                     verbose: bool = False):
    """Streaming mu/sigma over image files without holding all images in RAM.

    (The reference loads all 4000 images into one array, fid.py:299-301 /
    precalc .dat staging; here we stream with running moments.)
    """
    from sdbc_tpu.utils.image import decode_and_prepare

    cfg = cfg or inception_mod.InceptionConfig.fid()
    count = 0
    s1 = None
    s2 = None
    batch = []
    files = list(files)

    def flush(batch):
        nonlocal count, s1, s2
        if not batch:
            return
        imgs = (np.stack(batch) + 1.0) * 127.5  # [-1,1] → [0,255]
        acts = get_activations(imgs, params, cfg, batch_size=batch_size)
        acts64 = acts.astype(np.float64)
        if s1 is None:
            dim = acts64.shape[1]
            s1 = np.zeros((dim,), np.float64)
            s2 = np.zeros((dim, dim), np.float64)
        count += acts.shape[0]
        s1 += acts64.sum(axis=0)
        s2 += acts64.T @ acts64

    for i, f in enumerate(files):
        batch.append(decode_and_prepare(str(f), image_size))
        if len(batch) == batch_size:
            flush(batch)
            batch = []
            if verbose:
                print(f"\rFID stats {i + 1}/{len(files)}", end="", flush=True)
    flush(batch)
    if verbose:
        print()
    if count < 2:
        raise ValueError(
            f"need at least 2 images for FID statistics, got {count} "
            "(check the data path / file extensions)")
    mu = s1 / count
    sigma = (s2 - count * np.outer(mu, mu)) / (count - 1)
    return mu.astype(np.float64), sigma.astype(np.float64)


# ---------------------------------------------------------------------------
# Fréchet distance


def _trace_sqrt_product(sigma1: np.ndarray, sigma2: np.ndarray) -> float:
    """tr sqrt(Σ1 Σ2) via symmetric eigendecompositions (all-real path)."""
    # S = sqrtm(Σ1): eigh of a symmetric PSD matrix
    w, v = np.linalg.eigh(sigma1)
    w = np.clip(w, 0.0, None)
    s = (v * np.sqrt(w)) @ v.T
    # M = S Σ2 S is symmetric PSD with eig(M) = eig(Σ1 Σ2)
    m = s @ sigma2 @ s
    m = (m + m.T) / 2.0
    ev = np.clip(np.linalg.eigvalsh(m), 0.0, None)
    return float(np.sum(np.sqrt(ev)))


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2,
                               eps: float = 1e-6) -> float:
    """||mu1-mu2||² + tr(Σ1 + Σ2 - 2 sqrt(Σ1 Σ2)).

    Mirrors the reference's numerics contract (fid.py:111-162) including the
    eps-diagonal retry for near-singular covariances — but uses eigh-based
    sqrtm (real symmetric) rather than scipy.linalg.sqrtm, so no imaginary
    components can arise.
    """
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    try:
        tr_sqrt = _trace_sqrt_product(sigma1, sigma2)
        if not np.isfinite(tr_sqrt):
            raise FloatingPointError("non-finite trace")
    except (np.linalg.LinAlgError, FloatingPointError):
        offset = np.eye(sigma1.shape[0]) * eps
        tr_sqrt = _trace_sqrt_product(sigma1 + offset, sigma2 + offset)

    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_sqrt)


# ---------------------------------------------------------------------------
# path handling + top-level API (reference fid.py:288-319)


_IMG_EXTS = (".jpg", ".jpeg", ".png")


def _list_images(path: str):
    return sorted(p for p in pathlib.Path(path).iterdir()
                  if p.suffix.lower() in _IMG_EXTS)


def _handle_path(path: str, params, cfg=None, batch_size: int = 50,
                 image_size: int = 512, verbose: bool = False):
    """params may be a callable (lazy: only resolved for image dirs —
    two .npz stats need no Inception weights at all)."""
    if str(path).endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    files = _list_images(path)
    if not files:
        raise RuntimeError(f"no images found in {path}")
    if callable(params):
        params = params()
    return activation_statistics_from_files(files, params, cfg, batch_size,
                                            image_size, verbose)


def calculate_fid_given_paths(paths: Tuple[str, str], params=None, cfg=None,
                              batch_size: int = 50, image_size: int = 512,
                              verbose: bool = False) -> float:
    """FID between two paths (image dirs or precomputed .npz stats).

    ``params`` may be a params tree or a zero-arg callable returning one
    (resolved lazily, and only if an image dir is present — comparing two
    precomputed .npz files never loads Inception weights or warns).
    """
    for p in paths:
        if not os.path.exists(p):
            raise RuntimeError(f"Invalid path: {p}")
    if params is None:
        cfg = cfg or inception_mod.InceptionConfig.fid()
        params = functools.partial(default_params, cfg)
    if callable(params):
        params = functools.lru_cache(maxsize=1)(params)  # resolve once
    m1, s1 = _handle_path(paths[0], params, cfg, batch_size, image_size, verbose)
    m2, s2 = _handle_path(paths[1], params, cfg, batch_size, image_size, verbose)
    return calculate_frechet_distance(m1, s1, m2, s2)


_WEIGHTS_ENV = "SDBC_INCEPTION_WEIGHTS"


def default_params(cfg=None):
    """Inception weights resolution.

    SDBC_INCEPTION_WEIGHTS may point at:
      - pt_inception-2015-12-05-*.pth (pytorch-fid's port of the reference's
        frozen TF graph, fid.py:273) → numeric FID parity with the reference
      - a .npz in this framework's flat tree format (models/inception.py)
    Unset → deterministic random init (self-consistent FID deltas only).
    """
    cfg = cfg or inception_mod.InceptionConfig.fid()
    path = os.environ.get(_WEIGHTS_ENV, "")
    if path and os.path.exists(path):
        if path.endswith((".pth", ".pt")):
            from sdbc_tpu.models.port import load_fid_inception

            return load_fid_inception(path)
        flat = np.load(path)
        if any(k.startswith("Conv2d_1a") for k in flat.files):
            from sdbc_tpu.models.port import port_fid_inception

            return port_fid_inception(dict(flat))
        return inception_mod.load_npz(path)
    import sys

    print(
        "WARNING: SDBC_INCEPTION_WEIGHTS is unset — using RANDOM Inception "
        "weights.  FID values are self-consistent deltas only and are NOT "
        "comparable to any published or reference statistic.  Point "
        "SDBC_INCEPTION_WEIGHTS at pt_inception-2015-12-05-*.pth (or a "
        "ported .npz) for real FID.", file=sys.stderr, flush=True)
    return inception_mod.init(jax.random.key(2015), cfg)
