"""Dataset-level VAE latent cache for fine-tuning (opt-in, --cache_latents).

The training VAE encode is deterministic and stop-gradient (the reference
detaches it, finetune_sd.py:460-462), so the per-image posterior moments
(mean, logvar) can be computed ONCE per dataset and reused every epoch:
training then samples latents from the cached moments with fresh noise each
step — semantically identical to the reference's on-the-fly encode, minus
~all of the encode cost (the whole VAE forward per micro-batch).

This is a deliberate, flag-gated divergence from the reference's per-step
encode (PERF_NOTES round-3 lead 4): the reference could not cache because
torch DataLoader workers hold no GPU context; on TPU the one-off encode pass
is a single jitted scan over the dataset.

Cache layout (under ``<data_root>/latent_cache/<fingerprint>/``):
  mean.npy / logvar.npy : float32 (N, H/8, W/8, latent_channels)
  meta.json             : fingerprint inputs + a VAE parameter checksum

Moments are computed under the training compute dtype and stored as float32
(a lossless widening of bf16), and the loss path casts them back to the
compute dtype, so cached and on-the-fly training match for the same PRNG key
up to float rounding: the one-off encode compiles as its own jit graph (its
batch may differ from the training micro-batch), whose XLA fusions differ
from the encode-inside-the-train-step graph by a few ulps (observed max abs
diff ~6e-7 at fp32; tested in tests/test_latent_cache.py).  For the moments
to match the in-step encode, callers must pass the SAME weights the loss
would use — the compute-dtype-cast frozen VAE (state.frozen["vae"]), not the
fp32 checkpoint weights (cli/finetune.py does this).
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.models import vae as vae_mod


def _vae_checksum(vae_params) -> str:
    """Cheap but order-stable content checksum of the VAE parameters.

    Sums per-leaf (float64) + leaf count; enough to invalidate the cache when
    a different checkpoint's VAE is loaded, without hashing gigabytes.
    """
    leaves = jax.tree.leaves(vae_params)
    acc = hashlib.sha256()
    acc.update(str(len(leaves)).encode())
    for leaf in leaves:
        arr = np.asarray(jax.device_get(leaf), np.float64)
        acc.update(np.array([arr.sum(), arr.size], np.float64).tobytes())
    return acc.hexdigest()[:16]


def _fingerprint(dataset, compute_dtype) -> dict:
    cfg = dataset.cfg
    # hash the FULL index, not a sample: row edits that keep the filename and
    # count must miss the cache, or stale latents silently pair with new
    # prompts (hashing 43k index entries costs ~ms)
    ids = ",".join(str(i) for i in dataset.df.index)
    return {
        "n": len(dataset),
        "img_size": cfg.img_size,
        "csv_name": cfg.csv_name,
        "index_hash": hashlib.sha256(ids.encode()).hexdigest()[:16],
        "compute_dtype": jnp.dtype(compute_dtype).name,
    }


def cache_dir_for(dataset, vae_params, compute_dtype,
                  root: Optional[str] = None) -> Tuple[str, dict]:
    meta = _fingerprint(dataset, compute_dtype)
    meta["vae_checksum"] = _vae_checksum(vae_params)
    key = hashlib.sha256(
        json.dumps(meta, sort_keys=True).encode()).hexdigest()[:16]
    base = root or os.path.join(dataset.cfg.data_root, "latent_cache")
    return os.path.join(base, key), meta


def _encode_fn(vae_cfg, compute_dtype, img_size: int, micro: int):
    """Jitted batched moment encode matching trainer.diffusion_loss.

    Uses the shared vae.prefer_chunked_encode heuristic so both sites pick
    the per-image map at the same shapes.  The cache builder's batch may
    differ from the training micro-batch, so the graphs are not guaranteed
    bit-identical — only equal up to XLA fusion differences (~ulps at fp32,
    tests/test_latent_cache.py).
    """
    # the builder's encode batch is never mesh-sharded
    chunked = vae_mod.prefer_chunked_encode(micro, img_size, img_size,
                                            data_sharded=False)

    @jax.jit
    def run(vae_params, pixels):
        px = pixels.astype(compute_dtype)
        if chunked:
            mean, logvar = vae_mod.encode_moments_chunked(vae_params, px,
                                                          vae_cfg)
        else:
            mean, logvar = vae_mod.encode_moments(vae_params, px, vae_cfg)
        return mean.astype(jnp.float32), logvar.astype(jnp.float32)

    return run


def build_latent_cache(dataset, vae_params, vae_cfg, compute_dtype,
                       batch: int = 8, root: Optional[str] = None,
                       num_workers: int = 4, verbose: bool = True) -> str:
    """Encode every dataset image once; returns the cache directory.

    Idempotent: an existing directory with a matching meta.json is reused.
    """
    path, meta = cache_dir_for(dataset, vae_params, compute_dtype, root)
    if _hit_dir(path, meta):
        if verbose:
            print(f"latent cache hit: {path}")
        return path

    # multi-host coordination (shared filesystem): process 0 builds, the
    # rest poll for the finished meta.json instead of redundantly encoding
    # the whole dataset N times into the same files
    if jax.process_count() > 1 and jax.process_index() != 0:
        import time

        deadline = time.time() + 7200
        while time.time() < deadline:
            if _hit_dir(path, meta):
                return path
            time.sleep(5)
        raise TimeoutError(
            f"waited 2h for process 0 to build the latent cache at {path}")

    # sweep orphaned tmp dirs from crashed builders — each holds multi-GB
    # memmaps that would otherwise accumulate forever.  Two guards, BOTH
    # required: pid-dead (local liveness; a pid from another NFS host or a
    # reused pid is inconclusive) AND nothing written for an hour (a live
    # builder on any host touches its memmaps far more often)
    import glob
    import shutil
    import time as _time

    for stale in glob.glob(f"{path}.tmp.*"):
        try:
            pid = int(stale.rsplit(".", 1)[1])
            os.kill(pid, 0)  # raises if no LOCAL process has this pid
            continue  # a live local process — certainly not orphaned
        except ValueError:
            continue  # not our naming scheme — leave it
        except PermissionError:
            continue  # alive under another uid
        except ProcessLookupError:
            pass
        try:
            newest = max((os.path.getmtime(os.path.join(stale, f))
                          for f in os.listdir(stale)), default=0.0)
            if _time.time() - newest > 3600:
                shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            pass

    # build into a private tmp dir, then atomically rename into place:
    # concurrent single-host builders (two finetune runs sharing a
    # data_root) each write their own tmp and the first rename wins
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    path, final_path = tmp, path
    meta_path = os.path.join(path, "meta.json")

    n = len(dataset)
    f = 2 ** (len(vae_cfg.block_out_channels) - 1)
    hw = dataset.cfg.img_size // f
    c = vae_cfg.latent_channels
    mean_mm = np.lib.format.open_memmap(
        os.path.join(path, "mean.npy"), mode="w+", dtype=np.float32,
        shape=(n, hw, hw, c))
    logvar_mm = np.lib.format.open_memmap(
        os.path.join(path, "logvar.npy"), mode="w+", dtype=np.float32,
        shape=(n, hw, hw, c))

    # the loader's exact decode dispatch (data/dataset.py::decode_pixels):
    # cached latents must encode the same pixels a non-cached run sees
    from sdbc_tpu.data.dataset import decode_pixels

    encode = _encode_fn(vae_cfg, compute_dtype, dataset.cfg.img_size, batch)

    def load_pixels(indices):
        return decode_pixels(dataset, indices, num_workers)

    import concurrent.futures as cf

    with cf.ThreadPoolExecutor(max_workers=1) as prefetcher:
        future = None
        for start in range(0, n, batch):
            idxs = list(range(start, min(start + batch, n)))
            if future is None:
                future = prefetcher.submit(load_pixels, idxs)
            pixels = future.result()
            nxt_start = start + batch
            if nxt_start < n:
                future = prefetcher.submit(
                    load_pixels, list(range(nxt_start,
                                            min(nxt_start + batch, n))))
            # pad the tail to the compiled batch shape (one compile total)
            pad = batch - len(idxs)
            if pad:
                pixels = np.concatenate(
                    [pixels, np.repeat(pixels[-1:], pad, axis=0)])
            mean, logvar = encode(vae_params, pixels)
            mean_mm[idxs] = np.asarray(mean)[: len(idxs)]
            logvar_mm[idxs] = np.asarray(logvar)[: len(idxs)]
            if verbose and (start // batch) % 50 == 0:
                print(f"latent cache: {min(start + batch, n)}/{n}",
                      flush=True)
    mean_mm.flush()
    logvar_mm.flush()
    with open(meta_path, "w") as f_:
        json.dump(meta, f_, sort_keys=True)
    del mean_mm, logvar_mm
    try:
        os.rename(path, final_path)
    except OSError:
        # a concurrent builder renamed first — its content is equivalent
        # (the directory key derives from the full fingerprint)
        import shutil

        if not _hit_dir(final_path, meta):
            raise
        shutil.rmtree(path, ignore_errors=True)
    if verbose:
        print(f"latent cache built: {final_path}")
    return final_path


def _hit_dir(path: str, meta: dict) -> bool:
    meta_path = os.path.join(path, "meta.json")
    if not os.path.exists(meta_path):
        return False
    with open(meta_path) as f:
        return json.load(f) == meta


def open_latent_cache(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Memory-mapped (mean, logvar) arrays — no RAM cost until touched."""
    mean = np.load(os.path.join(path, "mean.npy"), mmap_mode="r")
    logvar = np.load(os.path.join(path, "logvar.npy"), mmap_mode="r")
    return mean, logvar
