"""Seeded randomness.

The reference seeds numpy/random/torch globally with 42
(/root/reference/finetune_sd.py:64-77) and draws fixed inference latents from a
seeded ``torch.Generator`` (/root/reference/inference.py:263-274).  JAX replaces
global seeding with explicit key threading; for bit-comparable fixed latents
against the CUDA reference we additionally provide ``torch_compat_randn``, which
reproduces torch's seeded CPU normal stream exactly (via the baked-in CPU torch
when importable, with a recorded-free fallback to a deterministic JAX stream).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

GLOBAL_SEED = 42  # reference default: finetune_sd.py:64


def seeded_key(seed: int = GLOBAL_SEED) -> jax.Array:
    return jax.random.key(seed)


def split_like(key: jax.Array, names: Sequence[str]) -> dict:
    """Split a key into a dict of named subkeys (stable w.r.t. name order)."""
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}


def torch_compat_randn(shape, seed: int = GLOBAL_SEED, dtype=np.float32) -> np.ndarray:
    """Standard-normal sample bit-identical to ``torch.Generator('cpu').manual_seed(seed)``.

    Mirrors the reference's fixed-latent protocol (inference.py:263-274):
    one generator, sequential ``randn`` draws.  Host-side numpy output — feed it
    to the pipeline's injectable-latents argument.
    """
    try:
        import torch  # CPU torch is in the base image

        g = torch.Generator(device="cpu").manual_seed(int(seed))
        return torch.randn(*shape, generator=g, dtype=torch.float32).numpy().astype(dtype)
    except ImportError:
        key = jax.random.key(int(seed))
        return np.asarray(jax.random.normal(key, shape, dtype=jnp.float32)).astype(dtype)


def per_sample_fixed_latents(n: int, shape, seed: int = GLOBAL_SEED) -> np.ndarray:
    """n fixed latents, each drawn sequentially from one seeded generator.

    Matches inference.py:263-274: ``generator.manual_seed(42)`` once, then one
    ``torch.randn(shape)`` per sample, stacked.
    """
    try:
        import torch

        g = torch.Generator(device="cpu").manual_seed(int(seed))
        lat = [torch.randn(*shape, generator=g, dtype=torch.float32).numpy() for _ in range(n)]
        return np.stack(lat).astype(np.float32)
    except ImportError:
        keys = jax.random.split(jax.random.key(int(seed)), n)
        return np.stack([np.asarray(jax.random.normal(k, shape)) for k in keys])
