"""VAE decode ablation: upsample implementations vs conv efficiency.

The sampling profile shows single VAE-decoder convs at ~62 ms (2.5% MFU),
suggesting XLA fuses the nearest-upsample gather into the conv input and
de-vectorizes it.  A/B: broadcast-reshape (current), jnp.repeat, explicit
device materialization, and resize.
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from sdbc_tpu.models import vae
from sdbc_tpu.ops import nn
from sdbc_tpu.utils.dtypes import cast_floating


def upsample_repeat(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def upsample_barrier(x):
    return jax.lax.optimization_barrier(nn.upsample_nearest_2x(x))


def main():
    cfg = vae.VAEConfig.sd15()

    @jax.jit
    def build(key):
        return cast_floating(vae.init(key, cfg), jnp.bfloat16)

    params = build(jax.random.key(0))
    z = jnp.zeros((4, 64, 64, 4), jnp.bfloat16)

    variants = {
        "broadcast(current)": nn.upsample_nearest_2x,
        "repeat": upsample_repeat,
        "barrier": upsample_barrier,
    }
    for name, fn in variants.items():
        orig = nn.upsample_nearest_2x
        vae_up = vae.nn.upsample_nearest_2x
        nn.upsample_nearest_2x = fn
        vae.nn.upsample_nearest_2x = fn
        try:
            dec = jax.jit(functools.partial(vae.decode, cfg=cfg))
            np.asarray(jax.block_until_ready(dec(params, z)))[0, 0, 0]
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jax.block_until_ready(dec(params, z)))[0, 0, 0]
                times.append(time.perf_counter() - t0)
            print(f"vae decode [{name}]: {min(times)*1000:.1f} ms", flush=True)
        finally:
            nn.upsample_nearest_2x = orig
            vae.nn.upsample_nearest_2x = vae_up


if __name__ == "__main__":
    main()
