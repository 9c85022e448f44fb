"""Slope-based perf measurement: dynamic-trip-count loops cancel host RTT.

time(N2) - time(N1) over (N2 - N1) = true per-iteration device cost.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sdbc_tpu.diffusion.pipeline import PipelineConfig
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.utils.dtypes import cast_floating


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def slope(fn, n1=2, n2=12, reps=2):
    sync(fn(n1))
    t1 = min(
        (lambda t0: (sync(fn(n1)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    t2 = min(
        (lambda t0: (sync(fn(n2)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    return (t2 - t1) / (n2 - n1), t1


def main():
    cfg = PipelineConfig.sd15()
    dt = jnp.bfloat16

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        return cast_floating({"unet": unet.init(k1, cfg.unet),
                              "vae": vae.init(k2, cfg.vae)}, dt)

    params = build(jax.random.key(0))
    print("params ready", flush=True)

    for b in (8, 16):
        for impl in ("flash", "xla"):
            os.environ["SDBC_ATTN_IMPL"] = impl

            @jax.jit
            def unet_loop(n, b=b):
                lat0 = jnp.ones((b, 64, 64, 4), dt) * 0.1
                ctx = jnp.ones((b, 77, 768), dt) * 0.02
                t = jnp.full((b,), 500, jnp.int32)

                def body(i, lat):
                    eps = unet.apply(params["unet"], lat, t, ctx, cfg.unet)
                    return lat - 0.001 * eps

                return jax.lax.fori_loop(0, n, body, lat0)

            per_step, base = slope(unet_loop)
            print(f"unet step b={b} attn={impl}: {per_step*1000:.1f} ms/step "
                  f"({0.34*b/per_step/197*100:.1f}% MFU, base {base*1000:.0f} ms)",
                  flush=True)
        os.environ.pop("SDBC_ATTN_IMPL", None)

    @jax.jit
    def vae_loop(n):
        z0 = jnp.ones((4, 64, 64, 4), dt) * 0.1

        def body(i, z):
            img = vae.decode(params["vae"], z, cfg.vae)
            small = img[:, ::8, ::8, :]
            return z + 1e-3 * jnp.pad(small, ((0, 0), (0, 0), (0, 0), (0, 1)))

        return jax.lax.fori_loop(0, n, body, z0)

    per_step, base = slope(vae_loop, 1, 5)
    print(f"vae decode b=4: {per_step*1000:.1f} ms/decode (base {base*1000:.0f})",
          flush=True)


if __name__ == "__main__":
    main()
