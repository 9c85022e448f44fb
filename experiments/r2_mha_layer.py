"""Round-2: fused vs legacy MHA at the single-transformer-layer level.

Full-UNet A/B loops are ~40-min remote compiles each on today's service;
one 64² spatial transformer layer (320ch, 8 heads, 4096 tokens) isolates
the change with a small graph.  The sampling hot path runs 5 such 64²
layers per step (round-1 profile) plus 32²/16² ones.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sdbc_tpu.models import unet


def sync(x):
    return np.asarray(jax.block_until_ready(x)).ravel()[:1]


def sync_retry(fn, n, attempts=8):
    for a in range(attempts):
        try:
            return sync(fn(n))
        except Exception as e:
            print(f"compile attempt {a}: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
            time.sleep(20)
    raise RuntimeError("remote compile kept failing")


def slope(fn, n1=2, n2=12, reps=2):
    sync_retry(fn, n1)
    t1 = min(
        (lambda t0: (sync(fn(n1)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    t2 = min(
        (lambda t0: (sync(fn(n2)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(reps))
    return (t2 - t1) / (n2 - n1), t1


def main():
    dt = jnp.bfloat16
    dim, heads, hw, b = 320, 8, 64, 8
    key = jax.random.key(0)
    params = jax.tree.map(
        lambda x: x.astype(dt),
        unet._init_transformer(key, dim, 768, heads))

    for mha in ("headmajor",):
        os.environ["SDBC_MHA"] = mha

        @jax.jit
        def loop(n, _tag=mha):
            x0 = jnp.ones((b, hw, hw, dim), dt) * 0.1
            ctx = jnp.ones((b, 77, 768), dt) * 0.02

            def body(i, x):
                y = unet._transformer(params, x, ctx, heads, 32)
                return x + 0.001 * y

            return jax.lax.fori_loop(0, n, body, x0)

        per, base = slope(loop, n1=10, n2=110, reps=3)
        print(f"transformer layer 64² b={b} mha={mha}: {per*1000:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
