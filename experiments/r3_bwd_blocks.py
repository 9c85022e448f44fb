"""Block sweep for the round-3 flash_bwd kernels at the non-64^2 shapes.

The r3_bwd_ab.py A/B showed the reformulated kernel 1.05x at (2,8,4096,40)
and 1.09x at (2,8,256,160) but 0.85x at (2,8,1024,80) with the default
512/1024 blocks.  Sweep block_q/block_kv at that shape (and sanity-check the
winner at the other two) to pick per-shape defaults.

Run ALONE on the chip: PYTHONPATH=. python experiments/r3_bwd_blocks.py
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

from sdbc_tpu.ops.flash_attention import _flash_fwd
from sdbc_tpu.ops.flash_attention_bwd import flash_bwd


def bench(q, k, v, o, do, lse, scale, iters, bq, bkv):
    def body(_, carry):
        dq, dk, dv = flash_bwd(q, k, v, o, carry, lse, scale,
                               block_q=bq, block_kv=bkv)
        return (dq * 1e-3 + do).astype(do.dtype)

    @jax.jit
    def run(do0):
        out = jax.lax.fori_loop(0, iters, body, do0)
        return out.ravel()[0]

    float(run(do))
    t0 = time.perf_counter()
    r = float(run(do))
    dt = time.perf_counter() - t0
    assert np.isfinite(r)
    return dt / iters


def main():
    # trimmed: remote compiles cost ~10+ min per new kernel variant, so only
    # the regressed shape is swept; (512,1024) is the measured default from
    # r3_bwd_ab.py (0.48 ms new vs 0.41 ms round-2 kernel)
    shapes = [(2, 8, 1024, 80)]
    grids = {
        (2, 8, 1024, 80): [(1024, 1024), (256, 1024), (512, 512), (1024, 512)],
    }
    for (b, h, s, d) in shapes:
        key = jax.random.key(0)
        kq, kk, kv_, kdo = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(kv_, (b, h, s, d), jnp.bfloat16)
        do = jax.random.normal(kdo, (b, h, s, d), jnp.bfloat16)
        scale = float(d) ** -0.5
        o, lse = _flash_fwd(q, k, v, scale)
        fl = 5 * 2 * b * h * s * s * d
        iters = max(int(1.2e12 / fl), 20)
        for (bq, bkv) in grids[(b, h, s, d)]:
            t = bench(q, k, v, o, do, lse, scale, iters, bq, bkv)
            print(f"shape ({b},{h},{s},{d}) blocks q={bq:5d} kv={bkv:5d}: "
                  f"{t*1e3:6.3f} ms  ({fl/t/1e12:5.1f} TF/s useful)",
                  flush=True)


if __name__ == "__main__":
    main()
