"""A/B: round-2 flash_bwd vs the round-3 scale-folded/exp2/unrolled kernels.

Methodology per PERF_NOTES: in-graph lax.fori_loop chains (do <- dq) so the
span is >=1 s, scalar readback, run ALONE on the chip.

  git show <rev>:sdbc_tpu/ops/flash_attention_bwd.py > /tmp/old_bwd.py
  PYTHONPATH=. python experiments/r3_bwd_ab.py
"""
import importlib.util
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
from sdbc_tpu.ops import flash_attention_bwd as new_mod


def load_old():
    spec = importlib.util.spec_from_file_location("old_bwd", "/tmp/old_bwd.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# training shapes: 64²/d40 (the hot one), 32²/d80, 16²/d160, micro-batch 2
SHAPES = [(2, 8, 4096, 40), (2, 8, 1024, 80), (2, 8, 256, 160)]


def bench(fn, q, k, v, o, do, lse, scale, iters):
    def body(_, carry):
        dq, dk, dv = fn(q, k, v, o, carry, lse, scale)
        return (dq * 1e-3 + do).astype(do.dtype)  # chain: serialize iterations

    @jax.jit
    def run(do0):
        out = jax.lax.fori_loop(0, iters, body, do0)
        return out.ravel()[0]

    float(run(do))  # compile+warmup
    t0 = time.perf_counter()
    r = float(run(do))
    dt = time.perf_counter() - t0
    assert np.isfinite(r)
    return dt / iters


def main():
    old_mod = load_old()
    for (b, h, s, d) in SHAPES:
        key = jax.random.key(0)
        kq, kk, kv_, kdo = jax.random.split(key, 4)
        q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(kv_, (b, h, s, d), jnp.bfloat16)
        do = jax.random.normal(kdo, (b, h, s, d), jnp.bfloat16)
        scale = float(d) ** -0.5
        o, lse = _flash_fwd(q, k, v, scale)

        # correctness cross-check first
        outs_n = new_mod.flash_bwd(q, k, v, o, do, lse, scale)
        outs_o = old_mod.flash_bwd(q, k, v, o, do, lse, scale)
        for name, a_, b_ in zip("dq dk dv".split(), outs_n, outs_o):
            diff = float(jnp.max(jnp.abs(a_.astype(jnp.float32)
                                         - b_.astype(jnp.float32))))
            print(f"  ({b},{h},{s},{d}) {name} max|new-old| = {diff:.2e}")

        iters = max(int(1.2e12 / (5 * 2 * b * h * s * s * d)), 20)
        t_old = bench(old_mod.flash_bwd, q, k, v, o, do, lse, scale, iters)
        t_new = bench(new_mod.flash_bwd, q, k, v, o, do, lse, scale, iters)
        fl = 5 * 2 * b * h * s * s * d
        print(f"shape {(b, h, s, d)}: old {t_old*1e3:.2f} ms "
              f"({fl/t_old/1e12:.1f} TF/s useful)  new {t_new*1e3:.2f} ms "
              f"({fl/t_new/1e12:.1f} TF/s)  speedup {t_old/t_new:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
