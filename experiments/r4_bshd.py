"""A/B the BSHD projection-layout flash kernel vs the relayout path.

Round-4 lever (VERDICT r3 item 4): the roofline's 145 ms/call of head
split/merge layout copies (91% HBM-bound).  The bshd kernel reads q/k/v
in the projection output layout (b, s, h, d) — the reshape from
(b, s, h·d) is a free bitcast — walking heads via the pallas grid, so
the relayouts never materialize in HBM.

Two measurements, both on the chip, run ALONE:
 1. kernel-level: _flash_fixed_fwd_raw (head-major, relayouts excluded)
    vs _flash_fixed_fwd_bshd at the UNet's sampling shapes — shows the
    kernel's own cost of strided DMA vs contiguous.
 2. end-to-end: bench.py protocol (batch 4, ddim-50) with
    SDBC_ATTN_BSHD=0/1 — the number that counts (includes the saved
    relayouts + projection fusion changes).

  PYTHONPATH=. python experiments/r4_bshd.py            # kernel A/B
  SDBC_ATTN_BSHD=1 python bench.py                      # end-to-end B
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sdbc_tpu.ops.flash_attention import (_flash_fixed_fwd_bshd,
                                          _flash_fixed_fwd_raw)


def timeit(fn, q, k, v, iters):
    @jax.jit
    def loop(q, k, v):
        def body(i, c):
            o = fn(c, k, v)
            return o * 0.0 + q  # data dep, keep shapes
        return jax.lax.fori_loop(0, iters, body, q)

    r = loop(q, k, v)
    np.asarray(jax.block_until_ready(r)).reshape(-1)[0]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(q, k, v)
        np.asarray(jax.block_until_ready(r)).reshape(-1)[0]
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


def main():
    for (b, h, s, d) in [(8, 8, 4096, 40), (8, 8, 1024, 80),
                         (8, 8, 256, 160)]:
        kq, kk, kv = jax.random.split(jax.random.key(1), 3)
        qm = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
        km = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
        vm = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
        tr = lambda t: t.transpose(0, 2, 1, 3)  # -> (b, s, h, d)
        q4, k4, v4 = tr(qm), tr(km), tr(vm)
        sc = d ** -0.5
        it = 60 if s == 4096 else 200
        bq = 1024 if s >= 2048 else min(512, s)
        bkv = min(1024, s)
        t_raw = timeit(lambda c, kk_, vv: _flash_fixed_fwd_raw(
            c, kk_, vv, sc, bq, bkv), qm, km, vm, it)
        t_bshd = timeit(lambda c, kk_, vv: _flash_fixed_fwd_bshd(
            c, kk_, vv, h, sc, bq, bkv), q4, k4, v4, it)
        o_raw = np.asarray(_flash_fixed_fwd_raw(qm, km, vm, sc, bq, bkv),
                           np.float32)
        o_bshd = np.asarray(tr(jnp.asarray(_flash_fixed_fwd_bshd(
            q4, k4, v4, h, sc, bq, bkv))), np.float32)
        err = np.max(np.abs(o_raw - o_bshd))
        print(f"({b},{h},{s},{d}): raw {t_raw:.3f} ms  bshd {t_bshd:.3f} ms "
              f"({t_raw / t_bshd:.2f}x)  max|diff|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
