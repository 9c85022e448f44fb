"""flash_bwd dual-accumulator A/B (round-3 lead: the bwd's remaining gap).

PERF_NOTES pins flash_bwd's remaining inefficiency vs the forward on the
loop-carried fp32 accumulators serializing against the exp2/VPU chain
(r3_bwd_raw_ab.py falsified the memory-traffic hypothesis).  The classic
ILP fix: split each accumulator into two parity partial sums so successive
unrolled iterations' accumulate-adds are independent, and combine once at
the end.  Self-contained variant kernels (same math as
ops/flash_attention_bwd.py); correctness in interpret mode, timing on-chip.

Run ALONE on the chip:  PYTHONPATH=. python experiments/r3_bwd_dualacc.py
CPU correctness only:   PYTHONPATH=. python experiments/r3_bwd_dualacc.py --check
"""
import functools
import math
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sdbc_tpu.ops.flash_attention import _flash_fwd
from sdbc_tpu.ops.flash_attention_bwd import _round_up, flash_bwd

_NEG_INF = -1e30
_LOG2E = math.log2(math.e)


def _dq_kernel2(qs_ref, kl_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                scale, kv_len, block_kv, kv_pad):
    qs = qs_ref[0]
    do = do_ref[0]
    bq, d = qs.shape
    jq = pl.program_id(1)
    lse2 = lse_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]
    delta = delta_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]
    num_kv = kv_pad // block_kv

    acc = [jnp.zeros((bq, d), jnp.float32), jnp.zeros((bq, d), jnp.float32)]
    for j in range(num_kv):
        kl = kl_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        s2 = jax.lax.dot_general(qs, kl, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if j * block_kv + block_kv > kv_len:
            col = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 1)
            s2 = jnp.where(col < kv_len, s2, _NEG_INF)
        p = jnp.exp2(s2 - lse2)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds0 = (p * (dp - delta)).astype(kl.dtype)
        acc[j % 2] = acc[j % 2] + jax.lax.dot_general(
            ds0, kl, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq_ref[0] = ((acc[0] + acc[1]) * (scale / _LOG2E)).astype(dq_ref.dtype)


def _dkv_kernel2(qs_ref, kl_ref, v_ref, do_ref, lse_ref, delta_ref,
                 dk_ref, dv_ref, *, block_q, q_pad):
    kl = kl_ref[0]
    v = v_ref[0]
    bkv, d = kl.shape
    num_q = q_pad // block_q

    dk = [jnp.zeros((bkv, d), jnp.float32), jnp.zeros((bkv, d), jnp.float32)]
    dv = [jnp.zeros((bkv, d), jnp.float32), jnp.zeros((bkv, d), jnp.float32)]
    for i in range(num_q):
        qs = qs_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse2 = lse_ref[0, 0, pl.ds(i * block_q, block_q)].astype(
            jnp.float32)[:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)].astype(
            jnp.float32)[:, None]
        s2 = jax.lax.dot_general(qs, kl, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p = jnp.exp2(s2 - lse2)
        pc = p.astype(do.dtype)
        dv[i % 2] = dv[i % 2] + jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds0 = (p * (dp - delta)).astype(qs.dtype)
        dk[i % 2] = dk[i % 2] + jax.lax.dot_general(
            ds0, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dk_ref[0] = (dk[0] + dk[1]).astype(dk_ref.dtype)
    dv_ref[0] = (dv[0] + dv[1]).astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def flash_bwd_dual(q, k, v, o, do, lse, scale: float,
                   block_q: int = 512, block_kv: int = 1024):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = _round_up(d, 128)
    block_q = min(block_q, _round_up(sq, 128))
    sq_pad = _round_up(sq, block_q)
    block_kv = min(block_kv, _round_up(sk, 128))
    kv_pad = _round_up(sk, block_kv)
    interpret = jax.default_backend() != "tpu"

    def pad(x, s_pad, mult=None):
        if mult is not None:
            x = (x.astype(jnp.float32) * mult).astype(x.dtype)
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - x.shape[3]))).reshape(
            b * h, s_pad, d_pad)

    qs, dop = pad(q, sq_pad, mult=scale), pad(do, sq_pad)
    kl, vp = pad(k, kv_pad, mult=_LOG2E), pad(v, kv_pad)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    lse2 = lse.astype(jnp.float32) * _LOG2E
    lse_p = jnp.pad(lse2, ((0, 0), (0, 0), (0, sq_pad - sq))).reshape(
        b * h, 1, sq_pad)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq))).reshape(
        b * h, 1, sq_pad)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel2, scale=scale, kv_len=sk,
                          block_kv=block_kv, kv_pad=kv_pad),
        grid=(b * h, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qs, kl, vp, dop, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel2, block_q=block_q, q_pad=sq_pad),
        grid=(b * h, kv_pad // block_kv),
        in_specs=[
            pl.BlockSpec((1, sq_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_kv, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, kv_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((b * h, kv_pad, d_pad), v.dtype),
        ),
        interpret=interpret,
    )(qs, kl, vp, dop, lse_p, delta_p)

    dq = dq.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
    dk = dk.reshape(b, h, kv_pad, d_pad)[:, :, :sk, :d]
    dv = dv.reshape(b, h, kv_pad, d_pad)[:, :, :sk, :d]
    return dq, dk, dv


def make_inputs(b, h, s, d, dtype=jnp.bfloat16):
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, h, s, d), dtype)
    k = jax.random.normal(ks[1], (b, h, s, d), dtype)
    v = jax.random.normal(ks[2], (b, h, s, d), dtype)
    do = jax.random.normal(ks[3], (b, h, s, d), dtype)
    scale = d ** -0.5
    o, lse = _flash_fwd(q, k, v, scale=scale)
    return q, k, v, o, do, lse, scale


def check():
    for (b, h, s, d) in [(1, 2, 256, 40), (1, 2, 320, 80)]:
        q, k, v, o, do, lse, scale = make_inputs(b, h, s, d, jnp.float32)
        ref = flash_bwd(q, k, v, o, do, lse, scale,
                        block_q=128, block_kv=128)
        out = flash_bwd_dual(q, k, v, o, do, lse, scale,
                             block_q=128, block_kv=128)
        for name, a, r in zip("dq dk dv".split(), out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=1e-5, rtol=1e-5)
        print(f"({b},{h},{s},{d}): dual == single  ok", flush=True)


def bench(fn, q, k, v, o, do, lse, scale, iters=50, reps=5):
    def body(_, carry):
        dq, dk, dv = fn(q, k, v, o, carry, lse, scale)
        return (dq * 1e-3 + do).astype(do.dtype)

    @jax.jit
    def run(do0):
        return jax.lax.fori_loop(0, iters, body, do0).ravel()[0]

    float(run(do))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = float(run(do))
        ts.append(time.perf_counter() - t0)
    assert np.isfinite(r)
    return min(ts) / iters


def main():
    check()
    if jax.default_backend() != "tpu":
        print("CPU backend: correctness only")
        return
    for (b, h, s, d) in [(2, 8, 4096, 40), (2, 8, 1024, 80),
                         (2, 8, 256, 160)]:
        args = make_inputs(b, h, s, d)
        t0 = bench(flash_bwd, *args)
        t1 = bench(flash_bwd_dual, *args)
        print(f"({b},{h},{s},{d}): single {t0*1e3:.3f} ms  "
              f"dual {t1*1e3:.3f} ms  ratio {t0/t1:.2f}x", flush=True)


if __name__ == "__main__":
    if "--check" in sys.argv:
        check()
    else:
        main()
