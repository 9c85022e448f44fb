"""FALSIFIED round-3 experiment: pad-free raw flash_bwd kernels.

Hypothesis: the backward kernels pad q/k/v/do to a 128-lane head dim
host-side (four jnp.pad ops per call); consuming the NATIVE d=40/80 refs
directly (the forward's raw-input lesson applied backward) should save
that traffic.

Measured on v5e (2026-08-17, run ALONE):
  (2,8,4096,40) raw 2.618 ms vs padded 2.611 ms  -> 1.00x
  (2,8,1024,80) raw 0.416 ms vs padded 0.410 ms  -> 0.99x
  (2,8,256,160) raw 0.063 ms vs padded 0.058 ms  -> 0.92x
Verdict: NEUTRAL-TO-WORSE.  Small-minor-dim arrays are already physically
128-lane tiled in HBM, so the explicit pads are pure copies that XLA
overlaps -- the same result as the round-2 raw-FORWARD experiment, where
the win came from skipping a pad on the critical path, which the backward
does not have.  The raw kernels live only here; the shipped
``flash_bwd`` keeps the single padded path.

Run ALONE: python experiments/r3_bwd_raw_ab.py
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
from sdbc_tpu.ops.flash_attention_bwd import flash_bwd as _flash_bwd_padded
from sdbc_tpu.ops.flash_attention_bwd import _round_up

_LOG2E = math.log2(math.e)


def _dq_kernel_raw(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                   scale, block_kv, num_kv):
    """Unpadded dq kernel: refs carry the NATIVE head dim (e.g. 40).

    q is scaled into log2 space in-kernel on the (bq, d) block; k/v stay
    raw, so the final write folds the lone ``scale`` correction.
    """
    q32 = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    qs = q32.astype(q_ref.dtype)
    do = do_ref[0]
    bq, d = qs.shape
    jq = pl.program_id(1)
    lse2 = lse_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]
    delta = delta_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]

    dq = jnp.zeros((bq, d), jnp.float32)
    for j in range(num_kv):  # static unroll -> software pipelining
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        s2 = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p = jnp.exp2(s2 - lse2)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds0 = (p * (dp - delta)).astype(k.dtype)
        dq = dq + jax.lax.dot_general(ds0, k, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel_raw(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, block_q, num_q):
    kl = k_ref[0]
    v = v_ref[0]
    bkv, d = kl.shape
    qls = scale * _LOG2E

    dk = jnp.zeros((bkv, d), jnp.float32)
    dv = jnp.zeros((bkv, d), jnp.float32)
    for i in range(num_q):  # static unroll
        q32 = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        qs = (q32 * qls).astype(q_ref.dtype)
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse2 = lse_ref[0, 0, pl.ds(i * block_q, block_q)].astype(
            jnp.float32)[:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)].astype(
            jnp.float32)[:, None]
        s2 = jax.lax.dot_general(qs, kl, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p = jnp.exp2(s2 - lse2)
        pc = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds0 = (p * (dp - delta)).astype(qs.dtype)
        dk = dk + jax.lax.dot_general(ds0, qs, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    dk_ref[0] = (dk * (1.0 / _LOG2E)).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_bwd_raw(q, k, v, o, do, lse, scale: float,
                   block_q: int, block_kv: int):
    """Pad-free backward: q/k/v/do consumed at their native head dim."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qr = q.reshape(b * h, sq, d)
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)
    dor = do.reshape(b * h, sq, d)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    lse2 = (lse.astype(jnp.float32) * _LOG2E).reshape(b * h, 1, sq)
    delta_r = delta.reshape(b * h, 1, sq)
    interpret = jax.default_backend() != "tpu"
    d_pad = _round_up(d, 128)  # physical lane footprint

    seq_specs = [
        pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel_raw, scale=scale, block_kv=block_kv,
                          num_kv=sk // block_kv),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ] + seq_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * sq * sk * d_pad,
            bytes_accessed=(qr.size + kr.size + vr.size + 2 * dor.size)
            * qr.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vr, dor, lse2, delta_r)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_raw, scale=scale, block_q=block_q,
                          num_q=sq // block_q),
        grid=(b * h, sk // block_kv),
        in_specs=[
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + seq_specs,
        out_specs=(
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, sk, d), v.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * sq * sk * d_pad,
            bytes_accessed=(qr.size + kr.size + 2 * vr.size + dor.size)
            * qr.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vr, dor, lse2, delta_r)

    return (dq.reshape(b, h, sq, d), dk.reshape(b, h, sk, d),
            dv.reshape(b, h, sk, d))


def bench(fn, q, k, v, o, do, lse, scale, iters, bq, bkv):
    def body(_, carry):
        dq, dk, dv = fn(q, k, v, o, carry, lse, scale,
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


CASES = [
    # (shape, raw blocks, padded blocks)
    ((2, 8, 4096, 40), (512, 1024), (512, 1024)),
    ((2, 8, 4096, 40), (1024, 1024), None),
    ((2, 8, 1024, 80), (256, 1024), (256, 1024)),
    ((2, 8, 1024, 80), (1024, 1024), None),
    ((2, 8, 256, 160), (256, 256), (256, 256)),
]


def main():
    for (b, h, s, d), raw_blk, pad_blk in CASES:
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

        outs_r = _flash_bwd_raw(q, k, v, o, do, lse, scale, *raw_blk)
        outs_p = _flash_bwd_padded(q, k, v, o, do, lse, scale,
                                   block_q=512, block_kv=1024)
        diffs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                       - b_.astype(jnp.float32))))
                 for a, b_ in zip(outs_r, outs_p)]
        print(f"({b},{h},{s},{d}) raw{raw_blk} maxdiff dq/dk/dv = "
              f"{diffs[0]:.2e}/{diffs[1]:.2e}/{diffs[2]:.2e}", flush=True)

        t_raw = bench(_flash_bwd_raw, q, k, v, o, do, lse, scale, iters,
                      *raw_blk)
        line = (f"({b},{h},{s},{d}) raw q={raw_blk[0]} kv={raw_blk[1]}: "
                f"{t_raw*1e3:6.3f} ms ({fl/t_raw/1e12:5.1f} TF/s useful)")
        if pad_blk is not None:
            t_pad = bench(_flash_bwd_padded, q, k, v, o, do, lse, scale,
                          iters, *pad_blk)
            line += (f"   padded q={pad_blk[0]} kv={pad_blk[1]}: "
                     f"{t_pad*1e3:6.3f} ms  raw speedup {t_pad/t_raw:.2f}x")
        print(line, flush=True)


if __name__ == "__main__":
    main()
