"""Pallas TPU flash attention backward kernels.

Two-kernel flash backward over saved log-sum-exp rows (no S×S matrix in HBM):
  dq kernel : grid (B*H, q-blocks), K/V resident, accumulate dq per q-block
  dkv kernel: grid (B*H, kv-blocks), K/V block resident, stream Q/dO, emit dk,dv
p is recomputed from (q, k, lse); padded kv positions are re-masked so their
p/ds rows are exactly zero and sliced-off dk/dv padding is exact.  This is
what makes UNet training at 4096-token spatial attention memory-feasible
(SURVEY.md §7 hard part 2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               scale, kv_len, block_kv, kv_pad):
    q = q_ref[0]
    do = do_ref[0]
    bq, d = q.shape
    jq = pl.program_id(1)
    lse = lse_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]
    delta = delta_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]
    num_kv = kv_pad // block_kv

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if kv_pad != kv_len:
            col = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(k.dtype)
        return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, kv_len, block_q, q_pad, block_kv):
    k = k_ref[0]
    v = v_ref[0]
    bkv, d = k.shape
    num_q = q_pad // block_q
    col = (pl.program_id(1) * block_kv
           + jax.lax.broadcasted_iota(jnp.int32, (1, bkv), 1))

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)].astype(
            jnp.float32)[:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)].astype(
            jnp.float32)[:, None]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if kv_len is not None:
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((bkv, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (z, z))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def flash_bwd(q, k, v, o, do, lse, scale: float,
              block_q: int = 512, block_kv: int = 1024):
    # block defaults measured on v5e at the training 64^2 shape
    # (experiments/r2_bwd_tune.py): 512/1024 = 2.02 ms vs 256/512's 2.20
    """(dq, dk, dv) for non-causal flash attention.

    q/k/v/o/do: (B,H,S,D); lse: (B,H,Sq) fp32 from the forward kernel.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = _round_up(d, 128)
    block_q = min(block_q, _round_up(sq, 128))
    sq_pad = _round_up(sq, block_q)
    block_kv = min(block_kv, _round_up(sk, 128))
    kv_pad = _round_up(sk, block_kv)
    interpret = jax.default_backend() != "tpu"

    def pad(x, s_pad):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - x.shape[3]))).reshape(
            b * h, s_pad, d_pad)

    qp, dop = pad(q, sq_pad), pad(do, sq_pad)
    kp, vp = pad(k, kv_pad), pad(v, kv_pad)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    # padded q rows: lse=0, delta=0 → p = exp(-inf-ish)? their s rows are 0;
    # with lse 0 p=1 → nonzero ds… but those rows' dq is sliced away and they
    # contribute do=0 to dk/dv (dop rows are zero-padded), and p·do == 0.
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_pad - sq))).reshape(
        b * h, 1, sq_pad)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq))).reshape(
        b * h, 1, sq_pad)

    kv_len = sk if kv_pad != sk else sk

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=sk,
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
    )(qp, kp, vp, dop, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, kv_len=sk,
                          block_q=block_q, q_pad=sq_pad, block_kv=block_kv),
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
    )(qp, kp, vp, dop, lse_p, delta_p)

    dq = dq.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
    dk = dk.reshape(b, h, kv_pad, d_pad)[:, :, :sk, :d]
    dv = dv.reshape(b, h, kv_pad, d_pad)[:, :, :sk, :d]
    return dq, dk, dv
