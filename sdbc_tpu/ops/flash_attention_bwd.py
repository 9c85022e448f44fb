"""Pallas TPU flash attention backward kernels.

Two-kernel flash backward over saved log-sum-exp rows (no S×S matrix in HBM):
  dq kernel : grid (B*H, q-blocks), K/V resident, accumulate dq per q-block
  dkv kernel: grid (B*H, kv-blocks), K/V block resident, stream Q/dO, emit dk,dv
p is recomputed from (q, k, lse); padded kv positions are re-masked so their
p/ds rows are exactly zero and sliced-off dk/dv padding is exact.  This is
what makes UNet training at 4096-token spatial attention memory-feasible
(SURVEY.md §7 hard part 2).

Round-3 reformulation (the forward's fixed-cap lessons applied backward):
  - scale is folded into q and log2(e) into k HOST-side, so the score matmul
    emits log2-space scaled logits directly and p = exp2(s2 − lse·log2e) —
    the two full S×S ``*scale`` VPU passes per kv/q iteration are gone and
    exp becomes a bare exp2.  The scalar corrections land on the final
    block-sized accumulator writes instead:
      dk = Σ ds0ᵀ·(scale·q)            (exact dK — scale rides the q̃ stream)
      dq = (scale/log2e)·Σ ds0·k̃       (one multiply per q-block)
  - kv/q loops are statically unrolled (python range) like the forward
    kernel, letting Mosaic software-pipeline the next block's matmuls
    against the current block's exp2.
  - the dkv kernel's p/ds matmul operands are cast to the stream dtype
    (bf16) before hitting the MXU — the previous fp32 operands forced
    multi-pass fp32 MXU matmuls on two of its three dots.
A/B vs the round-2 kernel: experiments/r3_bwd_ab.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = math.log2(math.e)

# Full-operand VMEM residency (K/V for dq, Q/dO for dkv) is the fast layout;
# Mosaic double-buffers the resident pair across grid dim 0, so the pair must
# fit in roughly half of scoped VMEM (~16 MB).  At bf16 d_pad=128 that bounds
# the sequence at ~8k tokens — 2× the UNet's largest spatial attention (64²=
# 4096, SURVEY.md §7 hard part 2), so no streamed fallback is needed here.


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _dq_kernel(qs_ref, kl_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               scale, kv_len, block_kv, kv_pad):
    """qs = scale·q; kl = log2e·k; lse in log2 units.  dq emitted with the
    scale/log2e correction folded into the single final write."""
    qs = qs_ref[0]
    do = do_ref[0]
    bq, d = qs.shape
    jq = pl.program_id(1)
    lse2 = lse_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]
    delta = delta_ref[0, 0, pl.ds(jq * bq, bq)].astype(jnp.float32)[:, None]
    num_kv = kv_pad // block_kv

    dq = jnp.zeros((bq, d), jnp.float32)
    for j in range(num_kv):  # static unroll → software pipelining
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
        dq = dq + jax.lax.dot_general(ds0, kl, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    # dQ = scale·dS0·K = (scale/log2e)·Σ ds0·k̃ — one scalar mult per block
    dq_ref[0] = (dq * (scale / _LOG2E)).astype(dq_ref.dtype)


def _dkv_kernel(qs_ref, kl_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, block_q, q_pad):
    # no padded-column masking needed here: padded kv columns only feed
    # dk/dv ROWS that the caller slices off (their p values never touch a
    # real output), so the per-iteration iota+select the forward kernel
    # needs is pure waste in this, the hottest training kernel
    kl = kl_ref[0]
    v = v_ref[0]
    bkv, d = kl.shape
    num_q = q_pad // block_q

    dk = jnp.zeros((bkv, d), jnp.float32)
    dv = jnp.zeros((bkv, d), jnp.float32)
    for i in range(num_q):  # static unroll
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
        dv = dv + jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds0 = (p * (dp - delta)).astype(qs.dtype)
        # dK = scale·dS0ᵀ·Q = Σ ds0ᵀ·q̃ — the scale rides the q̃ stream
        dk = dk + jax.lax.dot_general(ds0, qs, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)

    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def flash_bwd(q, k, v, o, do, lse, scale: float,
              block_q: int = 512, block_kv: int = 1024):
    # block defaults measured on v5e at the training 64^2 shape
    # (experiments/r2_bwd_tune.py): 512/1024 = 2.02 ms vs 256/512's 2.20
    """(dq, dk, dv) for non-causal flash attention.

    q/k/v/o/do: (B,H,S,D); lse: (B,H,Sq) fp32 NATURAL-log row log-sum-exp
    from the forward kernel (converted to log2 units here).
    """
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
            # fold the scalar in fp32 and round ONCE back to the operand
            # dtype (as the forward folds scale*log2e into q): a bf16
            # multiply would round the scalar AND the product, drifting the
            # recomputed p away from the forward's lse
            x = (x.astype(jnp.float32) * mult).astype(x.dtype)
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - x.shape[2]),
                           (0, d_pad - x.shape[3]))).reshape(
            b * h, s_pad, d_pad)

    qs, dop = pad(q, sq_pad, mult=scale), pad(do, sq_pad)
    kl, vp = pad(k, kv_pad, mult=_LOG2E), pad(v, kv_pad)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    # padded q rows: lse=0, delta=0 → p = exp(-inf-ish)? their s rows are 0;
    # with lse 0 p=1 → nonzero ds… but those rows' dq is sliced away and they
    # contribute do=0 to dk/dv (dop rows are zero-padded), and p·do == 0.
    lse2 = lse.astype(jnp.float32) * _LOG2E  # natural-log → log2 units
    lse_p = jnp.pad(lse2, ((0, 0), (0, 0), (0, sq_pad - sq))).reshape(
        b * h, 1, sq_pad)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_pad - sq))).reshape(
        b * h, 1, sq_pad)

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
    )(qs, kl, vp, dop, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, q_pad=sq_pad),
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
