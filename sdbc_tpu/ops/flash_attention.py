"""Pallas TPU flash attention (forward + custom VJP) for SD spatial attention.

Forward: online-softmax tiling; each grid program owns one (batch*head,
q-block) tile, streams K/V in `block_kv` chunks that stay VMEM-resident per
head (UNet worst case Sk=4096, D=160 → ~2.6 MB K+V in bf16, well under the
~16 MB VMEM budget), accumulates in fp32, and emits both the output and the
log-sum-exp rows.  Head dim / kv length are zero-padded to lane boundaries;
padded kv positions are masked to -inf so the math is exact.

Backward: the Pallas two-kernel flash backward (flash_attention_bwd.py) —
no S×S matrix ever reaches HBM.

Replaces the torch CUDA attention the reference uses via diffusers
(SURVEY.md E1).  CPU test runs use interpret mode automatically.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdbc_tpu.ops.flash_attention_bwd import flash_bwd

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                kv_len: int, block_kv: int, kv_pad: int):
    # (scale is folded into q host-side — log2-space prescale — so the
    # kernel itself never applies it)
    q = q_ref[0]                               # (bq, D) native dtype (bf16)
    num_kv = kv_pad // block_kv
    bq, d = q.shape

    def body(j, carry):
        m, l, acc = carry
        # keep operands in their native (bf16) dtype: fp32 MXU matmuls run at
        # a fraction of bf16 rate; accumulation stays fp32 via preferred type
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        # q is pre-scaled by scale*log2(e): s is already in log2 space,
        # saving one full elementwise pass over the (bq, bkv) score matrix
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, block_kv), log2 units
        if kv_pad != kv_len:  # mask zero-padded kv positions
            col = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)          # exp2: cheaper than exp on the VPU
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    jq = pl.program_id(1)
    # convert the log2-space running stats back to a natural-log LSE
    ln2 = 0.6931471805599453
    lse_ref[0, 0, pl.ds(jq * bq, bq)] = (
        m * ln2 + jnp.log(l)).reshape(bq)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_fwd(q, k, v, scale: float, block_q: int = 512, block_kv: int = 1024):
    """Returns (out, lse) with out (B,H,Sq,D) and lse (B,H,Sq) fp32."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = _round_up(d, 128)
    block_q = min(block_q, _round_up(sq, 128))
    sq_pad = _round_up(sq, block_q)
    block_kv = min(block_kv, _round_up(sk, 128))
    kv_pad = _round_up(sk, block_kv)

    log2e = 1.4426950408889634
    q = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - sk), (0, d_pad - d)))
    qp = qp.reshape(b * h, sq_pad, d_pad)
    kp = kp.reshape(b * h, kv_pad, d_pad)
    vp = vp.reshape(b * h, kv_pad, d_pad)

    grid = (b * h, sq_pad // block_q)
    interpret = jax.default_backend() != "tpu"  # CPU tests run the same kernel
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, kv_len=sk,
                          block_kv=block_kv, kv_pad=kv_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # full-row lse block revisited across q-block programs (each
            # program writes its own slice); (1,1,Sq) satisfies TPU tiling
            pl.BlockSpec((1, 1, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, sq_pad), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * kv_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq_pad * kv_pad,
        ),
    )(qp, kp, vp)
    out = out.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]
    lse = lse.reshape(b, h, sq_pad)[:, :, :sq]
    return out, lse


# ---------------------------------------------------------------------------
# Fixed-cap inference kernel (round 2)
#
# The online-softmax running max costs two extra VPU passes over every score
# element AND serializes the kv loop (m/alpha are loop-carried), which blocks
# Mosaic from software-pipelining the next block's QKᵀ against the current
# block's exp2.  For inference the max is unnecessary: scores live in log2
# space (q pre-scaled by scale·log2e), and exp2(min(s, CAP)) with CAP=60 is
# EXACT fp32 softmax for natural logits ≤ 60/log2e ≈ 41.6 — far beyond
# trained-SD magnitudes (O(10)); sums stay ≪ fp32 max and underflow flushes
# to exact 0.  The denominator comes from a ones lane appended to V at column
# D, accumulated by the PV matmul on the MXU — no VPU sum-reduce pass.
# Measured on v5e at the UNet's 64² shape (8,8,4096,40): 1.0-1.9 ms vs the
# running-max kernel's 7.9 ms (experiments/r2_flash_fixedmax.py).
# Training keeps the running-max kernel: its VJP must tolerate arbitrary
# logit scales mid-training.

_CAP = 60.0  # log2-space clamp; see note above


def _fixed_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_kv: int,
                  kv_pad: int, d: int):
    q = q_ref[0]                                 # (bq, d_pad) log2-prescaled
    bq = q.shape[0]
    num_kv = kv_pad // block_kv

    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)
    for j in range(num_kv):  # static unroll: iterations are independent
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bkv) log2 units
        if j * block_kv + block_kv > kv_len:     # mask zero-padded kv rows
            col = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_kv), 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp2(jnp.minimum(s, _CAP))
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    l = jnp.maximum(acc[:, d:d + 1], 1e-37)      # denominator from ones lane
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_fixed_fwd(q, k, v, scale: float, block_q: int = 0,
                     block_kv: int = 1024):
    """Fixed-cap forward: (B,H,Sq,D) → (B,H,Sq,D), no lse. Non-causal."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = _round_up(d + 1, 128)                # +1: ones lane at column d
    if block_q == 0:
        # measured-best q blocks (r2_flash_fixedmax.py): big blocks win at
        # long sequence — more unrolled kv work per grid step to pipeline
        block_q = 1024 if sq >= 2048 else 512
    block_q = min(block_q, _round_up(sq, 128))
    sq_pad = _round_up(sq, block_q)
    block_kv = min(block_kv, _round_up(sk, 128))
    kv_pad = _round_up(sk, block_kv)

    log2e = 1.4426950408889634
    qp = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    qp = jnp.pad(qp, ((0, 0), (0, 0), (0, sq_pad - sq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, kv_pad - sk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, kv_pad - sk), (0, d_pad - d)))
    vp = vp.at[:, :, :sk, d].set(1.0)            # ones lane → denominator
    qp = qp.reshape(b * h, sq_pad, d_pad)
    kp = kp.reshape(b * h, kv_pad, d_pad)
    vp = vp.reshape(b * h, kv_pad, d_pad)

    grid = (b * h, sq_pad // block_q)
    interpret = jax.default_backend() != "tpu"   # CPU tests run the kernel
    out = pl.pallas_call(
        functools.partial(_fixed_kernel, kv_len=sk, block_kv=block_kv,
                          kv_pad=kv_pad, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_pad, d_pad), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * kv_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq_pad * kv_pad,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, sq_pad, d_pad)[:, :, :sq, :d]


def _fixed_kernel_raw(q_ref, k_ref, v_ref, o_ref, *, block_kv: int,
                      num_kv: int, qscale: float):
    """Unpadded fixed-cap kernel: refs carry the NATIVE head dim (e.g. 40).

    Small-minor-dim arrays are already physically 128-lane tiled in HBM, so
    the padded variant's jnp.pad ops are pure copies (~1.1 ms/step at SD-1.5
    shapes) — this variant reads q/k/v as-is and lets Mosaic mask the lane
    tail inside the dots.  The softmax denominator is a VPU row-sum per kv
    block instead of the ones-lane trick (needs no extra V column); the
    kernel is MXU-saturated, so the extra VPU pass hides under the matmuls.
    q is scaled into log2 space in-kernel (kills the pre-scaling pass too).
    """
    q32 = q_ref[0].astype(jnp.float32) * qscale
    q = q32.astype(q_ref.dtype)                  # (bq, d) log2-prescaled
    bq, d = q.shape

    acc = jnp.zeros((bq, d), jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    for j in range(num_kv):  # static unroll: iterations are independent
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (bq, bkv) log2 units
        p = jnp.exp2(jnp.minimum(s, _CAP))
        l = l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    o_ref[0] = (acc / jnp.maximum(l, 1e-37)).astype(o_ref.dtype)


def _divisor_block(s: int, prefer: int) -> int:
    for b in (prefer, 512, 256, 128):
        if b <= prefer and s % b == 0:
            return b
    return 0


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_fixed_fwd_raw(q, k, v, scale: float, block_q: int,
                         block_kv: int):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    log2e = 1.4426950408889634
    qr = q.reshape(b * h, sq, d)                 # bitcast, no copy
    kr = k.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)
    grid = (b * h, sq // block_q)
    interpret = jax.default_backend() != "tpu"   # CPU tests run the kernel
    d_pad = _round_up(d, 128)                    # physical lane footprint
    out = pl.pallas_call(
        functools.partial(_fixed_kernel_raw, block_kv=block_kv,
                          num_kv=sk // block_kv, qscale=scale * log2e),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d_pad,
            bytes_accessed=(qr.size + kr.size + vr.size) * qr.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vr)
    return out.reshape(b, h, sq, d)


def _fixed_kernel_bshd(q_ref, k_ref, v_ref, o_ref, *, heads: int, d: int,
                       block_kv: int, num_kv: int, qscale: float):
    """_fixed_kernel_raw math over (b, s, h·d) projection-layout refs.

    One invocation handles ALL heads of a q block (Mosaic requires the
    last two block dims be 8/128-divisible or full, so a per-head grid
    axis is not expressible); each head is a static lane slice of the
    full-width block.  The head "split" thus happens in VMEM, not as an
    XLA relayout materialized in HBM (the round-3 roofline's 145 ms head
    split/merge bucket, 91% HBM-bound).
    """
    qall = (q_ref[0].astype(jnp.float32) * qscale).astype(q_ref.dtype)
    bq = qall.shape[0]
    for h in range(heads):  # static unroll over heads
        q = jax.lax.slice(qall, (0, h * d), (bq, (h + 1) * d))
        acc = jnp.zeros((bq, d), jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        for j in range(num_kv):  # static unroll: iterations independent
            k = k_ref[0, pl.ds(j * block_kv, block_kv), pl.ds(h * d, d)]
            v = v_ref[0, pl.ds(j * block_kv, block_kv), pl.ds(h * d, d)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (bq, bkv) log2 units
            p = jnp.exp2(jnp.minimum(s, _CAP))
            l = l + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, :, pl.ds(h * d, d)] = \
            (acc / jnp.maximum(l, 1e-37)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "block_q",
                                             "block_kv"))
def _flash_fixed_fwd_bshd(q, k, v, heads: int, scale: float, block_q: int,
                          block_kv: int):
    """Fixed-cap forward over the PROJECTION layout: (B,Sq,H,D) → same.

    The callers' reshape (b, s, h·d) ↔ (b, s, h, d) is a free bitcast, so
    this kernel consumes the q/k/v projections and feeds the o-projection
    with ZERO head split/merge copies in HBM (round-4 lever; A/B in
    experiments/r4_bshd.py).
    """
    b, sq, h, d = q.shape
    assert h == heads
    sk = k.shape[1]
    log2e = 1.4426950408889634
    qr = q.reshape(b, sq, h * d)                 # bitcast, no copy
    kr = k.reshape(b, sk, h * d)
    vr = v.reshape(b, sk, h * d)
    grid = (b, sq // block_q)
    interpret = jax.default_backend() != "tpu"   # CPU tests run the kernel
    d_pad = _round_up(d, 128)                    # physical lane footprint
    out = pl.pallas_call(
        functools.partial(_fixed_kernel_bshd, heads=heads, d=d,
                          block_kv=block_kv, num_kv=sk // block_kv,
                          qscale=scale * log2e),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, h * d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, h * d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, h * d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, h * d),
                               lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq, h * d), q.dtype),
        interpret=interpret,
        # the unrolled heads x kv loop keeps several (bq, bkv) fp32 score
        # tiles + the full-width double-buffered k/v blocks live at once —
        # past the conservative 16 MB default scoped-vmem limit (v5e has
        # 128 MB VMEM; measured need ~28 MB at the 64^2 shape)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d_pad,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qr, kr, vr)
    return out.reshape(b, sq, h, d)


def flash_attention_fixed_bshd(q, k, v, *, scale: Optional[float] = None):
    """Inference flash attention over (B,S,H,D) projection-layout inputs.

    Falls back to transposing into the head-major path when the block
    divisibility the bshd kernel needs doesn't hold (odd sizes); same
    fixed-cap exactness bound as flash_attention_fixed.
    """
    scale = float(scale if scale is not None else q.shape[-1] ** -0.5)
    sq, sk = q.shape[1], k.shape[1]
    bq = _divisor_block(sq, 1024 if sq >= 2048 else 512)
    bkv = _divisor_block(sk, 1024)
    if bq and bkv:
        return _flash_fixed_fwd_bshd(q, k, v, q.shape[2], scale, bq, bkv)
    tr = lambda t: t.transpose(0, 2, 1, 3)
    return tr(flash_attention_fixed(tr(q), tr(k), tr(v), scale=scale))


# ---------------------------------------------------------------------------
# int8 QKᵀ experiment (SageAttention-style) — MEASURED SLOWER, not dispatched
#
# Hypothesis: v5e's MXU runs int8 matmuls at 2× the bf16 rate, so
# quantizing Q/K with per-row scales should halve the QKᵀ half of the
# kernel (P·V stays bf16, the SageAttention split, arXiv:2410.02367).
# Accuracy holds (~2% of output range, tests/test_ops.py), but on-chip the
# kernel is SLOWER than the bf16 raw variant (4.28 vs 3.63 ms at
# (8,8,4096,40), experiments/r2_int8_ab.py): Mosaic does not lower this
# int8 dot to a faster MXU path today, and the per-row rescale adds a VPU
# pass over the full score matrix that does not hide under the matmuls.
# Kept (with its test) for re-evaluation on future Mosaic/hardware; no
# production code path uses it.


def _int8_kernel(q_ref, qs_ref, k_ref, ks_ref, v_ref, o_ref, *,
                 block_kv: int, num_kv: int):
    q = q_ref[0]                                 # (bq, d) int8
    qs = qs_ref[0]                               # (bq, 1) f32, log2e·scale folded
    bq, d = q.shape

    acc = jnp.zeros((bq, d), jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    for j in range(num_kv):
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :]
        ks = ks_ref[0, :, pl.ds(j * block_kv, block_kv)]   # (1, bkv) f32
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :]
        s_i = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)    # (bq, bkv) int32
        s = s_i.astype(jnp.float32) * qs * ks    # log2 units
        p = jnp.exp2(jnp.minimum(s, _CAP))
        l = l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    o_ref[0] = (acc / jnp.maximum(l, 1e-37)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_fixed_fwd_int8(q, k, v, scale: float, block_q: int,
                          block_kv: int):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    log2e = 1.4426950408889634

    def quant(x):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        s = jnp.maximum(ax, 1e-8) / 127.0
        xi = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
        return xi, s

    qi, qs = quant(q)
    ki, ks = quant(k)
    qi = qi.reshape(b * h, sq, d)
    ki = ki.reshape(b * h, sk, d)
    vr = v.reshape(b * h, sk, d)
    qs = (qs * (scale * log2e)).reshape(b * h, sq, 1)
    ks = ks.reshape(b * h, 1, sk)                # row scales, lane-major

    grid = (b * h, sq // block_q)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_int8_kernel, block_kv=block_kv,
                          num_kv=sk // block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * _round_up(d, 128),
            bytes_accessed=(qi.size * qi.dtype.itemsize
                            + ki.size * ki.dtype.itemsize
                            + 2 * vr.size * vr.dtype.itemsize),
            transcendentals=b * h * sq * sk,
        ),
    )(qi, qs, ki, ks, vr)
    return out.reshape(b, h, sq, d)


def flash_attention_fixed(q, k, v, *, scale: Optional[float] = None):
    """Inference-path flash attention (fixed-cap softmax, no VJP).

    EXACTNESS BOUND: the kernel computes softmax as exp2(min(s, 60)) in log2
    space, which is exact fp32 softmax only while natural logits stay ≤
    60/log2e ≈ 41.6.  Beyond that, relative weights between clamped scores
    are compressed (a distorted, not merely clipped, softmax).  Trained
    SD-class models measure O(10) (experiments/r2_flash_fixedmax.py), but a
    checkpoint or scale producing larger logits is silently wrong — set
    SDBC_ATTN_DEBUG=1 to emit a per-call upper-bound estimate
    (scale·max‖q‖·max‖k‖), or SDBC_ATTN_IMPL=xla to bypass the kernel.
    """
    scale = float(scale if scale is not None else q.shape[-1] ** -0.5)
    if os.environ.get("SDBC_ATTN_DEBUG") == "1":
        qn = jnp.sqrt((q.astype(jnp.float32) ** 2).sum(-1)).max()
        kn = jnp.sqrt((k.astype(jnp.float32) ** 2).sum(-1)).max()
        jax.debug.print(
            "[sdbc flash-fixed] logit upper bound {b:.1f} "
            "(exact while <= 41.6; if larger use SDBC_ATTN_IMPL=xla)",
            b=scale * qn * kn)
    sq, sk = q.shape[2], k.shape[2]
    bq = _divisor_block(sq, 1024 if sq >= 2048 else 512)
    bkv = _divisor_block(sk, 1024)
    if bq and bkv:
        return _flash_fixed_fwd_raw(q, k, v, scale, bq, bkv)
    return _flash_fixed_fwd(q, k, v, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale: float):
    out, _ = _flash_fwd(q, k, v, scale)
    return out


def _flash_fwd_rule(q, k, v, scale):
    out, lse = _flash_fwd(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(scale, res, g):
    q, k, v, out, lse = res
    dq, dk, dv = flash_bwd(q, k, v, out, g.astype(out.dtype), lse, scale)
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q, k, v, *, causal: bool = False, scale: Optional[float] = None):
    if causal:
        # CLIP's 77-token causal attention goes through XLA (attention.py);
        # the kernel targets the UNet's non-causal spatial attention.
        from sdbc_tpu.ops.attention import xla_attention
        return xla_attention(q, k, v, causal=True, scale=scale)
    scale = float(scale if scale is not None else q.shape[-1] ** -0.5)
    return _flash(q, k, v, scale)
