"""[DEAD EXPERIMENT - kept for the record] Pallas TPU flash attention v2 - head-interleaved layout.

MEASURED SLOWER than the v1-layout fixed-cap kernel (5.72 vs 4.38 ms at the
(8,8,4096,40) shape; experiments/r2_flash2.py). The winning design is
flash_attention_fixed in sdbc_tpu/ops/flash_attention.py (v1 padded layout +
fixed-cap softmax + ones-lane denominator). Not part of the package.

Round-2 redesign of the sampling-path attention kernel (the round-1 profile
put the 64²/d=40 self-attention at 45% of sampling device time and the
pad/transpose relayouts around it inside the 37% elementwise bucket):

1. **No (B,H,S,D) transpose.**  The kernel consumes q/k/v as (B, S, H·64):
   the qkv projections' natural (B, S, C) output, reshaped per-head and
   lane-padded to the next 64 boundary — one cheap elementwise pass, vs the v1 path's
   transpose + pad-to-128 (3.2× inflated arrays) + output transpose.
   Head split/merge happens INSIDE the kernel as 64-aligned lane slices.

2. **Fixed-cap softmax (no running max).**  Scores arrive in log2 space
   (q is pre-scaled by scale·log2e).  Instead of the online-softmax running
   max + rescale chain — which serializes the kv loop and costs two extra
   VPU passes over every score element — probabilities are exp2(min(s, CAP))
   with CAP=60 (log2): natural logits ≤ ~41.6 are computed EXACTLY in fp32
   (sum ≤ 2^60·Skv ≪ fp32 max; underflow flushes to exact 0).  Trained SD
   attention logits are O(10); the cap only engages on a diverged model.
   Removing the max dependency makes all (head, kv-block) iterations
   independent, so Mosaic can software-pipeline the next QKᵀ matmul against
   the previous block's exp2.

3. **MXU row sums.**  V is augmented (outside the kernel) with a ones lane at
   per-head column D, so the PV matmul accumulates the softmax denominator in
   acc[:, D] for free — no VPU sum-reduce pass over the score tile.

The exact-softmax equivalence (vs ops.attention.xla_attention) is asserted in
tests/test_ops.py for magnitudes far beyond anything a trained model emits.
Training keeps the v1 running-max kernel (ops/flash_attention.py) whose
custom VJP tolerates arbitrary logit scales mid-training.

Replaces the torch/diffusers CUDA attention of the reference's hot path
(reference finetune_sd.py:480-481 via diffusers UNet; SURVEY.md §2.2 E1).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
# log2-space clamp: exp2(60)·4096 ≈ 4.7e21 ≪ fp32 max; natural-logit bound
# 60/log2(e) ≈ 41.6 — far above trained-SD score magnitudes (O(10)).
_CAP = 60.0


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, d: int, hp: int,
                kv_len: int, block_kv: int, kv_pad: int):
    bq = q_ref.shape[1]
    num_kv = kv_pad // block_kv

    accs = [jnp.zeros((bq, hp), jnp.float32) for _ in range(heads)]
    for j in range(num_kv):  # static unroll: no cross-iteration dependency
        masked = j * block_kv + block_kv > kv_len
        col = (j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_kv), 1)) if masked else None
        for h in range(heads):
            q = q_ref[0, :, pl.ds(h * hp, hp)]             # (bq, hp)
            k = k_ref[0, pl.ds(j * block_kv, block_kv), pl.ds(h * hp, hp)]
            v = v_ref[0, pl.ds(j * block_kv, block_kv), pl.ds(h * hp, hp)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (bq, bkv) log2
            if masked:                                     # zero-padded kv rows
                s = jnp.where(col < kv_len, s, _NEG_INF)
            p = jnp.exp2(jnp.minimum(s, _CAP))
            accs[h] = accs[h] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    for h in range(heads):
        acc = accs[h]
        l = acc[:, d:d + 1]            # denominator from the ones lane
        o_ref[0, :, pl.ds(h * hp, hp)] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash2(q, k, v, scale: float, block_q: int = 512, block_kv: int = 1024):
    """q (B,Sq,H,D), k/v (B,Skv,H,D) → out (B,Sq,H,D).  Non-causal."""
    import math

    b, sq, h, d = q.shape
    sk = k.shape[1]
    hp = _round_up(d + 1, 64)  # per-head lanes: 64-aligned slices in-kernel
    # Heads are processed in groups via a grid dimension so the VMEM-resident
    # K/V tiles hold only one group's lanes (all 8 heads at Skv=4096 would be
    # 2×8.4 MB double-buffered — over the 16 MB scoped budget).  Group size =
    # smallest head count whose lane width is a 128 multiple.
    hg = 128 // math.gcd(hp, 128)
    if h % hg != 0:
        hg = h  # odd head counts: single group (block width == full array)
    groups = h // hg
    block_q = min(block_q, _round_up(sq, 128))
    sq_pad = _round_up(sq, block_q)
    block_kv = min(block_kv, _round_up(sk, 128))
    kv_pad = _round_up(sk, block_kv)

    log2e = 1.4426950408889634
    qp = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    qp = jnp.pad(qp, ((0, 0), (0, sq_pad - sq), (0, 0), (0, hp - d)))
    kp = jnp.pad(k, ((0, 0), (0, kv_pad - sk), (0, 0), (0, hp - d)))
    # ones lane at per-head column D: the PV matmul accumulates the softmax
    # denominator there for free (padded kv rows contribute p=0 via the mask)
    vp = jnp.concatenate([
        v,
        jnp.ones(v.shape[:3] + (1,), v.dtype),
        jnp.zeros(v.shape[:3] + (hp - d - 1,), v.dtype),
    ], axis=-1)
    if kv_pad != sk:
        vp = jnp.pad(vp, ((0, 0), (0, kv_pad - sk), (0, 0), (0, 0)))
    c = h * hp
    cg = hg * hp  # lanes per head group
    qp = qp.reshape(b, sq_pad, c)
    kp = kp.reshape(b, kv_pad, c)
    vp = vp.reshape(b, kv_pad, c)

    grid = (b, groups, sq_pad // block_q)
    interpret = jax.default_backend() != "tpu"  # CPU tests run the same kernel
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=hg, d=d, hp=hp, kv_len=sk,
                          block_kv=block_kv, kv_pad=kv_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, cg), lambda i, g, j: (i, j, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, cg), lambda i, g, j: (i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, cg), lambda i, g, j: (i, 0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, cg), lambda i, g, j: (i, j, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, c), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * kv_pad * hp,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * sq_pad * kv_pad,
        ),
    )(qp, kp, vp)
    out = out.reshape(b, sq_pad, h, hp)
    return out[:, :sq, :, :d]


def flash_attention2(q, k, v, *, scale: Optional[float] = None):
    """Inference flash attention in (B, S, H, D) layout (non-causal)."""
    scale = float(scale if scale is not None else q.shape[-1] ** -0.5)
    return _flash2(q, k, v, scale)
