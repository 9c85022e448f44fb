"""Fused GEGLU feed-forward Pallas kernel (sampling fast path).

The spatial transformer's FF (unet._transformer; replaces diffusers
FeedForward/GEGLU, reference hot path finetune_sd.py:480-481) is
``y + (val·gelu(gate)) @ W2`` with ``[val, gate] = LN(y) @ W1 + b1``.  As
XLA ops the 8c-wide hidden state round-trips HBM between the two matmuls —
the round-1 profile shows the down-projection fusion HBM-bound at 42 TF/s
(reads bf16[8,4096,2560], writes a transposed-layout output), ~6 ms of the
60 ms sampling step across 11 instances.

This kernel runs LayerNorm → up-proj → erf-GELU gate → down-proj →
residual add in ONE pass over row tiles, keeping the hidden in VMEM:
HBM traffic drops from ~(4·s·8c + 2·s·c) to (2·s·c + weights) bytes and
both matmuls run back-to-back on the MXU.

Weights stay resident across grid steps (constant index maps).  VMEM
budget at c=640 caps the row block at 256 (hidden tile ≈ 5 MB in f32
accum); c=320 uses 512 rows.  Inference-only: no VJP — the training path
keeps the XLA formulation (dispatched via attn_impl in unet._transformer).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 polynomial erf (|err| < 1.5e-7).

    Pallas TPU has no erf lowering; this approximation's error is ~5 orders
    of magnitude below bf16 rounding, so the kernel still matches the XLA
    path's exact-erf GELU to working precision.
    """
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(y_ref, g_ref, bl_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, inner: int, eps: float, split: bool):
    y = y_ref[...]
    dt = y.dtype
    x = y.astype(jnp.float32)
    mu = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    xn = xc * jax.lax.rsqrt(var + eps)
    xn = (xn * g_ref[...].astype(jnp.float32)
          + bl_ref[...].astype(jnp.float32)).astype(dt)

    # up-projection; f32 accumulate (Mosaic requires a 32-bit acc), then
    # round to bf16 — matches the XLA path's nn.linear semantics
    def up(w, b):
        r = jax.lax.dot_general(xn, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(dt)
        return (r + b).astype(jnp.float32)

    if split:
        # halve the live f32 hidden: gate half first, gelu it, then val half
        gate = up(w1_ref[:, inner:], b1_ref[:, inner:].astype(dt))
        gact = 0.5 * gate * (1.0 + _erf(gate * 0.7071067811865476))
        val = up(w1_ref[:, :inner], b1_ref[:, :inner].astype(dt))
        a = val * gact
    else:
        h = up(w1_ref[...], b1_ref[...].astype(dt))
        val = h[:, :inner]
        gate = h[:, inner:]
        # erf GELU (torch F.gelu default; NOT the tanh approximation)
        a = val * (0.5 * gate * (1.0 + _erf(gate * 0.7071067811865476)))

    o = jax.lax.dot_general(a.astype(dt), w2_ref[...],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[...] = (y.astype(jnp.float32) + o).astype(o_ref.dtype)


def _default_block(c: int) -> int:
    # measured on v5e (experiments/r2_geglu_tune.py): c=320 block 1024 +
    # split-gate 1.217 ms vs 512/no-split 1.347 at (32768,320); c=640 keeps
    # 256/no-split (the split variant's val+gate f32 transients OOM the
    # 16 MB scoped VMEM next to the 9.8 MB of resident weights)
    return 1024 if c <= 320 else 256


def _default_split(c: int) -> bool:
    return c <= 320


@functools.partial(jax.jit, static_argnames=("eps", "block", "split"))
def _geglu_ff_rows(y, gamma, beta, w1, b1, w2, b2, eps: float,
                   block: int = 0, split: bool = False):
    rows, c = y.shape
    wide = w1.shape[1]
    inner = wide // 2
    block = min(block or _default_block(c), rows)
    assert rows % block == 0, (rows, block)
    grid = (rows // block,)
    dt = y.dtype
    interpret = jax.default_backend() != "tpu"  # CPU tests run the kernel
    return pl.pallas_call(
        functools.partial(_kernel, inner=inner, eps=eps, split=split),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, wide), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wide), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), dt),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * c * wide + 2 * rows * inner * c,
            bytes_accessed=2 * y.size * y.dtype.itemsize
            + (w1.size + w2.size) * 2,
            transcendentals=rows * inner,
        ),
    )(y, gamma[None], beta[None], w1, b1[None], w2, b2[None])


def ff_fused_eligible(y) -> bool:
    """Kernel applies: TPU, modest width (weights resident in ~16 MB VMEM),
    and the row count divides the block size."""
    rows = y.shape[0] * y.shape[1]
    c = y.shape[-1]
    return (jax.default_backend() == "tpu" and c <= 640
            and rows % min(_default_block(c), rows) == 0)


def geglu_ff(y, ln_p, geglu_p, out_p, *, eps: float = 1e-5):
    """Fused ``y + FF(LN(y))`` over (b, s, c); parameter dicts as in
    unet._init_transformer (ln3 / geglu / ff_out)."""
    b, s, c = y.shape
    dt = y.dtype
    out = _geglu_ff_rows(
        y.reshape(b * s, c),
        ln_p["scale"].astype(jnp.float32), ln_p["bias"].astype(jnp.float32),
        geglu_p["w"].astype(dt), geglu_p["b"].astype(dt),
        out_p["w"].astype(dt), out_p["b"].astype(dt), eps,
        split=_default_split(c))
    return out.reshape(b, s, c)
