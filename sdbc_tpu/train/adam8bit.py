"""Blockwise 8-bit AdamW — TPU-native replacement for bitsandbytes AdamW8bit.

The reference optimises with ``bnb.optim.AdamW8bit(min_8bit_size=16384)``
(finetune_sd.py:407-410, SURVEY.md E8), whose CUDA kernels store Adam moments
as int8 with per-block scales to cut optimizer memory 4x.  This is the same
idea as ONE fused Pallas kernel per parameter tensor: dequantize m/v,
Adam(W) update, requantize — one HBM read/write of every buffer per step.

Differences vs bitsandbytes (documented, not hidden): block size is 2048 with
*linear* absmax int8 scaling (bnb uses a nonlinear dynamic quantization map);
tensors smaller than ``min_8bit_size`` keep fp32 moments, exactly like bnb's
fallback.  Exposed as an optax ``GradientTransformation`` so it slots into
train/trainer.py via TrainConfig(use_8bit_adam=True).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048          # quantization block (one row)
ROW_TILE = 64         # rows per grid program
MIN_8BIT_SIZE = 16384  # reference min_8bit_size (finetune_sd.py:409)


class Quant8State(NamedTuple):
    mq: Any      # int8  (M, BLOCK)
    ms: Any      # fp32  (M, 128) per-row scale (broadcast across lanes)
    vq: Any      # int8  (M, BLOCK)
    vs: Any      # fp32  (M, 128)


def _adam8_kernel(g_ref, p_ref, mq_ref, ms_ref, vq_ref, vs_ref, lr_ref,
                  step_ref, p_out, mq_out, ms_out, vq_out, vs_out, *,
                  b1, b2, eps, wd):
    g = g_ref[:].astype(jnp.float32)
    p = p_ref[:].astype(jnp.float32)
    # nonlinear dequant (see quant() below): m in sqrt-space, v in 4th-root
    # space — closed-form equivalent of bnb's dynamic quantization map that
    # keeps tiny v entries representable (linear int8 zeroes them → blowup)
    mq = mq_ref[:].astype(jnp.float32) / 127.0
    m = jnp.sign(mq) * mq * mq * ms_ref[:, :1]
    vq = vq_ref[:].astype(jnp.float32) / 127.0
    v = (vq * vq) * (vq * vq) * vs_ref[:, :1]

    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g

    import math

    step = step_ref[0, 0].astype(jnp.float32)
    # b**step as exp(step·ln b): Mosaic has no powf lowering
    bc1 = 1.0 - jnp.exp(step * math.log(b1))
    bc2 = 1.0 - jnp.exp(step * math.log(b2))
    m_hat = m / bc1
    v_hat = v / bc2
    lr = lr_ref[0, 0]
    update = m_hat / (jnp.sqrt(v_hat) + eps) + wd * p
    p_out[:] = (p - lr * update).astype(p_out.dtype)

    def quant(x, power_root):
        amax = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-24)
        norm = x / amax                     # in [-1, 1]
        if power_root == 2:                 # store sign*sqrt(|x|)
            mapped = jnp.sign(norm) * jnp.sqrt(jnp.abs(norm))
        else:                               # store |x|^(1/4) (v is >= 0)
            mapped = jnp.sqrt(jnp.sqrt(jnp.maximum(norm, 0.0)))
        q = jnp.clip(jnp.round(mapped * 127.0), -127, 127).astype(jnp.int8)
        return q, jnp.broadcast_to(amax, (x.shape[0], 128)).astype(jnp.float32)

    mq_new, ms = quant(m, 2)
    vq_new, vs = quant(v, 4)
    mq_out[:] = mq_new
    ms_out[:] = ms
    vq_out[:] = vq_new
    vs_out[:] = vs


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "wd"))
def _adam8_update(g2d, p2d, st: Quant8State, lr, step, b1, b2, eps, wd):
    m_rows = g2d.shape[0]
    rows_pad = (m_rows + ROW_TILE - 1) // ROW_TILE * ROW_TILE

    def pad(x):
        return jnp.pad(x, ((0, rows_pad - m_rows), (0, 0)))

    grid = (rows_pad // ROW_TILE,)
    interpret = jax.default_backend() != "tpu"
    row_spec = pl.BlockSpec((ROW_TILE, BLOCK), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((ROW_TILE, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(_adam8_kernel, b1=b1, b2=b2, eps=eps, wd=wd),
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, scale_spec, row_spec,
                  scale_spec, scalar_spec, scalar_spec],
        out_specs=(row_spec, row_spec, scale_spec, row_spec, scale_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, BLOCK), p2d.dtype),
            jax.ShapeDtypeStruct((rows_pad, BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((rows_pad, BLOCK), jnp.int8),
            jax.ShapeDtypeStruct((rows_pad, 128), jnp.float32),
        ),
        interpret=interpret,
    )(pad(g2d), pad(p2d), pad(st.mq), pad(st.ms), pad(st.vq), pad(st.vs),
      jnp.asarray(lr, jnp.float32).reshape(1, 1),
      jnp.asarray(step, jnp.float32).reshape(1, 1))
    p_new, mq, ms, vq, vs = outs
    trim = lambda x: x[:m_rows]
    return trim(p_new), Quant8State(trim(mq), trim(ms), trim(vq), trim(vs))


def _to_2d(x):
    n = x.size
    rows = -(-n // BLOCK)
    flat = jnp.pad(x.reshape(-1).astype(jnp.float32),
                   (0, rows * BLOCK - n))
    return flat.reshape(rows, BLOCK)


class FP32Moments(NamedTuple):
    m: Any
    v: Any


class Adam8State(NamedTuple):
    count: jax.Array
    per_leaf: Any   # flat list (params-treedef order) of Quant8State|FP32Moments


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 1e-4,
              min_8bit_size: int = MIN_8BIT_SIZE) -> optax.GradientTransformation:
    """optax transformation with blockwise-int8 Adam moments (applies updates
    directly like bnb; use alone, not chained after scale_by_adam)."""

    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def leaf_init(p):
        if p.size >= min_8bit_size:
            rows = -(-p.size // BLOCK)
            return Quant8State(
                mq=jnp.zeros((rows, BLOCK), jnp.int8),
                ms=jnp.zeros((rows, 128), jnp.float32),
                vq=jnp.zeros((rows, BLOCK), jnp.int8),
                vs=jnp.zeros((rows, 128), jnp.float32))
        return FP32Moments(m=jnp.zeros_like(p, jnp.float32),
                           v=jnp.zeros_like(p, jnp.float32))

    def init_fn(params):
        # per-leaf states kept as a FLAT LIST in params-treedef order
        leaves = jax.tree.leaves(params)
        return Adam8State(count=jnp.zeros((), jnp.int32),
                          per_leaf=[leaf_init(p) for p in leaves])

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("adamw8bit requires params")
        step = state.count + 1
        lr = sched(state.count)

        g_leaves, treedef = jax.tree.flatten(grads)
        p_leaves = treedef.flatten_up_to(params)

        def leaf_update(g, p, st):
            if isinstance(st, Quant8State):
                p_new2d, st_new = _adam8_update(
                    _to_2d(g), _to_2d(p), st, lr, step, b1, b2, eps,
                    weight_decay)
                p_new = p_new2d.reshape(-1)[: p.size].reshape(p.shape)
                return (p_new - p).astype(p.dtype), st_new
            gf = g.astype(jnp.float32)
            m = b1 * st.m + (1 - b1) * gf
            v = b2 * st.v + (1 - b2) * gf * gf
            sf = step.astype(jnp.float32)
            m_hat = m / (1 - b1 ** sf)
            v_hat = v / (1 - b2 ** sf)
            upd = m_hat / (jnp.sqrt(v_hat) + eps) + weight_decay * p
            return (-lr * upd).astype(p.dtype), FP32Moments(m, v)

        pairs = [leaf_update(g, p, st)
                 for g, p, st in zip(g_leaves, p_leaves, state.per_leaf)]
        updates = treedef.unflatten([u for u, _ in pairs])
        return updates, Adam8State(count=step,
                                   per_leaf=[s for _, s in pairs])

    return optax.GradientTransformation(init_fn, update_fn)
