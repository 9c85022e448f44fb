"""Transposed-layout Pallas flash attention forward (head-dim in sublanes).

The v1 kernel (flash_attention.py) lays tensors as (S, D) with D on the lane
axis, so SD-1.x head dims (40/80/160) pad to 128/128/256 lanes — up to 3.2x
wasted MXU work; profiling showed the 64x64-level attentions at ~37% of
sampling time.  Here tensors are (D, S): D sits on the SUBLANE axis (pad to
16 only) and S on lanes (naturally 128-aligned), so

    s' = kT·q   : (d,bkv)x(d,bq)  → (bkv,bq)   contraction over sublanes
    acc += vT·p : (d,bkv)x(bkv,bq)→ (d,bq)

never touch a 128-padded head dim.  Softmax runs over the sublane axis.

Backward reuses the v1 flash backward (residuals are kept in the standard
(B,H,S,D) layout).  Enable via attention(impl="flash_tt") or env
SDBC_ATTN_IMPL=flash_tt.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdbc_tpu.ops.flash_attention_bwd import flash_bwd

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_tt_kernel(qt_ref, kt_ref, vt_ref, o_ref, lse_ref, *,
                   kv_len: int, block_kv: int, kv_pad: int):
    qt = qt_ref[0]                                  # (d, bq) native dtype
    d, bq = qt.shape
    num_kv = kv_pad // block_kv

    def body(j, carry):
        m, l, acc = carry
        kt = kt_ref[0, :, pl.ds(j * block_kv, block_kv)]
        vt = vt_ref[0, :, pl.ds(j * block_kv, block_kv)]
        # s' (bkv, bq): contraction over the sublane head dim; q pre-scaled
        # by scale*log2(e) so s is in log2 space (one less elementwise pass)
        s = jax.lax.dot_general(kt, qt, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if kv_pad != kv_len:
            row = j * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (block_kv, bq), 0)
            s = jnp.where(row < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=0, keepdims=True))  # (1, bq)
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=0, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            vt, p.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l, acc

    m0 = jnp.full((1, bq), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((1, bq), jnp.float32)
    acc0 = jnp.zeros((d, bq), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    jq = pl.program_id(1)
    ln2 = 0.6931471805599453
    lse_ref[0, 0, pl.ds(jq * bq, bq)] = (
        m * ln2 + jnp.log(l)).reshape(bq)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_fwd_tt(q, k, v, scale: float, block_q: int = 256,
                  block_kv: int = 512):
    """q/k/v (B,H,S,D) → (out (B,H,Sq,D), lse (B,H,Sq) fp32)."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    d_pad = _round_up(d, 16)
    block_q = min(block_q, _round_up(sq, 128))
    sq_pad = _round_up(sq, block_q)
    block_kv = min(block_kv, _round_up(sk, 128))
    kv_pad = _round_up(sk, block_kv)

    log2e = 1.4426950408889634
    q = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)

    def to_tt(x, s_pad):
        xt = jnp.swapaxes(x, -1, -2)  # (B,H,D,S)
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, d_pad - d),
                          (0, s_pad - x.shape[2])))
        return xt.reshape(b * h, d_pad, s_pad)

    qt, kt, vt = to_tt(q, sq_pad), to_tt(k, kv_pad), to_tt(v, kv_pad)

    grid = (b * h, sq_pad // block_q)
    interpret = jax.default_backend() != "tpu"
    out, lse = pl.pallas_call(
        functools.partial(_fwd_tt_kernel, kv_len=sk,
                          block_kv=block_kv, kv_pad=kv_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d_pad, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, kv_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad, kv_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, d_pad, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, d_pad, sq_pad), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, sq_pad), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_pad * kv_pad * d_pad,
            bytes_accessed=(qt.size + kt.size + vt.size) * qt.dtype.itemsize,
            transcendentals=b * h * sq_pad * kv_pad,
        ),
    )(qt, kt, vt)
    out = out.reshape(b, h, d_pad, sq_pad)[:, :, :d, :sq]
    out = jnp.swapaxes(out, -1, -2)
    lse = lse.reshape(b, h, sq_pad)[:, :, :sq]
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_tt(q, k, v, scale: float):
    out, _ = _flash_fwd_tt(q, k, v, scale)
    return out


def _fwd_rule(q, k, v, scale):
    out, lse = _flash_fwd_tt(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _bwd_rule(scale, res, g):
    q, k, v, out, lse = res
    return flash_bwd(q, k, v, out, g.astype(out.dtype), lse, scale)


_flash_tt.defvjp(_fwd_rule, _bwd_rule)


def flash_attention_tt(q, k, v, *, causal: bool = False,
                       scale: Optional[float] = None):
    if causal:
        from sdbc_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, causal=True, scale=scale)
    scale = float(scale if scale is not None else q.shape[-1] ** -0.5)
    return _flash_tt(q, k, v, scale)
