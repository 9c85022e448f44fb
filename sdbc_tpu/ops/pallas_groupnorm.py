"""Fused GroupNorm(+SiLU) Pallas kernel.

XLA computes GroupNorm as a reduce pass + a normalize pass → x is read from
HBM twice.  Here one grid program owns one sample: x stays VMEM-resident
between the statistics and the normalize+activation, so HBM sees exactly one
read and one write of x.  Group statistics use the one-hot matmul trick
(channel-sum → (C,)·M(C,G)) to avoid lane-splitting reshapes.

Applies to tensors whose per-sample slice fits VMEM (all SD UNet activations:
≤ 64²×320 bf16 ≈ 2.6 MB); larger tensors (VAE decoder at 512²) fall back to
the jnp formulation in ops/nn.py.  Differentiable via custom_vjp with a
reference-recompute backward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BYTES_LIMIT = 6 * 1024 * 1024  # per-sample x slice budget


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_ROW_TILE = 256


def _gn_kernel(x_ref, m_ref, scale_ref, bias_ref, y_ref, *, eps: float,
               count: float, silu: bool):
    """x stays VMEM-resident; fp32 temporaries live only per ROW_TILE slab
    (Mosaic materialises whole-block intermediates on the VMEM stack, so
    whole-block fp32 math OOMs at (4096, 320))."""
    hw_pad, c = x_ref.shape[1], x_ref.shape[2]
    tiles = hw_pad // _ROW_TILE
    m = m_ref[:]                                   # (C, G) one-hot

    def stats_body(i, carry):
        s1, s2 = carry
        xt = x_ref[0, pl.ds(i * _ROW_TILE, _ROW_TILE), :].astype(jnp.float32)
        # zero-padded rows contribute nothing to either sum
        return s1 + jnp.sum(xt, axis=0, keepdims=True), \
            s2 + jnp.sum(xt * xt, axis=0, keepdims=True)

    z = jnp.zeros((1, c), jnp.float32)
    col_s1, col_s2 = jax.lax.fori_loop(0, tiles, stats_body, (z, z))

    s1 = jax.lax.dot_general(col_s1, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (1, G)
    s2 = jax.lax.dot_general(col_s2, m, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mean_g = s1 / count
    var_g = jnp.maximum(s2 / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)                      # (1, G)
    # scatter group stats back to channels: (1,G)·Mᵀ via dot with M transposed
    inv_c = jax.lax.dot_general(inv_g, m, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (1, C)
    mean_c = jax.lax.dot_general(mean_g, m, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    a_c = inv_c * scale_ref[:]                              # (1, C)
    b_c = bias_ref[:] - mean_c * a_c

    def norm_body(i, _):
        xt = x_ref[0, pl.ds(i * _ROW_TILE, _ROW_TILE), :].astype(jnp.float32)
        y = xt * a_c + b_c
        if silu:
            y = y * jax.nn.sigmoid(y)
        y_ref[0, pl.ds(i * _ROW_TILE, _ROW_TILE), :] = y.astype(y_ref.dtype)
        return 0

    jax.lax.fori_loop(0, tiles, norm_body, 0)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "silu"))
def _gn_fwd(x2d, m, scale, bias, num_groups: int, eps: float, silu: bool):
    n, hw, c = x2d.shape
    hw_pad = _round_up(hw, _ROW_TILE)
    xp = jnp.pad(x2d, ((0, 0), (0, hw_pad - hw), (0, 0)))
    interpret = jax.default_backend() != "tpu"
    count = float(hw * (c // num_groups))
    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps, count=count, silu=silu),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, hw_pad, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw_pad, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw_pad, c), x2d.dtype),
        interpret=interpret,
    )(xp, m, scale, bias)
    return out[:, :hw, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _gn(x2d, m, scale, bias, num_groups, eps, silu):
    return _gn_fwd(x2d, m, scale, bias, num_groups, eps, silu)


def _ref(x2d, m, scale, bias, num_groups, eps, silu):
    from sdbc_tpu.ops import nn

    p = {"scale": scale.reshape(-1), "bias": bias.reshape(-1)}
    return nn.group_norm_ref(p, x2d, num_groups, eps,
                             act="silu" if silu else None)


def _gn_fwd_rule(x2d, m, scale, bias, num_groups, eps, silu):
    return _gn_fwd(x2d, m, scale, bias, num_groups, eps, silu), \
        (x2d, m, scale, bias)


def _gn_bwd_rule(num_groups, eps, silu, res, g):
    x2d, m, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _ref(x_, m, s_, b_, num_groups, eps, silu),
        x2d, scale, bias)
    dx, dscale, dbias = vjp(g)
    return dx, jnp.zeros_like(m), dscale, dbias


_gn.defvjp(_gn_fwd_rule, _gn_bwd_rule)


def eligible(x, num_groups: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    c = x.shape[-1]
    per_sample = (x.size // x.shape[0]) * 4  # fp32 working copy in VMEM
    return c % num_groups == 0 and per_sample <= _VMEM_BYTES_LIMIT


def fused_group_norm(p, x, num_groups: int = 32, eps: float = 1e-6,
                     act=None):
    """Drop-in for nn.group_norm when eligible() holds."""
    from sdbc_tpu.ops.nn import _group_onehot

    n, c = x.shape[0], x.shape[-1]
    x2d = x.reshape(n, -1, c)
    m = _group_onehot(c, num_groups)
    y = _gn(x2d, m, p["scale"].reshape(1, c).astype(jnp.float32),
            p["bias"].reshape(1, c).astype(jnp.float32),
            num_groups, eps, act == "silu")
    return y.reshape(x.shape)
