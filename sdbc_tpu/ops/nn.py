"""NN primitives: functional init/apply with explicit param pytrees.

Everything is NHWC (TPU-native conv layout; XLA tiles NHWC convs onto the MXU
directly) and dtype-polymorphic: params are stored fp32 and cast to the compute
dtype at apply time by the caller (see utils.dtypes.Policy).

These replace the torch/diffusers layers the reference gets from its deps
(SURVEY.md §2.2): nn.Linear, nn.Conv2d, nn.GroupNorm, nn.LayerNorm,
nn.Embedding, SiLU/GELU, and the diffusers sinusoidal timestep embedding.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# initialisers


def _fan_in_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch-style kaiming-uniform(a=sqrt(5)) default init: U(-1/sqrt(fan_in), +)."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# linear


def init_linear(key, in_dim: int, out_dim: int, use_bias: bool = True, dtype=jnp.float32):
    # DELIBERATE deviation from torch nn.Linear's kaiming-uniform default:
    # normal/sqrt(fan_in) weights + zero bias.  Real runs always port
    # pretrained weights (models/port.py), so init parity is immaterial to
    # reference behavior, and the golden-activation fixtures pin this
    # stream.  (bk reserved: consuming it would shift every init draw.)
    wk, bk = jax.random.split(key)
    del bk
    scale = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.normal(wk, (in_dim, out_dim), dtype) * scale}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(p, x):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# conv2d (NHWC, HWIO)


def init_conv(key, in_ch: int, out_ch: int, kernel: int = 3, use_bias: bool = True,
              dtype=jnp.float32):
    wk, bk = jax.random.split(key)
    fan_in = in_ch * kernel * kernel
    p = {"w": _fan_in_uniform(wk, (kernel, kernel, in_ch, out_ch), fan_in, dtype)}
    if use_bias:
        p["b"] = _fan_in_uniform(bk, (out_ch,), fan_in, dtype)
    return p


def conv2d(p, x, stride: int = 1, padding="SAME"):
    """NHWC conv. padding: 'SAME' | 'VALID' | int | ((t,b),(l,r)).

    Stays on XLA's native conv: measured 147 TF/s at the VAE tail shapes
    (experiments/PERF_NOTES.md round 2) — a Pallas conv cannot beat that,
    and the shifted-9-matmul formulation measured 3x slower.
    """
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# norms


def init_group_norm(num_channels: int, dtype=jnp.float32):
    return {"scale": jnp.ones((num_channels,), dtype),
            "bias": jnp.zeros((num_channels,), dtype)}


def group_norm_ref(p, x, num_groups: int = 32, eps: float = 1e-6,
                   act: Optional[str] = None):
    """Reference GroupNorm (4D-reshape formulation); used by tests."""
    orig_dtype = x.dtype
    n, c = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape((n,) + spatial + (c,))
    y = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    if act == "silu":
        y = jax.nn.silu(y)
    elif act is not None:
        raise ValueError(f"unknown act {act}")
    return y.astype(orig_dtype)


@functools.lru_cache(maxsize=64)
def _group_onehot_np(c: int, g: int):
    """(C, G) 0/1 group-membership matrix (channel ch → group ch // (C/G)).

    Cached as NUMPY (a cached jnp constant created inside one trace would
    leak that trace's tracer into later ones).
    """
    import numpy as _np

    m = _np.zeros((c, g), _np.float32)
    cpg = c // g
    for ch in range(c):
        m[ch, ch // cpg] = 1.0
    return m


def _group_onehot(c: int, g: int):
    return jnp.asarray(_group_onehot_np(c, g))


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-6,
               act: Optional[str] = None):
    """GroupNorm over channel groups of an NHWC (or N...C) tensor.

    TPU formulation: group statistics via one-hot matmuls on the MXU
    (einsum over spatial+channel) instead of a 4D lane-splitting reshape —
    the reshape forced layout changes that showed up as ~17% of sampling
    device time in the profile.  fp32 statistics, optional fused SiLU.
    SDBC_GN_FUSED=1 routes VMEM-sized tensors through the single-HBM-pass
    Pallas kernel (ops/pallas_groupnorm.py) — measured slightly SLOWER than
    XLA's own fusion on v5e (3.18 vs 2.96 ms at (8,64,64,320)), so off by
    default; kept as an implementation option.
    """
    import os

    if act in (None, "silu") and os.environ.get("SDBC_GN_FUSED", "0") == "1":
        from sdbc_tpu.ops import pallas_groupnorm as pgn

        if pgn.eligible(x, num_groups):
            return pgn.fused_group_norm(p, x, num_groups, eps, act)
    orig_dtype = x.dtype
    n, c = x.shape[0], x.shape[-1]
    g = num_groups
    cpg = c // g
    count = (x.size // (n * c)) * cpg  # elements per (sample, group)

    x2d = x.reshape(n, -1, c)
    m = _group_onehot(c, g)
    xf = x2d.astype(jnp.float32)
    s1 = jnp.einsum("nhc,cg->ng", xf, m)            # group sums
    s2 = jnp.einsum("nhc,cg->ng", xf * xf, m)       # group sum-squares
    mean_g = s1 / count
    var_g = jnp.maximum(s2 / count - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    # per-channel affine folded with the group stats: y = x*a_c + b_c
    scale = p["scale"].astype(jnp.float32)
    bias = p["bias"].astype(jnp.float32)
    a_c = jnp.einsum("ng,cg->nc", inv_g, m) * scale[None]
    b_c = bias[None] - jnp.einsum("ng,cg->nc", mean_g * inv_g, m) * scale[None]
    y = xf * a_c[:, None, :] + b_c[:, None, :]
    if act == "silu":
        y = jax.nn.silu(y)
    elif act is not None:
        raise ValueError(f"unknown act {act}")
    return y.astype(orig_dtype).reshape(x.shape)


def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(p, x, eps: float = 1e-5):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# embedding


def init_embedding(key, vocab: int, dim: int, dtype=jnp.float32):
    return {"table": jax.random.normal(key, (vocab, dim), dtype) * 0.02}


def embedding(p, ids):
    return jnp.take(p["table"], ids, axis=0)


# ---------------------------------------------------------------------------
# activations


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


silu = jax.nn.silu
gelu = jax.nn.gelu


# ---------------------------------------------------------------------------
# timestep embedding (SD UNet)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, downscale_freq_shift: float = 0.0,
                       dtype=jnp.float32):
    """Sinusoidal timestep embedding, diffusers Timesteps semantics.

    SD-1.x UNet uses flip_sin_to_cos=True, downscale_freq_shift=0 → [cos | sin].
    t: (B,) int/float timesteps → (B, dim).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


# ---------------------------------------------------------------------------
# resampling (UNet/VAE up & down blocks)


def upsample_nearest_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def avg_pool_2x(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0
