"""Independent NumPy implementation of the diffusers-0.7.2 UNet/VAE math.

This is the SECOND implementation demanded by the round-1 VERDICT (item 2):
written directly from the diffusers 0.7.2 block equations — ResnetBlock2D,
Transformer2DModel/BasicTransformerBlock, CrossAttention, GEGLU,
Down/Upsample2D, get_timestep_embedding, Encoder/Decoder/AttentionBlock —
sharing NO code with sdbc_tpu (pure NumPy, fp64).  It consumes the
framework's parameter tree (weights are just data; HWIO convs, (in,out)
linears) but derives every equation independently, so a framework divergence
in GEGLU split order, attention scaling, GroupNorm eps, skip ordering, or
time-embedding layout fails the comparison tests in test_numpy_mirror.py.

diffusers-0.7.2 semantics encoded here:
  - UNet2DConditionModel: norm_eps=1e-5 for ResnetBlock2D and conv_norm_out;
    Transformer2DModel's GroupNorm is hardcoded eps=1e-6; LayerNorm eps=1e-5
    (torch default); attention scale = head_dim**-0.5; GEGLU = Linear(d,8d)
    chunked into (value, gate) with EXACT erf GELU on the gate;
    get_timestep_embedding(flip_sin_to_cos=True, downscale_freq_shift=0)
    → [cos | sin]; Downsample2D = 3x3 conv stride 2 pad 1; Upsample2D =
    nearest 2x + 3x3 conv; skip stack = [conv_in] + every (resnet[+attn])
    output + every downsample output, popped from the end by up blocks of
    layers_per_block+1 resnets each.
  - AutoencoderKL: resnet_eps=1e-6 everywhere, asymmetric ((0,1),(0,1))
    pad + VALID stride-2 conv in the encoder downsample, AttentionBlock =
    single-head with biased q/k/v and scale (C/heads)**-0.5, residual add.
"""
from __future__ import annotations

import math

import numpy as np
from scipy.special import erf


# ---------------------------------------------------------------------------
# primitive ops (all fp64)


def _np(x):
    return np.asarray(x, np.float64)


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu_exact(x):
    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def linear(p, x):
    y = x @ _np(p["w"])
    if "b" in p:
        y = y + _np(p["b"])
    return y


def conv2d(p, x, stride=1, pad=1):
    """NHWC x HWIO conv via im2col.  pad: int (symmetric) or ((t,b),(l,r))."""
    w = _np(p["w"])
    kh, kw, cin, cout = w.shape
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    xp = np.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    n, hp, wp, _ = xp.shape
    ho = (hp - kh) // stride + 1
    wo = (wp - kw) // stride + 1
    cols = np.empty((n, ho, wo, kh, kw, cin), np.float64)
    for i in range(kh):
        for j in range(kw):
            cols[:, :, :, i, j, :] = xp[:, i:i + ho * stride:stride,
                                        j:j + wo * stride:stride, :]
    y = np.einsum("nhwijc,ijco->nhwo", cols, w)
    if "b" in p:
        y = y + _np(p["b"])
    return y


def group_norm(p, x, groups, eps):
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    xf = x.reshape(n, -1, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) / np.sqrt(var + eps)
    return xf.reshape((n,) + spatial + (c,)) * _np(p["scale"]) + _np(p["bias"])


def layer_norm(p, x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * _np(p["scale"]) + _np(p["bias"])


def softmax(x):
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def attention(q, k, v, scale):
    """(B, H, S, D) scaled-dot-product attention."""
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    return np.einsum("bhqk,bhkd->bhqd", softmax(logits), v)


def multi_head_attention(p, x, ctx, heads):
    """diffusers CrossAttention: per-head scale, no q/k/v bias, out proj."""
    b, s, dim = x.shape
    hd = dim // heads

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    q = split(linear(p["q"], x))
    k = split(linear(p["k"], ctx))
    v = split(linear(p["v"], ctx))
    a = attention(q, k, v, hd ** -0.5)
    a = a.transpose(0, 2, 1, 3).reshape(b, s, dim)
    return linear(p["o"], a)


def timestep_embedding(t, dim, max_period=10000.0):
    """get_timestep_embedding with flip_sin_to_cos=True, freq_shift=0."""
    half = dim // 2
    freqs = np.exp(-math.log(max_period) * np.arange(half) / half)
    args = _np(t)[:, None] * freqs[None, :]
    return np.concatenate([np.cos(args), np.sin(args)], axis=-1)


# ---------------------------------------------------------------------------
# diffusers UNet2DConditionModel blocks


def resnet_block(p, x, temb, groups):
    """ResnetBlock2D, UNet config: eps=1e-5, silu, temb added after conv1."""
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups, 1e-5)))
    h = h + linear(p["temb"], silu(temb))[:, None, None, :]
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups, 1e-5)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, pad=0)
    return x + h


def transformer_block(p, x, ctx, heads, groups):
    """Transformer2DModel: GN(eps=1e-6) → 1x1 proj_in → BasicTransformerBlock
    (self-attn, cross-attn, GEGLU-FF, each pre-LayerNorm residual) →
    1x1 proj_out → residual."""
    n, h, w, c = x.shape
    residual = x
    y = conv2d(p["proj_in"], group_norm(p["norm"], x, groups, 1e-6), pad=0)
    y = y.reshape(n, h * w, c)

    yn = layer_norm(p["ln1"], y)
    y = y + multi_head_attention(p["attn1"], yn, yn, heads)
    y = y + multi_head_attention(p["attn2"], layer_norm(p["ln2"], y), ctx,
                                 heads)
    z = linear(p["geglu"], layer_norm(p["ln3"], y))
    value, gate = z[..., : z.shape[-1] // 2], z[..., z.shape[-1] // 2:]
    y = y + linear(p["ff_out"], value * gelu_exact(gate))

    y = conv2d(p["proj_out"], y.reshape(n, h, w, c), pad=0)
    return y + residual


def unet_forward(params, latents, timesteps, ctx, cfg):
    """UNet2DConditionModel.forward (0.7.2) in NumPy.

    cfg needs: block_out_channels, layers_per_block, attention_heads,
    norm_groups, cross_attn_blocks, time_embed_dim.
    """
    g = cfg.norm_groups
    heads = cfg.attention_heads
    x = _np(latents)
    ctx = _np(ctx)

    temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
    temb = linear(params["time_mlp"]["fc2"],
                  silu(linear(params["time_mlp"]["fc1"], temb)))

    h = conv2d(params["conv_in"], x)
    skips = [h]
    for i, blk in enumerate(params["down"]):
        for j, r in enumerate(blk["resnets"]):
            h = resnet_block(r, h, temb, g)
            if cfg.cross_attn_blocks[i]:
                h = transformer_block(blk["attns"][j], h, ctx, heads, g)
            skips.append(h)
        if "downsample" in blk:
            h = conv2d(blk["downsample"], h, stride=2, pad=1)
            skips.append(h)

    h = resnet_block(params["mid"]["resnet1"], h, temb, g)
    h = transformer_block(params["mid"]["attn"], h, ctx, heads, g)
    h = resnet_block(params["mid"]["resnet2"], h, temb, g)

    rev_cross = list(reversed(cfg.cross_attn_blocks))
    for i, blk in enumerate(params["up"]):
        for j, r in enumerate(blk["resnets"]):
            h = np.concatenate([h, skips.pop()], axis=-1)
            h = resnet_block(r, h, temb, g)
            if rev_cross[i]:
                h = transformer_block(blk["attns"][j], h, ctx, heads, g)
        if "upsample" in blk:
            h = np.repeat(np.repeat(h, 2, axis=1), 2, axis=2)  # nearest 2x
            h = conv2d(blk["upsample"], h)

    h = silu(group_norm(params["norm_out"], h, g, 1e-5))
    return conv2d(params["conv_out"], h)


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL


def vae_resnet(p, x, groups):
    h = conv2d(p["conv1"], silu(group_norm(p["norm1"], x, groups, 1e-6)))
    h = conv2d(p["conv2"], silu(group_norm(p["norm2"], h, groups, 1e-6)))
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, pad=0)
    return x + h


def vae_attention(p, x, groups):
    """AttentionBlock (0.7.2): single head, biased q/k/v, scale C**-0.5."""
    n, h, w, c = x.shape
    y = group_norm(p["norm"], x, groups, 1e-6).reshape(n, h * w, c)
    q = linear(p["q"], y)[:, None]
    k = linear(p["k"], y)[:, None]
    v = linear(p["v"], y)[:, None]
    a = attention(q, k, v, c ** -0.5)[:, 0]
    return x + linear(p["o"], a).reshape(n, h, w, c)


def vae_encode_moments(params, x, cfg):
    g = cfg.norm_groups
    enc = params["encoder"]
    h = conv2d(enc["conv_in"], _np(x))
    for blk in enc["down"]:
        for r in blk["resnets"]:
            h = vae_resnet(r, h, g)
        if "downsample" in blk:
            # Downsample2D(padding=0) with F.pad (0,1,0,1): bottom/right pad
            h = conv2d(blk["downsample"], h, stride=2, pad=((0, 1), (0, 1)))
    h = vae_resnet(enc["mid"]["resnet1"], h, g)
    h = vae_attention(enc["mid"]["attn"], h, g)
    h = vae_resnet(enc["mid"]["resnet2"], h, g)
    h = conv2d(enc["conv_out"], silu(group_norm(enc["norm_out"], h, g, 1e-6)))
    moments = conv2d(params["quant_conv"], h, pad=0)
    c = moments.shape[-1] // 2
    mean, logvar = moments[..., :c], moments[..., c:]
    return mean, np.clip(logvar, -30.0, 20.0)


def vae_decode(params, z, cfg):
    g = cfg.norm_groups
    dec = params["decoder"]
    h = conv2d(params["post_quant_conv"], _np(z), pad=0)
    h = conv2d(dec["conv_in"], h)
    h = vae_resnet(dec["mid"]["resnet1"], h, g)
    h = vae_attention(dec["mid"]["attn"], h, g)
    h = vae_resnet(dec["mid"]["resnet2"], h, g)
    for blk in dec["up"]:
        for r in blk["resnets"]:
            h = vae_resnet(r, h, g)
        if "upsample" in blk:
            h = np.repeat(np.repeat(h, 2, axis=1), 2, axis=2)
            h = conv2d(blk["upsample"], h)
    return conv2d(dec["conv_out"], silu(group_norm(dec["norm_out"], h, g,
                                                   1e-6)))
