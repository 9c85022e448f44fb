"""AutoencoderKL — SD-1.x VAE, from scratch in functional JAX (NHWC).

Replaces ``diffusers.AutoencoderKL`` (reference finetune_sd.py:325-327 for
training-side ``vae.encode(...).latent_dist.sample() * 0.18215`` at :460-462,
and the pipeline-side decode).  Architecture per SD-1.x config: encoder with
block channels (128, 256, 512, 512) x 2 resnets + mid attention, decoder with
3 resnets per up block, latent_channels=4, GroupNorm(32), SiLU.

Encode returns a DiagonalGaussian (mean, logvar); ``sample`` draws with an
explicit JAX key.  The 0.18215 scaling is the caller's job, mirroring the
reference's call sites.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from sdbc_tpu.ops import nn
from sdbc_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215  # finetune_sd.py:462

    @staticmethod
    def sd15() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def sdxl() -> "VAEConfig":
        # same f8/4-channel architecture as SD-1.x; retrained weights ship
        # with scaling_factor 0.13025 in their diffusers config
        return VAEConfig(scaling_factor=0.13025)

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                         norm_groups=8)


# ---------------------------------------------------------------------------
# building blocks


def _init_resnet(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": nn.init_group_norm(cin),
        "conv1": nn.init_conv(k1, cin, cout, 3),
        "norm2": nn.init_group_norm(cout),
        "conv2": nn.init_conv(k2, cout, cout, 3),
    }
    if cin != cout:
        p["shortcut"] = nn.init_conv(k3, cin, cout, 1)
    return p


def _resnet(p, x, groups):
    h = nn.group_norm(p["norm1"], x, groups, act="silu")
    h = nn.conv2d(p["conv1"], h)
    h = nn.group_norm(p["norm2"], h, groups, act="silu")
    h = nn.conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = nn.conv2d(p["shortcut"], x)
    return x + h


def _init_attn(key, ch):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "norm": nn.init_group_norm(ch),
        "q": nn.init_linear(k1, ch, ch),
        "k": nn.init_linear(k2, ch, ch),
        "v": nn.init_linear(k3, ch, ch),
        "o": nn.init_linear(k4, ch, ch),
    }


def _attn(p, x, groups):
    """Single-head spatial self-attention at the VAE mid block."""
    n, h, w, c = x.shape
    y = nn.group_norm(p["norm"], x, groups).reshape(n, h * w, c)
    q = nn.linear(p["q"], y)[:, None]  # (N, 1 head, S, C)
    k = nn.linear(p["k"], y)[:, None]
    v = nn.linear(p["v"], y)[:, None]
    a = attention(q, k, v)[:, 0]
    return x + nn.linear(p["o"], a).reshape(n, h, w, c)


# ---------------------------------------------------------------------------
# init


def init(key, cfg: VAEConfig):
    keys = iter(jax.random.split(key, 256))
    ch = cfg.block_out_channels
    enc = {"conv_in": nn.init_conv(next(keys), cfg.in_channels, ch[0], 3)}
    down = []
    cin = ch[0]
    for i, cout in enumerate(ch):
        block = {"resnets": [_init_resnet(next(keys), cin if j == 0 else cout, cout)
                             for j in range(cfg.layers_per_block)]}
        if i < len(ch) - 1:
            block["downsample"] = nn.init_conv(next(keys), cout, cout, 3)
        down.append(block)
        cin = cout
    enc["down"] = down
    enc["mid"] = {
        "resnet1": _init_resnet(next(keys), ch[-1], ch[-1]),
        "attn": _init_attn(next(keys), ch[-1]),
        "resnet2": _init_resnet(next(keys), ch[-1], ch[-1]),
    }
    enc["norm_out"] = nn.init_group_norm(ch[-1])
    enc["conv_out"] = nn.init_conv(next(keys), ch[-1], 2 * cfg.latent_channels, 3)

    dec = {"conv_in": nn.init_conv(next(keys), cfg.latent_channels, ch[-1], 3)}
    dec["mid"] = {
        "resnet1": _init_resnet(next(keys), ch[-1], ch[-1]),
        "attn": _init_attn(next(keys), ch[-1]),
        "resnet2": _init_resnet(next(keys), ch[-1], ch[-1]),
    }
    up = []
    rev = list(reversed(ch))
    cin = rev[0]
    for i, cout in enumerate(rev):
        block = {"resnets": [_init_resnet(next(keys), cin if j == 0 else cout, cout)
                             for j in range(cfg.layers_per_block + 1)]}
        if i < len(rev) - 1:
            block["upsample"] = nn.init_conv(next(keys), cout, cout, 3)
        up.append(block)
        cin = cout
    dec["up"] = up
    dec["norm_out"] = nn.init_group_norm(rev[-1])
    dec["conv_out"] = nn.init_conv(next(keys), rev[-1], cfg.in_channels, 3)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": nn.init_conv(next(keys), 2 * cfg.latent_channels,
                                   2 * cfg.latent_channels, 1),
        "post_quant_conv": nn.init_conv(next(keys), cfg.latent_channels,
                                        cfg.latent_channels, 1),
    }


# ---------------------------------------------------------------------------
# apply


def prefer_chunked_encode(batch: int, h: int, w: int,
                          data_sharded=None) -> bool:
    """True when a per-image ``lax.map`` encode beats XLA's batched spatial
    tiling on one device (512²-class images, batch > 1 — measured 22.0 vs
     43.7 ms at micro-batch 2 on v5e, experiments/r2_vae_enc_chunk.py).

    Single definition shared by the trainer loss and the latent-cache
    builder so both encodes pick the same graph shape for the same inputs.
    ``data_sharded``: whether the batch axis is sharded over a mesh — the
    map would serialize what a sharded batched encode runs in parallel.
    Callers that know (the trainer knows its mesh) pass it; None falls back
    to the conservative device-count guess.
    """
    if data_sharded is None:
        data_sharded = jax.device_count() > 1
    return batch > 1 and h * w >= 262144 and not data_sharded


def encode_moments_chunked(params, x, cfg: "VAEConfig"):
    """``encode_moments`` computed image-by-image via ``lax.map``.

    The graph shape ``prefer_chunked_encode`` selects; one definition so
    the trainer loss and the latent-cache builder stay bit-equivalent by
    construction (the cache docstring's promise).
    """
    return jax.lax.map(
        lambda p: tuple(m[0] for m in encode_moments(params, p[None], cfg)),
        x)


def encode_moments(params, x, cfg: VAEConfig):
    """x: (N,H,W,3) in [-1,1] → (mean, logvar) each (N,H/8,W/8,latent)."""
    g = cfg.norm_groups
    enc = params["encoder"]
    h = nn.conv2d(enc["conv_in"], x)
    for block in enc["down"]:
        for r in block["resnets"]:
            h = _resnet(r, h, g)
        if "downsample" in block:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))  # asymmetric pad
            h = nn.conv2d(block["downsample"], h, stride=2, padding="VALID")
    h = _resnet(enc["mid"]["resnet1"], h, g)
    h = _attn(enc["mid"]["attn"], h, g)
    h = _resnet(enc["mid"]["resnet2"], h, g)
    h = nn.group_norm(enc["norm_out"], h, g, act="silu")
    h = nn.conv2d(enc["conv_out"], h)
    moments = nn.conv2d(params["quant_conv"], h)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def sample(mean, logvar, key):
    """Reparameterised draw from the diagonal Gaussian posterior."""
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(key, mean.shape, jnp.float32)
    return (mean.astype(jnp.float32) + std * eps).astype(mean.dtype)


def encode(params, x, key, cfg: VAEConfig):
    mean, logvar = encode_moments(params, x, cfg)
    return sample(mean, logvar, key)


def decode(params, z, cfg: VAEConfig):
    """z: (N,h,w,latent) (already un-scaled by caller) → (N,8h,8w,3) in [-1,1]."""
    g = cfg.norm_groups
    dec = params["decoder"]
    h = nn.conv2d(params["post_quant_conv"], z)
    h = nn.conv2d(dec["conv_in"], h)
    h = _resnet(dec["mid"]["resnet1"], h, g)
    h = _attn(dec["mid"]["attn"], h, g)
    h = _resnet(dec["mid"]["resnet2"], h, g)
    for block in dec["up"]:
        for r in block["resnets"]:
            h = _resnet(r, h, g)
        if "upsample" in block:
            h = nn.upsample_nearest_2x(h)
            h = nn.conv2d(block["upsample"], h)
    h = nn.group_norm(dec["norm_out"], h, g, act="silu")
    return nn.conv2d(dec["conv_out"], h)
