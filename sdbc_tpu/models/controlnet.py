"""ControlNet — spatially-conditioned SD denoising, from scratch in JAX (NHWC).

Beyond-reference model family (arXiv:2302.05543; the reference pins plain
SD-1.5, finetune_sd.py:322-336).  A ControlNet is a trainable copy of the
UNet's encoder half (conv_in + down blocks + mid block) that reads an extra
spatial conditioning image (edges, depth, pose, ...) and injects per-skip
residuals into the frozen base UNet through zero-initialised 1x1 convs, so
training starts as an exact no-op on the base model.

Layout mirrors ``models.unet`` (same block dicts, so ``from_unet`` is a
plain subtree copy), plus:

- ``cond_embedding``: a small strided conv stack mapping the (N, H, W, 3)
  conditioning image in [0, 1] down to latent resolution at
  ``block_out_channels[0]`` width.  One stride-2 conv per entry-pair of
  ``conditioning_channels`` — its length must match the VAE's downscale
  factor (SD-1.5: (16, 32, 96, 256) = 3 halvings = f8).  The final
  projection conv is zero-initialised.
- ``zero_down`` / ``zero_mid``: zero-initialised 1x1 convs, one per UNet
  skip tensor plus one for the mid output.

TPU notes: the conditioning embedding depends only on the control image,
so the sampling loop hoists it (``embed_cond`` once, ``apply`` per step) —
the per-step cost is the encoder half only.  All convs are NHWC on XLA's
native conv path; attention goes through the same Pallas flash kernels as
the base UNet.
"""
from __future__ import annotations

import dataclasses

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sdbc_tpu.models import unet as unet_mod
from sdbc_tpu.ops import nn


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    unet: unet_mod.UNetConfig = dataclasses.field(
        default_factory=unet_mod.UNetConfig)
    # channel ramp of the conditioning embedder; len-1 stride-2 convs ⇒ the
    # spatial reduction must equal the VAE scale (8 for SD: 512² → 64²)
    conditioning_channels: Tuple[int, ...] = (16, 32, 96, 256)

    @property
    def spatial_reduction(self) -> int:
        return 2 ** (len(self.conditioning_channels) - 1)

    @staticmethod
    def sd15() -> "ControlNetConfig":
        return ControlNetConfig()

    @staticmethod
    def tiny() -> "ControlNetConfig":
        # tiny pipeline uses a 2-level VAE (f2) ⇒ one stride-2 conv
        return ControlNetConfig(unet=unet_mod.UNetConfig.tiny(),
                                conditioning_channels=(8, 16))


def _zero_conv(in_ch: int, out_ch: int, kernel: int = 1):
    return {"w": jnp.zeros((kernel, kernel, in_ch, out_ch), jnp.float32),
            "b": jnp.zeros((out_ch,), jnp.float32)}


def num_skips(cfg: unet_mod.UNetConfig) -> int:
    """conv_in + one per down-block resnet + one per downsample."""
    n = 1
    for i in range(len(cfg.block_out_channels)):
        n += cfg.layers_per_block
        if i < len(cfg.block_out_channels) - 1:
            n += 1
    return n


def _skip_channels(cfg: unet_mod.UNetConfig):
    ch = cfg.block_out_channels
    out = [ch[0]]
    for i, cout in enumerate(ch):
        out.extend([cout] * cfg.layers_per_block)
        if i < len(ch) - 1:
            out.append(cout)
    return out


def _init_cond_embedding(key, cfg: ControlNetConfig):
    cc = cfg.conditioning_channels
    keys = iter(jax.random.split(key, 2 * len(cc) + 2))
    p = {"conv_in": nn.init_conv(next(keys), 3, cc[0], 3), "blocks": []}
    for i in range(len(cc) - 1):
        p["blocks"].append(nn.init_conv(next(keys), cc[i], cc[i], 3))
        p["blocks"].append(nn.init_conv(next(keys), cc[i], cc[i + 1], 3))
    # zero-init: a fresh ControlNet starts as an exact no-op on the base
    p["conv_out"] = _zero_conv(cc[-1], cfg.unet.block_out_channels[0], 3)
    return p


def init(key, cfg: ControlNetConfig):
    """Fresh ControlNet: encoder half randomly initialised (use ``from_unet``
    to start from a base checkpoint — the arXiv:2302.05543 protocol)."""
    ucfg = cfg.unet
    ku, kc = jax.random.split(key)
    base = unet_mod.init(ku, ucfg)
    p = {
        "conv_in": base["conv_in"],
        "time_mlp": base["time_mlp"],
        "down": base["down"],
        "mid": base["mid"],
        "cond_embedding": _init_cond_embedding(kc, cfg),
        "zero_down": [_zero_conv(c, c) for c in _skip_channels(ucfg)],
        "zero_mid": _zero_conv(ucfg.block_out_channels[-1],
                               ucfg.block_out_channels[-1]),
    }
    if "add_mlp" in base:  # SDXL text_time addition embedding
        p["add_mlp"] = base["add_mlp"]
    return p


def from_unet(unet_params, key, cfg: ControlNetConfig):
    """Clone the encoder half of a trained base UNet (zero convs stay zero):
    the standard ControlNet training start — the injected residuals are
    exactly zero, so step 0 reproduces the base model bit-for-bit."""
    ucfg = cfg.unet
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    p = {
        "conv_in": copy(unet_params["conv_in"]),
        "time_mlp": copy(unet_params["time_mlp"]),
        "down": copy(unet_params["down"]),
        "mid": copy(unet_params["mid"]),
        "cond_embedding": _init_cond_embedding(key, cfg),
        "zero_down": [_zero_conv(c, c) for c in _skip_channels(ucfg)],
        "zero_mid": _zero_conv(ucfg.block_out_channels[-1],
                               ucfg.block_out_channels[-1]),
    }
    if "add_mlp" in unet_params:  # SDXL: the branch conditions like the base
        p["add_mlp"] = copy(unet_params["add_mlp"])
    return p


def embed_cond(params, control_image, cfg: ControlNetConfig):
    """(N, H, W, 3) control image in [0, 1] → (N, h, w, ch0) latent-res map.

    Depends only on the control image: sampling hoists this out of the
    denoise loop entirely (the diffusers ControlNetModel recomputes it
    every step — pure waste under a fixed conditioning image).
    """
    ce = params["cond_embedding"]
    x = control_image
    if x.shape[-1] != 3:
        raise ValueError(f"control image must be (N, H, W, 3), got {x.shape}")
    x = jax.nn.silu(nn.conv2d(ce["conv_in"], x))
    for i in range(0, len(ce["blocks"]), 2):
        x = jax.nn.silu(nn.conv2d(ce["blocks"][i], x))
        x = jax.nn.silu(nn.conv2d(ce["blocks"][i + 1], x, stride=2,
                                  padding=1))
    return nn.conv2d(ce["conv_out"], x)


def edge_hint(pixels):
    """In-graph Sobel-edge conditioning hint: (N,H,W,3) in [-1,1] → [0,1].

    The standard ControlNet recipe derives the training hint from the
    target image with an offline edge detector (canny in
    arXiv:2302.05543 §5); on TPU a fixed-weight Sobel magnitude is the
    graph-native equivalent — two 3x3 convs that XLA fuses into the step,
    so the input pipeline ships no extra per-example data.  Per-image
    max-normalised, replicated to 3 channels (the conditioning-image
    convention of ``embed_cond``).
    """
    gray = jnp.mean(pixels.astype(jnp.float32), axis=-1, keepdims=True)
    gray = gray * 0.5 + 0.5
    kx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]],
                   jnp.float32).reshape(3, 3, 1, 1)
    ky = jnp.transpose(kx, (1, 0, 2, 3))
    conv = lambda k: jax.lax.conv_general_dilated(
        gray, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mag = jnp.sqrt(conv(kx) ** 2 + conv(ky) ** 2)
    peak = jnp.max(mag, axis=(1, 2, 3), keepdims=True)
    mag = mag / jnp.maximum(peak, 1e-6)
    return jnp.broadcast_to(mag, mag.shape[:-1] + (3,))


def training_hint(pixels, kind: str):
    """Hint derivation for ControlNet training (see TrainConfig.control_hint):
    'edges' = Sobel magnitude; 'image' = the target image itself in [0, 1]
    (a recolorize/reconstruct conditioning, also the cheap test mode)."""
    if kind == "edges":
        return edge_hint(pixels)
    if kind == "image":
        return pixels.astype(jnp.float32) * 0.5 + 0.5
    raise ValueError(f"unknown control hint {kind!r} (edges | image)")


def precompute_temb(params, timesteps, cfg: ControlNetConfig,
                    dtype=jnp.bfloat16, added_cond=None):
    """unet.precompute_temb for the encoder-half tree (down + mid only).

    ``added_cond`` (SDXL, required iff cfg.unet.addition_embed_dim): same
    semantics as unet.precompute_temb — tables become (T, N, 1, 1, cout).
    """
    ucfg = cfg.unet
    if (added_cond is None) != (not ucfg.addition_embed_dim):
        raise ValueError("precompute_temb: added_cond must be passed exactly "
                         "when cfg.unet.addition_embed_dim is set")
    temb = unet_mod._temb_mlp(params, timesteps,
                              ucfg.block_out_channels[0], dtype)
    if added_cond is not None:
        aug = nn.linear(params["add_mlp"]["fc2"], jax.nn.silu(
            nn.linear(params["add_mlp"]["fc1"],
                      added_cond.astype(jnp.float32))))
        temb = temb[:, None, :] + aug[None].astype(temb.dtype)  # (T, N, ted)
    st = jax.nn.silu(temb)

    def proj(r):
        out = nn.linear(r["temb"], st)   # (T, cout) or (T, N, cout)
        if added_cond is not None:       # → (T, N, 1, 1, cout), as unet's
            out = out[:, :, None, None]
        return out

    return {"down": [{"resnets": [proj(r) for r in blk["resnets"]]}
                     for blk in params["down"]],
            "mid": {"resnet1": proj(params["mid"]["resnet1"]),
                    "resnet2": proj(params["mid"]["resnet2"])}}


def apply(params, latents, timesteps, encoder_hidden_states, cond_emb,
          cfg: ControlNetConfig, *, conditioning_scale: float = 1.0,
          remat: bool = False, attn_impl: str = "auto", temb_proj=None,
          added_cond=None):
    """Encoder-half forward → (down_residuals tuple, mid_residual).

    cond_emb: precomputed ``embed_cond`` output (latent-res).  Residuals are
    ordered exactly like the base UNet's skip appends (conv_in, then each
    down-block resnet, then each downsample) and are consumed by
    ``unet.apply(..., control_residuals=...)``.

    ``added_cond`` (SDXL): the (N, addition_embed_dim) text_time vector,
    required iff the UNet config sets ``addition_embed_dim`` and no
    ``temb_proj`` is given (the hoisted tables already bake it in) — the
    branch conditions its ResBlocks exactly like the base UNet.
    """
    if temb_proj is None and (added_cond is None) != \
            (not cfg.unet.addition_embed_dim):
        raise ValueError(
            "added_cond must be passed exactly when "
            "cfg.unet.addition_embed_dim is set (SDXL ControlNet)")
    if added_cond is not None and temb_proj is not None:
        raise ValueError("added_cond is already baked into temb_proj tables "
                         "(precompute_temb added_cond) — pass only one")
    ucfg = cfg.unet
    g = ucfg.norm_groups
    nheads = ucfg.heads_per_level
    ctx = encoder_hidden_states

    res_fn = unet_mod._resnet
    attn_fn = functools.partial(unet_mod._transformer, attn_impl=attn_impl)
    if remat:
        res_fn = jax.checkpoint(unet_mod._resnet, static_argnums=(3,))
        ckpt_tfm = jax.checkpoint(unet_mod._transformer,
                                  static_argnums=(3, 4, 5))
        attn_fn = (lambda p, x, c, h, grp:
                   ckpt_tfm(p, x, c, h, grp, attn_impl))

    if temb_proj is None:
        temb = unet_mod._temb_mlp(params, timesteps,
                                  ucfg.block_out_channels[0], latents.dtype)
        if added_cond is not None:
            aug = nn.linear(params["add_mlp"]["fc2"], jax.nn.silu(
                nn.linear(params["add_mlp"]["fc1"],
                          added_cond.astype(jnp.float32))))
            temb = temb + aug.astype(temb.dtype)
        tp_down = [{"resnets": [None] * len(b["resnets"])}
                   for b in params["down"]]
        tp_mid = {"resnet1": None, "resnet2": None}
    else:
        temb = None
        tp_down, tp_mid = temb_proj["down"], temb_proj["mid"]

    h = nn.conv2d(params["conv_in"], latents) + cond_emb.astype(latents.dtype)
    skips = [h]
    for i, (blk, tp) in enumerate(zip(params["down"], tp_down)):
        for j, r in enumerate(blk["resnets"]):
            h = res_fn(r, h, temb, g, tp["resnets"][j])
            if blk["attns"]:
                h = attn_fn(blk["attns"][j], h, ctx, nheads[i], g)
            skips.append(h)
        if "downsample" in blk:
            h = nn.conv2d(blk["downsample"], h, stride=2, padding=1)
            skips.append(h)

    h = res_fn(params["mid"]["resnet1"], h, temb, g, tp_mid["resnet1"])
    h = attn_fn(params["mid"]["attn"], h, ctx, nheads[-1], g)
    h = res_fn(params["mid"]["resnet2"], h, temb, g, tp_mid["resnet2"])

    s = jnp.asarray(conditioning_scale, latents.dtype)
    down_res = tuple(nn.conv2d(z, sk) * s
                     for z, sk in zip(params["zero_down"], skips))
    mid_res = nn.conv2d(params["zero_mid"], h) * s
    return down_res, mid_res
