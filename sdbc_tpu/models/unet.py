"""UNet2DCondition — SD-1.x denoiser, from scratch in functional JAX (NHWC).

Replaces ``diffusers.UNet2DConditionModel`` (reference finetune_sd.py:328-330;
hot call ``unet(noisy_latents, t, encoder_hidden_states).sample`` at :480-481).

SD-1.x architecture: conv_in(4→320); sinusoidal time embedding 320→MLP→1280;
down path CrossAttnDownBlock(320) / CrossAttnDownBlock(640) /
CrossAttnDownBlock(1280) / DownBlock(1280), two ResBlocks each + spatial
transformer (8-head self-attn + cross-attn on 768-d CLIP states + GEGLU FF)
after every ResBlock in cross blocks; mid ResBlock/transformer/ResBlock; up
path mirrored with three ResBlocks per block consuming skip connections;
GroupNorm(32)+SiLU head conv to 4 channels.

TPU notes: everything is NHWC; the spatial attention goes through
ops.attention (Pallas flash kernel on TPU); gradient checkpointing
(reference finetune_sd.py:388-389) is `jax.checkpoint` around each ResBlock /
transformer via ``remat=True``.
"""
from __future__ import annotations

import dataclasses
import functools
import os

from typing import Tuple

import jax
import jax.numpy as jnp

from sdbc_tpu.ops import nn
from sdbc_tpu.ops import geglu_ff as geglu_ff_mod
from sdbc_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    # int = same head count at every level (SD-1.x); tuple = per-level head
    # counts (SD-2.x keeps head_dim=64, so heads vary with the channel width)
    attention_heads: int | Tuple[int, ...] = 8
    norm_groups: int = 32
    # which blocks carry cross-attention transformers (SD-1.x: all but deepest)
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    # transformer blocks per spatial transformer (diffusers
    # transformer_layers_per_block).  int = same everywhere (SD-1/2: 1);
    # tuple = per level (SDXL: (1, 2, 10) — entries for no-attention levels
    # are ignored).  The mid transformer uses the deepest level's entry.
    transformer_depth: int | Tuple[int, ...] = 1
    # SDXL "text_time" addition embedding: when set, ``apply`` expects an
    # ``added_cond`` (N, addition_embed_dim) vector — concat(pooled text
    # embed, Fourier(micro-conditioning time_ids)) — run through its own
    # 2-layer MLP and added to the timestep embedding.  SDXL-base: 2816
    # (= 1280 pooled + 6 ids × 256 Fourier features).
    addition_embed_dim: int | None = None
    addition_time_embed_dim: int = 256

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def depth_per_level(self) -> Tuple[int, ...]:
        d = self.transformer_depth
        if isinstance(d, (tuple, list)):
            if len(d) != len(self.block_out_channels):
                raise ValueError(
                    f"transformer_depth {d} must have one entry per block "
                    f"({len(self.block_out_channels)})")
            return tuple(d)
        return (d,) * len(self.block_out_channels)

    @property
    def heads_per_level(self) -> Tuple[int, ...]:
        """attention_heads normalized to one head count per resolution level."""
        h = self.attention_heads
        if isinstance(h, (tuple, list)):
            if len(h) != len(self.block_out_channels):
                raise ValueError(
                    f"attention_heads {h} must have one entry per block "
                    f"({len(self.block_out_channels)})")
            return tuple(h)
        return (h,) * len(self.block_out_channels)

    @staticmethod
    def sd15() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def sd21() -> "UNetConfig":
        # SD-2.x: head_dim fixed at 64 → heads per level (5,10,20,20) over
        # the (320,640,1280,1280) widths; OpenCLIP ViT-H context dim 1024
        return UNetConfig(cross_attention_dim=1024,
                          attention_heads=(5, 10, 20, 20))

    @staticmethod
    def sdxl() -> "UNetConfig":
        # SDXL-base: 3 levels, no attention at full resolution, transformer
        # depth (–, 2, 10), head_dim 64 → (5, 10, 20) heads, 2048-d context
        # (CLIP-L 768 ⧺ OpenCLIP-bigG 1280), text_time addition embedding
        # (1280 pooled + 6×256 Fourier = 2816)
        return UNetConfig(block_out_channels=(320, 640, 1280),
                          cross_attention_dim=2048,
                          attention_heads=(5, 10, 20),
                          cross_attn_blocks=(False, True, True),
                          transformer_depth=(1, 2, 10),
                          addition_embed_dim=2816)

    @staticmethod
    def sdxl_refiner() -> "UNetConfig":
        # SDXL-refiner: 4 levels, attention on the middle two, uniform
        # transformer depth 4, head_dim 64 → (6, 12, 24, 24) heads,
        # 1280-d context (OpenCLIP-bigG ONLY — no CLIP-L), text_time
        # addition embedding of 2560 (= 1280 pooled + 5×256: orig size,
        # crop, AESTHETIC SCORE instead of target size)
        return UNetConfig(block_out_channels=(384, 768, 1536, 1536),
                          cross_attention_dim=1280,
                          attention_heads=(6, 12, 24, 24),
                          cross_attn_blocks=(False, True, True, False),
                          transformer_depth=4,
                          addition_embed_dim=2560)

    @staticmethod
    def tiny() -> "UNetConfig":
        return UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                          cross_attention_dim=32, attention_heads=4,
                          norm_groups=8, cross_attn_blocks=(True, False))

    @staticmethod
    def tiny_xl() -> "UNetConfig":
        # exercises every SDXL-specific path at toy scale: a no-attention
        # level, depth-2 stacked transformer blocks, the addition embedding.
        # cross_attention_dim 64 = tiny CLIP-L 32 ⧺ tiny bigG 32;
        # addition_embed_dim 40 = 16 pooled + 6×4 time-id Fourier.
        return UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                          cross_attention_dim=64, attention_heads=4,
                          norm_groups=8, cross_attn_blocks=(False, True),
                          transformer_depth=(1, 2), addition_embed_dim=40,
                          addition_time_embed_dim=4)


# ---------------------------------------------------------------------------
# blocks


def _init_resnet(key, cin, cout, temb_dim):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": nn.init_group_norm(cin),
        "conv1": nn.init_conv(k1, cin, cout, 3),
        "temb": nn.init_linear(k2, temb_dim, cout),
        "norm2": nn.init_group_norm(cout),
        "conv2": nn.init_conv(k3, cout, cout, 3),
    }
    if cin != cout:
        p["shortcut"] = nn.init_conv(k4, cin, cout, 1)
    return p


def _resnet(p, x, temb, groups, tproj=None):
    # diffusers UNet norm_eps=1e-5 (the transformer GroupNorm stays 1e-6)
    h = nn.group_norm(p["norm1"], x, groups, eps=1e-5, act="silu")
    if tproj is not None and tproj.ndim == 1 \
            and os.environ.get("SDBC_FOLD_TEMB_BIAS", "0") == "1":
        # sampling with a hoisted batch-invariant (cout,) time projection:
        # fold it into conv1's bias — the conv epilogue performs the add,
        # deleting a separate elementwise pass over (N,H,W,cout)
        # (round-4 add_add lever; A/B via bench.py, default off pending
        # measurement — the reassociated bias add rounds differently)
        h = nn.conv2d({"w": p["conv1"]["w"],
                       "b": p["conv1"]["b"] + tproj.astype(p["conv1"]["b"].dtype)},
                      h)
    else:
        h = nn.conv2d(p["conv1"], h)
        if tproj is None:
            # training / per-sample timesteps: project the (N, ted)
            # embedding here
            tproj = nn.linear(p["temb"], jax.nn.silu(temb))[:, None, None, :]
        # sampling passes a precomputed (cout,) vector (same t across the
        # batch): the per-step projection is hoisted out of the denoise
        # loop entirely (precompute_temb) — (cout,) broadcasts over
        # (N,H,W,cout)
        h = h + tproj.astype(h.dtype)
    h = nn.group_norm(p["norm2"], h, groups, eps=1e-5, act="silu")
    h = nn.conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = nn.conv2d(p["shortcut"], x)
    return x + h


def _init_mha(key, dim, kv_dim, heads):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q": nn.init_linear(k1, dim, dim, use_bias=False),
        "k": nn.init_linear(k2, kv_dim, dim, use_bias=False),
        "v": nn.init_linear(k3, kv_dim, dim, use_bias=False),
        "o": nn.init_linear(k4, dim, dim),
    }


def _mha(p, x, ctx, heads, impl="auto"):
    """Multi-head attention.

    Default is the full-width projection + reshape/transpose path: it MEASURES
    FASTER on v5e than folding the head split into the projection einsums
    (round-2 A/B, one 64² layer at b=8: legacy 6.93 ms vs head-major 8.25 ms
    vs fused-qkv 9.63 ms).  Head-major projections shrink the matmul output
    width to head_dim=40 — a 3.2× MXU lane-padding waste — which costs more
    than the transposes save (round-1 profile lead 2 falsified).
    SDBC_MHA=headmajor|fused keeps the variants for re-measurement on other
    topologies.

    The projection weights may be head-PACKED (``pack_attention_heads``):
    each head zero-padded to hd_pad columns inside W_q/k/v (and matching
    rows of W_o).  The layout is inferred from the weight shape; the
    softmax scale stays the LOGICAL head dim's rsqrt, making the packed
    path bit-exact math (zero columns contribute zero to QKᵀ and PV).
    """
    import os

    b, s, dim = x.shape
    hd = dim // heads
    dt = x.dtype

    if os.environ.get("SDBC_MHA", "legacy") == "legacy":
        proj_dim = p["q"]["w"].shape[1]          # heads·hd_pad (= dim unpacked)
        hd_pad = proj_dim // heads

        if (impl == "inference" and hd_pad == hd
                and os.environ.get("SDBC_ATTN_BSHD", "1") == "1"):
            # round-4 lever (default ON; A/B in experiments/r4_bshd.py):
            # keep q/k/v in the projection layout (b, s, h, d) — the
            # reshape is a free bitcast — and slice heads inside the bshd
            # kernel, eliminating the head split/merge HBM relayouts.
            # Measured +0.45% end-to-end (1.3808 → 1.387 img/s, alternated
            # 6-rep A/B, bit-exact outputs); SDBC_ATTN_BSHD=0 restores the
            # historical relayout path
            from sdbc_tpu.ops.attention import attention_bshd_inference

            q4 = nn.linear(p["q"], x).reshape(b, -1, heads, hd)
            k4 = nn.linear(p["k"], ctx).reshape(b, -1, heads, hd)
            v4 = nn.linear(p["v"], ctx).reshape(b, -1, heads, hd)
            a = attention_bshd_inference(q4, k4, v4).reshape(b, s, dim)
            return nn.linear(p["o"], a)

        def split(t):
            return t.reshape(b, -1, heads, hd_pad).transpose(0, 2, 1, 3)

        q = split(nn.linear(p["q"], x))
        k = split(nn.linear(p["k"], ctx))
        v = split(nn.linear(p["v"], ctx))
        # scale=None when unpacked keeps the trace byte-identical to the
        # historical graph (persistent-compile-cache stability)
        a = attention(q, k, v, impl=impl,
                      scale=hd ** -0.5 if hd_pad != hd else None)
        a = a.transpose(0, 2, 1, 3).reshape(b, s, proj_dim)
        return nn.linear(p["o"], a)

    # only reachable when SDBC_MHA is set and != "legacy" (benchmarking
    # variants; baked in at TRACE time — changing the env after the first
    # jitted forward has no effect)
    mode = os.environ["SDBC_MHA"]
    if mode == "fused" and x is ctx:  # self-attention: one qkv projection
        w = jnp.concatenate([p["q"]["w"], p["k"]["w"], p["v"]["w"]], axis=1)
        qkv = jnp.einsum("bsd,dthe->tbhse", x,
                         w.reshape(dim, 3, heads, hd).astype(dt),
                         preferred_element_type=dt)
        q, k, v = qkv[0], qkv[1], qkv[2]
    else:  # "headmajor": separate projections, still head-major output
        kv_dim = ctx.shape[-1]
        q = jnp.einsum("bsd,dhe->bhse", x,
                       p["q"]["w"].reshape(dim, heads, hd).astype(dt),
                       preferred_element_type=dt)
        k = jnp.einsum("bsd,dhe->bhse", ctx,
                       p["k"]["w"].reshape(kv_dim, heads, hd).astype(dt),
                       preferred_element_type=dt)
        v = jnp.einsum("bsd,dhe->bhse", ctx,
                       p["v"]["w"].reshape(kv_dim, heads, hd).astype(dt),
                       preferred_element_type=dt)
    a = attention(q, k, v, impl=impl)
    return (jnp.einsum("bhse,hed->bsd", a,
                       p["o"]["w"].reshape(heads, hd, dim).astype(dt),
                       preferred_element_type=dt)
            + p["o"]["b"].astype(dt))


def _init_basic_block(key, dim, ctx_dim, heads):
    """One pre-LN transformer block: self-attn → cross-attn → GEGLU FF."""
    ks = jax.random.split(key, 4)
    return {
        "ln1": nn.init_layer_norm(dim),
        "attn1": _init_mha(ks[0], dim, dim, heads),
        "ln2": nn.init_layer_norm(dim),
        "attn2": _init_mha(ks[1], dim, ctx_dim, heads),
        "ln3": nn.init_layer_norm(dim),
        "geglu": nn.init_linear(ks[2], dim, 8 * dim),
        "ff_out": nn.init_linear(ks[3], 4 * dim, dim),
    }


def _init_transformer(key, dim, ctx_dim, heads, depth: int = 1):
    """depth=1 (SD-1/2) keeps the historical FLAT param layout AND key-draw
    order (checkpoint / golden-fixture / compile-cache compatibility);
    depth>1 (SDXL) stacks the blocks into one scanned pytree under
    "blocks" — one compiled block body per transformer instead of ``depth``
    traced copies."""
    if depth == 1:
        ks = jax.random.split(key, 6)
        return {
            "norm": nn.init_group_norm(dim),
            "proj_in": nn.init_conv(ks[0], dim, dim, 1),
            "ln1": nn.init_layer_norm(dim),
            "attn1": _init_mha(ks[1], dim, dim, heads),
            "ln2": nn.init_layer_norm(dim),
            "attn2": _init_mha(ks[2], dim, ctx_dim, heads),
            "ln3": nn.init_layer_norm(dim),
            "geglu": nn.init_linear(ks[3], dim, 8 * dim),
            "ff_out": nn.init_linear(ks[4], 4 * dim, dim),
            "proj_out": nn.init_conv(ks[5], dim, dim, 1),
        }
    ks = jax.random.split(key, depth + 2)
    blocks = [_init_basic_block(k, dim, ctx_dim, heads) for k in ks[2:]]
    return {
        "norm": nn.init_group_norm(dim),
        "proj_in": nn.init_conv(ks[0], dim, dim, 1),
        "proj_out": nn.init_conv(ks[1], dim, dim, 1),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def _basic_block(p, y, ctx, heads, attn_impl="auto"):
    yn = nn.layer_norm(p["ln1"], y)
    y = y + _mha(p["attn1"], yn, yn, heads, attn_impl)
    y = y + _mha(p["attn2"], nn.layer_norm(p["ln2"], y), ctx, heads, attn_impl)
    if attn_impl == "inference" and geglu_ff_mod.ff_fused_eligible(y):
        # sampling fast path: LN → up-proj → GELU gate → down-proj →
        # residual in one Pallas pass (hidden stays in VMEM; see ops/geglu_ff)
        return geglu_ff_mod.geglu_ff(y, p["ln3"], p["geglu"], p["ff_out"])
    return _tfm_ff(p, y)


def _transformer(p, x, ctx, heads, groups, attn_impl="auto"):
    """Spatial transformer: proj_in → depth× basic block → proj_out."""
    y = _tfm_in(p, x, groups)
    if "blocks" in p:  # depth>1 (SDXL): scan one compiled block body
        def body(y, blk):
            return _basic_block(blk, y, ctx, heads, attn_impl), None
        y, _ = jax.lax.scan(body, y, p["blocks"])
    else:
        y = _basic_block(p, y, ctx, heads, attn_impl)
    return _tfm_out(p, y, x)


def _tfm_in(p, x, groups):
    n, h, w, c = x.shape
    y = nn.group_norm(p["norm"], x, groups, eps=1e-6)
    return nn.conv2d(p["proj_in"], y).reshape(n, h * w, c)


def _tfm_ff(p, y):
    z = nn.linear(p["geglu"], nn.layer_norm(p["ln3"], y))
    val, gate = jnp.split(z, 2, axis=-1)
    return y + nn.linear(p["ff_out"], val * jax.nn.gelu(gate, approximate=False))


def _tfm_out(p, y, x):
    n, h, w, c = x.shape
    return nn.conv2d(p["proj_out"], y.reshape(n, h, w, c)) + x


def _transformer_selective(p, x, ctx, heads, groups, attn_impl="auto"):
    """_transformer with remat everywhere EXCEPT the flash attention calls.

    Flash attention already has an O(s·d)-memory backward (its residuals are
    q/k/v/out/lse — never S×S), so wrapping it in jax.checkpoint buys no
    memory and costs one full extra kernel run per backward.  Selective mode
    keeps the attention calls (and their projections, whose outputs are the
    kernel's residuals anyway) outside the checkpoint regions and remats only
    the GN/conv/FF surroundings; dots_saveable additionally keeps the FF
    matmul outputs so their backward replays elementwise work only.
    Bit-identical forward to _transformer (same ops, same order) for the
    training attn_impl path.
    """
    pol = jax.checkpoint_policies.dots_saveable
    y = jax.checkpoint(_tfm_in, static_argnums=(2,), policy=pol)(p, x, groups)

    def block(blk, y):
        yn = nn.layer_norm(blk["ln1"], y)
        y = y + _mha(blk["attn1"], yn, yn, heads, attn_impl)
        y = y + _mha(blk["attn2"], nn.layer_norm(blk["ln2"], y), ctx, heads,
                     attn_impl)
        return jax.checkpoint(_tfm_ff, policy=pol)(blk, y)

    if "blocks" in p:  # depth>1 (SDXL): scan, whole block rematerialized
        def body(y, blk):
            return jax.checkpoint(block)(blk, y), None
        y, _ = jax.lax.scan(body, y, p["blocks"])
    else:
        y = block(p, y)
    return jax.checkpoint(_tfm_out, policy=pol)(p, y, x)


# ---------------------------------------------------------------------------
# init


def init(key, cfg: UNetConfig):
    keys = iter(jax.random.split(key, 512))
    ch = cfg.block_out_channels
    ted = cfg.time_embed_dim
    p = {
        "conv_in": nn.init_conv(next(keys), cfg.in_channels, ch[0], 3),
        "time_mlp": {
            "fc1": nn.init_linear(next(keys), ch[0], ted),
            "fc2": nn.init_linear(next(keys), ted, ted),
        },
    }
    if cfg.addition_embed_dim:
        # SDXL text_time addition embedding (diffusers add_embedding):
        # (N, addition_embed_dim) → ted, added to the timestep embedding
        p["add_mlp"] = {
            "fc1": nn.init_linear(next(keys), cfg.addition_embed_dim, ted),
            "fc2": nn.init_linear(next(keys), ted, ted),
        }

    nheads = cfg.heads_per_level
    depths = cfg.depth_per_level
    skip_ch = [ch[0]]
    down = []
    cin = ch[0]
    for i, cout in enumerate(ch):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(_init_resnet(next(keys), cin if j == 0 else cout,
                                               cout, ted))
            if cfg.cross_attn_blocks[i]:
                blk["attns"].append(_init_transformer(
                    next(keys), cout, cfg.cross_attention_dim, nheads[i],
                    depths[i]))
            skip_ch.append(cout)
        if i < len(ch) - 1:
            blk["downsample"] = nn.init_conv(next(keys), cout, cout, 3)
            skip_ch.append(cout)
        down.append(blk)
        cin = cout
    p["down"] = down

    p["mid"] = {
        "resnet1": _init_resnet(next(keys), ch[-1], ch[-1], ted),
        "attn": _init_transformer(next(keys), ch[-1], cfg.cross_attention_dim,
                                  nheads[-1], depths[-1]),
        "resnet2": _init_resnet(next(keys), ch[-1], ch[-1], ted),
    }

    up = []
    rev = list(reversed(ch))
    rev_cross = list(reversed(cfg.cross_attn_blocks))
    rev_heads = list(reversed(nheads))
    rev_depths = list(reversed(depths))
    prev = ch[-1]
    for i, cout in enumerate(rev):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block + 1):
            skip = skip_ch.pop()
            blk["resnets"].append(_init_resnet(next(keys), prev + skip, cout, ted))
            if rev_cross[i]:
                blk["attns"].append(_init_transformer(
                    next(keys), cout, cfg.cross_attention_dim, rev_heads[i],
                    rev_depths[i]))
            prev = cout
        if i < len(rev) - 1:
            blk["upsample"] = nn.init_conv(next(keys), cout, cout, 3)
        up.append(blk)
    p["up"] = up

    p["norm_out"] = nn.init_group_norm(ch[0])
    p["conv_out"] = nn.init_conv(next(keys), ch[0], cfg.out_channels, 3)
    return p


# ---------------------------------------------------------------------------
# head packing (sampling fast path)


def _pad_mha_heads(p, heads, hd, hd_pad):
    """Zero-pad each head to hd_pad: W_q/k/v per-head columns, W_o rows."""
    def pad_cols(w):                             # (din, h·hd) → (din, h·hd_pad)
        din = w.shape[0]
        w = w.reshape(din, heads, hd)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, hd_pad - hd)))
        return w.reshape(din, heads * hd_pad)

    def pad_rows(w):                             # (h·hd, dout) → (h·hd_pad, dout)
        dout = w.shape[1]
        w = w.reshape(heads, hd, dout)
        w = jnp.pad(w, ((0, 0), (0, hd_pad - hd), (0, 0)))
        return w.reshape(heads * hd_pad, dout)

    return {"q": {"w": pad_cols(p["q"]["w"])},
            "k": {"w": pad_cols(p["k"]["w"])},
            "v": {"w": pad_cols(p["v"]["w"])},
            "o": {"w": pad_rows(p["o"]["w"]), "b": p["o"]["b"]}}


def pack_attention_heads(params, cfg: UNetConfig, pad_to: int = 64):
    """Pad sub-``pad_to`` self-attention heads to ``pad_to`` inside the
    projection weights (sampling fast path).

    SD-1.x's 64² level has head_dim 40 (320ch / 8 heads); the MXU contracts
    in 128-lane chunks, so the flash kernel wastes 3.2× on d=40 math, and
    every head split/merge relayout moves misaligned 40-wide lanes.
    Zero-padding each head to 64 inside W_q/W_k/W_v (and the matching rows
    of W_o) is EXACT — zero columns contribute zero to QKᵀ and PV, and
    ``_mha`` keeps the softmax scale at the logical 40^-0.5 — while the
    kernel reads a lane-friendly d=64 (measured 1.50× on the isolated 64²
    MHA layer, experiments/r3_head128b.py; d=80→128 neutral, d=160→256
    slower, hence pad_to=64 packs only the sub-64 level).

    FALSIFIED end-to-end on v5e: the full sampling graph measures 1.336 vs
    1.376 img/s back-to-back (batch 4, ddim-50) — the 1.6× projection
    FLOPs at the 320-ch level outweigh the kernel+relayout savings once
    XLA fuses the projections with their neighbors.  Kept as an opt-in
    re-measurement hook (``SDBC_PACK_HEADS=1`` or ``sample(...,
    pack_heads=True)``); see PERF_NOTES.md round 3.

    Trace-time transform applied by ``diffusion.pipeline.sample`` on the
    inference attention path only: checkpoints, ports, and the training
    graph keep the standard diffusers layout (reference engine layout,
    finetune_sd.py:328-330).  Cross-attention (attn2) and levels with
    head_dim ≥ pad_to are left untouched.
    """
    nheads = cfg.heads_per_level

    def pack_tfm(tfm, heads):
        if "blocks" in tfm:
            # depth>1 (SDXL) transformers keep head_dim 64 — nothing sub-64
            # to pack, and the stacked layout is left untouched
            return tfm
        dim = tfm["attn1"]["q"]["w"].shape[0]
        hd = dim // heads
        if hd >= pad_to:
            return tfm
        out = dict(tfm)
        out["attn1"] = _pad_mha_heads(tfm["attn1"], heads, hd, pad_to)
        return out

    def pack_blk(blk, heads):
        out = dict(blk)
        out["attns"] = [pack_tfm(t, heads) for t in blk["attns"]]
        return out

    out = dict(params)
    out["down"] = [pack_blk(b, nheads[i])
                   for i, b in enumerate(params["down"])]
    out["up"] = [pack_blk(b, h)
                 for b, h in zip(params["up"], reversed(nheads))]
    mid = dict(params["mid"])
    mid["attn"] = pack_tfm(params["mid"]["attn"], nheads[-1])
    out["mid"] = mid
    return out


# ---------------------------------------------------------------------------
# time-embedding hoist (sampling fast path)


def _temb_mlp(params, timesteps, c0, dtype):
    temb = nn.timestep_embedding(timesteps, c0, dtype=dtype)
    return nn.linear(params["time_mlp"]["fc2"],
                     jax.nn.silu(nn.linear(params["time_mlp"]["fc1"], temb)))


def precompute_temb(params, timesteps, cfg: UNetConfig, dtype=jnp.bfloat16,
                    added_cond=None):
    """Precompute every ResBlock's time projection for a whole timestep grid.

    The denoise loop evaluates ~22 tiny (batch, 1280)→(batch, C) matmuls per
    step whose inputs depend ONLY on the (statically known) timestep — on TPU
    these are pure latency, ~3.5 ms/step at SD-1.5 shapes.  This hoists the
    sinusoidal embedding, the shared MLP, and all per-ResBlock projections
    into one batched pass over the full grid before the loop.

    timesteps: (T,) int32 sampling grid → pytree mirroring the ResBlock
    nesting of ``params`` with (T, cout) tables.  ``index_temb(tree, i)``
    slices step i.  Exact: same math, evaluated once.

    ``added_cond`` (SDXL, required iff cfg.addition_embed_dim): the (N,
    addition_embed_dim) conditioning vector of the UNET batch (for CFG
    sampling that is the 2B-row uncond⧺cond stack).  The embedding is
    per-sample, so the tables become (T, N, 1, 1, cout) — the hoist stays
    exact, ~N× bigger (a few MB at SD shapes).
    """
    temb = _temb_mlp(params, timesteps, cfg.block_out_channels[0], dtype)
    if (added_cond is None) != (not cfg.addition_embed_dim):
        raise ValueError("precompute_temb: added_cond must be passed exactly "
                         "when cfg.addition_embed_dim is set")
    if added_cond is not None:
        aug = nn.linear(params["add_mlp"]["fc2"], jax.nn.silu(
            nn.linear(params["add_mlp"]["fc1"],
                      added_cond.astype(jnp.float32))))
        temb = temb[:, None, :] + aug[None].astype(temb.dtype)  # (T, N, ted)
    st = jax.nn.silu(temb)

    def proj(r):
        out = nn.linear(r["temb"], st)   # (T, cout) or (T, N, cout)
        if added_cond is not None:       # → (T, N, 1, 1, cout): index_temb's
            out = out[:, :, None, None]  # (N, 1, 1, cout) slice broadcasts
        return out                       # over the (N, H, W, cout) activation

    out = {"down": [{"resnets": [proj(r) for r in blk["resnets"]]}
                    for blk in params["down"]],
           "mid": {"resnet1": proj(params["mid"]["resnet1"]),
                   "resnet2": proj(params["mid"]["resnet2"])},
           "up": [{"resnets": [proj(r) for r in blk["resnets"]]}
                  for blk in params["up"]]}
    return out


def index_temb(temb_proj, i):
    """Slice step ``i``'s (cout,) vectors out of a precompute_temb tree."""
    return jax.tree_util.tree_map(lambda a: a[i], temb_proj)


# ---------------------------------------------------------------------------
# FreeU (Si et al. 2023, arXiv:2309.11497): inference-time quality knob —
# amplify the backbone's low-channel half and damp the skip connections'
# low-frequency band at the two deepest decoder stages.  No training, no
# extra parameters; None (the default) leaves the graph untouched.


def fourier_filter(x, threshold: int, scale):
    """Scale the centered low-frequency box of a (N, H, W, C) feature map.

    FFT over the spatial axes, fftshift, multiply the (2·threshold)²
    center box by ``scale``, invert — the FreeU skip-feature filter
    (fp32 internally; TPU XLA lowers FFT natively).
    """
    dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    h, w = x.shape[1], x.shape[2]
    crow, ccol = h // 2, w // 2
    mask = jnp.ones((h, w), jnp.float32)
    mask = mask.at[max(crow - threshold, 0):crow + threshold,
                   max(ccol - threshold, 0):ccol + threshold].set(
        jnp.asarray(scale, jnp.float32))
    xf = xf * mask[None, :, :, None]
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    return jnp.fft.ifftn(xf, axes=(1, 2)).real.astype(dtype)


def _apply_freeu(h, skip, b_scale: float, s_scale: float):
    """One FreeU modification before a decoder concat: scale the first
    half of the backbone channels by ``b`` and low-pass-scale the skip by
    ``s``.  Scales of exactly 1.0 short-circuit so freeu=(1, 1, 1, 1) is
    byte-identical to off (an FFT roundtrip would not be)."""
    if b_scale != 1.0:
        half = h.shape[-1] // 2
        h = jnp.concatenate(
            [h[..., :half] * jnp.asarray(b_scale, h.dtype), h[..., half:]],
            axis=-1)
    if s_scale != 1.0:
        skip = fourier_filter(skip, 1, s_scale)
    return h, skip


# recommended settings from the FreeU paper / reference implementation
FREEU_SD15 = (1.5, 1.6, 0.9, 0.2)   # (b1, b2, s1, s2)
FREEU_SD21 = (1.4, 1.6, 0.9, 0.2)
FREEU_SDXL = (1.3, 1.4, 0.9, 0.2)


# ---------------------------------------------------------------------------
# apply


def apply(params, latents, timesteps, encoder_hidden_states, cfg: UNetConfig,
          *, remat: bool = False, remat_mode: str = "block",
          cached_deep=None, return_deep: bool = False,
          cache_tail: int = 0, attn_impl: str = "auto", temb_proj=None,
          control_residuals=None, added_cond=None, freeu=None):
    """latents (N,h,w,4), timesteps (N,), CLIP states (N,77,768) → eps (N,h,w,4).

    remat=True rematerialises every ResBlock/transformer in the backward pass
    (the reference's enable_gradient_checkpointing, finetune_sd.py:388-389).
    remat_mode="selective" keeps the flash attention calls outside the
    checkpoint regions (see _transformer_selective) — less recompute, a few
    hundred MB more live activations.

    Deep-feature caching (opt-in fast sampling, DeepCache-style): the "deep"
    trunk is cached between steps; return_deep=True additionally returns its
    output, cached_deep=<that tensor> skips it.  ``cache_tail`` sets the
    boundary = how many trailing ResNets of the LAST up block run fresh on
    cached steps (0/default = all of them, plus the whole first down block —
    the conservative split; 1 = aggressive: only conv_in, the final ResBlock
    and the output head run on cached steps).  The no-cache path is
    bit-identical to the plain forward for any cache_tail.

    ``control_residuals``: optional ``(down_residuals, mid_residual)`` from
    ``models.controlnet.apply``.  Each down residual is added to the saved
    skip tensor it indexes (NOT to the flowing activation — the diffusers
    injection points), the mid residual to the mid-block output.
    Incompatible with deep-feature caching (the residuals land in the
    cached trunk, so reusing it would silently freeze the conditioning).

    ``added_cond``: the SDXL text_time conditioning vector
    (N, cfg.addition_embed_dim) — concat(pooled text embed,
    Fourier(time_ids)) — required iff the config sets
    ``addition_embed_dim`` and no ``temb_proj`` is given; run through the
    add_mlp and summed into the timestep embedding (diffusers
    ``emb = t_emb + add_embedding(...)``).  With ``temb_proj`` the addition
    embedding is already baked into the hoisted tables
    (``precompute_temb(..., added_cond=...)``) and must not be repeated.

    ``freeu``: optional (b1, b2, s1, s2) static floats (FreeU,
    arXiv:2309.11497) — before each skip concat of the two DEEPEST decoder
    stages (up blocks 0 and 1), the backbone's first half channels scale
    by b and the skip's low-frequency band by s (``fourier_filter``).
    Presets: FREEU_SD15/SD21/SDXL.  (1, 1, 1, 1) is byte-identical to
    None.
    """
    if temb_proj is None and (added_cond is None) != \
            (not cfg.addition_embed_dim):
        raise ValueError(
            "added_cond must be passed exactly when cfg.addition_embed_dim "
            f"is set (got added_cond={'None' if added_cond is None else 'set'}"
            f", addition_embed_dim={cfg.addition_embed_dim})")
    if added_cond is not None and temb_proj is not None:
        raise ValueError("added_cond is already baked into temb_proj tables "
                         "(precompute_temb added_cond) — pass only one")
    if control_residuals is not None and (cached_deep is not None
                                          or return_deep):
        raise ValueError("control_residuals cannot combine with DeepCache "
                         "trunk caching (residuals land inside the trunk)")
    if control_residuals is not None:
        _want = 1 + sum(
            len(b["resnets"]) + ("downsample" in b) for b in params["down"])
        if len(control_residuals[0]) != _want:
            raise ValueError(
                f"{len(control_residuals[0])} down residuals for {_want} "
                "skip tensors — controlnet/unet configs disagree")
    g = cfg.norm_groups
    nheads = cfg.heads_per_level
    rev_heads = tuple(reversed(nheads))
    ctx = encoder_hidden_states

    res_fn = _resnet
    attn_fn = functools.partial(_transformer, attn_impl=attn_impl)
    if remat:
        res_fn = jax.checkpoint(_resnet, static_argnums=(3,))
        if remat_mode == "selective":
            attn_fn = functools.partial(_transformer_selective,
                                        attn_impl=attn_impl)
        else:
            # attn_impl rides through as a STATIC positional arg (strings
            # can't be traced, but static_argnums handles them) — TP
            # training needs the partitionable "xla" path here
            ckpt_tfm = jax.checkpoint(_transformer, static_argnums=(3, 4, 5))
            attn_fn = (lambda p, x, c, h, grp:
                       ckpt_tfm(p, x, c, h, grp, attn_impl))

    if temb_proj is None:
        temb = _temb_mlp(params, timesteps, cfg.block_out_channels[0],
                         latents.dtype)
        if added_cond is not None:
            aug = nn.linear(params["add_mlp"]["fc2"], jax.nn.silu(
                nn.linear(params["add_mlp"]["fc1"],
                          added_cond.astype(jnp.float32))))
            temb = temb + aug.astype(temb.dtype)
        tp_down = [{"resnets": [None] * len(b["resnets"])}
                   for b in params["down"]]
        tp_mid = {"resnet1": None, "resnet2": None}
        tp_up = [{"resnets": [None] * len(b["resnets"])} for b in params["up"]]
    else:
        # sampling fast path: per-ResBlock (cout,) projections precomputed
        # for the whole timestep grid (see precompute_temb); timesteps unused
        temb = None
        tp_down, tp_mid, tp_up = (temb_proj["down"], temb_proj["mid"],
                                  temb_proj["up"])

    # saved-skip residual injection (ControlNet): a running index over the
    # append order, which equals the diffusers down_block_res_samples order
    # (conv_in, per-resnet, per-downsample)
    _ctrl_i = [0]

    def add_ctrl(h):
        if control_residuals is None:
            return h
        r = control_residuals[0][_ctrl_i[0]]
        _ctrl_i[0] += 1
        return h + r.astype(h.dtype)

    def run_block_down(blk, tp, h, skips, nh):
        for j, r in enumerate(blk["resnets"]):
            h = res_fn(r, h, temb, g, tp["resnets"][j])
            if blk["attns"]:
                h = attn_fn(blk["attns"][j], h, ctx, nh, g)
            skips.append(add_ctrl(h))
        if "downsample" in blk:
            h = nn.conv2d(blk["downsample"], h, stride=2, padding=1)
            skips.append(add_ctrl(h))
        return h

    def run_block_up(blk, tp, h, skips, nh, fu=None):
        for j, r in enumerate(blk["resnets"]):
            skip = skips.pop()
            if fu is not None:
                h, skip = _apply_freeu(h, skip, *fu)
            h = jnp.concatenate([h, skip], axis=-1)
            h = res_fn(r, h, temb, g, tp["resnets"][j])
            if blk["attns"]:
                h = attn_fn(blk["attns"][j], h, ctx, nh, g)
        if "upsample" in blk:
            h = nn.upsample_nearest_2x(h)
            h = nn.conv2d(blk["upsample"], h)
        return h

    blk0 = params["down"][0]
    last_up = params["up"][-1]
    total_tail = len(last_up["resnets"])
    ct = cache_tail if cache_tail and 0 < cache_tail <= total_tail \
        else total_tail
    head_resnets = ct - 1  # down[0] resnets whose skips the fresh tail pops

    def run_resnet_j(blk, tp, j, h, skips=None):
        # only ever used on down[0] and up[-1] — both at level 0
        h = res_fn(blk["resnets"][j], h, temb, g, tp["resnets"][j])
        if blk["attns"]:
            h = attn_fn(blk["attns"][j], h, ctx, nheads[0], g)
        if skips is not None:
            skips.append(add_ctrl(h))
        return h

    # shallow head: conv_in + the first (ct-1) resnets of down[0]
    h = nn.conv2d(params["conv_in"], latents)
    shallow_skips = [add_ctrl(h)]
    for j in range(head_resnets):
        h = run_resnet_j(blk0, tp_down[0], j, h, shallow_skips)

    if cached_deep is None:
        d, deep_skips = h, []
        for j in range(head_resnets, len(blk0["resnets"])):
            d = run_resnet_j(blk0, tp_down[0], j, d, deep_skips)
        if "downsample" in blk0:
            d = nn.conv2d(blk0["downsample"], d, stride=2, padding=1)
            deep_skips.append(add_ctrl(d))
        for i, (blk, tp) in enumerate(zip(params["down"][1:], tp_down[1:]),
                                      start=1):
            d = run_block_down(blk, tp, d, deep_skips, nheads[i])
        d = res_fn(params["mid"]["resnet1"], d, temb, g, tp_mid["resnet1"])
        d = attn_fn(params["mid"]["attn"], d, ctx, nheads[-1], g)
        d = res_fn(params["mid"]["resnet2"], d, temb, g, tp_mid["resnet2"])
        if control_residuals is not None:
            d = d + control_residuals[1].astype(d.dtype)
        for i, (blk, tp) in enumerate(zip(params["up"][:-1], tp_up[:-1])):
            fu = None
            if freeu is not None and i < 2:
                fu = (freeu[0], freeu[2]) if i == 0 else (freeu[1], freeu[3])
            d = run_block_up(blk, tp, d, deep_skips, rev_heads[i], fu=fu)
        # deep-owned leading resnets of the last up block
        for j in range(total_tail - ct):
            d = jnp.concatenate([d, deep_skips.pop()], axis=-1)
            d = run_resnet_j(last_up, tp_up[-1], j, d)
        deep = d
    else:
        deep = cached_deep

    h = deep
    for j in range(total_tail - ct, total_tail):
        h = jnp.concatenate([h, shallow_skips.pop()], axis=-1)
        h = run_resnet_j(last_up, tp_up[-1], j, h)
    h = nn.group_norm(params["norm_out"], h, g, eps=1e-5, act="silu")
    out = nn.conv2d(params["conv_out"], h)
    return (out, deep) if return_deep else out
