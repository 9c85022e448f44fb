"""CLIP ViT-L/14 text encoder — the fine-tune target of the reference.

The reference loads ``transformers.CLIPTextModel`` (CompVis/stable-diffusion-v1-4
subfolder "text_encoder", /root/reference/finetune_sd.py:322-324) and uses
``text_encoder(input_ids)[0]`` — the last hidden state — as UNet conditioning
(finetune_sd.py:477).  This is a from-scratch functional JAX implementation:
12 pre-LN transformer layers, quick-GELU MLPs, causal self-attention over 77
tokens, final LayerNorm.  Layers are stacked and scanned (one compiled layer
body instead of 12) which keeps trace/compile time flat.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sdbc_tpu.ops import nn
from sdbc_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    mlp: int = 3072
    ctx: int = 77
    eps: float = 1e-5
    # "quick_gelu" (OpenAI CLIP / SD-1.x) or "gelu" (exact erf — OpenCLIP
    # ViT-H as shipped in SD-2.x text_encoder configs)
    act: str = "quick_gelu"
    # CLIPTextModelWithProjection (SDXL's second encoder): pooled EOS hidden
    # state projected hidden→projection_dim with a bias-free linear.  None =
    # plain CLIPTextModel (no projection weights in the param tree).
    projection_dim: int | None = None
    # Explicit <|endoftext|> id for pooled-output extraction.  None (the
    # default) = vocab_size − 1, correct for every stock CLIP vocabulary;
    # set when vocab_size counts APPENDED rows (textual inversion bumps
    # it at checkpoint load) so pooling keeps targeting the true eos.
    eot_id: int | None = None

    @staticmethod
    def sd15() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def sd2() -> "CLIPTextConfig":
        # SD-2.x text encoder: OpenCLIP ViT-H text tower as saved by
        # diffusers — 23 layers (the penultimate-layer trick is baked into
        # the shipped config), hidden 1024, exact-erf gelu
        return CLIPTextConfig(hidden=1024, layers=23, heads=16, mlp=4096,
                              act="gelu")

    @staticmethod
    def sdxl_g() -> "CLIPTextConfig":
        # SDXL's second encoder: OpenCLIP ViT-bigG text tower as shipped in
        # stabilityai/stable-diffusion-xl-base-1.0 text_encoder_2 — 32
        # layers, hidden 1280, exact-erf gelu, with a 1280-d text projection
        # (the pooled conditioning source)
        return CLIPTextConfig(hidden=1280, layers=32, heads=20, mlp=5120,
                              act="gelu", projection_dim=1280)

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=1000, hidden=32, layers=2, heads=4,
                              mlp=64, ctx=16)


def _init_layer(key, cfg: CLIPTextConfig):
    ks = jax.random.split(key, 6)
    h = cfg.hidden
    return {
        "ln1": nn.init_layer_norm(h),
        "attn": {
            "q": nn.init_linear(ks[0], h, h),
            "k": nn.init_linear(ks[1], h, h),
            "v": nn.init_linear(ks[2], h, h),
            "o": nn.init_linear(ks[3], h, h),
        },
        "ln2": nn.init_layer_norm(h),
        "mlp": {
            "fc1": nn.init_linear(ks[4], h, cfg.mlp),
            "fc2": nn.init_linear(ks[5], cfg.mlp, h),
        },
    }


def init(key, cfg: CLIPTextConfig):
    kt, kp, kl = jax.random.split(key, 3)
    layer_keys = jax.random.split(kl, cfg.layers)
    layers = [_init_layer(k, cfg) for k in layer_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    p = {
        "token_embedding": nn.init_embedding(kt, cfg.vocab_size, cfg.hidden),
        "position_embedding": nn.init_embedding(kp, cfg.ctx, cfg.hidden),
        "layers": stacked,
        "final_ln": nn.init_layer_norm(cfg.hidden),
    }
    if cfg.projection_dim:
        # fold_in: a fresh key that leaves the historical kt/kp/kl draw
        # order untouched (kt is already consumed by the token table)
        kj = jax.random.fold_in(key, 3)
        p["text_projection"] = nn.init_linear(kj, cfg.hidden,
                                              cfg.projection_dim,
                                              use_bias=False)
    return p


def _layer_apply(p, x, cfg, causal: bool = True):
    b, s, h = x.shape
    hd = h // cfg.heads

    def split_heads(t):
        return t.reshape(b, s, cfg.heads, hd).transpose(0, 2, 1, 3)

    res = x
    y = nn.layer_norm(p["ln1"], x, eps=cfg.eps)
    q = split_heads(nn.linear(p["attn"]["q"], y))
    k = split_heads(nn.linear(p["attn"]["k"], y))
    v = split_heads(nn.linear(p["attn"]["v"], y))
    a = attention(q, k, v, causal=causal, impl="xla")  # short seq: XLA path
    a = a.transpose(0, 2, 1, 3).reshape(b, s, h)
    x = res + nn.linear(p["attn"]["o"], a)

    res = x
    y = nn.layer_norm(p["ln2"], x, eps=cfg.eps)
    y = nn.linear(p["mlp"]["fc1"], y)
    if cfg.act == "quick_gelu":
        y = nn.quick_gelu(y)
    elif cfg.act == "gelu":  # transformers' "gelu" is the exact erf form
        y = nn.gelu(y, approximate=False)
    else:
        raise ValueError(f"unsupported CLIP hidden_act {cfg.act!r}")
    x = res + nn.linear(p["mlp"]["fc2"], y)
    return x


def apply(params, input_ids, cfg: CLIPTextConfig, compute_dtype=jnp.float32,
          skip_layers: int = 0, final_ln: bool = True):
    """input_ids: (B, ctx) int32 → last hidden state (B, ctx, hidden).

    ``skip_layers`` (CLIP-skip, the community convention where
    clip_skip=2 ≡ skip_layers=1): stop ``skip_layers`` transformer layers
    early and final-LayerNorm that hidden state — SD-1.x checkpoints
    fine-tuned with penultimate-layer conditioning expect it.  Static, so
    the scan simply runs over a sliced layer stack (0 = exact default).

    ``final_ln=False`` returns the raw hidden state of the stop layer —
    transformers' ``hidden_states[-(1+skip_layers)]`` convention, which is
    what SDXL conditions on (its penultimate states are NOT final-normed,
    unlike the SD-1.x clip-skip convention above).
    """
    x = nn.embedding(params["token_embedding"], input_ids)
    pos = params["position_embedding"]["table"][: input_ids.shape[1]]
    x = (x + pos[None]).astype(compute_dtype)

    def body(x, layer_params):
        return _layer_apply(layer_params, x, cfg), None

    layers = params["layers"]
    if skip_layers:
        if not 0 <= skip_layers < cfg.layers:
            raise ValueError(f"skip_layers={skip_layers} outside "
                             f"[0, {cfg.layers})")
        layers = jax.tree.map(lambda p: p[: cfg.layers - skip_layers],
                              layers)
    x, _ = jax.lax.scan(body, x, layers)
    if not final_ln:
        return x
    return nn.layer_norm(params["final_ln"], x, eps=cfg.eps)


def apply_with_pooled(params, input_ids, cfg: CLIPTextConfig,
                      compute_dtype=jnp.float32, skip_layers: int = 0,
                      eot_id: int | None = None):
    """One encoder pass returning BOTH SDXL conditioning tensors:

    - hidden: the ``skip_layers``-early hidden state WITHOUT final LayerNorm
      (transformers ``hidden_states[-(1+skip_layers)]`` — SDXL default is
      skip_layers=1, the penultimate state), shape (B, ctx, hidden);
    - pooled: the FULL stack's final-LN output at the first ``eot_id``
      position of each row, through ``text_projection`` when the config
      carries one (CLIPTextModelWithProjection semantics), shape
      (B, projection_dim or hidden).

    ``eot_id`` defaults to ``cfg.eot_id``, falling back to
    ``cfg.vocab_size - 1`` — every CLIP-family vocabulary (OpenAI 49408,
    the tiny fallback tokenizer) places <|endoftext|> last.  Configs whose
    vocab_size counts textual-inversion rows set cfg.eot_id explicitly.
    Pass it for a vocab that fits neither, or the pooled row silently
    lands on position 0 (BOS) and is constant across prompts.

    The layer scan is split at the capture point so the full depth runs
    exactly once (no second encoder pass for the pooled branch).
    """
    if not 0 <= skip_layers < cfg.layers:
        raise ValueError(f"skip_layers={skip_layers} outside [0, {cfg.layers})")
    x = nn.embedding(params["token_embedding"], input_ids)
    pos = params["position_embedding"]["table"][: input_ids.shape[1]]
    x = (x + pos[None]).astype(compute_dtype)

    def body(x, layer_params):
        return _layer_apply(layer_params, x, cfg), None

    cut = cfg.layers - skip_layers
    head = jax.tree.map(lambda p: p[:cut], params["layers"])
    x, _ = jax.lax.scan(body, x, head)
    hidden = x
    if skip_layers:
        tail = jax.tree.map(lambda p: p[cut:], params["layers"])
        x, _ = jax.lax.scan(body, x, tail)
    x = nn.layer_norm(params["final_ln"], x, eps=cfg.eps)
    # transformers pools at the FIRST eos position (argmax of the match mask)
    if eot_id is None:
        eot_id = cfg.eot_id if cfg.eot_id is not None else cfg.vocab_size - 1
    eot_pos = jnp.argmax(input_ids == eot_id, axis=1)
    pooled = x[jnp.arange(x.shape[0]), eot_pos]
    if "text_projection" in params:
        pooled = nn.linear(params["text_projection"], pooled)
    return hidden, pooled


# ---------------------------------------------------------------------------
# CLIP vision tower (ViT) — the image half of the safety checker (E6).
#
# transformers.CLIPVisionModel semantics: conv patch embedding (bias-free),
# prepended class token, learned position embeddings, pre-LayerNorm, the
# same pre-LN transformer layers as the text tower but WITHOUT the causal
# mask, and a post-LayerNorm applied to the CLS token only (the pooled
# output).  SD's checker runs ViT-L/14 @ 224².


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    mlp: int = 4096
    patch: int = 14
    image_size: int = 224
    eps: float = 1e-5
    act: str = "quick_gelu"

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1

    @staticmethod
    def sd_safety() -> "CLIPVisionConfig":
        """The vision tower of CompVis/stable-diffusion-safety-checker
        (CLIP ViT-L/14)."""
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(hidden=32, layers=2, heads=4, mlp=64,
                                patch=8, image_size=32)


# CLIPImageProcessor constants (openai/clip-vit-large-patch14)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def vision_init(key, cfg: CLIPVisionConfig):
    kc, kp, kpos, kl = jax.random.split(key, 4)
    layers = [_init_layer(k, cfg) for k in jax.random.split(kl, cfg.layers)]
    return {
        "class_embedding": jax.random.normal(kc, (cfg.hidden,)) * 0.02,
        "patch_embedding": nn.init_conv(kp, 3, cfg.hidden, cfg.patch,
                                        use_bias=False),
        "position_embedding": nn.init_embedding(kpos, cfg.num_positions,
                                                cfg.hidden),
        "pre_ln": nn.init_layer_norm(cfg.hidden),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "post_ln": nn.init_layer_norm(cfg.hidden),
    }


def vision_apply(params, pixels, cfg: CLIPVisionConfig,
                 compute_dtype=jnp.float32):
    """pixels: (B, image_size, image_size, 3) ALREADY CLIP-normalized
    ((x - mean)/std per channel) → (last_hidden (B, N+1, hidden),
    pooled (B, hidden)).

    The pooled output is post-LayerNorm of the CLS position — exactly
    transformers' CLIPVisionTransformer pooler; the returned last_hidden
    is pre-post-LN (also the transformers convention).
    """
    if pixels.shape[1:] != (cfg.image_size, cfg.image_size, 3):
        raise ValueError(f"vision tower expects (B, {cfg.image_size}, "
                         f"{cfg.image_size}, 3), got {pixels.shape}")
    x = nn.conv2d(params["patch_embedding"], pixels.astype(compute_dtype),
                  stride=cfg.patch, padding="VALID")
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.hidden)                     # (B, N, hidden)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(compute_dtype)[None, None],
        (b, 1, cfg.hidden))
    x = jnp.concatenate([cls, x], axis=1)                # (B, N+1, hidden)
    x = x + params["position_embedding"]["table"][None].astype(compute_dtype)
    x = nn.layer_norm(params["pre_ln"], x, eps=cfg.eps)

    def body(x, layer_params):
        return _layer_apply(layer_params, x, cfg, causal=False), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    pooled = nn.layer_norm(params["post_ln"], x[:, 0], eps=cfg.eps)
    return x, pooled
