"""Port diffusers/transformers SD-1.x checkpoints into sdbc_tpu param trees.

The reference loads pretrained components straight from the diffusers layout
(finetune_sd.py:322-336, utils.py:195-230).  This module converts that layout
— ``unet/diffusion_pytorch_model.{safetensors,bin}``, ``vae/...``,
``text_encoder/model.{safetensors}|pytorch_model.bin`` — into this
framework's functional param trees so fixed-seed outputs can be compared
against the CUDA reference with the *same* weights.

Conventions:
  - torch conv (O, I, H, W) → JAX HWIO (H, W, I, O)
  - torch linear (O, I)     → (I, O)
  - CLIP per-layer params are stacked along a leading axis (models/clip.py
    scans over layers)
Both safetensors and torch .bin sources are supported (torch is CPU-only in
this image and used purely as a deserializer).
"""
from __future__ import annotations

import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# state-dict loading


def load_state_dict(component_dir: str) -> Dict[str, np.ndarray]:
    """Load a diffusers/transformers component dir into {name: np.ndarray}."""
    cands = [f for f in sorted(os.listdir(component_dir))
             if f.endswith((".safetensors", ".bin"))]
    if not cands:
        raise FileNotFoundError(f"no weight files in {component_dir}")
    # HF dirs often ship BOTH formats with identical content: prefer
    # safetensors alone (no double load, no torch requirement)
    if any(f.endswith(".safetensors") for f in cands):
        cands = [f for f in cands if f.endswith(".safetensors")]
    out: Dict[str, np.ndarray] = {}
    for fname in cands:
        path = os.path.join(component_dir, fname)
        if fname.endswith(".safetensors"):
            from safetensors.numpy import load_file

            out.update(load_file(path))
        else:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            out.update({k: v.float().numpy() for k, v in sd.items()})
    return out


def _conv(sd, name):
    w = np.transpose(sd[f"{name}.weight"], (2, 3, 1, 0)).astype(np.float32)
    p = {"w": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"].astype(np.float32))
    return p


def _linear(sd, name):
    w = np.transpose(sd[f"{name}.weight"], (1, 0)).astype(np.float32)
    p = {"w": jnp.asarray(w)}
    if f"{name}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{name}.bias"].astype(np.float32))
    return p


def _norm(sd, name):
    return {"scale": jnp.asarray(sd[f"{name}.weight"].astype(np.float32)),
            "bias": jnp.asarray(sd[f"{name}.bias"].astype(np.float32))}


# ---------------------------------------------------------------------------
# UNet


def _port_resnet(sd, pfx):
    p = {
        "norm1": _norm(sd, f"{pfx}.norm1"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "norm2": _norm(sd, f"{pfx}.norm2"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
    }
    if f"{pfx}.time_emb_proj.weight" in sd:
        p["temb"] = _linear(sd, f"{pfx}.time_emb_proj")
    if f"{pfx}.conv_shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, f"{pfx}.conv_shortcut")
    return p


def _proj_conv(sd, name):
    """Spatial-transformer proj_in/proj_out → our 1×1-conv layout.

    SD-1/2 store these as 1×1 convs; SDXL (use_linear_projection=True)
    stores 2-D linear weights — mathematically the same per-pixel map, so a
    (out, in) linear becomes a (1, 1, in, out) conv kernel.
    """
    w = sd[f"{name}.weight"]
    if w.ndim == 2:
        p = {"w": jnp.asarray(
            np.transpose(w, (1, 0))[None, None].astype(np.float32))}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(sd[f"{name}.bias"].astype(np.float32))
        return p
    return _conv(sd, name)


def _port_basic_block(sd, tb):
    return {
        "ln1": _norm(sd, f"{tb}.norm1"),
        "attn1": {
            "q": _linear(sd, f"{tb}.attn1.to_q"),
            "k": _linear(sd, f"{tb}.attn1.to_k"),
            "v": _linear(sd, f"{tb}.attn1.to_v"),
            "o": _linear(sd, f"{tb}.attn1.to_out.0"),
        },
        "ln2": _norm(sd, f"{tb}.norm2"),
        "attn2": {
            "q": _linear(sd, f"{tb}.attn2.to_q"),
            "k": _linear(sd, f"{tb}.attn2.to_k"),
            "v": _linear(sd, f"{tb}.attn2.to_v"),
            "o": _linear(sd, f"{tb}.attn2.to_out.0"),
        },
        "ln3": _norm(sd, f"{tb}.norm3"),
        "geglu": _linear(sd, f"{tb}.ff.net.0.proj"),
        "ff_out": _linear(sd, f"{tb}.ff.net.2"),
    }


def _port_transformer(sd, pfx):
    p = {
        "norm": _norm(sd, f"{pfx}.norm"),
        "proj_in": _proj_conv(sd, f"{pfx}.proj_in"),
        "proj_out": _proj_conv(sd, f"{pfx}.proj_out"),
    }
    depth = 0
    while f"{pfx}.transformer_blocks.{depth}.norm1.weight" in sd:
        depth += 1
    if depth == 1:  # SD-1/2: the historical flat layout
        p.update(_port_basic_block(sd, f"{pfx}.transformer_blocks.0"))
    else:  # SDXL: stacked depth-N blocks (models/unet.py scans them)
        import jax

        blocks = [_port_basic_block(sd, f"{pfx}.transformer_blocks.{i}")
                  for i in range(depth)]
        p["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return p


def port_unet(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers UNet2DConditionModel state dict → models/unet.py tree."""
    if "time_embedding.cond_proj.weight" in sd:
        raise ValueError(
            "UNet weights carry time_embedding.cond_proj (fully-distilled "
            "LCM/guidance-embedded checkpoint); unsupported — use LCM-LoRA "
            "weights merged onto a standard UNet instead")
    p = {
        "conv_in": _conv(sd, "conv_in"),
        "time_mlp": {
            "fc1": _linear(sd, "time_embedding.linear_1"),
            "fc2": _linear(sd, "time_embedding.linear_2"),
        },
        "norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if "add_embedding.linear_1.weight" in sd:  # SDXL text_time embedding
        p["add_mlp"] = {
            "fc1": _linear(sd, "add_embedding.linear_1"),
            "fc2": _linear(sd, "add_embedding.linear_2"),
        }

    def block(prefix):
        blk = {"resnets": [], "attns": []}
        j = 0
        while f"{prefix}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(_port_resnet(sd, f"{prefix}.resnets.{j}"))
            if f"{prefix}.attentions.{j}.proj_in.weight" in sd:
                blk["attns"].append(
                    _port_transformer(sd, f"{prefix}.attentions.{j}"))
            j += 1
        if f"{prefix}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv(sd, f"{prefix}.downsamplers.0.conv")
        if f"{prefix}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv(sd, f"{prefix}.upsamplers.0.conv")
        return blk

    p["down"] = []
    i = 0
    while f"down_blocks.{i}.resnets.0.norm1.weight" in sd:
        p["down"].append(block(f"down_blocks.{i}"))
        i += 1
    p["up"] = []
    i = 0
    while f"up_blocks.{i}.resnets.0.norm1.weight" in sd:
        p["up"].append(block(f"up_blocks.{i}"))
        i += 1
    p["mid"] = {
        "resnet1": _port_resnet(sd, "mid_block.resnets.0"),
        "attn": _port_transformer(sd, "mid_block.attentions.0"),
        "resnet2": _port_resnet(sd, "mid_block.resnets.1"),
    }
    return p


def port_controlnet(sd: Dict[str, np.ndarray]) -> dict:
    """diffusers ControlNetModel state dict → models/controlnet.py tree.

    The encoder half (conv_in/time_embedding/down_blocks/mid_block) uses the
    UNet naming verbatim; the control-specific parts are
    ``controlnet_cond_embedding.{conv_in,blocks.N,conv_out}`` and the
    ``controlnet_down_blocks.N`` / ``controlnet_mid_block`` zero convs.
    """
    p = {
        "conv_in": _conv(sd, "conv_in"),
        "time_mlp": {
            "fc1": _linear(sd, "time_embedding.linear_1"),
            "fc2": _linear(sd, "time_embedding.linear_2"),
        },
    }
    if "add_embedding.linear_1.weight" in sd:  # SDXL ControlNet
        p["add_mlp"] = {
            "fc1": _linear(sd, "add_embedding.linear_1"),
            "fc2": _linear(sd, "add_embedding.linear_2"),
        }

    p["down"] = []
    i = 0
    while f"down_blocks.{i}.resnets.0.norm1.weight" in sd:
        prefix = f"down_blocks.{i}"
        blk = {"resnets": [], "attns": []}
        j = 0
        while f"{prefix}.resnets.{j}.norm1.weight" in sd:
            blk["resnets"].append(_port_resnet(sd, f"{prefix}.resnets.{j}"))
            if f"{prefix}.attentions.{j}.proj_in.weight" in sd:
                blk["attns"].append(
                    _port_transformer(sd, f"{prefix}.attentions.{j}"))
            j += 1
        if f"{prefix}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv(sd, f"{prefix}.downsamplers.0.conv")
        p["down"].append(blk)
        i += 1
    p["mid"] = {
        "resnet1": _port_resnet(sd, "mid_block.resnets.0"),
        "attn": _port_transformer(sd, "mid_block.attentions.0"),
        "resnet2": _port_resnet(sd, "mid_block.resnets.1"),
    }

    ce = {"conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
          "blocks": []}
    j = 0
    while f"controlnet_cond_embedding.blocks.{j}.weight" in sd:
        ce["blocks"].append(_conv(sd, f"controlnet_cond_embedding.blocks.{j}"))
        j += 1
    ce["conv_out"] = _conv(sd, "controlnet_cond_embedding.conv_out")
    p["cond_embedding"] = ce

    p["zero_down"] = []
    j = 0
    while f"controlnet_down_blocks.{j}.weight" in sd:
        p["zero_down"].append(_conv(sd, f"controlnet_down_blocks.{j}"))
        j += 1
    p["zero_mid"] = _conv(sd, "controlnet_mid_block")
    return p


def controlnet_config_from_diffusers(cfg: dict, unet_cfg=None):
    """diffusers ControlNetModel config.json → ControlNetConfig.

    The ControlNet config carries the UNet-encoder fields directly (it has
    no up blocks and no out_channels, so those are synthesized for the
    shared ``unet_config_from_diffusers`` parse — which also picks up the
    SDXL fields: transformer_layers_per_block, addition_embed_type /
    projection_class_embeddings_input_dim, addition_time_embed_dim); pass
    ``unet_cfg`` to override with the base model's config instead (they
    must agree for the residual shapes to line up).
    """
    from sdbc_tpu.models.controlnet import ControlNetConfig

    if unet_cfg is None:
        down = cfg.get("down_block_types",
                       ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"])
        for t in down:
            if t not in ("CrossAttnDownBlock2D", "DownBlock2D"):
                raise ValueError(f"unsupported ControlNet block type {t!r}")
        mirror = ["CrossAttnUpBlock2D" if t == "CrossAttnDownBlock2D"
                  else "UpBlock2D" for t in reversed(down)]
        unet_cfg = unet_config_from_diffusers(
            {**cfg, "down_block_types": list(down),
             "up_block_types": mirror,
             "out_channels": cfg.get("out_channels", 4)})
    order = cfg.get("controlnet_conditioning_channel_order", "rgb")
    if order != "rgb":
        raise ValueError(f"conditioning channel order {order!r} unsupported "
                         "(pre-swap the control image instead)")
    return ControlNetConfig(
        unet=unet_cfg,
        conditioning_channels=tuple(
            cfg.get("conditioning_embedding_out_channels", (16, 32, 96, 256))))


def load_controlnet(path: str):
    """Load a diffusers ControlNetModel dir → (params, ControlNetConfig).

    ``path`` may be the model dir itself or a pipeline dir containing a
    ``controlnet/`` subfolder (the save layout of diffusers'
    StableDiffusionControlNetPipeline).
    """
    sub = os.path.join(path, "controlnet")
    if os.path.isdir(sub):
        path = sub
    cfg_path = os.path.join(path, "config.json")
    cfg_json = _read_json(cfg_path) if os.path.exists(cfg_path) else {}
    return (port_controlnet(load_state_dict(path)),
            controlnet_config_from_diffusers(cfg_json))


# ---------------------------------------------------------------------------
# VAE


def _port_vae_attn(sd, pfx):
    """Handles both old (query/key/value/proj_attn) and new (to_q/...) names."""
    if f"{pfx}.to_q.weight" in sd:
        names = ("to_q", "to_k", "to_v", "to_out.0")
    else:
        names = ("query", "key", "value", "proj_attn")
    group_norm = "group_norm" if f"{pfx}.group_norm.weight" in sd else "norm"
    return {
        "norm": _norm(sd, f"{pfx}.{group_norm}"),
        "q": _linear(sd, f"{pfx}.{names[0]}"),
        "k": _linear(sd, f"{pfx}.{names[1]}"),
        "v": _linear(sd, f"{pfx}.{names[2]}"),
        "o": _linear(sd, f"{pfx}.{names[3]}"),
    }


def port_vae(sd: Dict[str, np.ndarray]) -> dict:
    def coder(side, blocks_key, updown):
        c = {
            "conv_in": _conv(sd, f"{side}.conv_in"),
            "mid": {
                "resnet1": _port_resnet(sd, f"{side}.mid_block.resnets.0"),
                "attn": _port_vae_attn(sd, f"{side}.mid_block.attentions.0"),
                "resnet2": _port_resnet(sd, f"{side}.mid_block.resnets.1"),
            },
            "norm_out": _norm(sd, f"{side}.conv_norm_out"),
            "conv_out": _conv(sd, f"{side}.conv_out"),
        }
        blocks = []
        i = 0
        while f"{side}.{blocks_key}.{i}.resnets.0.norm1.weight" in sd:
            pfx = f"{side}.{blocks_key}.{i}"
            blk = {"resnets": []}
            j = 0
            while f"{pfx}.resnets.{j}.norm1.weight" in sd:
                blk["resnets"].append(_port_resnet(sd, f"{pfx}.resnets.{j}"))
                j += 1
            if f"{pfx}.downsamplers.0.conv.weight" in sd:
                blk["downsample"] = _conv(sd, f"{pfx}.downsamplers.0.conv")
            if f"{pfx}.upsamplers.0.conv.weight" in sd:
                blk["upsample"] = _conv(sd, f"{pfx}.upsamplers.0.conv")
            blocks.append(blk)
            i += 1
        c[updown] = blocks
        return c

    enc = coder("encoder", "down_blocks", "down")
    dec = coder("decoder", "up_blocks", "up")
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# CLIP text encoder


def port_clip_text(sd: Dict[str, np.ndarray]) -> dict:
    pfx = "text_model." if "text_model.final_layer_norm.weight" in sd else ""
    layers = []
    i = 0
    while f"{pfx}encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"{pfx}encoder.layers.{i}"
        layers.append({
            "ln1": _norm(sd, f"{lp}.layer_norm1"),
            "attn": {
                "q": _linear(sd, f"{lp}.self_attn.q_proj"),
                "k": _linear(sd, f"{lp}.self_attn.k_proj"),
                "v": _linear(sd, f"{lp}.self_attn.v_proj"),
                "o": _linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "ln2": _norm(sd, f"{lp}.layer_norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                "fc2": _linear(sd, f"{lp}.mlp.fc2"),
            },
        })
        i += 1
    import jax

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    out = {
        "token_embedding": {"table": jnp.asarray(
            sd[f"{pfx}embeddings.token_embedding.weight"].astype(np.float32))},
        "position_embedding": {"table": jnp.asarray(
            sd[f"{pfx}embeddings.position_embedding.weight"].astype(np.float32))},
        "layers": stacked,
        "final_ln": _norm(sd, f"{pfx}final_layer_norm"),
    }
    if "text_projection.weight" in sd:
        # CLIPTextModelWithProjection (SDXL text_encoder_2): bias-free
        # pooled-output projection
        out["text_projection"] = _linear(sd, "text_projection")
    return out


# ---------------------------------------------------------------------------
# config inference from the dir's config.json files


def _read_json(path: str) -> dict:
    import json

    with open(path) as f:
        return json.load(f)


def unet_config_from_diffusers(cfg: dict):
    """diffusers UNet2DConditionModel config.json → models/unet.UNetConfig.

    Mirrors the reference's ``load_model`` reconstructing a pipeline from any
    save_pretrained dir (utils.py:181-230) instead of assuming SD-1.5 shapes.
    Errors clearly on layouts this framework does not implement.
    """
    from sdbc_tpu.models.unet import UNetConfig

    down = cfg.get("down_block_types",
                   ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"])
    up = cfg.get("up_block_types",
                 ["UpBlock2D"] + ["CrossAttnUpBlock2D"] * 3)
    for t in down:
        if t not in ("CrossAttnDownBlock2D", "DownBlock2D"):
            raise ValueError(f"unsupported UNet down block type {t!r}")
    cross = tuple(t == "CrossAttnDownBlock2D" for t in down)
    expect_up = ["CrossAttnUpBlock2D" if c else "UpBlock2D"
                 for c in reversed(cross)]
    if list(up) != expect_up:
        raise ValueError(
            f"up_block_types {up} are not the mirror of down_block_types "
            f"{down}; this UNet layout is unsupported")
    heads = cfg.get("attention_head_dim", 8)
    if isinstance(heads, (list, tuple)):
        # SD-2.x/XL style: one entry per block (5,10,20[,20])
        heads = tuple(heads) if len(set(heads)) > 1 else heads[0]
    # diffusers-0.7.2 passes attention_head_dim as Transformer2DModel's
    # num_attention_heads (the SD-1.x value 8 and SD-2.x's per-block
    # (5,10,20,20) are head COUNTS under that era's constructor quirk)
    depth = cfg.get("transformer_layers_per_block", 1)
    if isinstance(depth, (list, tuple)):
        depth = tuple(depth) if len(set(depth)) > 1 else depth[0]
    if cfg.get("time_cond_proj_dim"):
        # fully-distilled LCM checkpoints condition on a w-embedding via
        # time_cond_proj; this UNet has no such input.  Only LCM-LoRA
        # merged onto a standard UNet works with scheduler="lcm".
        raise ValueError(
            "UNet has time_cond_proj_dim (fully-distilled LCM/guidance-"
            "embedded checkpoint); unsupported — use LCM-LoRA weights "
            "merged onto a standard UNet instead")
    add_type = cfg.get("addition_embed_type")
    add_dim = None
    if add_type == "text_time":  # SDXL micro-conditioning
        add_dim = cfg.get("projection_class_embeddings_input_dim")
        if not add_dim:
            raise ValueError("addition_embed_type=text_time needs "
                             "projection_class_embeddings_input_dim")
    elif add_type:
        raise ValueError(f"unsupported addition_embed_type {add_type!r} "
                         "(only SDXL's 'text_time' is implemented)")
    return UNetConfig(
        in_channels=cfg.get("in_channels", 4),
        out_channels=cfg.get("out_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (320, 640, 1280, 1280))),
        layers_per_block=cfg.get("layers_per_block", 2),
        cross_attention_dim=cfg.get("cross_attention_dim", 768),
        attention_heads=heads,
        norm_groups=cfg.get("norm_num_groups", 32),
        cross_attn_blocks=cross,
        transformer_depth=depth,
        addition_embed_dim=add_dim,
        addition_time_embed_dim=cfg.get("addition_time_embed_dim", 256),
    )


def vae_config_from_diffusers(cfg: dict):
    from sdbc_tpu.models.vae import VAEConfig

    for t in cfg.get("down_block_types", ["DownEncoderBlock2D"]):
        if t != "DownEncoderBlock2D":
            raise ValueError(f"unsupported VAE down block type {t!r}")
    for t in cfg.get("up_block_types", ["UpDecoderBlock2D"]):
        if t != "UpDecoderBlock2D":
            raise ValueError(f"unsupported VAE up block type {t!r}")
    return VAEConfig(
        in_channels=cfg.get("in_channels", 3),
        latent_channels=cfg.get("latent_channels", 4),
        block_out_channels=tuple(cfg.get("block_out_channels",
                                         (128, 256, 512, 512))),
        layers_per_block=cfg.get("layers_per_block", 2),
        norm_groups=cfg.get("norm_num_groups", 32),
        scaling_factor=cfg.get("scaling_factor", 0.18215),
    )


def clip_config_from_diffusers(cfg: dict):
    """transformers CLIPTextConfig json → models/clip.CLIPTextConfig."""
    from sdbc_tpu.models.clip import CLIPTextConfig

    # projection_dim is present (default 512) in EVERY transformers CLIP
    # config; only CLIPTextModelWithProjection (SDXL text_encoder_2)
    # actually owns projection weights — gate on the architecture tag
    with_proj = "CLIPTextModelWithProjection" in (cfg.get("architectures")
                                                  or [])
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden=cfg.get("hidden_size", 768),
        layers=cfg.get("num_hidden_layers", 12),
        heads=cfg.get("num_attention_heads", 12),
        mlp=cfg.get("intermediate_size", 3072),
        ctx=cfg.get("max_position_embeddings", 77),
        eps=cfg.get("layer_norm_eps", 1e-5),
        act=cfg.get("hidden_act", "quick_gelu"),
        projection_dim=cfg.get("projection_dim") if with_proj else None,
    )


def pipeline_config_from_diffusers(root: str, scheduler: str = "ddim"):
    """Build a PipelineConfig from a diffusers dir's component config.json
    files, falling back to SD-1.5 defaults for components without one.

    The schedule follows the reference's behavior of HARDCODING its scaled
    -linear 0.00085→0.012 construction at load time (utils.py:222-224,
    inference.py:386-387) rather than reading scheduler_config.json; only
    prediction_type is honored from the saved scheduler config since it
    changes the model's output semantics.
    """
    import dataclasses

    from sdbc_tpu.diffusion.pipeline import PipelineConfig
    from sdbc_tpu.diffusion.schedulers import ScheduleConfig

    base = PipelineConfig.sd15(scheduler)
    unet_cfg, vae_cfg, clip_cfg = base.unet, base.vae, base.clip
    p = os.path.join(root, "unet", "config.json")
    if os.path.exists(p):
        unet_cfg = unet_config_from_diffusers(_read_json(p))
    p = os.path.join(root, "vae", "config.json")
    if os.path.exists(p):
        vae_cfg = vae_config_from_diffusers(_read_json(p))
    p = os.path.join(root, "text_encoder", "config.json")
    if os.path.exists(p):
        clip_cfg = clip_config_from_diffusers(_read_json(p))
    clip2_cfg = None
    refiner = False
    p = os.path.join(root, "text_encoder_2", "config.json")
    if os.path.exists(p):  # SDXL second encoder
        clip2_cfg = clip_config_from_diffusers(_read_json(p))
        if not unet_cfg.addition_embed_dim:
            raise ValueError(
                f"{root} has a text_encoder_2 but its UNet config carries no "
                "text_time addition embedding — not an SDXL layout this "
                "framework recognizes")
        if not os.path.exists(os.path.join(root, "text_encoder",
                                           "config.json")):
            # SDXL-refiner layout: bigG alone (diffusers saves the dir
            # with text_encoder/tokenizer null), aesthetic-score
            # micro-conditioning
            refiner = True
            clip_cfg = clip2_cfg
    schedule = ScheduleConfig.sd15()
    p = os.path.join(root, "scheduler", "scheduler_config.json")
    if os.path.exists(p):
        sc = _read_json(p)
        if "prediction_type" in sc:
            schedule = dataclasses.replace(
                schedule, prediction_type=sc["prediction_type"])
    return PipelineConfig(clip=clip_cfg, unet=unet_cfg, vae=vae_cfg,
                          schedule=schedule, scheduler=scheduler,
                          clip2=clip2_cfg, refiner=refiner)


# ---------------------------------------------------------------------------
# top level


def port_diffusers_checkpoint(root: str) -> dict:
    """Convert a full diffusers save_pretrained dir → {text_encoder, unet, vae}."""
    params = {}
    mapping = {
        "unet": port_unet,
        "vae": port_vae,
        "text_encoder": port_clip_text,
        "text_encoder_2": port_clip_text,  # SDXL (WithProjection handled)
    }
    for comp, fn in mapping.items():
        cdir = os.path.join(root, comp)
        if os.path.isdir(cdir):
            params[comp] = fn(load_state_dict(cdir))
    if not params:
        raise FileNotFoundError(f"no portable components under {root}")
    return params


# ---------------------------------------------------------------------------
# export (our trees → diffusers-named state dicts, for interop/testing)


def _exp_conv(out, name, p):
    # ascontiguousarray: safetensors serializes the raw buffer, so a
    # np.transpose VIEW would silently write the UNtransposed bytes
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(p["w"]), (3, 2, 0, 1)))
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _exp_linear(out, name, p):
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.transpose(np.asarray(p["w"]), (1, 0)))
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _exp_norm(out, name, p):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def _exp_resnet(out, pfx, p):
    _exp_norm(out, f"{pfx}.norm1", p["norm1"])
    _exp_conv(out, f"{pfx}.conv1", p["conv1"])
    _exp_norm(out, f"{pfx}.norm2", p["norm2"])
    _exp_conv(out, f"{pfx}.conv2", p["conv2"])
    if "temb" in p:
        _exp_linear(out, f"{pfx}.time_emb_proj", p["temb"])
    if "shortcut" in p:
        _exp_conv(out, f"{pfx}.conv_shortcut", p["shortcut"])


def _exp_basic_block(out, tb, p):
    _exp_norm(out, f"{tb}.norm1", p["ln1"])
    _exp_norm(out, f"{tb}.norm2", p["ln2"])
    _exp_norm(out, f"{tb}.norm3", p["ln3"])
    for attn, tname in (("attn1", "attn1"), ("attn2", "attn2")):
        _exp_linear(out, f"{tb}.{tname}.to_q", p[attn]["q"])
        _exp_linear(out, f"{tb}.{tname}.to_k", p[attn]["k"])
        _exp_linear(out, f"{tb}.{tname}.to_v", p[attn]["v"])
        _exp_linear(out, f"{tb}.{tname}.to_out.0", p[attn]["o"])
    _exp_linear(out, f"{tb}.ff.net.0.proj", p["geglu"])
    _exp_linear(out, f"{tb}.ff.net.2", p["ff_out"])


def _exp_proj_linear(out, name, p):
    """Write our (1,1,in,out) conv kernel back as a 2-D (out,in) linear —
    the SDXL use_linear_projection layout."""
    w = np.asarray(p["w"])
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.transpose(w[0, 0], (1, 0)))
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"])


def _exp_transformer(out, pfx, p):
    _exp_norm(out, f"{pfx}.norm", p["norm"])
    if "blocks" in p:
        # depth>1 ⇒ SDXL convention: linear proj_in/out, unstacked blocks
        import jax

        _exp_proj_linear(out, f"{pfx}.proj_in", p["proj_in"])
        _exp_proj_linear(out, f"{pfx}.proj_out", p["proj_out"])
        depth = np.asarray(p["blocks"]["ln1"]["scale"]).shape[0]
        for i in range(depth):
            blk = jax.tree.map(lambda x: x[i], p["blocks"])
            _exp_basic_block(out, f"{pfx}.transformer_blocks.{i}", blk)
        return
    _exp_conv(out, f"{pfx}.proj_in", p["proj_in"])
    _exp_basic_block(out, f"{pfx}.transformer_blocks.0", p)
    _exp_conv(out, f"{pfx}.proj_out", p["proj_out"])


def export_unet(params: dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _exp_conv(out, "conv_in", params["conv_in"])
    _exp_linear(out, "time_embedding.linear_1", params["time_mlp"]["fc1"])
    _exp_linear(out, "time_embedding.linear_2", params["time_mlp"]["fc2"])
    if "add_mlp" in params:  # SDXL text_time embedding
        _exp_linear(out, "add_embedding.linear_1", params["add_mlp"]["fc1"])
        _exp_linear(out, "add_embedding.linear_2", params["add_mlp"]["fc2"])
    _exp_norm(out, "conv_norm_out", params["norm_out"])
    _exp_conv(out, "conv_out", params["conv_out"])

    def block(prefix, blk):
        for j, r in enumerate(blk["resnets"]):
            _exp_resnet(out, f"{prefix}.resnets.{j}", r)
        for j, a in enumerate(blk["attns"]):
            _exp_transformer(out, f"{prefix}.attentions.{j}", a)
        if "downsample" in blk:
            _exp_conv(out, f"{prefix}.downsamplers.0.conv", blk["downsample"])
        if "upsample" in blk:
            _exp_conv(out, f"{prefix}.upsamplers.0.conv", blk["upsample"])

    for i, blk in enumerate(params["down"]):
        block(f"down_blocks.{i}", blk)
    for i, blk in enumerate(params["up"]):
        block(f"up_blocks.{i}", blk)
    _exp_resnet(out, "mid_block.resnets.0", params["mid"]["resnet1"])
    _exp_transformer(out, "mid_block.attentions.0", params["mid"]["attn"])
    _exp_resnet(out, "mid_block.resnets.1", params["mid"]["resnet2"])
    return out


def export_controlnet(params: dict) -> Dict[str, np.ndarray]:
    """models/controlnet.py tree → diffusers-ControlNetModel-named state dict
    (inverse of ``port_controlnet``; used for interop and round-trip tests)."""
    out: Dict[str, np.ndarray] = {}
    _exp_conv(out, "conv_in", params["conv_in"])
    _exp_linear(out, "time_embedding.linear_1", params["time_mlp"]["fc1"])
    _exp_linear(out, "time_embedding.linear_2", params["time_mlp"]["fc2"])
    if "add_mlp" in params:  # SDXL ControlNet text_time embedding
        _exp_linear(out, "add_embedding.linear_1", params["add_mlp"]["fc1"])
        _exp_linear(out, "add_embedding.linear_2", params["add_mlp"]["fc2"])
    for i, blk in enumerate(params["down"]):
        prefix = f"down_blocks.{i}"
        for j, r in enumerate(blk["resnets"]):
            _exp_resnet(out, f"{prefix}.resnets.{j}", r)
        for j, a in enumerate(blk["attns"]):
            _exp_transformer(out, f"{prefix}.attentions.{j}", a)
        if "downsample" in blk:
            _exp_conv(out, f"{prefix}.downsamplers.0.conv", blk["downsample"])
    _exp_resnet(out, "mid_block.resnets.0", params["mid"]["resnet1"])
    _exp_transformer(out, "mid_block.attentions.0", params["mid"]["attn"])
    _exp_resnet(out, "mid_block.resnets.1", params["mid"]["resnet2"])
    ce = params["cond_embedding"]
    _exp_conv(out, "controlnet_cond_embedding.conv_in", ce["conv_in"])
    for j, c in enumerate(ce["blocks"]):
        _exp_conv(out, f"controlnet_cond_embedding.blocks.{j}", c)
    _exp_conv(out, "controlnet_cond_embedding.conv_out", ce["conv_out"])
    for j, z in enumerate(params["zero_down"]):
        _exp_conv(out, f"controlnet_down_blocks.{j}", z)
    _exp_conv(out, "controlnet_mid_block", params["zero_mid"])
    return out


def export_vae(params: dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}

    def attn(pfx, p):
        _exp_norm(out, f"{pfx}.group_norm", p["norm"])
        _exp_linear(out, f"{pfx}.to_q", p["q"])
        _exp_linear(out, f"{pfx}.to_k", p["k"])
        _exp_linear(out, f"{pfx}.to_v", p["v"])
        _exp_linear(out, f"{pfx}.to_out.0", p["o"])

    def coder(side, c, blocks_key, updown):
        _exp_conv(out, f"{side}.conv_in", c["conv_in"])
        _exp_resnet(out, f"{side}.mid_block.resnets.0", c["mid"]["resnet1"])
        attn(f"{side}.mid_block.attentions.0", c["mid"]["attn"])
        _exp_resnet(out, f"{side}.mid_block.resnets.1", c["mid"]["resnet2"])
        _exp_norm(out, f"{side}.conv_norm_out", c["norm_out"])
        _exp_conv(out, f"{side}.conv_out", c["conv_out"])
        for i, blk in enumerate(c[updown]):
            pfx = f"{side}.{blocks_key}.{i}"
            for j, r in enumerate(blk["resnets"]):
                _exp_resnet(out, f"{pfx}.resnets.{j}", r)
            if "downsample" in blk:
                _exp_conv(out, f"{pfx}.downsamplers.0.conv", blk["downsample"])
            if "upsample" in blk:
                _exp_conv(out, f"{pfx}.upsamplers.0.conv", blk["upsample"])

    coder("encoder", params["encoder"], "down_blocks", "down")
    coder("decoder", params["decoder"], "up_blocks", "up")
    _exp_conv(out, "quant_conv", params["quant_conv"])
    _exp_conv(out, "post_quant_conv", params["post_quant_conv"])
    return out


def export_clip_text(params: dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    pfx = "text_model."
    out[f"{pfx}embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"]["table"])
    out[f"{pfx}embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]["table"])
    _exp_norm(out, f"{pfx}final_layer_norm", params["final_ln"])
    n_layers = params["layers"]["ln1"]["scale"].shape[0]
    for i in range(n_layers):
        layer = __import__("jax").tree.map(lambda x: x[i], params["layers"])
        lp = f"{pfx}encoder.layers.{i}"
        _exp_norm(out, f"{lp}.layer_norm1", layer["ln1"])
        _exp_norm(out, f"{lp}.layer_norm2", layer["ln2"])
        _exp_linear(out, f"{lp}.self_attn.q_proj", layer["attn"]["q"])
        _exp_linear(out, f"{lp}.self_attn.k_proj", layer["attn"]["k"])
        _exp_linear(out, f"{lp}.self_attn.v_proj", layer["attn"]["v"])
        _exp_linear(out, f"{lp}.self_attn.out_proj", layer["attn"]["o"])
        _exp_linear(out, f"{lp}.mlp.fc1", layer["mlp"]["fc1"])
        _exp_linear(out, f"{lp}.mlp.fc2", layer["mlp"]["fc2"])
    if "text_projection" in params:  # CLIPTextModelWithProjection (SDXL)
        _exp_linear(out, "text_projection", params["text_projection"])
    return out


# ---------------------------------------------------------------------------
# export a full diffusers save_pretrained directory (safetensors — no torch
# needed; the reverse of port_diffusers_checkpoint, so diffusers users can
# from_pretrained a model fine-tuned here)


def _unet_config_to_diffusers(c) -> dict:
    down = ["CrossAttnDownBlock2D" if x else "DownBlock2D"
            for x in c.cross_attn_blocks]
    up = ["CrossAttnUpBlock2D" if x else "UpBlock2D"
          for x in reversed(c.cross_attn_blocks)]
    heads = c.attention_heads
    out = {
        "_class_name": "UNet2DConditionModel",
        "_diffusers_version": "0.7.2",
        "in_channels": c.in_channels,
        "out_channels": c.out_channels,
        "block_out_channels": list(c.block_out_channels),
        "layers_per_block": c.layers_per_block,
        "cross_attention_dim": c.cross_attention_dim,
        # head COUNTS under the 0.7.2 constructor quirk (see
        # unet_config_from_diffusers)
        "attention_head_dim": (list(heads) if isinstance(heads, (tuple, list))
                               else heads),
        "norm_num_groups": c.norm_groups,
        "down_block_types": down,
        "up_block_types": up,
        "act_fn": "silu",
        "sample_size": 64,
    }
    depth = c.transformer_depth
    if (isinstance(depth, (tuple, list)) and max(depth) > 1) or \
            (isinstance(depth, int) and depth > 1):
        out["transformer_layers_per_block"] = (
            list(depth) if isinstance(depth, (tuple, list)) else depth)
        out["use_linear_projection"] = True  # the SDXL weight layout we emit
    if c.addition_embed_dim:
        out["addition_embed_type"] = "text_time"
        out["projection_class_embeddings_input_dim"] = c.addition_embed_dim
        out["addition_time_embed_dim"] = c.addition_time_embed_dim
        out["sample_size"] = 128
    return out


def _vae_config_to_diffusers(c) -> dict:
    n = len(c.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "_diffusers_version": "0.7.2",
        "in_channels": c.in_channels,
        "out_channels": c.in_channels,
        "latent_channels": c.latent_channels,
        "block_out_channels": list(c.block_out_channels),
        "layers_per_block": c.layers_per_block,
        "norm_num_groups": c.norm_groups,
        "scaling_factor": c.scaling_factor,
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "up_block_types": ["UpDecoderBlock2D"] * n,
        "act_fn": "silu",
    }


def _clip_config_to_diffusers(c) -> dict:
    out = {
        "architectures": ["CLIPTextModelWithProjection" if c.projection_dim
                          else "CLIPTextModel"],
        "model_type": "clip_text_model",
        "vocab_size": c.vocab_size,
        "hidden_size": c.hidden,
        "num_hidden_layers": c.layers,
        "num_attention_heads": c.heads,
        "intermediate_size": c.mlp,
        "max_position_embeddings": c.ctx,
        "layer_norm_eps": c.eps,
        "hidden_act": c.act,
    }
    if c.projection_dim:
        out["projection_dim"] = c.projection_dim
    return out


def export_diffusers_checkpoint(params: dict, cfg, out_dir: str) -> str:
    """Write a diffusers ``save_pretrained``-layout directory.

    ``cfg``: a PipelineConfig describing ``params``.  Components present in
    ``params`` are written as ``<comp>/*.safetensors`` + ``config.json``
    (fp32 — safetensors-numpy has no bf16); the scheduler dir records the
    reference's PNDM construction (utils.py:222-224) + prediction_type, and
    model_index.json makes the dir ``from_pretrained``-able.  Round-trips
    through port_diffusers_checkpoint / pipeline_config_from_diffusers
    (tested)."""
    from safetensors.numpy import save_file

    layout = {
        "unet": (export_unet, _unet_config_to_diffusers(cfg.unet),
                 "diffusion_pytorch_model.safetensors"),
        "vae": (export_vae, _vae_config_to_diffusers(cfg.vae),
                "diffusion_pytorch_model.safetensors"),
        "text_encoder": (export_clip_text,
                         _clip_config_to_diffusers(cfg.clip),
                         "model.safetensors"),
    }
    if getattr(cfg, "clip2", None) is not None:  # SDXL second encoder
        layout["text_encoder_2"] = (export_clip_text,
                                    _clip_config_to_diffusers(cfg.clip2),
                                    "model.safetensors")
    index = {"_class_name": ("StableDiffusionXLImg2ImgPipeline"
                             if getattr(cfg, "refiner", False)
                             else "StableDiffusionXLPipeline"
                             if getattr(cfg, "clip2", None) is not None
                             else "StableDiffusionPipeline"),
             "_diffusers_version": "0.7.2",
             "scheduler": ["diffusers", "PNDMScheduler"],
             "safety_checker": [None, None],
             "feature_extractor": [None, None]}
    for comp, (exp, cjson, fname) in layout.items():
        if comp not in params:
            continue
        cdir = os.path.join(out_dir, comp)
        os.makedirs(cdir, exist_ok=True)
        # ascontiguousarray, not asarray: the export helpers return
        # np.transpose VIEWS, and safetensors serializes the raw buffer —
        # a non-contiguous view would write the UNtransposed bytes
        sd = {k: np.ascontiguousarray(v, np.float32)
              for k, v in exp(params[comp]).items()}
        save_file(sd, os.path.join(cdir, fname))
        with open(os.path.join(cdir, "config.json"), "w") as f:
            json.dump(cjson, f, indent=2)
        if comp.startswith("text_encoder"):
            index[comp] = ["transformers", cjson["architectures"][0]]
        else:
            index[comp] = ["diffusers", cjson.get("_class_name")]
    sdir = os.path.join(out_dir, "scheduler")
    os.makedirs(sdir, exist_ok=True)
    s = cfg.schedule
    with open(os.path.join(sdir, "scheduler_config.json"), "w") as f:
        json.dump({"_class_name": "PNDMScheduler",
                   "_diffusers_version": "0.7.2",
                   "num_train_timesteps": s.num_train_timesteps,
                   "beta_start": s.beta_start, "beta_end": s.beta_end,
                   "beta_schedule": s.beta_schedule,
                   "skip_prk_steps": True,
                   "set_alpha_to_one": s.set_alpha_to_one,
                   "steps_offset": s.steps_offset,
                   "prediction_type": s.prediction_type}, f, indent=2)
    with open(os.path.join(out_dir, "model_index.json"), "w") as f:
        json.dump(index, f, indent=2)
    return out_dir


# ---------------------------------------------------------------------------
# BART (summarizer)


def port_bart(sd: Dict[str, np.ndarray]) -> dict:
    """transformers BartForConditionalGeneration state dict → models/bart.py tree."""
    def attn(pfx):
        return {"q": _linear(sd, f"{pfx}.q_proj"),
                "k": _linear(sd, f"{pfx}.k_proj"),
                "v": _linear(sd, f"{pfx}.v_proj"),
                "o": _linear(sd, f"{pfx}.out_proj")}

    def layer(pfx, cross):
        p = {
            "self_attn": attn(f"{pfx}.self_attn"),
            "self_ln": _norm(sd, f"{pfx}.self_attn_layer_norm"),
            "fc1": _linear(sd, f"{pfx}.fc1"),
            "fc2": _linear(sd, f"{pfx}.fc2"),
            "final_ln": _norm(sd, f"{pfx}.final_layer_norm"),
        }
        if cross:
            p["cross_attn"] = attn(f"{pfx}.encoder_attn")
            p["cross_ln"] = _norm(sd, f"{pfx}.encoder_attn_layer_norm")
        return p

    def layers(side, cross):
        out, i = [], 0
        while f"model.{side}.layers.{i}.self_attn.q_proj.weight" in sd:
            out.append(layer(f"model.{side}.layers.{i}", cross))
            i += 1
        return out

    return {
        "shared_embedding": {"table": jnp.asarray(
            sd["model.shared.weight"].astype(np.float32))},
        "enc_pos": {"table": jnp.asarray(
            sd["model.encoder.embed_positions.weight"].astype(np.float32))},
        "dec_pos": {"table": jnp.asarray(
            sd["model.decoder.embed_positions.weight"].astype(np.float32))},
        "enc_ln_emb": _norm(sd, "model.encoder.layernorm_embedding"),
        "dec_ln_emb": _norm(sd, "model.decoder.layernorm_embedding"),
        "encoder": layers("encoder", cross=False),
        "decoder": layers("decoder", cross=True),
    }


# ---------------------------------------------------------------------------
# FID InceptionV3 (pt-inception-2015-12-05 / torchvision naming)


def _inc_cbr(sd, name):
    """BasicConv2d: conv + BN(gamma, beta, running stats)."""
    p = {
        "w": jnp.asarray(np.transpose(sd[f"{name}.conv.weight"],
                                      (2, 3, 1, 0)).astype(np.float32)),
        "gamma": jnp.asarray(sd[f"{name}.bn.weight"].astype(np.float32)),
        "beta": jnp.asarray(sd[f"{name}.bn.bias"].astype(np.float32)),
        "mean": jnp.asarray(sd[f"{name}.bn.running_mean"].astype(np.float32)),
        "var": jnp.asarray(sd[f"{name}.bn.running_var"].astype(np.float32)),
    }
    return p


def port_fid_inception(sd: Dict[str, np.ndarray]) -> dict:
    """pt_inception-2015-12-05 (pytorch-fid) state dict → models/inception.py.

    This is THE standard FID weights file (a port of the reference's frozen
    TF graph, fid.py:273).  Feed the result to eval.fid get_activations for
    numeric FID parity with the CUDA/TF reference.
    """
    c = _inc_cbr
    p = {"stem": {
        "c1": c(sd, "Conv2d_1a_3x3"),
        "c2": c(sd, "Conv2d_2a_3x3"),
        "c3": c(sd, "Conv2d_2b_3x3"),
        "c4": c(sd, "Conv2d_3b_1x1"),
        "c5": c(sd, "Conv2d_4a_3x3"),
    }}
    p["mixed35"] = []
    for blk in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        # torchvision names the 5x5 branch of 5c differently (branch5x5 vs
        # branch5x5_1/2 are consistent; pool branch is branch_pool)
        p["mixed35"].append({
            "b1x1": c(sd, f"{blk}.branch1x1"),
            "b5x5_1": c(sd, f"{blk}.branch5x5_1"),
            "b5x5_2": c(sd, f"{blk}.branch5x5_2"),
            "b3x3_1": c(sd, f"{blk}.branch3x3dbl_1"),
            "b3x3_2": c(sd, f"{blk}.branch3x3dbl_2"),
            "b3x3_3": c(sd, f"{blk}.branch3x3dbl_3"),
            "pool": c(sd, f"{blk}.branch_pool"),
        })
    p["red17"] = {
        "b3x3": c(sd, "Mixed_6a.branch3x3"),
        "b3x3d_1": c(sd, "Mixed_6a.branch3x3dbl_1"),
        "b3x3d_2": c(sd, "Mixed_6a.branch3x3dbl_2"),
        "b3x3d_3": c(sd, "Mixed_6a.branch3x3dbl_3"),
    }
    p["mixed17"] = []
    for blk in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        p["mixed17"].append({
            "b1x1": c(sd, f"{blk}.branch1x1"),
            "b7x7_1": c(sd, f"{blk}.branch7x7_1"),
            "b7x7_2": c(sd, f"{blk}.branch7x7_2"),
            "b7x7_3": c(sd, f"{blk}.branch7x7_3"),
            "b7x7d_1": c(sd, f"{blk}.branch7x7dbl_1"),
            "b7x7d_2": c(sd, f"{blk}.branch7x7dbl_2"),
            "b7x7d_3": c(sd, f"{blk}.branch7x7dbl_3"),
            "b7x7d_4": c(sd, f"{blk}.branch7x7dbl_4"),
            "b7x7d_5": c(sd, f"{blk}.branch7x7dbl_5"),
            "pool": c(sd, f"{blk}.branch_pool"),
        })
    p["red8"] = {
        "b3x3_1": c(sd, "Mixed_7a.branch3x3_1"),
        "b3x3_2": c(sd, "Mixed_7a.branch3x3_2"),
        "b7x7_1": c(sd, "Mixed_7a.branch7x7x3_1"),
        "b7x7_2": c(sd, "Mixed_7a.branch7x7x3_2"),
        "b7x7_3": c(sd, "Mixed_7a.branch7x7x3_3"),
        "b7x7_4": c(sd, "Mixed_7a.branch7x7x3_4"),
    }
    p["mixed8"] = []
    for blk in ("Mixed_7b", "Mixed_7c"):
        p["mixed8"].append({
            "b1x1": c(sd, f"{blk}.branch1x1"),
            "b3x3_1": c(sd, f"{blk}.branch3x3_1"),
            "b3x3_2a": c(sd, f"{blk}.branch3x3_2a"),
            "b3x3_2b": c(sd, f"{blk}.branch3x3_2b"),
            "b3x3d_1": c(sd, f"{blk}.branch3x3dbl_1"),
            "b3x3d_2": c(sd, f"{blk}.branch3x3dbl_2"),
            "b3x3d_3a": c(sd, f"{blk}.branch3x3dbl_3a"),
            "b3x3d_3b": c(sd, f"{blk}.branch3x3dbl_3b"),
            "pool": c(sd, f"{blk}.branch_pool"),
        })
    return p


def load_fid_inception(weights_path: str) -> dict:
    """Load pt_inception-2015-12-05-*.pth (torch) or a .npz of it."""
    if weights_path.endswith(".npz"):
        flat = dict(np.load(weights_path))
        return port_fid_inception(flat)
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    return port_fid_inception({k: v.numpy() for k, v in sd.items()})


# ---------------------------------------------------------------------------
# safety checker (StableDiffusionSafetyChecker = CLIP vision tower +
# visual projection + learned concept embeddings)


def port_clip_vision(sd: Dict[str, np.ndarray]) -> dict:
    """transformers CLIPVisionModel state dict → models/clip.vision_init tree.

    Accepts the bare CLIPVisionModel ("vision_model.embeddings...") or the
    raw CLIPVisionTransformer ("embeddings...") key layouts.
    """
    pfx = "vision_model." if "vision_model.post_layernorm.weight" in sd \
        else ""
    layers = []
    i = 0
    while f"{pfx}encoder.layers.{i}.layer_norm1.weight" in sd:
        lp = f"{pfx}encoder.layers.{i}"
        layers.append({
            "ln1": _norm(sd, f"{lp}.layer_norm1"),
            "attn": {
                "q": _linear(sd, f"{lp}.self_attn.q_proj"),
                "k": _linear(sd, f"{lp}.self_attn.k_proj"),
                "v": _linear(sd, f"{lp}.self_attn.v_proj"),
                "o": _linear(sd, f"{lp}.self_attn.out_proj"),
            },
            "ln2": _norm(sd, f"{lp}.layer_norm2"),
            "mlp": {
                "fc1": _linear(sd, f"{lp}.mlp.fc1"),
                "fc2": _linear(sd, f"{lp}.mlp.fc2"),
            },
        })
        i += 1
    if not layers:
        raise ValueError("no CLIP vision encoder layers found in state dict")
    import jax

    return {
        "class_embedding": jnp.asarray(
            sd[f"{pfx}embeddings.class_embedding"].astype(np.float32)),
        "patch_embedding": _conv(sd, f"{pfx}embeddings.patch_embedding"),
        "position_embedding": {"table": jnp.asarray(
            sd[f"{pfx}embeddings.position_embedding.weight"].astype(
                np.float32))},
        "pre_ln": _norm(sd, f"{pfx}pre_layrnorm"),  # transformers' own typo
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "post_ln": _norm(sd, f"{pfx}post_layernorm"),
    }


def port_safety_checker(sd: Dict[str, np.ndarray]) -> dict:
    """StableDiffusionSafetyChecker state dict → ClipSafetyChecker params.

    The checker nests CLIPVisionModel as ``vision_model`` (so its keys
    start "vision_model.vision_model."); the head carries the visual
    projection and the learned concept tables + thresholds.
    """
    vision_sd = {k[len("vision_model."):]: v for k, v in sd.items()
                 if k.startswith("vision_model.")}
    return {
        "vision": port_clip_vision(vision_sd),
        "visual_projection": _linear(sd, "visual_projection"),
        "concept_embeds": jnp.asarray(
            sd["concept_embeds"].astype(np.float32)),
        "concept_weights": jnp.asarray(
            sd["concept_embeds_weights"].astype(np.float32)),
        "special_care_embeds": jnp.asarray(
            sd["special_care_embeds"].astype(np.float32)),
        "special_care_weights": jnp.asarray(
            sd["special_care_embeds_weights"].astype(np.float32)),
    }


def safety_checker_from_dir(path: str):
    """A diffusers safety_checker dir → (params, CLIPVisionConfig).

    Reads the dir's config.json vision_config for the tower geometry
    (mirroring the other component-config inference paths) and ports the
    weights; pair with ``models.safety.ClipSafetyChecker``.
    """
    import os

    from sdbc_tpu.models.clip import CLIPVisionConfig

    cfg_path = os.path.join(path, "config.json")
    vcfg = CLIPVisionConfig.sd_safety()
    if os.path.exists(cfg_path):
        raw = _read_json(cfg_path).get("vision_config", {})
        vcfg = CLIPVisionConfig(
            hidden=raw.get("hidden_size", vcfg.hidden),
            layers=raw.get("num_hidden_layers", vcfg.layers),
            heads=raw.get("num_attention_heads", vcfg.heads),
            mlp=raw.get("intermediate_size", vcfg.mlp),
            patch=raw.get("patch_size", vcfg.patch),
            image_size=raw.get("image_size", vcfg.image_size),
            eps=raw.get("layer_norm_eps", vcfg.eps),
            act=raw.get("hidden_act", vcfg.act),
        )
    return port_safety_checker(load_state_dict(path)), vcfg


def clip_model_from_dir(path: str):
    """A transformers CLIPModel save dir → (params, text_cfg, vision_cfg)
    for eval/clip_score.ClipScorer.

    The dual-tower CLIPModel state dict nests both towers
    ("text_model.*" / "vision_model.*") next to the two bias-free
    projections; config.json carries text_config/vision_config +
    projection_dim.  Reuses the component porters (port_clip_text picks
    up text_projection on its own).
    """
    import os

    from sdbc_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig

    raw = _read_json(os.path.join(path, "config.json"))
    tc, vc = raw.get("text_config", {}), raw.get("vision_config", {})
    proj = raw.get("projection_dim", 512)
    text_cfg = CLIPTextConfig(
        vocab_size=tc.get("vocab_size", 49408),
        hidden=tc.get("hidden_size", 512),
        layers=tc.get("num_hidden_layers", 12),
        heads=tc.get("num_attention_heads", 8),
        mlp=tc.get("intermediate_size", 2048),
        ctx=tc.get("max_position_embeddings", 77),
        eps=tc.get("layer_norm_eps", 1e-5),
        act=tc.get("hidden_act", "quick_gelu"),
        projection_dim=proj,
    )
    vision_cfg = CLIPVisionConfig(
        hidden=vc.get("hidden_size", 768),
        layers=vc.get("num_hidden_layers", 12),
        heads=vc.get("num_attention_heads", 12),
        mlp=vc.get("intermediate_size", 3072),
        patch=vc.get("patch_size", 32),
        image_size=vc.get("image_size", 224),
        eps=vc.get("layer_norm_eps", 1e-5),
        act=vc.get("hidden_act", "quick_gelu"),
    )
    sd = load_state_dict(path)
    vision_sd = {k[len("vision_model."):]: v for k, v in sd.items()
                 if k.startswith("vision_model.")}
    params = {
        "text": port_clip_text(sd),          # text_model.* + text_projection
        "vision": port_clip_vision(vision_sd),
        "visual_projection": _linear(sd, "visual_projection"),
    }
    if "text_projection" not in params["text"]:
        raise ValueError(f"{path}: no text_projection in state dict — not "
                         "a CLIPModel checkpoint")
    return params, text_cfg, vision_cfg
