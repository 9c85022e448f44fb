"""Checkpoint save/load — orbax-backed, diffusers-shaped logical layout.

Replaces the reference's ``pipeline.save_pretrained`` + ``optimizer.pt`` +
wandb-artifact dance (finetune_sd.py:511-545, utils.py:181-256, SURVEY.md L0):
a checkpoint directory holds one orbax PyTree per component

    <dir>/unet/ <dir>/vae/ <dir>/text_encoder/   (params)
    <dir>/opt_state/                              (optional optimizer state)
    <dir>/config.json                             (model/schedule configs)
    <dir>/metadata.json                           (step, best loss, hyperparams)

so components can be saved/loaded independently (the reference's
train-text-encoder-only runs re-use the frozen UNet), sharded arrays restore
across different meshes, and the layout stays recognisable to diffusers users.
Versioned runs live under ``runs/<run_id>/ckpt-<n>`` (wandb artifact-version
equivalent, gated tracking lives in utils/tracking.py).
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np

from sdbc_tpu.diffusion.pipeline import PipelineConfig
from sdbc_tpu.diffusion.schedulers import ScheduleConfig
from sdbc_tpu.models.clip import CLIPTextConfig
from sdbc_tpu.models.unet import UNetConfig
from sdbc_tpu.models.vae import VAEConfig

# "controlnet" is optional — present only on ControlNet-training runs
# (models/controlnet.py); both save and load skip absent components
COMPONENTS = ("text_encoder", "text_encoder_2", "unet", "vae", "controlnet")


def _ckpt():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_pipeline(path: str, params: dict, cfg: PipelineConfig,
                  opt_state: Any = None, metadata: Optional[dict] = None,
                  lora: Optional[dict] = None, lora_rank: int = 0,
                  lora_alpha: float = 0.0,
                  ema: Optional[dict] = None,
                  ti: Optional[tuple] = None) -> None:
    """``lora``: optional adapter dict (train/lora.py).  A LoRA checkpoint
    stores the UNTOUCHED base components plus ``lora.npz``; load_pipeline
    merges them by default, so every consumer sees the tuned model while
    the adapter stays separately shippable.

    ``ema``: optional EMA shadow of the trained components
    ({component: params} subset, TrainState.ema).  Stored under
    ``<dir>/ema``; load_pipeline overlays it by default (EMA weights are
    what diffusion checkpoints serve), while resume restores the raw
    components + the shadow separately so Adam moments stay aligned.

    ``ti``: optional (rows, token, ids) textual-inversion triple
    (train/textual_inversion.py).  Stored as ``ti.npz`` + the tokenizer's
    ``added_tokens.json``; load_pipeline merges the rows into the embedding
    table (and bumps clip.vocab_size) by default."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = _ckpt()
    for comp in COMPONENTS:
        if comp in params:
            ckptr.save(os.path.join(path, comp), params[comp], force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    if ema is not None:
        bad = set(ema) - set(COMPONENTS)
        if bad:
            # a {"lora": ...} shadow has no component to overlay at load —
            # the finetune CLI refuses --ema_decay with --lora_rank up front
            raise ValueError(f"ema tree may only hold component subtrees "
                             f"{COMPONENTS}, got extra keys {sorted(bad)}")
        ckptr.save(os.path.join(path, "ema"), ema, force=True)
    if lora is not None:
        from sdbc_tpu.train import lora as lora_mod

        lora_mod.save_lora(os.path.join(path, "lora.npz"), lora,
                           lora_rank, lora_alpha)
    if ti is not None:
        from sdbc_tpu.train import textual_inversion as ti_mod

        # (rows, token, ids) or (rows, token, ids, rows2) — the 4-tuple is
        # a dual-encoder (SDXL) embedding
        rows, token, ids = ti[:3]
        rows2 = ti[3] if len(ti) > 3 else None
        ti_mod.save_ti(os.path.join(path, "ti.npz"), rows, token, ids,
                       rows2=rows2)
        with open(os.path.join(path, "added_tokens.json"), "w") as f:
            json.dump({token: list(map(int, ids))}, f, indent=2)
    # all component saves must land BEFORE config.json: it doubles as the
    # completeness marker latest_checkpoint() keys resume on, so a kill
    # mid-save leaves a dir that resume skips instead of a torn restore
    ckptr.wait_until_finished()
    # metadata BEFORE config.json: config.json is the completeness marker,
    # so nothing may be written after it (a kill in between would yield a
    # "complete" checkpoint whose resume restarts at step 0)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(metadata or {}, f, indent=2, default=float)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config_to_json(cfg), f, indent=2)


def load_pipeline(path: str, template_params: Optional[dict] = None,
                  with_opt_state: bool = False, merge_lora: bool = True,
                  use_ema: bool = True, merge_ti: bool = True):
    """→ (params, cfg[, opt_state]).  template_params enables sharded/typed
    restore onto an existing layout; without it arrays restore as saved.

    A ``lora.npz`` adapter saved alongside the components is merged into
    the base weights by default (the checkpoint's tuned model); pass
    merge_lora=False to get the raw base (LoRA training resume restores
    the adapter separately so Adam moments stay aligned with a/b).

    An ``ema/`` shadow (saved by --ema_decay training) likewise overlays
    the raw components by default — EMA weights are the checkpoint's
    servable model; pass use_ema=False for the raw masters (training
    resume)."""
    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = config_from_json(json.load(f))
    ckptr = _ckpt()
    params = {}
    for comp in COMPONENTS:
        cpath = os.path.join(path, comp)
        if os.path.exists(cpath):
            target = template_params.get(comp) if template_params else None
            params[comp] = ckptr.restore(cpath, target) if target is not None \
                else ckptr.restore(cpath)
    epath = os.path.join(path, "ema")
    if use_ema and os.path.exists(epath):
        shadow = ckptr.restore(epath)
        params.update(shadow)  # component-keyed subset of the params tree
    lpath = os.path.join(path, "lora.npz")
    if merge_lora and os.path.exists(lpath):
        from sdbc_tpu.train import lora as lora_mod

        params = lora_mod.merge_file(params, lpath)
    tpath = os.path.join(path, "ti.npz")
    if merge_ti and os.path.exists(tpath):
        from sdbc_tpu.train import textual_inversion as ti_mod

        params, meta = ti_mod.merge_file(params, tpath)
        # the merged table is longer than the saved config's vocab — keep
        # the returned cfg consistent with the params it describes, and
        # pin eot_id to the TRUE eos (vocab_size−1 would now point at an
        # appended row, silently mispooling SDXL's conditioning)
        n = len(meta["ids"])
        cfg = dataclasses.replace(
            cfg, clip=dataclasses.replace(
                cfg.clip, vocab_size=cfg.clip.vocab_size + n,
                eot_id=cfg.clip.eot_id if cfg.clip.eot_id is not None
                else cfg.clip.vocab_size - 1))
        if "rows2" in meta and cfg.clip2 is not None:
            cfg = dataclasses.replace(
                cfg, clip2=dataclasses.replace(
                    cfg.clip2, vocab_size=cfg.clip2.vocab_size + n,
                    eot_id=cfg.clip2.eot_id if cfg.clip2.eot_id is not None
                    else cfg.clip2.vocab_size - 1))
    if with_opt_state:
        opath = os.path.join(path, "opt_state")
        opt_state = ckptr.restore(opath) if os.path.exists(opath) else None
        return params, cfg, opt_state
    return params, cfg


def load_opt_state(path: str, template: Any):
    """Restore optimizer state onto a freshly-initialised template tree.

    optax states are NamedTuple trees; restoring WITHOUT a template yields
    plain dicts that optax.update cannot consume — so resume callers must
    pass ``opt.init(trainable)`` (or an existing TrainState.opt_state) as the
    template.  Returns None when the checkpoint has no opt_state (mirrors the
    reference's optional optimizer.pt, finetune_sd.py:536-537).
    """
    opath = os.path.join(os.path.abspath(path), "opt_state")
    if not os.path.exists(opath):
        return None
    return _ckpt().restore(opath, template)


def load_ema(path: str, template: Any = None):
    """Restore the EMA shadow tree, or None when the checkpoint has none.

    ``template`` (e.g. a fresh TrainState.ema) enables typed/sharded
    restore, exactly as load_opt_state does for optimizer state.
    """
    epath = os.path.join(os.path.abspath(path), "ema")
    if not os.path.exists(epath):
        return None
    ckptr = _ckpt()
    return ckptr.restore(epath, template) if template is not None \
        else ckptr.restore(epath)


def load_metadata(path: str) -> dict:
    mpath = os.path.join(path, "metadata.json")
    if not os.path.exists(mpath):
        return {}
    with open(mpath) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# config (de)serialisation


def config_to_json(cfg: PipelineConfig) -> dict:
    out = {
        "clip": dataclasses.asdict(cfg.clip),
        "unet": dataclasses.asdict(cfg.unet),
        "vae": dataclasses.asdict(cfg.vae),
        "schedule": dataclasses.asdict(cfg.schedule),
        "scheduler": cfg.scheduler,
    }
    if cfg.controlnet is not None:
        out["controlnet"] = {
            "conditioning_channels":
                list(cfg.controlnet.conditioning_channels)}
    if cfg.clip2 is not None:  # SDXL second encoder
        out["clip2"] = dataclasses.asdict(cfg.clip2)
    if getattr(cfg, "refiner", False):  # SDXL refiner flavor
        out["refiner"] = True
    return out


def config_from_json(d: dict) -> PipelineConfig:
    def tup(x):
        return tuple(x) if isinstance(x, list) else x

    unet_cfg = UNetConfig(**{k: tup(v) for k, v in d["unet"].items()})
    controlnet = None
    if "controlnet" in d:
        from sdbc_tpu.models.controlnet import ControlNetConfig

        # the branch's encoder layout IS the base UNet's (the residual
        # shape contract) — only the embedder ramp is stored separately
        controlnet = ControlNetConfig(
            unet=unet_cfg,
            conditioning_channels=tup(d["controlnet"]
                                      ["conditioning_channels"]))
    return PipelineConfig(
        clip=CLIPTextConfig(**d["clip"]),
        unet=unet_cfg,
        vae=VAEConfig(**{k: tup(v) for k, v in d["vae"].items()}),
        schedule=ScheduleConfig(**d["schedule"]),
        scheduler=d.get("scheduler", "ddim"),
        controlnet=controlnet,
        clip2=CLIPTextConfig(**d["clip2"]) if "clip2" in d else None,
        refiner=bool(d.get("refiner", False)),
    )


# ---------------------------------------------------------------------------
# versioned runs (wandb-artifact-version equivalent)


def run_dir(output_dir: str, run_id: str) -> str:
    return os.path.join(output_dir, "runs", run_id)


def latest_checkpoint(output_dir: str, run_id: str) -> Optional[str]:
    """Newest COMPLETE checkpoint (config.json is written last by
    save_pipeline, so its presence marks a finished save — a dir torn by
    a mid-save kill is skipped in favor of the previous good one)."""
    base = run_dir(output_dir, run_id)
    if not os.path.isdir(base):
        return None
    cands = [d for d in os.listdir(base)
             if d.startswith("ckpt-")
             and os.path.exists(os.path.join(base, d, "config.json"))]
    if not cands:
        return None
    latest = max(cands, key=lambda d: int(d.split("-")[1]))
    return os.path.join(base, latest)


def new_checkpoint_path(output_dir: str, run_id: str, step: int) -> str:
    return os.path.join(run_dir(output_dir, run_id), f"ckpt-{step}")
