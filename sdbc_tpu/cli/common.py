"""Shared CLI plumbing: proper boolean flags, model resolution, seeding.

Fixes the reference's argparse footguns (SURVEY.md §5 config system): its
``type=bool`` flags treat any non-empty string as True (finetune_sd.py:27),
and its mode ``choices`` list is one malformed string (inference.py:48-49).
Here booleans are argparse.BooleanOptionalAction (--flag / --no-flag).
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp

from sdbc_tpu.utils.cache import enable_persistent_cache


def maybe_init_distributed() -> None:
    """Multi-host init (multi-slice pods): gated so single-host runs are
    untouched.  This is the launcher-semantics equivalent of the
    reference's ``notebook_launcher(..., num_processes=N)`` worker setup
    (finetune_sd.py:590-593): each OS process joins one coordination
    plane, and parallel.host_local_batch_indices shards input loading
    per host.

    Two wire-ups:
      - TPU pods: SDBC_MULTIHOST=1 → jax.distributed autodetects the
        coordinator from the TPU metadata.
      - explicit (CPU pods / tests / bare clusters): COORDINATOR_ADDRESS
        plus SDBC_NUM_PROCESSES + SDBC_PROCESS_ID.
    """
    coord = os.environ.get("COORDINATOR_ADDRESS")
    nproc = os.environ.get("SDBC_NUM_PROCESSES")
    if not (os.environ.get("SDBC_MULTIHOST") == "1" or coord):
        return
    if jax.distributed.is_initialized():  # idempotent (import + CLI main)
        return
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=int(nproc),
            process_id=int(os.environ["SDBC_PROCESS_ID"]))
    else:
        jax.distributed.initialize()


# ORDER MATTERS: jax.distributed.initialize must run before anything that
# initialises the XLA backend, and enable_persistent_cache probes the
# backend (default_backend) to pick the cache key.  Doing both at import
# time keeps every CLI multi-host-safe without per-main boilerplate (the
# 2-process integration test, tests/test_multiprocess.py, exercises this).
maybe_init_distributed()
enable_persistent_cache()


def bool_flag(parser: argparse.ArgumentParser, name: str, default: bool,
              help: str = "") -> None:
    parser.add_argument(f"--{name}", action=argparse.BooleanOptionalAction,
                        default=default, help=help)


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--ckpt", type=str, default="",
                   help="checkpoint dir (utils/checkpoint.py layout)")
    p.add_argument("--diffusers_ckpt", type=str, default="",
                   help="diffusers save_pretrained dir (ported on the fly)")
    p.add_argument("--wandb_artifact_run", type=str, default="",
                   help="wandb run id to download stable_diffusion_model from")
    p.add_argument("--wandb_artifact_version", type=str, default="latest")
    p.add_argument("--output_dir", type=str, default="./outputs")
    p.add_argument("--run_id", type=str, default="dev")
    p.add_argument("--tokenizer_dir", type=str, default="",
                   help="dir with CLIP vocab.json+merges.txt")
    # default None = "not explicitly chosen": fresh runs resolve to ddim,
    # checkpoint loads KEEP the checkpoint's scheduler (an argparse default
    # would silently flip a resumed pndm run back to ddim)
    p.add_argument("--scheduler", type=str, default=None,
                   choices=["ddim", "pndm", "ddpm", "dpm", "dpm_sde",
                            "euler_a", "lms", "unipc", "lcm", "heun"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--prompt_bank", type=str, default="native",
                   choices=["native", "reference"],
                   help="'reference' renders byte-exact reference template "
                        "strings (first-slot legible interpolation) for "
                        "apples-to-apples FID/grid comparisons")
    p.add_argument("--lora_path", type=str, default="",
                   help="lora.npz adapter (train/lora.py) merged into the "
                        "resolved base weights at load — serve any base + "
                        "adapter combination without re-exporting")
    p.add_argument("--ti_path", type=str, default="",
                   help="ti.npz textual-inversion embedding "
                        "(train/textual_inversion.py) merged into the "
                        "resolved base at load; the placeholder token "
                        "registers on the tokenizer and composes into any "
                        "prompt")
    p.add_argument("--controlnet_path", type=str, default="",
                   help="diffusers ControlNetModel dir (or a pipeline dir "
                        "with a controlnet/ subfolder) attached onto the "
                        "resolved base (models/controlnet.py); activate per "
                        "image with --control_image")
    p.add_argument("--model_family", type=str, default="sd15",
                   choices=["sd15", "sd21", "sdxl"],
                   help="architecture preset for FRESH inits (checkpoint / "
                        "diffusers loads infer the family from their own "
                        "configs); composes with --tiny (toy shapes of the "
                        "same family)")
    bool_flag(p, "zero_snr", False,
              "rescale the beta schedule to exactly zero terminal SNR "
              "(arXiv:2305.08891; requires a v-prediction model and the "
              "ddim/unipc schedulers; pair with --timestep_spacing "
              "trailing and --guidance_rescale)")
    p.add_argument("--timestep_spacing", type=str, default=None,
                   choices=["leading", "trailing"],
                   help="inference grid construction (default: keep the "
                        "checkpoint's / 'leading'); 'trailing' starts at "
                        "t=T-1 — required for --zero_snr to sample the "
                        "pure-noise endpoint")
    bool_flag(p, "tiny", False, "tiny test config instead of SD-1.5")
    bool_flag(p, "bf16", True, "bfloat16 compute")


def add_img_size_arg(p):
    p.add_argument("--img_size", type=int, default=None,
                   help="image side in pixels (default 512; 32 with --tiny)")


def resolve_img_size(args):
    """Default --img_size against --tiny AFTER parsing.

    The tiny VAE only downsamples 2x (vs SD's 8x), so --tiny at the full
    512 default would build a 256x256-latent graph whose self-attention
    allocates hundreds of GB — never what a --tiny caller wants.
    """
    if args.img_size is None:
        args.img_size = 32 if getattr(args, "tiny", False) else 512


def _collect_added_tokens(args):
    """Textual-inversion placeholder registrations for the tokenizer(s).

    Checkpoints carry added_tokens.json (utils/checkpoint.save_pipeline
    ti=...); --ti_path files carry their own meta.  Without the
    registration the placeholder string would BPE into ordinary tokens and
    miss the learned rows."""
    import json as _json

    added = {}
    ck = getattr(args, "ckpt", "") or ""
    atp = os.path.join(ck, "added_tokens.json") if ck else ""
    if atp and os.path.exists(atp):
        with open(atp) as f:
            raw = _json.load(f)
        added = {k: (v if isinstance(v, list) else [v])
                 for k, v in raw.items()}
    tp = getattr(args, "ti_path", "") or ""
    if tp:
        from sdbc_tpu.train import textual_inversion as ti_mod

        _, meta = ti_mod.load_ti(tp)
        added.update(ti_mod.added_tokens_entry(meta))
    return added


def make_tokenizer(args, vocab_size: int):
    """``vocab_size``: the BASE vocab (without textual-inversion rows — a
    TI checkpoint's added_tokens.json re-registers those below)."""
    from sdbc_tpu.data.tokenizer import CLIPTokenizer

    added = _collect_added_tokens(args)
    if args.tokenizer_dir:
        tok = CLIPTokenizer.from_pretrained(args.tokenizer_dir)
    else:
        # a TI checkpoint's cfg.clip.vocab_size includes the appended rows;
        # the fallback's hash buckets must span only the BASE vocab or
        # bucket ids would collide with the placeholder ids
        n_added = sum(len(v) for v in added.values())
        tok = CLIPTokenizer.fallback(vocab_size - n_added)
    if added and not tok.added_tokens:
        tok.added_tokens.update(added)
    return tok


def make_tokenizer2(args, cfg):
    """SDXL second (OpenCLIP) tokenizer: prefer the checkpoint dir's own
    ``tokenizer_2/`` (its "!" pad token differs from CLIP-L's); None for
    single-encoder families or when no dir ships one — SDPipeline then
    falls back to the primary tokenizer (pad ids only differ)."""
    if getattr(cfg, "clip2", None) is None:
        return None
    from sdbc_tpu.data.tokenizer import CLIPTokenizer

    for base in (getattr(args, "diffusers_ckpt", "") or "",
                 getattr(args, "ckpt", "") or ""):
        d = os.path.join(base, "tokenizer_2") if base else ""
        if d and os.path.exists(os.path.join(d, "vocab.json")):
            tok2 = CLIPTokenizer.from_pretrained(d)
            # SDXL textual inversion: the placeholder registers at the
            # SAME ids in both tokenizers (shared base vocabulary)
            added = _collect_added_tokens(args)
            if added and not tok2.added_tokens:
                tok2.added_tokens.update(added)
            return tok2
    return None


def resolve_params_cfg(args):
    """3-way model resolution (reference utils.py:181-256 / inference.py:388-429):
    checkpoint dir → load; else fresh init (tiny or SD-1.5 shapes).

    Zero-egress: there is no HF-hub branch; pretrained weights enter via
    --ckpt (our layout) or models/port.py (diffusers-format conversion).
    """
    from sdbc_tpu.diffusion.pipeline import PipelineConfig
    from sdbc_tpu.models import clip, unet, vae
    from sdbc_tpu.utils import checkpoint as ckpt_mod

    import dataclasses

    def finish(params, cfg):
        over = {}
        if getattr(args, "zero_snr", False):
            over["rescale_zero_snr"] = True
        if getattr(args, "timestep_spacing", None):
            over["timestep_spacing"] = args.timestep_spacing
        if over:
            cfg = dataclasses.replace(
                cfg, schedule=dataclasses.replace(cfg.schedule, **over))
        lp = getattr(args, "lora_path", "")
        if lp:
            from sdbc_tpu.train import lora as lora_mod

            params = lora_mod.merge_file(params, lp)
            print(f"merged LoRA adapter {lp}")
        tp = getattr(args, "ti_path", "")
        if tp:
            from sdbc_tpu.train import textual_inversion as ti_mod

            params, meta = ti_mod.merge_file(params, tp)
            n = len(meta["ids"])
            cfg = dataclasses.replace(cfg, clip=dataclasses.replace(
                cfg.clip, vocab_size=cfg.clip.vocab_size + n,
                eot_id=cfg.clip.eot_id if cfg.clip.eot_id is not None
                else cfg.clip.vocab_size - 1))
            if "rows2" in meta and cfg.clip2 is not None:
                cfg = dataclasses.replace(cfg, clip2=dataclasses.replace(
                    cfg.clip2, vocab_size=cfg.clip2.vocab_size + n,
                    eot_id=cfg.clip2.eot_id if cfg.clip2.eot_id is not None
                    else cfg.clip2.vocab_size - 1))
            print(f"merged textual inversion {tp} ({meta['token']!r})")
        cp = getattr(args, "controlnet_path", "")
        if cp:
            from sdbc_tpu.models.port import load_controlnet

            branches = []
            cn_cfg = None
            # comma-separated paths = multi-ControlNet (residuals sum);
            # every branch must share the base model's encoder layout
            for one in [s for s in cp.split(",") if s]:
                cn_params, cn_cfg = load_controlnet(one)
                # the residual shapes depend on the encoder-half layout
                # only — out_channels (absent from ControlNet configs) is
                # irrelevant
                probe = dataclasses.replace(
                    cn_cfg.unet, out_channels=cfg.unet.out_channels)
                if probe != cfg.unet:
                    raise SystemExit(
                        f"--controlnet_path {one}: its UNet layout "
                        f"{cn_cfg.unet} does not match the base model's "
                        f"{cfg.unet} — the injected residual shapes would "
                        "disagree")
                branches.append(cn_params)
                print(f"attached ControlNet {one}")
            params = {**params, "controlnet":
                      branches[0] if len(branches) == 1 else branches}
            cfg = dataclasses.replace(
                cfg, controlnet=dataclasses.replace(
                    cn_cfg, unet=dataclasses.replace(
                        cn_cfg.unet, out_channels=cfg.unet.out_channels)))
        return params, cfg

    if getattr(args, "wandb_artifact_run", ""):
        # wandb-artifact branch of the reference's 3-way resolution
        # (utils.py:232-253); requires wandb + network
        from sdbc_tpu.utils.tracking import Tracker

        path = Tracker.download_artifact(
            args.wandb_artifact_run, getattr(args, "wandb_key", ""),
            version=args.wandb_artifact_version)
        params, cfg = ckpt_mod.load_pipeline(path)
        if args.scheduler is not None:
            cfg = dataclasses.replace(cfg, scheduler=args.scheduler)
        return finish(params, cfg)

    if getattr(args, "diffusers_ckpt", ""):
        from sdbc_tpu.models.port import (pipeline_config_from_diffusers,
                                          port_diffusers_checkpoint)

        params = port_diffusers_checkpoint(args.diffusers_ckpt)
        # shapes come from the dir's own config.json files (the reference's
        # load_model reconstructs from any save_pretrained dir,
        # utils.py:181-230) — not assumed SD-1.5
        cfg = pipeline_config_from_diffusers(args.diffusers_ckpt,
                                             args.scheduler or "ddim")
        return finish(params, cfg)

    if args.ckpt:
        params, cfg = ckpt_mod.load_pipeline(args.ckpt)
        if args.scheduler is not None:
            cfg = dataclasses.replace(cfg, scheduler=args.scheduler)
        return finish(params, cfg)

    sched = args.scheduler or "ddim"
    family = getattr(args, "model_family", "sd15")
    if args.tiny:
        cfg = (PipelineConfig.tiny_xl(sched) if family == "sdxl"
               else PipelineConfig.tiny(sched))
        if family == "sd21":
            # keep the family's v-prediction objective at toy shapes
            cfg = dataclasses.replace(cfg, schedule=dataclasses.replace(
                cfg.schedule, prediction_type="v_prediction"))
    else:
        cfg = {"sd15": PipelineConfig.sd15,
               "sd21": PipelineConfig.sd21,
               "sdxl": PipelineConfig.sdxl}[family](sched)
        print(f"WARNING: no --ckpt given; using RANDOM {family} weights "
              "(zero-egress image — port real weights via models/port.py)")
    @jax.jit  # single compiled init: avoids per-layer dispatch roundtrips
    def build(key):
        # split(3) kept for the single-encoder families: the historical
        # draw order pins fresh-init determinism across versions
        k1, k2, k3 = jax.random.split(key, 3)
        p = {
            "text_encoder": clip.init(k1, cfg.clip),
            "unet": unet.init(k2, cfg.unet),
            "vae": vae.init(k3, cfg.vae),
        }
        if cfg.clip2 is not None:  # SDXL second encoder
            p["text_encoder_2"] = clip.init(jax.random.fold_in(key, 2),
                                            cfg.clip2)
        return p

    return finish(build(jax.random.key(args.seed)), cfg)


def compute_dtype(args):
    return jnp.bfloat16 if args.bf16 else jnp.float32


def resolve_refiner(path: str, scheduler: str):
    """--refiner_ckpt resolution: our checkpoint layout or a diffusers
    save_pretrained dir (auto-detected by the unet/config.json marker).

    The scheduler is forced to the base pipeline's: the ensemble handoff
    resumes mid-grid, so both stages must step the same grid
    (diffusion/pipeline.py EnsemblePipeline validates the schedule too).
    """
    import dataclasses

    from sdbc_tpu.utils import checkpoint as ckpt_mod

    if os.path.exists(os.path.join(path, "unet", "config.json")):
        from sdbc_tpu.models.port import (pipeline_config_from_diffusers,
                                          port_diffusers_checkpoint)

        params = port_diffusers_checkpoint(path)
        cfg = pipeline_config_from_diffusers(path, scheduler)
    else:
        params, cfg = ckpt_mod.load_pipeline(path)
        cfg = dataclasses.replace(cfg, scheduler=scheduler)
    if not getattr(cfg, "refiner", False):
        raise SystemExit(
            f"--refiner_ckpt {path} is not a refiner layout (expected "
            "text_encoder_2 WITHOUT text_encoder + a text_time addition "
            "embedding) — pass the base model via --ckpt/--diffusers_ckpt "
            "instead")
    return params, cfg
