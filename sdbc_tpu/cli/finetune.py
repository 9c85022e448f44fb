"""Fine-tune SD-1.x on the Goodreads covers — the `finetune_sd.py` equivalent.

Mirrors the reference CLI surface (finetune_sd.py:24-48) with correct boolean
flags, and runs the TPU-native training loop: pjit'ed step with in-graph grad
accumulation on a named mesh, best-mean-loss checkpointing 4x/epoch
(finetune_sd.py:496-545), resume from a run's latest checkpoint
(--resume, vs the reference's wandb --resume_id), optional wandb via
--wandb_key with always-on local JSONL tracking, and post-training prompt
grids (finetune_sd.py:595-607).

Usage:
  python -m sdbc_tpu.cli.finetune --data_root ./goodreads --num_examples 12000 \
      --train_text_encoder --no-train_unet --epochs 12 --grad_acc_steps 16
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.cli import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    # reference hyperparameters: finetune_sd.py:25-48
    p.add_argument("--learning_rate", type=float, default=5e-6)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--num_examples", type=int, default=12000)
    p.add_argument("--batch_size", type=int, default=1,
                   help="per-device micro batch")
    p.add_argument("--grad_acc_steps", type=int, default=16)
    p.add_argument("--data_root", type=str, default="./")
    common.add_img_size_arg(p)
    p.add_argument("--legible_text_prob", type=float, default=0.1)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--wandb_key", type=str, default="")
    p.add_argument("--ckpts_per_epoch", type=int, default=4)
    common.bool_flag(p, "use_8bit_adam", False,
                     "blockwise-int8 Adam moments (bitsandbytes equivalent)")
    common.bool_flag(p, "scale_lr", False,
                     "scale lr by grad_accum*batch*devices (reference's "
                     "opt-in scale_lr branch, finetune_sd.py:367-371)")
    common.bool_flag(p, "train_unet", False)
    common.bool_flag(p, "train_text_encoder", True)
    common.bool_flag(p, "train_controlnet", False,
                     "train ONLY a ControlNet branch with the whole base "
                     "model frozen (arXiv:2302.05543; models/controlnet.py). "
                     "Starts from --controlnet_path if given, else clones "
                     "the base UNet's encoder (zero convs = exact no-op). "
                     "The conditioning hint derives in-graph from each "
                     "training image (--control_hint)")
    p.add_argument("--control_hint", type=str, default="edges",
                   choices=["edges", "image"],
                   help="ControlNet training hint derivation: 'edges' = "
                        "Sobel magnitude of the target image (canny-like); "
                        "'image' = the target image itself (reconstruction "
                        "conditioning)")
    p.add_argument("--lora_rank", type=int, default=0,
                   help="> 0 trains LoRA adapters of this rank on the "
                        "attention projections of the selected components "
                        "(train_unet/train_text_encoder) instead of full "
                        "fine-tuning (train/lora.py); checkpoints store the "
                        "frozen base + lora.npz and load merged")
    p.add_argument("--lora_alpha", type=float, default=8.0,
                   help="LoRA scale numerator: dW = (alpha/rank) * A@B")
    p.add_argument("--ti_token", type=str, default="",
                   help="textual inversion: register this placeholder "
                        "(e.g. '<cover-style>') and train ONLY its new "
                        "embedding rows; every pretrained weight stays "
                        "frozen (train/textual_inversion.py). Training "
                        "prompts gain ', in the style of <token>'; at "
                        "inference use the token in any prompt")
    p.add_argument("--ti_vectors", type=int, default=1,
                   help="embedding rows the placeholder expands to "
                        "(multi-vector inversion captures more detail)")
    p.add_argument("--ti_init_token", type=str, default="",
                   help="initializer word whose mean embedding seeds the "
                        "new rows (default: embedding-table mean)")
    p.add_argument("--prior_class_prompt", type=str, default="",
                   help="enable DreamBooth prior preservation (arXiv:"
                        "2208.12242): every micro-batch also trains class "
                        "images under THIS prompt (e.g. 'a book cover'), "
                        "weighted by --prior_weight — keeps a small-set "
                        "fine-tune from collapsing the class manifold")
    p.add_argument("--prior_images_dir", type=str, default="",
                   help="directory of class images for the prior term "
                        "(default <output_dir>/prior_class); top it up "
                        "with --prior_generate")
    p.add_argument("--prior_weight", type=float, default=1.0,
                   help="prior-preservation loss weight (loss = instance "
                        "MSE + weight * class MSE)")
    p.add_argument("--prior_generate", type=int, default=0,
                   help="before training, generate class images with the "
                        "resolved BASE model until --prior_images_dir "
                        "holds this many (existing images count; the "
                        "DreamBooth self-generation step)")
    p.add_argument("--prior_batch_size", type=int, default=0,
                   help="class images per device per micro-batch "
                        "(0 = same as --batch_size)")
    p.add_argument("--prior_gen_steps", type=int, default=50,
                   help="sampler steps for --prior_generate")
    p.add_argument("--min_snr_gamma", type=float, default=0.0,
                   help="min-SNR loss weighting (arXiv:2303.09556): weight "
                        "each example by min(SNR_t, gamma)/SNR_t — "
                        "down-weights the near-noiseless low-t steps "
                        "(0 = off, the paper recommends 5)")
    p.add_argument("--noise_offset", type=float, default=0.0,
                   help="offset-noise strength: add a per-(example, "
                        "channel) constant to the training noise so the "
                        "model can shift global brightness (0 = off, "
                        "typical 0.05-0.1)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="> 0 keeps an exponential-moving-average shadow of "
                        "the trained components (decay ramped in as "
                        "min(d, (1+t)/(10+t)), the diffusers EMAModel "
                        "convention; 0.9999 is the usual value). "
                        "Checkpoints store raw masters + ema/; loads and "
                        "final grids serve the EMA weights")
    p.add_argument("--grad_ckpt", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="gradient checkpointing (default: on with "
                        "--train_unet, as in the reference "
                        "finetune_sd.py:146-149; an explicit --no-grad_ckpt "
                        "overrides the force — on TPU full-UNet training "
                        "fits without remat at micro-batch 2 and runs ~23%% "
                        "faster, PERF_NOTES round 3)")
    p.add_argument("--remat_mode", type=str, default="block",
                   choices=["block", "selective"],
                   help="grad-ckpt granularity: 'block' remats whole "
                        "ResBlocks/transformers; 'selective' keeps flash "
                        "attention outside the checkpoint regions (faster, "
                        "slightly more memory)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel (model-axis) size: shards attention "
                        "heads, MLPs and UNet conv channels Megatron-style "
                        "over the mesh's `model` axis (parallel/specs.py); "
                        "must divide attention heads and norm_groups. The "
                        "remaining devices form the data axis")
    common.bool_flag(p, "fsdp", False,
                     "ZeRO-3: shard params + Adam moments over the data "
                     "axis (parallel/specs.py fsdp_specs); XLA all-gathers "
                     "weights at use and reduce-scatters gradients")
    common.bool_flag(p, "include_desc", False)
    common.bool_flag(p, "cache_latents", False,
                     "precompute VAE posterior moments once per dataset and "
                     "train from the cache — exact same objective (the VAE "
                     "is frozen; encode is deterministic), skips the whole "
                     "in-step encode (PERF_NOTES round-3 lead 4)")
    common.bool_flag(p, "resume", False, "resume from run's latest checkpoint")
    common.bool_flag(p, "final_grids", False, "render prompt grids after training")
    p.add_argument("--profile_dir", type=str, default="",
                   help="jax.profiler trace output dir (traces steps 3-5)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.resolve_img_size(args)
    if (args.fsdp or args.tp > 1) and args.use_8bit_adam:
        # the fused int8 update kernel (train/adam8bit.py) is a pallas_call —
        # the SPMD partitioner cannot split it over sharded params/moments
        # (FSDP shards moments over `data`; TP shards trainables over
        # `model`).  At data >= 4, FSDP-sharded fp32 moments use less
        # per-chip memory than replicated int8 ones anyway.
        raise SystemExit("--use_8bit_adam cannot combine with --fsdp/--tp: "
                         "the fused int8 update kernel is not partitionable "
                         "over sharded state (FSDP alone already shards the "
                         "fp32 moments)")
    use_lora = args.lora_rank > 0
    use_ti = bool(args.ti_token)
    use_cn = args.train_controlnet
    if use_cn:
        if use_lora or use_ti:
            raise SystemExit("--train_controlnet is a full-branch mode; it "
                             "cannot combine with --lora_rank/--ti_token")
        if args.tp > 1 or args.fsdp:
            raise SystemExit("--train_controlnet with --tp/--fsdp is not "
                             "wired up (the spec walkers don't cover the "
                             "branch tree) — use plain data parallelism")
        if args.cache_latents:
            raise SystemExit("--train_controlnet derives its conditioning "
                             "hint from the pixel batch — incompatible with "
                             "--cache_latents")
        if args.train_unet:
            raise SystemExit("--train_controlnet freezes the whole base "
                             "model (the arXiv:2302.05543 protocol) — drop "
                             "--train_unet")
        if args.train_text_encoder:
            # default-True reference flag: the ControlNet protocol freezes it
            print("--train_controlnet: freezing the text encoder "
                  "(the base model stays untouched)")
            args.train_text_encoder = False
    use_prior = bool(args.prior_class_prompt)
    if use_prior and args.cache_latents:
        raise SystemExit("--prior_class_prompt is incompatible with "
                         "--cache_latents (the class set has no latent "
                         "cache) — drop one")
    if args.prior_generate and not use_prior:
        raise SystemExit("--prior_generate needs --prior_class_prompt "
                         "(the prompt the class images are generated and "
                         "trained under)")
    if use_ti and use_lora:
        raise SystemExit("--ti_token and --lora_rank are mutually "
                         "exclusive: pick one parameter-efficient mode")
    if use_ti and args.ema_decay > 0:
        raise SystemExit("--ema_decay cannot combine with --ti_token: the "
                         "checkpoint's ema/ overlay holds component trees, "
                         "not embedding rows")
    if use_ti and (args.tp > 1 or args.fsdp):
        raise SystemExit("--ti_token trains a handful of embedding rows; "
                         "TP/FSDP buy nothing and the spec walkers don't "
                         "cover the rows tree — use plain data parallelism")
    if use_lora and args.ema_decay > 0:
        raise SystemExit("--ema_decay cannot combine with --lora_rank: an "
                         "adapter shadow has no component slot in the "
                         "checkpoint's ema/ overlay (and LoRA runs are "
                         "short enough that EMA buys little) — drop one")
    if use_lora and (args.tp > 1 or args.fsdp):
        raise SystemExit("--lora_rank trains <1% of the parameters; "
                         "sharding the base weights buys nothing and the "
                         "TP/FSDP spec walkers don't cover adapter trees — "
                         "use plain data parallelism (adapters replicate)")
    common.maybe_init_distributed()
    from sdbc_tpu.data.dataset import DatasetConfig, GoodreadsDataset, make_dataloader
    from sdbc_tpu.diffusion.pipeline import SDPipeline
    from sdbc_tpu.parallel import specs as spec_mod
    from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh, replicate_tree
    from sdbc_tpu.train.trainer import (
        TrainConfig, init_train_state, make_train_step, merged_params)
    from sdbc_tpu.utils import checkpoint as ckpt_mod
    from sdbc_tpu.utils.profiling import StepTimer
    from sdbc_tpu.utils.tracking import Tracker

    # the reference forces grad-ckpt on with train_unet (finetune_sd.py:
    # 146-149); an explicit --no-grad_ckpt overrides (tri-state default None)
    grad_ckpt = (args.train_unet if args.grad_ckpt is None else args.grad_ckpt)
    dt = common.compute_dtype(args)

    # resume resolution FIRST: building fresh (possibly random SD-1.5)
    # weights only to throw them away wastes minutes of single-core init,
    # and the tokenizer/dataset below must bind to the RESUMED config
    # (a checkpoint's clip.ctx wins over the CLI-derived one)
    resume_meta, resume_path = {}, None
    if args.resume:
        resume_path = ckpt_mod.latest_checkpoint(args.output_dir, args.run_id)
    if resume_path:
        import dataclasses

        print(f"resuming from {resume_path}")
        # a LoRA resume needs the RAW base (the adapter is restored onto
        # the fresh state below, keeping Adam moments aligned with a/b);
        # a full-finetune resume of any checkpoint takes the merged weights
        # raw masters, never the EMA overlay: resume must continue the
        # optimizer trajectory (the shadow restores separately below)
        params, cfg = ckpt_mod.load_pipeline(resume_path,
                                             merge_lora=not use_lora,
                                             merge_ti=not use_ti,
                                             use_ema=False)
        if args.scheduler is not None:  # explicit flag only: a resumed
            # run keeps its checkpointed scheduler by default
            cfg = dataclasses.replace(cfg, scheduler=args.scheduler)
        resume_meta = ckpt_mod.load_metadata(resume_path)
    else:
        params, cfg = common.resolve_params_cfg(args)
    is_xl = cfg.clip2 is not None
    if use_ti and getattr(cfg, "refiner", False):
        raise SystemExit("--ti_token is not wired for the refiner flavor "
                         "— invert on the base model instead")
    if use_cn and "controlnet" not in params:
        # fresh branch: clone the base UNet's encoder half (zero output
        # convs ⇒ step 0 reproduces the base model bit-for-bit)
        from sdbc_tpu.models import controlnet as cn_mod

        if cfg.controlnet is None:
            cfg = cfg.with_controlnet()
        params["controlnet"] = cn_mod.from_unet(
            params["unet"],
            jax.random.fold_in(jax.random.key(args.seed), 0xC0),
            cfg.controlnet)
        print("fresh ControlNet cloned from the base UNet encoder")
    tok = common.make_tokenizer(args, cfg.clip.vocab_size)
    tok2 = None
    if is_xl:
        if cfg.clip2.ctx != cfg.clip.ctx:
            raise SystemExit("SDXL training assumes both encoders share one "
                             f"context length (got {cfg.clip.ctx} vs "
                             f"{cfg.clip2.ctx})")
        # same pipeline fallback as SDPipeline: the two tokenizers differ
        # only in pad id, which the bigG encoder ignores past eos
        tok2 = common.make_tokenizer2(args, cfg) or tok
    ti_ids, ti_init_ids = None, None
    if use_ti:
        ti_ids = tok.add_placeholder(args.ti_token, args.ti_vectors)
        if is_xl and tok2 is not tok:
            # both encoders see the token through their own tokenizer —
            # the ids must line up with the shared appended-row block
            ti_ids2 = tok2.add_placeholder(args.ti_token, args.ti_vectors)
            if ti_ids2 != ti_ids:
                raise SystemExit(
                    f"--ti_token registered at ids {ti_ids} in the first "
                    f"tokenizer but {ti_ids2} in tokenizer_2 (different "
                    "base vocabularies?) — SDXL inversion needs one "
                    "shared id block")
        if args.ti_init_token:
            ti_init_ids = tok._token_ids(args.ti_init_token)
        print(f"textual inversion: {args.ti_token!r} -> ids {ti_ids}"
              + (f" (init from {args.ti_init_token!r})"
                 if args.ti_init_token else "")
              + (" [dual-encoder]" if is_xl else ""))

    dcfg = DatasetConfig(
        data_root=args.data_root, img_size=args.img_size,
        size=args.num_examples, legible_text_prob=args.legible_text_prob,
        include_desc=args.include_desc, max_length=cfg.clip.ctx,
        seed=args.seed, prompt_bank=args.prompt_bank,
        style_token=args.ti_token.strip().lower() if use_ti else "")
    ds = GoodreadsDataset(dcfg, tok, tokenizer2=tok2)
    if use_ti and len(ds):
        # a long title can push the style suffix past the context window —
        # the placeholder ids then never reach the text encoder and the
        # inversion silently learns nothing for that example
        import random as _random

        probe = ds.prompt_for(0, rng=_random.Random(0))
        if not set(ti_ids) <= set(tok.encode(probe, cfg.clip.ctx)):
            print(f"WARNING: sample prompt truncates the {args.ti_token!r} "
                  f"placeholder out of the {cfg.clip.ctx}-token context "
                  f"(prompt: {probe!r}); such examples contribute no "
                  "inversion gradient")

    prior_set = None
    if use_prior:
        from sdbc_tpu.train import prior as prior_mod

        prior_dir = args.prior_images_dir or os.path.join(
            args.output_dir, "prior_class")
        if args.prior_generate:
            if jax.process_count() > 1:
                raise SystemExit("--prior_generate is single-host only — "
                                 "pre-generate the class set once and "
                                 "point every host at --prior_images_dir")
            pipe = SDPipeline(params, cfg, tok, tokenizer2=tok2,
                              compute_dtype=dt)
            made = prior_mod.generate_class_images(
                pipe, args.prior_class_prompt, args.prior_generate,
                prior_dir, img_size=args.img_size,
                batch_size=max(args.batch_size, 4),
                num_inference_steps=args.prior_gen_steps, seed=args.seed)
            if made:
                print(f"prior set: {made} class images generated into "
                      f"{prior_dir}")
        prior_set = prior_mod.PriorSet(
            prior_dir, args.prior_class_prompt, tok, args.img_size,
            max_length=cfg.clip.ctx, tokenizer2=tok2 if is_xl else None)
        print(f"prior preservation: {len(prior_set)} class images under "
              f"{args.prior_class_prompt!r}, weight {args.prior_weight}")

    mesh = make_mesh(MeshConfig(model=args.tp))
    dp = mesh.shape["data"]
    tp_exclude = ()
    if args.tp > 1:
        tp_exclude = spec_mod.validate_tp(cfg, args.tp)
        if tp_exclude:
            print(f"TP{args.tp}: replicating {', '.join(tp_exclude)} "
                  "(head count not divisible; the UNet still shards)")
    micro_global = args.batch_size * dp
    global_batch = micro_global * args.grad_acc_steps
    if len(ds) < global_batch:
        raise SystemExit(
            f"dataset has {len(ds)} examples but one optimizer step consumes "
            f"{global_batch} (batch_size {args.batch_size} x {dp} devices x "
            f"grad_acc {args.grad_acc_steps}) — lower them or add data")
    steps_per_epoch = len(ds) // global_batch
    total_steps = steps_per_epoch * args.epochs

    tcfg = TrainConfig(
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        num_examples=total_steps,  # cosine horizon = total optimizer steps
        grad_accum=args.grad_acc_steps, micro_batch=args.batch_size,
        train_unet=args.train_unet,
        train_text_encoder=args.train_text_encoder, grad_ckpt=grad_ckpt,
        remat_mode=args.remat_mode,
        use_8bit_adam=args.use_8bit_adam, lr_scale_by_dp=args.scale_lr,
        lora_rank=args.lora_rank, lora_alpha=args.lora_alpha,
        ti_token=args.ti_token, ti_vectors=args.ti_vectors,
        ema_decay=args.ema_decay, min_snr_gamma=args.min_snr_gamma,
        noise_offset=args.noise_offset,
        train_controlnet=use_cn, control_hint=args.control_hint,
        prior_weight=args.prior_weight if use_prior else 0.0,
        dual_text_encoder=is_xl, refiner=getattr(cfg, "refiner", False))

    state = init_train_state(
        params, tcfg, dp_size=dp, compute_dtype=dt,
        key=jax.random.fold_in(jax.random.key(args.seed), 0x10A),
        ti_init_ids=ti_init_ids)
    base_host = None
    if use_ti:
        # host snapshot of the fp32 base for checkpointing (same donation
        # rationale as the LoRA branch below)
        base_host = jax.device_get(params)
    if use_lora:
        from sdbc_tpu.train import lora as lora_mod

        print(f"LoRA rank {args.lora_rank} alpha {args.lora_alpha}: "
              f"{len(state.trainable['lora'])} adapted projections, "
              f"{lora_mod.count_params(state.trainable['lora']):,} "
              "trainable parameters")
        # host snapshot of the fp32 base for checkpointing: the donated
        # train step invalidates the original device buffers after step 1
        # (state.frozen aliases them when compute dtype is fp32)
        base_host = jax.device_get(params)
    if resume_path:
        # full training-state continuity: Adam moments + schedule step
        # (the reference saves optimizer.pt but never restores it —
        # finetune_sd.py:536-537; we restore both, VERDICT round-1 item 3)
        if use_lora:
            lpath = os.path.join(resume_path, "lora.npz")
            if os.path.exists(lpath):
                restored, lmeta = lora_mod.load_lora(lpath)
                if (int(lmeta["rank"]) != args.lora_rank
                        or float(lmeta["alpha"]) != args.lora_alpha):
                    raise SystemExit(
                        f"checkpoint adapter is rank {lmeta['rank']} alpha "
                        f"{lmeta['alpha']} but the CLI asked for rank "
                        f"{args.lora_rank} alpha {args.lora_alpha} — the "
                        "restored Adam moments would be wrong; match the "
                        "flags or start a new run")
                state = state._replace(trainable={"lora": restored})
            else:
                raise SystemExit(
                    f"--lora_rank resume from {resume_path} which has no "
                    "lora.npz (a full-finetune checkpoint) — resume without "
                    "--lora_rank, or start a fresh LoRA run on it via "
                    "--ckpt")
        if use_ti:
            from sdbc_tpu.train import textual_inversion as ti_mod

            tpath = os.path.join(resume_path, "ti.npz")
            if not os.path.exists(tpath):
                raise SystemExit(
                    f"--ti_token resume from {resume_path} which has no "
                    "ti.npz — resume without --ti_token, or start a fresh "
                    "inversion on it via --ckpt")
            rows, tmeta = ti_mod.load_ti(tpath)
            if (tmeta["token"] != args.ti_token.strip().lower()
                    or list(tmeta["ids"]) != list(ti_ids)):
                raise SystemExit(
                    f"checkpoint inversion is {tmeta['token']!r} ids "
                    f"{tmeta['ids']} but the CLI asked for "
                    f"{args.ti_token!r} ids {ti_ids} — match the flags or "
                    "start a new run")
            if ("rows2" in tmeta) != is_xl:
                raise SystemExit(
                    "checkpoint inversion encoder count does not match the "
                    "model family (dual-encoder ti.npz needs SDXL and vice "
                    "versa) — start a new run")
            t = {"rows": rows}
            if is_xl:
                t["rows2"] = tmeta["rows2"]
            state = state._replace(trainable={"ti": t})
        opt_state = ckpt_mod.load_opt_state(resume_path, state.opt_state)
        if opt_state is not None:
            state = state._replace(
                opt_state=opt_state,
                step=jnp.asarray(int(resume_meta.get("step", 0)), jnp.int32))
        if args.ema_decay > 0:
            shadow = ckpt_mod.load_ema(resume_path, template=state.ema)
            if shadow is not None:
                state = state._replace(ema=shadow)
            else:  # pre-EMA checkpoint: init_train_state already seeded the
                # shadow from the restored masters; it ramps in from here
                print("resume: checkpoint has no ema/ — EMA shadow starts "
                      "from the restored masters")
    latents_mm = None
    if args.cache_latents:
        from sdbc_tpu.train import latent_cache as lc

        # encode with the SAME weights the in-step loss would use: the
        # compute-dtype-cast frozen VAE (under bf16 training the fp32
        # checkpoint weights would yield measurably different moments)
        cache_path = lc.build_latent_cache(
            ds, state.frozen["vae"], cfg.vae, dt,
            batch=max(args.batch_size, 8), num_workers=args.num_workers)
        latents_mm = lc.open_latent_cache(cache_path)

    if args.tp > 1 or args.fsdp:
        base = (spec_mod.tp_specs(state, mesh, exclude=tp_exclude)
                if args.tp > 1 else None)
        sp = (spec_mod.fsdp_specs(state, mesh, base=base) if args.fsdp
              else base)
        state = spec_mod.shard_tree(state, mesh, sp)
    else:
        state = replicate_tree(state, mesh)
    step_fn = make_train_step(cfg, tcfg, mesh=mesh, dp_size=dp,
                              compute_dtype=dt, donate=True,
                              cached_latents=latents_mm is not None)

    def save_ckpt(path, metadata):
        if use_ti:
            # untouched base + the learned rows (+ added_tokens.json so any
            # loader's tokenizer knows the placeholder ids); SDXL embeds
            # carry the second encoder's rows as the 4th element
            ti_tuple = (jax.device_get(state.trainable["ti"]["rows"]),
                        args.ti_token.strip().lower(), ti_ids)
            if "rows2" in state.trainable["ti"]:
                ti_tuple += (jax.device_get(
                    state.trainable["ti"]["rows2"]),)
            ckpt_mod.save_pipeline(
                path, base_host, cfg, opt_state=state.opt_state,
                metadata={**metadata, "ti_token": args.ti_token,
                          "ti_vectors": args.ti_vectors},
                ti=ti_tuple)
        elif use_lora:
            # base components are untouched by LoRA training: save the
            # original fp32 tree + the adapter (load_pipeline merges them)
            ckpt_mod.save_pipeline(
                path, base_host, cfg, opt_state=state.opt_state,
                metadata=metadata,
                lora=jax.device_get(state.trainable["lora"]),
                lora_rank=args.lora_rank, lora_alpha=args.lora_alpha)
        else:
            if args.ema_decay > 0:
                metadata = {**metadata, "ema_decay": args.ema_decay}
            ckpt_mod.save_pipeline(
                path, merged_params(state), cfg,
                opt_state=state.opt_state, metadata=metadata,
                ema=(jax.device_get(state.ema)
                     if state.ema is not None else None))

    tracker = Tracker(args.output_dir, args.run_id,
                      config={**vars(args), "total_steps": total_steps,
                              "dp": dp},
                      wandb_key=args.wandb_key or None)

    key = jax.random.key(args.seed)
    best_mean_loss = float(resume_meta.get("best_mean_loss", np.inf))
    gstep = int(resume_meta.get("step", 0))
    ckpt_every = max(steps_per_epoch // args.ckpts_per_epoch, 1)

    # preemption safety: SIGTERM/SIGINT → finish the step, checkpoint, exit
    # (replaces the reference's manual wandb-resume recovery, SURVEY.md §5)
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        print(f"signal {signum}: checkpointing at next step boundary")
        preempted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, _on_term)

    profiling = False
    run_steps = 0  # steps executed by THIS process (gstep spans resumes)
    # warmup-aware steady-state rate (utils/profiling.StepTimer): the first
    # step includes the XLA compile, so its raw rate is a wildly low
    # outlier — it is excluded from the steady rate AND not logged at all
    # (steady_times falls back to the full list until warmup is exceeded).
    # One timer for the whole run: per-epoch recreation would re-admit the
    # outlier at every epoch start.
    timer = StepTimer(micro_global * args.grad_acc_steps,
                      n_chips=jax.device_count(), warmup=1)

    def stop_profile():
        # every exit path must flush an open trace or the dump is lost
        nonlocal profiling
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
    # resume continues the ORIGINAL epoch schedule (a fresh range() would
    # train args.epochs additional epochs and run the cosine tail at
    # eta_min); a mid-epoch resume restarts that epoch's loader from its
    # beginning — a few repeated micro-batches, never a longer run
    start_epoch = min(gstep // steps_per_epoch, args.epochs)
    if start_epoch:
        print(f"resume: continuing at epoch {start_epoch}/{args.epochs} "
              f"(step {gstep})")
    for epoch in range(start_epoch, args.epochs):
        loader = make_dataloader(ds, micro_batch=micro_global,
                                 grad_accum=args.grad_acc_steps,
                                 seed=args.seed + epoch,
                                 num_workers=args.num_workers,
                                 mesh=mesh,  # per-host input sharding
                                 latent_cache=latents_mm,
                                 epoch=epoch)  # host-independent prompt draws
        if prior_set is not None:
            from sdbc_tpu.train.prior import augment_loader

            pb = (args.prior_batch_size or args.batch_size) * dp
            loader = augment_loader(
                loader, prior_set.batches(pb, args.grad_acc_steps,
                                          seed=args.seed + epoch,
                                          mesh=mesh))
        running, running_n = 0.0, 0
        t0 = time.perf_counter()
        for batch in loader:
            # profile a 3-step window after warmup, RELATIVE to this run
            # (gstep continues across --resume, so an absolute trigger
            # would silently never fire on a resumed run)
            if args.profile_dir and run_steps == 2 and not profiling:
                jax.profiler.start_trace(args.profile_dir)
                profiling = True
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub)
            loss = float(metrics["loss"])
            if profiling and run_steps >= 5:
                jax.profiler.stop_trace()
                profiling = False
            gstep += 1
            run_steps += 1
            running += loss
            running_n += 1
            timer.times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            warm = len(timer.times) > timer.warmup
            imgs_per_s = (timer.images_per_sec_per_chip() * timer.n_chips
                          if warm else 0.0)
            skipped = int(metrics.get("notfinite_count", 0))
            tracker.log({"loss": loss, "epoch": epoch,
                         "skipped_updates": skipped,
                         **({"images_per_sec": imgs_per_s} if warm else {})},
                        step=gstep)
            warn = "" if bool(metrics.get("finite", True)) else \
                f"  [non-finite update SKIPPED; {skipped} total]"
            rate = f" ({imgs_per_s:.2f} img/s)" if warm else " (compiling)"
            print(f"epoch {epoch} step {gstep} loss {loss:.4f}"
                  f"{rate}{warn}", flush=True)

            if gstep % ckpt_every == 0:
                mean_loss = running / running_n
                # fixed-length window per checkpoint interval (the reference
                # resets its accumulator only on a new best, so its mean_loss
                # covers a variable window — SURVEY §7 bug, not replicated)
                running, running_n = 0.0, 0
                tracker.log({"mean_loss": mean_loss}, step=gstep)
                if mean_loss < best_mean_loss:
                    best_mean_loss = mean_loss
                    path = ckpt_mod.new_checkpoint_path(
                        args.output_dir, args.run_id, gstep)
                    print(f"new best mean loss {mean_loss:.4f}; saving {path}")
                    save_ckpt(path,
                              metadata={"step": gstep, "epoch": epoch,
                                        "best_mean_loss": best_mean_loss,
                                        "mean_loss": mean_loss})
                    tracker.log_artifact(path)

            if preempted["flag"]:
                stop_profile()
                path = ckpt_mod.new_checkpoint_path(args.output_dir,
                                                    args.run_id, gstep)
                save_ckpt(path,
                          metadata={"step": gstep, "epoch": epoch,
                                    "best_mean_loss": best_mean_loss,
                                    "preempted": True})
                print(f"preemption checkpoint saved: {path}")
                tracker.finish()
                return

    stop_profile()
    final = ckpt_mod.new_checkpoint_path(args.output_dir, args.run_id, gstep)
    save_ckpt(final,
              metadata={"step": gstep, "epoch": args.epochs,
                        "best_mean_loss": best_mean_loss, "final": True})
    print(f"saved final checkpoint: {final}")

    if args.final_grids:
        from sdbc_tpu.eval.visualize import visualize_prompts

        pipe = SDPipeline(
            merged_params(state, tcfg, use_ema=state.ema is not None),
            cfg, tok, compute_dtype=dt, tokenizer2=tok2)
        grid_dir = os.path.join(tracker.dir, "grids")
        for include_desc in (False,):
            _, _, path = visualize_prompts(
                pipe, include_desc=include_desc, img_size=args.img_size,
                inference_steps=50 if not args.tiny else 4,
                save_dir=grid_dir, seed=args.seed)
            print(f"grid saved: {path}")
    tracker.finish()


if __name__ == "__main__":
    main()
