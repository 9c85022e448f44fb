"""Inference CLI — the `inference.py` equivalent (modes default/calc_fid/enter_prompt).

Mirrors the reference surface (inference.py:34-63,386-506) with its bugs fixed
(SURVEY.md §7 "reference bugs NOT to replicate"): the mode choices list is a
real list, enter_prompt works (no `arggmode` NameError), and height/width come
from --img_size.

  default      3 prompt-grid configurations with fixed latents
  calc_fid     generate --num_imgs covers over df_test + FID vs --fid_stats_path
  enter_prompt single custom prompt → PNG
"""
from __future__ import annotations

import argparse
import json
import os
import re

import numpy as np

from sdbc_tpu.cli import common


def _scale_list(s: str):
    """--controlnet_scale parser: '0.8' → float, '0.8,1.2' → [floats]."""
    vals = [float(v) for v in s.split(",") if v]
    return vals if len(vals) > 1 else vals[0]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    p.add_argument("--mode", type=str, default="default",
                   choices=["default", "calc_fid", "enter_prompt"])
    p.add_argument("--data_root", type=str, default="./")
    p.add_argument("--batch_size", type=int, default=4,
                   help="generation batch (reference: max 4 on a 16GB GPU)")
    p.add_argument("--num_imgs", type=int, default=4000)
    p.add_argument("--save_dir", type=str, default="./generated")
    common.add_img_size_arg(p)
    p.add_argument("--num_inference_steps", type=int, default=50,
                   help="50-step DDIM is the reference-exact protocol; the "
                        "recommended fast serving profile is --scheduler dpm "
                        "--num_inference_steps 25 (~2x faster, full-quality "
                        "higher-order solver; smallest measured drift from "
                        "the exact protocol — experiments/PERF_NOTES.md)")
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--clip_skip", type=int, default=0,
                   help="community CLIP-skip: 2 conditions the UNet on the "
                        "text encoder's penultimate hidden state (0/1 = "
                        "full encoder, the SD-1.x default)")
    p.add_argument("--guidance_rescale", type=float, default=0.0,
                   help="CFG rescale factor (arXiv:2305.08891): renormalize "
                        "the guided prediction's std toward the conditional "
                        "branch's — counteracts detail washout at high "
                        "guidance scales (0 = off, try 0.7)")
    p.add_argument("--fid_stats_path", type=str, default="./fid_stats.npz")
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--negative_prompt", type=str, default="",
                   help="CFG unconditional text (enter_prompt mode; "
                        "diffusers StableDiffusionPipeline parameter)")
    p.add_argument("--init_image", type=str, default="",
                   help="enter_prompt mode: path to an image → img2img "
                        "(re-diffuse it under --prompt; the diffusers "
                        "Img2Img surface of the reference's engine)")
    p.add_argument("--mask_image", type=str, default="",
                   help="with --init_image: path to a mask image (white = "
                        "regenerate) → inpainting")
    p.add_argument("--strength", type=float, default=0.8,
                   help="img2img strength in (0,1]: fraction of the "
                        "diffusion run re-applied to --init_image")
    p.add_argument("--control_image", type=str, default="",
                   help="enter_prompt mode: path to a spatial conditioning "
                        "image (edges/depth/pose) routed through "
                        "--controlnet_path (models/controlnet.py)")
    p.add_argument("--refiner_ckpt", type=str, default="",
                   help="SDXL refiner checkpoint (our layout or a diffusers "
                        "save_pretrained dir, auto-detected): wraps serving "
                        "in the ensemble-of-expert-denoisers handoff — the "
                        "base runs the high-noise fraction, the refiner the "
                        "tail (diffusion/pipeline.py EnsemblePipeline)")
    p.add_argument("--refiner_frac", type=float, default=0.8,
                   help="denoising handoff fraction for --refiner_ckpt "
                        "(base runs [0, frac), refiner [frac, 1])")
    p.add_argument("--controlnet_scale", type=_scale_list, default=1.0,
                   help="multiplier on the injected ControlNet residuals "
                        "(comma-separated with multi-ControlNet: one per "
                        "branch)")
    common.bool_flag(p, "prompt_weighting", False,
                     "enable the community prompt-emphasis syntax "
                     "('(word:1.3)', '((up))', '[down]') and chunked long "
                     "prompts (>75 tokens span multiple CLIP windows)")
    p.add_argument("--max_prompt_chunks", type=int, default=3,
                   help="with --prompt_weighting: max 77-token CLIP windows "
                        "a long prompt may span before truncation")
    p.add_argument("--samples_per_prompt", type=int, default=None,
                   help="images per prompt/template (grids default 2; "
                        "enter_prompt defaults 1)")
    p.add_argument("--wandb_key", type=str, default="")
    p.add_argument("--bart_ckpt", type=str, default="",
                   help="transformers BART dir for --summarize (DistilBART)")
    p.add_argument("--hires_scale", type=float, default=0.0,
                   help="enter_prompt mode: hires-fix — compose at "
                        "img_size/scale, upscale, finish with a strength-"
                        "bounded img2img pass at full size (0 = off; the "
                        "community two-stage txt2img for targets beyond "
                        "the training resolution)")
    p.add_argument("--hires_strength", type=float, default=0.7,
                   help="second-stage img2img strength for --hires_scale")
    p.add_argument("--hires_steps", type=int, default=0,
                   help="second-stage grid size for --hires_scale "
                        "(0 = same as --num_inference_steps)")
    p.add_argument("--hires_mode", type=str, default="latent",
                   choices=["latent", "image"],
                   help="hires upscale space: 'latent' resizes the raw "
                        "first-pass latents on device (default), 'image' "
                        "decodes, upscales pixels and re-encodes")
    common.bool_flag(p, "karras_sigmas", False,
                     "use the Karras et al. 2022 rho=7 sigma grid instead "
                     "of the leading integer timestep grid (euler_a/lms/dpm/heun "
                     "schedulers; markedly better low-step quality)")
    p.add_argument("--safety_checker", type=str, default="",
                   help="diffusers safety_checker dir: run the CLIP-vision "
                        "StableDiffusionSafetyChecker on decoded images "
                        "(flagged images are blacked out; the reference "
                        "always disables this — default off)")
    p.add_argument("--freeu", type=str, default="",
                   help="FreeU decoder rebalancing (arXiv:2309.11497): "
                        "'auto' picks the family preset (sd15/sd21/sdxl), "
                        "or 4 comma-separated floats b1,b2,s1,s2")
    p.add_argument("--cfg_interval", type=str, default="",
                   help="apply classifier-free guidance only on the steps "
                        "in [lo,hi) grid fractions, e.g. '0.0,0.7' "
                        "(arXiv:2404.07724): steps outside run ONE "
                        "cond-only UNet eval (half the batch), cutting "
                        "UNet cost roughly by half of the excluded span "
                        "at matched-or-better quality")
    p.add_argument("--cache_interval", type=int, default=0,
                   help=">1: DeepCache-style fast sampling (approximate; "
                        "deep UNet trunk reused between every k-th step)")
    p.add_argument("--cache_tail", type=int, default=0,
                   help="fast-sampling cache boundary: how many trailing "
                        "ResNets run fresh on cached steps (1=aggressive, "
                        "0=conservative default)")
    p.add_argument("--tp", type=int, default=0,
                   help="multi-chip serving: 0 = single device (default); "
                        ">=1 lays a (data x model=tp) mesh over all devices, "
                        "shards the batch over `data` and, for tp>1, the "
                        "weights Megatron-style over `model` "
                        "(parallel/specs.py); attention switches to the "
                        "partitionable XLA path automatically with tp>1")
    common.bool_flag(p, "spatial", False,
                     "with --tp: shard latent image ROWS over the `data` "
                     "axis instead of the batch — the batch-1-latency "
                     "decomposition (diffusion/pipeline.py)")
    common.bool_flag(p, "batch_generate", True)
    # tri-state: unset → auto (default mode runs the reference's full
    # 3-config matrix, skipping configs whose inputs are unavailable);
    # --summarize forces (errors if inputs missing); --no-summarize drops it
    p.add_argument("--summarize", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="summarize book descriptions into prompts (needs "
                        "--bart_ckpt; default-mode auto-runs it when "
                        "available, reference inference.py:463-466)")
    p.add_argument("--include_desc", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="append book descriptions to prompts (needs "
                        "df_test.csv under --data_root; default-mode "
                        "auto-runs it when available)")
    return p


def _resolve_freeu(args, cfg):
    """--freeu '' → None; 'auto' → the family preset; 'b1,b2,s1,s2' → tuple.

    'auto' picks by the RESOLVED pipeline config (checkpoints can override
    --model_family): SDXL configs get FREEU_SDXL, v-prediction (SD-2.1
    style) FREEU_SD21, everything else FREEU_SD15.
    """
    from sdbc_tpu.models import unet as unet_mod

    spec = (args.freeu or "").strip()
    if not spec:
        return None
    if spec == "auto":
        if getattr(cfg, "is_sdxl", False):
            return unet_mod.FREEU_SDXL
        if cfg.schedule.prediction_type == "v_prediction":
            return unet_mod.FREEU_SD21
        return unet_mod.FREEU_SD15
    try:
        vals = tuple(float(v) for v in spec.split(","))
    except ValueError:
        raise SystemExit(f"--freeu must be 'auto' or 4 comma-separated "
                         f"floats, got {spec!r}")
    if len(vals) != 4:
        raise SystemExit(f"--freeu takes 4 values b1,b2,s1,s2, got "
                         f"{len(vals)}")
    return vals


def _resolve_cfg_interval(args):
    """--cfg_interval '' → None; 'lo,hi' → (float, float)."""
    spec = (getattr(args, "cfg_interval", "") or "").strip()
    if not spec:
        return None
    try:
        vals = tuple(float(v) for v in spec.split(","))
    except ValueError:
        raise SystemExit(f"--cfg_interval must be 2 comma-separated step "
                         f"fractions lo,hi, got {spec!r}")
    if len(vals) != 2 or not 0.0 <= vals[0] <= vals[1] <= 1.0:
        raise SystemExit(f"--cfg_interval takes 0 <= lo <= hi <= 1, got "
                         f"{spec!r}")
    return vals


def _build_summarizer(args):
    from sdbc_tpu.data.bart_tokenizer import BartTokenizer
    from sdbc_tpu.models import bart
    from sdbc_tpu.models.port import load_state_dict, port_bart

    # cheap existence checks BEFORE porting the multi-hundred-MB state dict
    # (in-repo byte-level BPE — no runtime transformers dependency,
    # reference inference.py:293-298)
    for fname in ("vocab.json", "merges.txt"):
        if not os.path.exists(os.path.join(args.bart_ckpt, fname)):
            raise SystemExit(f"--summarize needs vocab.json + merges.txt in "
                             f"{args.bart_ckpt} (missing {fname})")
    params = port_bart(load_state_dict(args.bart_ckpt))
    cfg = bart.BartConfig.distilbart_cnn()
    return bart.Summarizer(params, cfg,
                           BartTokenizer.from_pretrained(args.bart_ckpt))


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.resolve_img_size(args)
    if args.samples_per_prompt is None:
        args.samples_per_prompt = 1 if args.mode == "enter_prompt" else 2
    from sdbc_tpu.diffusion.pipeline import SDPipeline

    params, cfg = common.resolve_params_cfg(args)
    tok = common.make_tokenizer(args, cfg.clip.vocab_size)
    mesh = None
    if args.tp:
        from sdbc_tpu.parallel.mesh import MeshConfig, make_mesh

        mesh = make_mesh(MeshConfig(model=args.tp))
    elif args.spatial:
        raise SystemExit("--spatial requires --tp (it lays the mesh; "
                         "use --tp 1 for pure row sharding)")
    checker = None
    if args.safety_checker:
        from sdbc_tpu.models.port import safety_checker_from_dir
        from sdbc_tpu.models.safety import ClipSafetyChecker

        sc_params, sc_cfg = safety_checker_from_dir(args.safety_checker)
        checker = ClipSafetyChecker(sc_params, sc_cfg)
        print(f"safety checker: {args.safety_checker} "
              f"(ViT {sc_cfg.layers}x{sc_cfg.hidden} @ {sc_cfg.image_size})")
    pipe = SDPipeline(params, cfg, tok, compute_dtype=common.compute_dtype(args),
                      mesh=mesh, spatial=args.spatial,
                      tokenizer2=common.make_tokenizer2(args, cfg),
                      safety_checker=checker)
    if args.refiner_ckpt:
        from sdbc_tpu.diffusion.pipeline import EnsemblePipeline

        rf_params, rf_cfg = common.resolve_refiner(args.refiner_ckpt,
                                                   cfg.scheduler)
        rf_pipe = SDPipeline(rf_params, rf_cfg, tok,
                             compute_dtype=common.compute_dtype(args),
                             tokenizer2=common.make_tokenizer2(args, rf_cfg))
        pipe = EnsemblePipeline(pipe, rf_pipe, handoff=args.refiner_frac)
        print(f"ensemble serving: refiner {args.refiner_ckpt} takes over "
              f"at {args.refiner_frac:.0%} of the denoising run")

    save_dir = os.path.join(args.save_dir, f"{args.run_id} inference")
    os.makedirs(save_dir, exist_ok=True)

    # ONE sampling-profile spec from the flags, shared by every mode —
    # previously calc_fid/default silently dropped the profile knobs
    # (--cache_interval/--karras_sigmas/--freeu/--cfg_interval/...)
    from sdbc_tpu.diffusion.spec import SampleSpec

    profile_spec = SampleSpec(
        cache_interval=args.cache_interval, cache_tail=args.cache_tail,
        use_karras_sigmas=args.karras_sigmas,
        freeu=_resolve_freeu(args, cfg),
        cfg_interval=_resolve_cfg_interval(args),
        guidance_rescale=args.guidance_rescale, clip_skip=args.clip_skip)

    if args.mode == "enter_prompt":
        if not args.prompt:
            raise SystemExit("--prompt is required with --mode enter_prompt")
        if args.mask_image and not args.init_image:
            raise SystemExit("--mask_image (inpainting) requires --init_image")
        init_image = mask_image = control_image = None
        if args.init_image:
            from PIL import Image

            if not os.path.exists(args.init_image):
                raise SystemExit(f"--init_image {args.init_image} not found")
            init_image = Image.open(args.init_image)
            if args.mask_image:
                if not os.path.exists(args.mask_image):
                    raise SystemExit(
                        f"--mask_image {args.mask_image} not found")
                mask_image = Image.open(args.mask_image)
        if args.control_image:
            from PIL import Image

            if cfg.controlnet is None:
                raise SystemExit("--control_image needs a ControlNet: pass "
                                 "--controlnet_path or a --ckpt from a "
                                 "--train_controlnet run")
            paths = [s for s in args.control_image.split(",") if s]
            for one in paths:
                if not os.path.exists(one):
                    raise SystemExit(f"--control_image {one} not found")
            # comma-separated = multi-ControlNet (one image per
            # --controlnet_path branch, residuals sum)
            control_image = ([Image.open(one) for one in paths]
                             if len(paths) > 1 else Image.open(paths[0]))
        spec = profile_spec.replace(
            height=args.img_size, width=args.img_size,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            seed=args.seed,
            negative_prompt=args.negative_prompt or None,
            num_images_per_prompt=args.samples_per_prompt,
            control_image=control_image,
            controlnet_scale=args.controlnet_scale,
            prompt_weighting=args.prompt_weighting,
            max_prompt_chunks=args.max_prompt_chunks)
        if args.hires_scale:
            if init_image is not None:
                raise SystemExit("--hires_scale drives both stages itself "
                                 "and cannot combine with --init_image "
                                 "(use --strength img2img instead)")
            if not hasattr(pipe, "hires"):  # EnsemblePipeline
                raise SystemExit("--hires_scale is not wired up for "
                                 "--refiner_ckpt ensemble serving (the "
                                 "refiner already runs a tail pass)")
            spec = spec.replace(hires_scale=args.hires_scale,
                                hires_strength=args.hires_strength,
                                hires_steps=args.hires_steps,
                                hires_mode=args.hires_mode)
        else:
            spec = spec.replace(init_image=init_image,
                                strength=args.strength,
                                mask_image=mask_image)
        imgs = pipe.generate([args.prompt], spec)
        pils = pipe.numpy_to_pil(imgs)
        # prompt text becomes a filename: strip path separators ('/' would
        # point into a nonexistent subdir and lose the generated image)
        stem = re.sub(r"[/\\\0]", "_", args.prompt)[:64] or "prompt"
        for i, im in enumerate(pils):
            suffix = f"-{i}" if len(pils) > 1 else ""
            out = os.path.join(save_dir, f"{stem}{suffix}.png")
            im.save(out)
            print(f"saved {out}")

    elif args.mode == "calc_fid":
        import pandas as pd

        from sdbc_tpu.eval.fid import calculate_fid_given_paths
        from sdbc_tpu.eval.generate import get_fid_images

        # validate the (pure) stats path BEFORE hours of image generation
        if not os.path.exists(args.fid_stats_path):
            raise SystemExit(
                f"{args.fid_stats_path} not found — run "
                "python -m sdbc_tpu.cli.precalc_fid_stats first")
        df_test = pd.read_csv(os.path.join(args.data_root, "df_test.csv"),
                              index_col=0)
        get_fid_images(pipe, save_dir, df_test, num_imgs=args.num_imgs,
                       batch_size=args.batch_size, img_size=args.img_size,
                       inference_steps=args.num_inference_steps,
                       guidance_scale=args.guidance_scale, seed=args.seed,
                       prompt_bank=args.prompt_bank, spec=profile_spec)
        from sdbc_tpu.models.inception import InceptionConfig

        icfg = InceptionConfig.tiny() if args.tiny else InceptionConfig.fid()
        fid = calculate_fid_given_paths((save_dir, args.fid_stats_path),
                                        cfg=icfg, image_size=args.img_size,
                                        verbose=True)
        print(f"FID: {fid:.4f}")
        with open(os.path.join(save_dir, "fid_score.txt"), "w") as f:
            f.write(f"{fid}\n")
        # device memory high-water mark for the run's manifest (TPU
        # backends expose memory_stats; CPU returns None)
        import jax

        mstats = getattr(jax.local_devices()[0], "memory_stats",
                         lambda: None)() or {}
        peak = mstats.get("peak_bytes_in_use")
        if peak:
            print(f"peak HBM: {peak / 2**30:.2f} GiB")

    else:  # default: qualitative grids (3 configs, reference inference.py:458-471)
        from sdbc_tpu.eval.visualize import visualize_prompts

        with open(os.path.join(save_dir, "hyperparams.json"), "w") as f:
            json.dump(vars(args), f, indent=2, default=str)

        # availability of each optional input (graceful-skip in auto mode)
        test_csv = os.path.join(args.data_root, "df_test.csv")
        want_desc = args.include_desc is not False
        want_sum = args.summarize is not False and args.include_desc is not False
        if args.include_desc and not os.path.exists(test_csv):
            raise SystemExit(f"--include_desc needs {test_csv}")
        # explicit --summarize FORCES the config (tri-state contract above):
        # missing inputs are an error, not a silent skip
        if args.summarize and not args.bart_ckpt:
            raise SystemExit("--summarize needs --bart_ckpt")
        if args.summarize and args.include_desc is False:
            raise SystemExit("--summarize summarizes book descriptions; "
                             "it cannot combine with --no-include_desc")
        if args.summarize and not os.path.exists(test_csv):
            raise SystemExit(f"--summarize needs {test_csv} "
                             f"(source of the descriptions)")
        have_desc = want_desc and os.path.exists(test_csv)
        have_sum = want_sum and bool(args.bart_ckpt) and have_desc

        if args.prompt_bank == "reference" and not os.path.exists(test_csv):
            # the reference grid interpolates (author, title) df_test rows
            raise SystemExit(f"--prompt_bank reference needs {test_csv}")
        summarizer, descriptions, df_test = None, None, None
        if have_desc or args.prompt_bank == "reference":
            import pandas as pd

            df_test = pd.read_csv(test_csv, index_col=0)
            n_desc = max(16, args.samples_per_prompt)
            descriptions = [str(d) for d in df_test["book_desc"].head(n_desc)]
        if have_sum:
            summarizer = _build_summarizer(args)

        # the reference's default mode always renders 3 configurations in
        # this order: (summarize, include_desc) = (F,F), (T,T), (F,T)
        # (inference.py:458-471); unavailable ones are skipped with a log
        configs = [(False, False)]
        if have_sum:
            configs.append((True, True))
        elif want_sum:
            print("skipping summarize grid config "
                  "(needs --bart_ckpt and df_test.csv)")
        if have_desc:
            configs.append((False, True))
        elif want_desc:
            print(f"skipping include_desc grid config (no {test_csv})")
        for summarize, include_desc in configs:
            prompts_override = None
            if args.prompt_bank == "reference":
                # reference grid semantics: per test template, the first
                # samples_per_prompt df_test rows' (author, title) rendered
                # with the byte-exact bank (inference.py:299-330)
                import random as _random

                from sdbc_tpu.data import templates as tmpl

                head = df_test.head(args.samples_per_prompt)
                rows = [(str(r["book_authors"]), str(r["book_title"]))
                        for _, r in head.iterrows()]
                descs = None
                if summarize:
                    descs = [summarizer(d, max_length=15)
                             for d in descriptions[:args.samples_per_prompt]]
                elif include_desc:
                    descs = descriptions[:args.samples_per_prompt]
                prompts_override = tmpl.reference_grid_prompts(
                    rows, args.samples_per_prompt, include_desc=include_desc,
                    descriptions=descs, rng=_random.Random(args.seed))
            _, _, path = visualize_prompts(
                pipe, summarize=summarize, include_desc=include_desc,
                summarizer=summarizer, descriptions=descriptions,
                samples_per_prompt=args.samples_per_prompt,
                img_size=args.img_size,
                inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                batch_generate=args.batch_generate,
                batch_size=args.batch_size,
                save_dir=save_dir, seed=args.seed,
                prompts_override=prompts_override, spec=profile_spec,
                # keep native- and reference-bank grids from overwriting
                # each other in a shared save_dir
                name_suffix=("" if args.prompt_bank == "native"
                             else f",bank={args.prompt_bank}"))
            print(f"grid saved: {path}")


if __name__ == "__main__":
    main()
