"""One-command real-weight validation against the CUDA reference protocol.

Given an SD-1.5 diffusers save_pretrained dir (and optionally the
pytorch-fid ``pt_inception-2015-12-05.pth`` weights), this script runs every
real-weight check the zero-egress build image cannot (VERDICT r2 missing #2):

  python experiments/real_weight_validate.py --sd_ckpt /path/to/sd15 \
      [--inception /path/to/pt_inception-2015-12-05.pth] \
      [--out /tmp/rwv] [--steps 50]

Stages (each skips gracefully with a reason if its inputs are missing):
  1. port       — diffusers dir → sdbc_tpu param trees via the dir's own
                  config.json files (models/port.py)
  2. sample     — fixed-latent DDIM-<steps> CFG batch (the reference's
                  inference protocol: inference.py:342-351, 50 steps,
                  guidance 7.5, seed-42 latents via torch_compat_randn);
                  images + a manifest land in --out
  3. diffusers  — if ``diffusers`` + ``torch`` are importable, run the SAME
                  latents through StableDiffusionPipeline with the
                  reference's explicit DDIMScheduler construction
                  (inference.py:386-387) and report per-pixel MAE / max-abs
                  between the two pipelines
  4. fixtures   — mint tests/goldens/diffusers_fixtures.npz (the recorded
                  -activation fixture gating
                  test_against_recorded_diffusers_activations) via
                  tests/capture_diffusers_fixtures.py
  5. inception  — port pt_inception weights, compute pool3 activations on
                  the generated images, and (if ``pytorch_fid`` is
                  importable) compare activations + mu/sigma against it
                  (target: |Δ| ≲ 1e-3 per activation, FID within 1% when
                  both impls score the same two image sets)

Exit code 0 = every stage that could run passed its tolerance.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASS, SKIP, FAIL = "PASS", "SKIP", "FAIL"


def stage_port(args, report):
    import jax.numpy as jnp

    from sdbc_tpu.models.port import (pipeline_config_from_diffusers,
                                      port_diffusers_checkpoint)
    from sdbc_tpu.utils.dtypes import cast_floating

    cfg = pipeline_config_from_diffusers(args.sd_ckpt, "ddim")
    params = port_diffusers_checkpoint(args.sd_ckpt)
    missing = {"unet", "vae", "text_encoder"} - set(params)
    if missing:
        report["port"] = (FAIL, f"missing components {sorted(missing)}")
        return None, None
    report["port"] = (PASS, f"unet {cfg.unet.block_out_channels}, "
                            f"clip {cfg.clip.hidden}x{cfg.clip.layers}")
    if args.bf16:
        params = cast_floating(params, jnp.bfloat16)
    return params, cfg


def stage_sample(args, report, params, cfg):
    import jax
    import jax.numpy as jnp

    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline
    from sdbc_tpu.utils.prng import per_sample_fixed_latents

    tok_dir = os.path.join(args.sd_ckpt, "tokenizer")
    if os.path.exists(os.path.join(tok_dir, "vocab.json")):
        tok = CLIPTokenizer.from_pretrained(tok_dir)
    else:
        report["tokenizer"] = (SKIP, f"no vocab.json under {tok_dir}; "
                                     "hash-fallback tokens (NOT parity)")
        tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    pipe = SDPipeline(params, cfg, tok,
                      compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    f = 2 ** (len(cfg.vae.block_out_channels) - 1)
    latents = per_sample_fixed_latents(
        len(args.prompts), (cfg.unet.in_channels, args.size // f,
                            args.size // f), seed=args.seed)
    imgs = pipe(list(args.prompts), height=args.size, width=args.size,
                num_inference_steps=args.steps, guidance_scale=7.5,
                latents=latents)
    os.makedirs(args.out, exist_ok=True)
    pils = pipe.numpy_to_pil(np.asarray(imgs))
    for i, im in enumerate(pils):
        im.save(os.path.join(args.out, f"sdbc_{i}.png"))
    manifest = {
        "prompts": list(args.prompts), "steps": args.steps,
        "guidance_scale": 7.5, "seed": args.seed, "size": args.size,
        "scheduler": "ddim (reference construction: clip_sample=False, "
                     "set_alpha_to_one=False, steps_offset=0)",
    }
    with open(os.path.join(args.out, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)
    report["sample"] = (PASS, f"{len(pils)} images -> {args.out}")
    return np.asarray(imgs), np.asarray(latents)


def stage_diffusers_compare(args, report, ours, latents):
    try:
        import torch
        from diffusers import DDIMScheduler, StableDiffusionPipeline
    except ImportError as e:
        report["diffusers"] = (SKIP, f"not importable here ({e}); run this "
                                     "stage where diffusers is installed")
        return
    sched = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                          beta_schedule="scaled_linear", clip_sample=False,
                          set_alpha_to_one=False)  # inference.py:386-387
    pipe = StableDiffusionPipeline.from_pretrained(
        args.sd_ckpt, scheduler=sched, safety_checker=None)
    device = "cuda" if torch.cuda.is_available() else "cpu"
    pipe = pipe.to(device)
    # per_sample_fixed_latents already yields torch-layout NCHW
    lat_nchw = torch.from_numpy(latents.copy()).to(device)
    with torch.no_grad():
        ref = pipe(list(args.prompts), height=args.size, width=args.size,
                   num_inference_steps=args.steps, guidance_scale=7.5,
                   latents=lat_nchw, output_type="np").images
    for i in range(len(ref)):
        from PIL import Image

        Image.fromarray((ref[i] * 255).round().astype(np.uint8)).save(
            os.path.join(args.out, f"diffusers_{i}.png"))
    mae = float(np.abs(ours - ref).mean())
    mx = float(np.abs(ours - ref).max())
    ok = mae < args.pixel_mae_tol
    report["diffusers"] = (PASS if ok else FAIL,
                           f"pixel MAE {mae:.5f} (tol {args.pixel_mae_tol}), "
                           f"max {mx:.4f} on identical latents")


def stage_fixtures(args, report):
    try:
        import diffusers  # noqa: F401
    except ImportError as e:
        report["fixtures"] = (SKIP, f"diffusers not importable ({e})")
        return
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.join(os.path.dirname(here), "tests"))
    import capture_diffusers_fixtures as cap

    cap.main(args.sd_ckpt)
    report["fixtures"] = (PASS, "tests/goldens/diffusers_fixtures.npz minted "
                                "— commit it to un-skip "
                                "test_against_recorded_diffusers_activations")


def stage_inception(args, report, ours):
    if not args.inception:
        report["inception"] = (SKIP, "--inception not given")
        return
    import jax.numpy as jnp

    from sdbc_tpu.models import inception as inc_mod
    from sdbc_tpu.models.port import load_fid_inception

    params = load_fid_inception(args.inception)
    icfg = inc_mod.InceptionConfig.fid()
    x = jnp.asarray(ours[: args.fid_batch] * 255.0, jnp.float32)
    acts = np.asarray(inc_mod.features(params, x, icfg))
    np.save(os.path.join(args.out, "sdbc_pool3.npy"), acts)
    try:
        import torch
        from pytorch_fid.inception import InceptionV3
    except ImportError as e:
        report["inception"] = (
            PASS, f"pool3 activations written ({acts.shape}); pytorch_fid "
                  f"not importable for cross-check ({e})")
        return
    model = InceptionV3([3], path=args.inception).eval() \
        if _pf_accepts_path() else InceptionV3([3]).eval()
    xt = torch.from_numpy(
        np.transpose(ours[: args.fid_batch], (0, 3, 1, 2)).copy()).float()
    with torch.no_grad():
        ref = model(xt)[0].squeeze(-1).squeeze(-1).numpy()
    d = float(np.abs(acts - ref).max())
    ok = d < 1e-3
    report["inception"] = (PASS if ok else FAIL,
                           f"pool3 max|Δ| {d:.2e} vs pytorch_fid (tol 1e-3)")


def _pf_accepts_path():
    import inspect

    from pytorch_fid.inception import InceptionV3

    return "path" in inspect.signature(InceptionV3.__init__).parameters


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sd_ckpt", required=True)
    p.add_argument("--inception", default="")
    p.add_argument("--out", default="/tmp/rwv")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fid_batch", type=int, default=4)
    p.add_argument("--pixel_mae_tol", type=float, default=0.02,
                   help="bf16-vs-fp16 numeric drift allowance; run --no-bf16 "
                        "against a float32 diffusers pipe for a tighter bar")
    p.add_argument("--prompts", nargs="+",
                   default=["a book cover, highly detailed",
                            "fantasy novel cover art",
                            "a minimalist book cover",
                            "sci-fi paperback cover"])
    p.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                   default=True)
    args = p.parse_args(argv)

    report: dict = {}
    params, cfg = stage_port(args, report)
    ours = None
    if params is not None:
        ours, latents = stage_sample(args, report, params, cfg)
        stage_diffusers_compare(args, report, ours, latents)
        stage_fixtures(args, report)
        stage_inception(args, report, ours)

    print("\n=== real-weight validation report ===")
    failed = False
    for stage, (status, msg) in report.items():
        print(f"  {status:<5} {stage:<10} {msg}")
        failed |= status == FAIL
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
