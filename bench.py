"""Headline benchmark: SD-1.5 512x512 50-step sampling throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "ceiling",
"profiles"}.  vs_baseline is measured against the BASELINE.json north-star
target of 2 images/sec/chip (the reference publishes no numbers, SURVEY.md
§6, so the target is the baseline).

The exact-protocol number stays `value`.  `ceiling` carries the round-3
per-op roofline proof that 2.0 img/s/chip is structurally infeasible on one
v5e for this protocol (BASELINE.md "Measured ceiling"); `profiles` carries
the matched-quality serving points (unipc-20 / dpm-25 / DeepCache) that DO
beat the target — live-measured when the wall-clock budget
(SDBC_BENCH_BUDGET, default 1500s) allows, otherwise the recorded
bench_log.jsonl rows, flagged "recorded".

Random-init weights (zero-egress image: no pretrained checkpoints available);
throughput is weight-value-independent.
"""
import json
import os
import sys
import time

import jax

# the axon TPU plugin silently ignores the JAX_PLATFORMS env var; honor it
# explicitly (verbatim, preserving multi-platform fallback values like
# "tpu,cpu") so `JAX_PLATFORMS=cpu python bench.py` really runs the CPU
# smoke mode instead of claiming the chip (same fix as __graft_entry__.py)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

# round-3 ceiling proof (experiments/r3_roofline.py + PERF_NOTES "Round 3");
# static by construction: it is the *proof artifact*, not a measurement of
# this run
CEILING = {
    "summary": "2.0 img/s/chip infeasible on one v5e for the exact "
               "protocol: after the round-4 BSHD attention layout the "
               "pipeline measures AT the 178 TF/s sustained-peak "
               "structural roofline (2826.8 ms measured vs 2865.2 ms "
               "ideal device self-time per batch-4 call; spec-peak "
               "roofline 1.45 img/s); a hypothetical zero-waste "
               "attention kernel still bounds the protocol at 1.78",
    "roofline_img_per_s": 1.45,
    "sustained_roofline_ms_per_call": {"measured": 2826.8, "ideal": 2865.2},
    "zero_waste_attention_bound_img_per_s": 1.78,
    "batch_sweep_img_per_s": {"4": 1.379, "8": 1.353, "16": 1.326},
    "evidence": ["experiments/r3_roofline.py",
                 "experiments/PERF_NOTES.md#round-4",
                 "BASELINE.md#measured-ceiling"],
}

# training-side recorded fallbacks (PERF_NOTES round 3, same chip): the
# reference's primary entry point is the trainer (finetune_sd.py:480-481),
# so the driver-visible bench certifies both halves of the workload
TRAIN_RECORDED = [
    {"mode": "A", "desc": "text-encoder-only, micro 4 x accum 4",
     "img_per_s_chip": 37.32},
    {"mode": "B", "desc": "UNet, no-remat, micro 2 x accum 4, 8-bit Adam",
     "img_per_s_chip": 30.59},
    {"mode": "C", "desc": "UNet+text-encoder, no-remat, micro 2 x accum 4, "
                          "8-bit Adam",
     "img_per_s_chip": 30.02},
]
V5E_PEAK_BF16 = 197e12  # FLOP/s, for the MFU estimate

# recorded fallback rows (bench_log.jsonl, round 2/3 measurements on the
# same chip) used when the budget can't fit a live re-measure
RECORDED_PROFILES = [
    {"profile": "unipc-20", "img_per_s_chip": 3.1888, "vs_target": 1.59,
     "quality": "UniPC bh2 order-2 ~ dpm-2m quality class at fewer steps "
                "(arXiv:2302.04867); FID ladder experiments/"
                "r2_fid_fast_table.md"},
    {"profile": "dpm-25", "img_per_s_chip": 2.63, "vs_target": 1.32,
     "quality": "DPM-Solver++ 2M, 25 steps; FID-validated at tiny scale "
                "(experiments/r2_fid_fast_table.md)"},
    {"profile": "dpm-25+deepcache-k3", "img_per_s_chip": 5.26,
     "vs_target": 2.63,
     "quality": "DeepCache interval 3 tail 1 (arXiv:2312.00858); quality "
                "ladder in experiments/r2_fid_fast_table.md"},
]


def measure_train(on_tpu: bool, remaining_fn):
    """Live train-step throughput per reference fine-tune mode (A/B/C).

    Builds fresh random-init params + train state per mode, AOT-compiles
    the step (jit .lower().compile() — exposes cost_analysis for the MFU
    estimate), times SDBC_BENCH_TRAIN_REPS steps of synthetic batches.
    Modes that don't fit the remaining budget keep their recorded row.
    """
    from sdbc_tpu.diffusion.pipeline import PipelineConfig
    from sdbc_tpu.models import clip, unet, vae
    from sdbc_tpu.train.trainer import (TrainConfig, init_train_state,
                                        make_train_step)
    from sdbc_tpu.utils.dtypes import cast_floating

    cfg = (PipelineConfig.sd15 if on_tpu else PipelineConfig.tiny)()
    hw = 512 if on_tpu else 32
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    reps = int(os.environ.get("SDBC_BENCH_TRAIN_REPS", "3"))
    modes = {
        "A": (TrainConfig(train_text_encoder=True, train_unet=False,
                          grad_accum=4, num_examples=1000), 4),
        "B": (TrainConfig(train_text_encoder=False, train_unet=True,
                          grad_ckpt=False, use_8bit_adam=True,
                          grad_accum=4, num_examples=1000), 2),
        "C": (TrainConfig(train_text_encoder=True, train_unet=True,
                          grad_ckpt=False, use_8bit_adam=True,
                          grad_accum=4, num_examples=1000), 2),
    }

    rows = []
    for row in TRAIN_RECORDED:
        out = dict(row, recorded=True)
        name = out["mode"]
        if not on_tpu and name != "A":
            rows.append(out)
            continue
        if remaining_fn() < (420 if on_tpu else 60):
            print(f"[bench] budget: skipping live train mode {name}",
                  file=sys.stderr, flush=True)
            rows.append(out)
            continue
        try:
            tcfg, micro = modes[name]
            print(f"[bench] train {name}: init + compile...",
                  file=sys.stderr, flush=True)

            @jax.jit
            def build(key):
                k1, k2, k3 = jax.random.split(key, 3)
                p = {"text_encoder": clip.init(k1, cfg.clip),
                     "unet": unet.init(k2, cfg.unet),
                     "vae": vae.init(k3, cfg.vae)}
                return p

            params = jax.block_until_ready(build(jax.random.key(0)))
            state = init_train_state(params, tcfg, compute_dtype=dt,
                                     key=jax.random.key(2))
            del params
            step = make_train_step(cfg, tcfg, compute_dtype=dt,
                                   donate=True)
            batch = {
                "pixel_values": jnp.zeros(
                    (tcfg.grad_accum, micro, hw, hw, 3), dt),
                "input_ids": jnp.ones(
                    (tcfg.grad_accum, micro, 77 if on_tpu else cfg.clip.ctx),
                    jnp.int32),
            }
            key = jax.random.key(3)
            t0 = time.perf_counter()
            lowered = step.lower(state, batch, key)
            compiled = lowered.compile()
            flops = None
            try:
                ca = compiled.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = float(ca.get("flops", 0.0)) or None
            except Exception:
                pass
            state, metrics = compiled(state, batch, key)  # warmup
            float(metrics["loss"])  # sync via scalar readback
            print(f"[bench] train {name}: compile+warmup "
                  f"{time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
            # chain K steps per timed window: per-dispatch overhead over
            # the tunnel is ~80-110 ms, which would dominate a ~0.3 s
            # step if synced every call (TPU timing gotcha — see
            # .claude/skills/verify)
            chain = int(os.environ.get("SDBC_BENCH_TRAIN_CHAIN", "4"))
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                for _ in range(chain):
                    state, metrics = compiled(state, batch, key)
                float(metrics["loss"])
                times.append((time.perf_counter() - t0) / chain)
            del state, compiled, lowered, batch
            imgs = tcfg.grad_accum * micro
            best = min(times)
            out.update(img_per_s_chip=round(imgs / best, 2),
                       step_time_s=round(best, 4),
                       times_s=[round(t, 4) for t in times],
                       recorded=False)
            if flops and on_tpu:
                out["mfu"] = round(flops / best / V5E_PEAK_BF16, 4)
            print(f"[bench] train {name}: {out['img_per_s_chip']} img/s",
                  file=sys.stderr, flush=True)
        except Exception as e:  # keep the bench line intact per-mode
            out["error"] = f"{type(e).__name__}: {e}"[:300]
        rows.append(out)
    return rows


def main():
    from sdbc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    t_start = time.monotonic()
    budget = float(os.environ.get("SDBC_BENCH_BUDGET", "1500"))
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError as e:
        # chip tunnel outage (observed multi-hour UNAVAILABLE windows):
        # emit a labeled error line instead of a bare stack trace so the
        # recorded artifact is interpretable, then fail
        print(json.dumps({
            "metric": "images/sec/chip @ 512x512, 50-step DDIM, CFG, batch 4",
            "value": 0, "unit": "images/sec/chip", "vs_baseline": 0,
            "error": f"TPU backend unavailable: {e}",
            "last_recorded": "experiments/bench_log.jsonl",
        }))
        raise
    from sdbc_tpu.diffusion.pipeline import PipelineConfig, sample
    from sdbc_tpu.models import clip, unet, vae
    from sdbc_tpu.utils.dtypes import cast_floating

    if on_tpu:
        sched = os.environ.get("SDBC_BENCH_SCHEDULER", "ddim")
        batch = int(os.environ.get("SDBC_BENCH_BATCH", "4"))
        hw = 512
        steps = int(os.environ.get("SDBC_BENCH_STEPS", "50"))
        dt = jnp.bfloat16
    else:  # CPU smoke mode for local runs
        sched = "ddim"
        batch, hw, steps = 1, 32, 3
        dt = jnp.float32
    cfg = (PipelineConfig.sd15 if on_tpu else PipelineConfig.tiny)(sched)

    key = jax.random.key(0)
    print(f"[bench] init params ({'sd15' if on_tpu else 'tiny'})...",
          file=sys.stderr, flush=True)

    # one jitted program for the whole init: eager per-layer init would pay
    # thousands of host→device dispatch roundtrips over the axon tunnel
    @jax.jit
    def build_params(key):
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "text_encoder": clip.init(k1, cfg.clip),
            "unet": unet.init(k2, cfg.unet),
            "vae": vae.init(k3, cfg.vae),
        }
        return cast_floating(params, jnp.bfloat16) if on_tpu else params

    params = jax.block_until_ready(build_params(key))

    f = cfg.vae_scale
    cond = jnp.ones((batch, cfg.clip.ctx), jnp.int32)
    uncond = jnp.zeros((batch, cfg.clip.ctx), jnp.int32)
    latents = jax.random.normal(key, (batch, hw // f, hw // f,
                                      cfg.unet.in_channels), jnp.float32)

    cache_interval = int(os.environ.get("SDBC_BENCH_CACHE_INTERVAL", "0"))
    cache_tail = int(os.environ.get("SDBC_BENCH_CACHE_TAIL", "0"))
    # guidance interval 'lo,hi' (arXiv:2404.07724): CFG only on that step
    # sub-interval; cond-only (half-batch) UNet evals outside it
    cfg_interval = None
    if os.environ.get("SDBC_BENCH_CFG_INTERVAL", ""):
        cfg_interval = tuple(
            float(v)
            for v in os.environ["SDBC_BENCH_CFG_INTERVAL"].split(","))
    karras = os.environ.get("SDBC_BENCH_KARRAS", "") == "1"

    reps = int(os.environ.get("SDBC_BENCH_REPS", "3"))

    def measure(run_cfg, n_steps, ci=0, ct=0, label=""):
        """compile+warmup then best-of-reps images/sec for one profile."""
        def run():
            return sample(params, cond, uncond, latents, key, 7.5,
                          cfg=run_cfg, num_inference_steps=n_steps,
                          compute_dtype=dt, cache_interval=ci,
                          cache_tail=ct, cfg_interval=cfg_interval,
                          use_karras_sigmas=karras)

        def run_sync():
            # force a device→host readback: block_until_ready alone is not
            # a reliable completion barrier over the axon tunnel
            return np.asarray(jax.block_until_ready(run())[0, 0, 0, 0])

        print(f"[bench] {label or 'headline'}: compiling + warmup...",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        run_sync()
        print(f"[bench] warmup done in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_sync()
            times.append(time.perf_counter() - t0)
        print(f"[bench] per-call times: {[round(t, 3) for t in times]}",
              file=sys.stderr, flush=True)
        return batch / min(times), times

    ips, times = measure(cfg, steps, cache_interval, cache_tail)

    target = 2.0  # images/sec/chip north star (BASELINE.json)
    mode = "sd15" if on_tpu else "tiny-cpu-smoke"
    if cache_interval:
        mode += f", deepcache k={cache_interval}"
        if cache_tail:
            mode += f" tail={cache_tail}"
    if cfg_interval is not None:
        mode += f", cfg_interval={cfg_interval}"
    if karras:
        mode += ", karras"

    # matched-quality serving profiles (same checkpoint, opt-in flags):
    # live-measure what fits in the budget, recorded rows otherwise
    profiles = []
    want_profiles = (on_tpu and not cache_interval and cfg_interval is None
                     and not karras
                     and os.environ.get("SDBC_BENCH_PROFILES", "1") != "0")
    live = {}
    if want_profiles:
        for name, n_steps in (("unipc", 20), ("dpm", 25)):
            remaining = budget - (time.monotonic() - t_start)
            if remaining < 240:  # compile+reps for one more profile
                print(f"[bench] budget: skipping live {name}-{n_steps}",
                      file=sys.stderr, flush=True)
                break
            p_ips, _ = measure(PipelineConfig.sd15(name), n_steps,
                               label=f"{name}-{n_steps}")
            live[f"{name}-{n_steps}"] = p_ips
    for row in RECORDED_PROFILES:
        out = dict(row)
        if row["profile"] in live:
            out["img_per_s_chip"] = round(live[row["profile"]], 4)
            out["vs_target"] = round(live[row["profile"]] / target, 4)
            out["recorded"] = False
        else:
            out["recorded"] = True  # bench_log.jsonl rows (same chip, r2/r3)
        profiles.append(out)

    # --- training throughput (the reference's hot loop,
    # finetune_sd.py:480-481): live-measured when the budget allows,
    # recorded PERF_NOTES rows otherwise ---
    train_rows = []
    if os.environ.get("SDBC_BENCH_TRAIN", "1") != "0":
        # free the sampling weights first — the train state (+ masters /
        # int8 moments) needs the HBM
        params = cond = uncond = latents = None
        train_rows = measure_train(
            on_tpu, lambda: budget - (time.monotonic() - t_start))

    print(json.dumps({
        "metric": f"images/sec/chip @ {hw}x{hw}, {steps}-step "
                  f"{cfg.scheduler.upper()}, CFG, "
                  f"batch {batch} ({mode})",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / target, 4),
        "ceiling": CEILING,
        "profiles": profiles,
        "train": {"modes": train_rows,
                  "note": "training img/s on the same chip (reference "
                          "finetune_sd.py:480-481); mfu = step FLOPs / "
                          "step time / 197 TF/s v5e bf16 peak"},
    }))

    # recorded run matrix (batch/scheduler/variance) — experiments/bench_log.jsonl
    try:
        rec = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "backend": jax.default_backend(),
            "note": os.environ.get("SDBC_BENCH_NOTE", ""),
            "xla_flags": os.environ.get("XLA_FLAGS", ""),
            "batch": batch, "steps": steps, "scheduler": cfg.scheduler,
            "cache_interval": cache_interval, "cache_tail": cache_tail,
            "cfg_interval": list(cfg_interval) if cfg_interval else None,
            "karras": karras,
            "times_s": [round(t, 4) for t in times],
            "img_per_s_best": round(ips, 4),
            "img_per_s_mean": round(batch * reps / sum(times), 4),
            "live_profiles": {k: round(v, 4) for k, v in live.items()},
        }
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "experiments", "bench_log.jsonl"),
                  "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    except OSError as e:
        print(f"[bench] could not append bench_log.jsonl: {e}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
