"""Headline benchmark: SD-1.5 512x512 50-step sampling throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json north-star target of
2 images/sec/chip (the reference publishes no numbers, SURVEY.md §6, so the
target is the baseline).

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


def main():
    from sdbc_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
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
        cfg = PipelineConfig.sd15(os.environ.get("SDBC_BENCH_SCHEDULER", "ddim"))
        batch = int(os.environ.get("SDBC_BENCH_BATCH", "4"))
        hw = 512
        steps = int(os.environ.get("SDBC_BENCH_STEPS", "50"))
        dt = jnp.bfloat16
    else:  # CPU smoke mode for local runs
        cfg = PipelineConfig.tiny("ddim")
        batch, hw, steps = 1, 32, 3
        dt = jnp.float32

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

    def run():
        return sample(params, cond, uncond, latents, key, 7.5, cfg=cfg,
                      num_inference_steps=steps, compute_dtype=dt,
                      cache_interval=cache_interval, cache_tail=cache_tail,
                      cfg_interval=cfg_interval)

    def run_sync():
        # force a device→host readback: block_until_ready alone is not a
        # reliable completion barrier over the axon tunnel
        return np.asarray(jax.block_until_ready(run())[0, 0, 0, 0])

    print("[bench] compiling + warmup...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    run_sync()
    t_compile = time.perf_counter() - t0
    print(f"[bench] warmup done in {t_compile:.1f}s", file=sys.stderr, flush=True)

    reps = int(os.environ.get("SDBC_BENCH_REPS", "3"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    dt_run = min(times)
    print(f"[bench] per-call times: {[round(t, 3) for t in times]}",
          file=sys.stderr, flush=True)
    ips = batch / dt_run

    target = 2.0  # images/sec/chip north star (BASELINE.json)
    mode = "sd15" if on_tpu else "tiny-cpu-smoke"
    if cache_interval:
        mode += f", deepcache k={cache_interval}"
        if cache_tail:
            mode += f" tail={cache_tail}"
    if cfg_interval is not None:
        mode += f", cfg_interval={cfg_interval}"
    print(json.dumps({
        "metric": f"images/sec/chip @ {hw}x{hw}, {steps}-step "
                  f"{cfg.scheduler.upper()}, CFG, "
                  f"batch {batch} ({mode})",
        "value": round(ips, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / target, 4),
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
            "times_s": [round(t, 4) for t in times],
            "img_per_s_best": round(ips, 4),
            "img_per_s_mean": round(batch * reps / sum(times), 4),
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
