"""Profile one exact-protocol sampling call and print the HLO time breakdown.

Captures a jax.profiler trace of pipeline.sample (batch 4, 50-step DDIM, CFG)
and converts it with xprof into per-op-category totals, so optimization
targets are measured, not guessed.

Run alone (single host core — any concurrent load corrupts timings):
  PYTHONPATH=. python experiments/r2_profile.py [--steps N] [--tool hlo_stats]
"""
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdbc_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from sdbc_tpu.diffusion import pipeline as pl_mod
from sdbc_tpu.models import clip, unet, vae
from sdbc_tpu.utils.dtypes import cast_floating


def main():
    steps = int(sys.argv[sys.argv.index("--steps") + 1]) if "--steps" in sys.argv else 50
    tool = sys.argv[sys.argv.index("--tool") + 1] if "--tool" in sys.argv else "hlo_stats"
    cfg = pl_mod.PipelineConfig.sd15()

    @jax.jit
    def build(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "text_encoder": clip.init(k1, cfg.clip),
            "unet": unet.init(k2, cfg.unet),
            "vae": vae.init(k3, cfg.vae),
        }

    params = cast_floating(build(jax.random.key(0)), jnp.bfloat16)
    print("[profile] params ready", flush=True)

    b = 4
    cond = jnp.zeros((b, 77), jnp.int32)
    uncond = jnp.zeros((b, 77), jnp.int32)
    lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.float32)

    def call():
        img = pl_mod.sample(params, cond, uncond, lat, jax.random.key(2), 7.5,
                            cfg=cfg, num_inference_steps=steps)
        return np.asarray(jax.block_until_ready(img)).ravel()[:1]

    call()  # compile + warmup
    print("[profile] warmed up; tracing one call", flush=True)
    log_dir = "/tmp/sdbc_trace"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    call()
    jax.profiler.stop_trace()

    paths = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    print("[profile] xplane:", paths, flush=True)
    if not paths:
        return

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, tool, {})
    out = f"/tmp/sdbc_{tool}.out"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print(f"[profile] wrote {out} ({len(data)} bytes)", flush=True)

    if tool == "hlo_stats":
        _summarize_hlo_stats(data)


def _summarize_hlo_stats(data):
    """hlo_stats tool emits json; aggregate device time by op category."""
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    tbl = json.loads(data)
    # format: {"cols": [...], "rows"/"data": [...]} — handle common layouts
    print("[profile] keys:", list(tbl)[:10] if isinstance(tbl, dict) else type(tbl))
    import collections
    cat_time = collections.Counter()
    name_time = collections.Counter()
    rows = tbl if isinstance(tbl, list) else tbl.get("data") or tbl.get("rows") or []
    cols = None
    if isinstance(tbl, dict) and "cols" in tbl:
        cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
        print("[profile] cols:", cols)
    for r in rows[:200000]:
        vals = [c.get("v") for c in r["c"]] if isinstance(r, dict) and "c" in r else r
        if cols:
            row = dict(zip(cols, vals))
            cat = row.get("HLO category") or row.get("category") or "?"
            t = row.get("Total time (us)") or row.get("occurrences_total_time_us") or 0
            nm = (row.get("HLO op expression") or row.get("HLO op name") or "?")
            cat_time[cat] += float(t or 0)
            name_time[str(nm)[:110]] += float(t or 0)
    tot = sum(cat_time.values())
    print(f"\n=== device time by HLO category (total {tot/1e3:.1f} ms) ===")
    for cat, t in cat_time.most_common(15):
        print(f"  {cat:<32} {t/1e3:9.1f} ms  {100*t/max(tot,1e-9):5.1f}%")
    print("\n=== top 25 ops ===")
    for nm, t in name_time.most_common(25):
        print(f"  {t/1e3:9.2f} ms  {nm}")


if __name__ == "__main__":
    main()
