"""Per-op roofline profile of the exact sampling protocol at a given batch.

Extends experiments/r2_profile.py with --batch and SELF-time aggregation
(the while-loop op double-counts children in total time), emitting the
bucket table used for the round-3 protocol-ceiling proof in PERF_NOTES.md.

Run ALONE (single host core):
  PYTHONPATH=. python experiments/r3_profile_batch.py --batch 8 [--steps 50]
"""
import collections
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


def arg(name, default):
    return (sys.argv[sys.argv.index(name) + 1]
            if name in sys.argv else default)


def main():
    steps = int(arg("--steps", 50))
    b = int(arg("--batch", 4))
    if "--parse_only" in sys.argv:  # re-parse an existing trace dir
        return parse(b, steps)
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
    cond = jnp.zeros((b, 77), jnp.int32)
    uncond = jnp.zeros((b, 77), jnp.int32)
    lat = jax.random.normal(jax.random.key(1), (b, 64, 64, 4), jnp.float32)

    def call():
        img = pl_mod.sample(params, cond, uncond, lat, jax.random.key(2), 7.5,
                            cfg=cfg, num_inference_steps=steps)
        return np.asarray(jax.block_until_ready(img)).ravel()[:1]

    call()  # compile + warmup
    print(f"[profile] warmed up (batch {b}); tracing one call", flush=True)
    log_dir = f"/tmp/sdbc_trace_b{b}"
    os.system(f"rm -rf {log_dir}")
    jax.profiler.start_trace(log_dir)
    call()
    jax.profiler.stop_trace()

    parse(b, steps)


def parse(b, steps):
    log_dir = f"/tmp/sdbc_trace_b{b}"
    paths = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        print("[profile] no xplane captured")
        return
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data).decode()
        except OSError:
            data = data.decode()
    tbl = json.loads(data)
    cols = [c.get("label") or c.get("id") for c in tbl["cols"]]
    print("[profile] cols:", cols, flush=True)
    with open(f"/tmp/sdbc_hlo_stats_b{b}.json", "w") as fh:
        fh.write(data)
    cat_time = collections.Counter()
    name_time = collections.Counter()
    cat_keys = [c for c in cols if "categ" in str(c).lower()]
    self_keys = [c for c in cols if "self" in str(c).lower()
                 and "%" not in str(c)]
    for r in tbl.get("rows") or tbl.get("data") or []:
        vals = [c.get("v") for c in r["c"]] if isinstance(r, dict) and "c" in r else r
        row = dict(zip(cols, vals))
        cat = next((row[k] for k in cat_keys if row.get(k)), None)
        nm = (row.get("HLO op expression") or row.get("HLO op name")
              or row.get("hlo_op_expression") or "?")
        if not cat:  # fall back to op-name classification
            n = str(nm)
            cat = ("custom-call" if ("custom-call" in n or n.startswith("_"))
                   else "convolution fusion" if "convolution" in n
                   else "fusion" if n.startswith("fusion")
                   else "formatting" if any(x in n for x in
                                            ("copy", "transpose", "pad",
                                             "bitcast", "reshape"))
                   else n.split(".")[0][:24])
        t = 0.0
        for key in self_keys or ("Total self time (us)",):
            if row.get(key):
                t = float(row[key])
                break
        cat_time[cat] += t
        name_time[str(nm)[:110]] += t
    tot = sum(cat_time.values())
    print(f"\n=== batch {b}: device SELF time by HLO category "
          f"(total {tot/1e3:.1f} ms/call, {tot/1e3/steps:.2f} ms/step-incl-once) ===")
    for cat, t in cat_time.most_common(15):
        print(f"  {cat:<32} {t/1e3:9.1f} ms  {100*t/max(tot,1e-9):5.1f}%")
    print("\n=== top 20 ops by self time ===")
    for nm, t in name_time.most_common(20):
        print(f"  {t/1e3:9.2f} ms  {nm}")


if __name__ == "__main__":
    main()
