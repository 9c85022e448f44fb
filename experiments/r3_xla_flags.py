"""XLA flag sweep over the exact sampling protocol (graph-level conv-fusion
attack, VERDICT r2 item 1b).

Each variant re-runs bench.py under a different XLA_FLAGS set; flag changes
miss the persistent compile cache, so every row costs a full remote compile
(10-25 min).  Run ALONE; results also land in experiments/bench_log.jsonl.

  nohup python experiments/r3_xla_flags.py > /tmp/xla_flags.log 2>&1 &
"""
import os
import subprocess
import sys

VARIANTS = [
    ("baseline", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("fusion_cost", "--xla_tpu_enable_experimental_fusion_cost_model=true"),
    ("no_multioutput", "--xla_tpu_enable_multi_output_fusion=false"),
]


def main():
    env_base = dict(os.environ)
    for name, flags in VARIANTS:
        env = dict(env_base)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        env["SDBC_BENCH_NOTE"] = f"xla_flags:{name}"
        print(f"=== {name}: XLA_FLAGS='{flags}' ===", flush=True)
        r = subprocess.run([sys.executable, "-u", "bench.py"], env=env,
                           capture_output=True, text=True, timeout=3600)
        out = (r.stdout + r.stderr).strip().splitlines()
        for ln in out[-6:]:
            print("   ", ln, flush=True)
        if r.returncode != 0:
            print(f"    [{name}] FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
