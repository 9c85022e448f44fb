"""LIBTPU_INIT_ARGS fusion-flag probes over the exact sampling protocol.

r3_xla_flags.py's non-vmem variants never ran: `--xla_tpu_*` flags under
XLA_FLAGS are rejected by the LOCAL CPU XLA parser before the remote TPU
compiler sees them (PERF_NOTES round 3).  The working channel is
LIBTPU_INIT_ARGS, which this sweep uses.  Every variant misses the
persistent compile cache (flags key it), so each row costs a full remote
compile (~10-25 min).  Run ALONE:

  nohup python experiments/r3_libtpu_flags.py > /tmp/libtpu_flags.log 2>&1 &

Targets the conv-fusion bucket (1070 ms/call at 83% of roofline — the
largest absolute headroom left in the per-op table).
"""
import os
import subprocess
import sys

VARIANTS = [
    # measured 2026-08-17: baseline 1.3772, vmem32m 1.3618 (falsified)
    ("fusion_cost", "--xla_tpu_enable_experimental_fusion_cost_model=true"),
    ("no_multioutput", "--xla_tpu_enable_multi_output_fusion=false"),
]


def main():
    env_base = dict(os.environ)
    for name, flags in VARIANTS:
        env = dict(env_base)
        env["LIBTPU_INIT_ARGS"] = (
            env.get("LIBTPU_INIT_ARGS", "") + " " + flags).strip()
        env["SDBC_BENCH_NOTE"] = f"libtpu:{name}"
        print(f"=== {name}: LIBTPU_INIT_ARGS='{flags}' ===", flush=True)
        r = subprocess.run([sys.executable, "-u", "bench.py"], env=env,
                           capture_output=True, text=True, timeout=3600)
        out = (r.stdout + r.stderr).strip().splitlines()
        for ln in out[-6:]:
            print("   ", ln, flush=True)
        if r.returncode != 0:
            print(f"    [{name}] FAILED rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
