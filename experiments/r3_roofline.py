"""Per-op roofline table for the exact sampling protocol (offline analysis).

Consumes /tmp/sdbc_hlo_stats_b{B}.json written by r3_profile_batch.py and
emits, per HLO op (aggregated) and per bucket:
  measured self time, achieved TF/s, achieved HBM GiB/s, bound-by,
  roofline time = max(FLOPs / MXU_PEAK, bytes / HBM_PEAK)
and totals → the protocol throughput ceiling if every op ran at roofline.

v5e peaks: 197 TF/s bf16 MXU (chip spec; we measure 178 sustained on 4096^3
matmuls → both ceilings reported), 819 GB/s HBM.

  PYTHONPATH=. python experiments/r3_roofline.py --batch 4 [--steps 50]
"""
import collections
import json
import sys

MXU_SPEC = 197e12     # v5e bf16 peak
MXU_MEAS = 178e12     # slope-measured sustained (PERF_NOTES chip charact.)
HBM = 819e9           # v5e HBM bandwidth


def arg(name, default):
    return (sys.argv[sys.argv.index(name) + 1]
            if name in sys.argv else default)


def main():
    b = int(arg("--batch", 4))
    steps = int(arg("--steps", 50))
    tbl = json.load(open(f"/tmp/sdbc_hlo_stats_b{b}.json"))
    cols = [c.get("label") or c.get("id") for c in tbl["cols"]]

    agg = collections.defaultdict(lambda: dict(t=0.0, fl=0.0, by=0.0, n=0,
                                               bound=collections.Counter()))
    for r in tbl["rows"]:
        vals = [c.get("v") for c in r["c"]] if isinstance(r, dict) and "c" in r else r
        row = dict(zip(cols, vals))
        t_us = float(row.get("Total self time (us)") or 0.0)
        if t_us <= 0:
            continue
        gflops = float(row.get("Model GFLOP/s") or 0.0)   # rate, not count
        bw = float(row.get("Measured memory BW (GiB/s)") or 0.0)
        name = str(row.get("HLO op name") or "?")
        base = name.split(".")[0]
        cat = str(row.get("HLO op category") or "?")
        key = (cat, base)
        a = agg[key]
        a["t"] += t_us
        a["fl"] += gflops * 1e9 * t_us * 1e-6          # total FLOPs
        a["by"] += bw * (2**30) * t_us * 1e-6          # total bytes
        a["n"] += 1
        a["bound"][str(row.get("Bound by") or "?")] += 1

    rows = sorted(agg.items(), key=lambda kv: -kv[1]["t"])
    tot_t = sum(a["t"] for _, a in rows)
    tot_ideal_meas = tot_ideal_spec = 0.0
    print(f"batch {b}, {steps} steps — total device self time "
          f"{tot_t/1e3:.1f} ms/call ({tot_t/1e3/steps:.2f} ms incl-once/step)")
    print(f"{'op (aggregated)':<42} {'ms':>8} {'TF/s':>6} {'GiB/s':>6} "
          f"{'bound':>10} {'ideal178':>8} {'ideal197':>8} {'eff%':>5}")
    for (cat, base), a in rows:
        t_s = a["t"] * 1e-6
        tf = a["fl"] / t_s / 1e12 if t_s else 0.0
        gib = a["by"] / t_s / 2**30 if t_s else 0.0
        ideal_m = max(a["fl"] / MXU_MEAS, a["by"] / HBM)
        ideal_s = max(a["fl"] / MXU_SPEC, a["by"] / HBM)
        tot_ideal_meas += ideal_m
        tot_ideal_spec += ideal_s
        eff = 100 * ideal_m / t_s if t_s else 0.0
        bound = a["bound"].most_common(1)[0][0][:10]
        if a["t"] / 1e3 < 3.0:
            continue  # print only ops >3 ms/call; still counted in totals
        print(f"{(cat + ' ' + base)[:42]:<42} {a['t']/1e3:8.1f} {tf:6.1f} "
              f"{gib:6.0f} {bound:>10} {ideal_m*1e3:8.1f} {ideal_s*1e3:8.1f} "
              f"{eff:5.0f}")
    print(f"\nTOTALS: measured {tot_t/1e3:.1f} ms | roofline@178TF/s "
          f"{tot_ideal_meas*1e3:.1f} ms | roofline@197TF/s "
          f"{tot_ideal_spec*1e3:.1f} ms")
    for nm, ideal in (("meas(178TF/s)", tot_ideal_meas),
                      ("spec(197TF/s)", tot_ideal_spec)):
        print(f"  ceiling if every op at roofline[{nm}]: "
              f"{b / ideal:.2f} img/s/chip "
              f"(measured now: {b / (tot_t * 1e-6):.2f})")


if __name__ == "__main__":
    main()
