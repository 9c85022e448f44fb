"""Input-pipeline throughput: can the host feed the chip? (VERDICT r4 #4)

SURVEY §7 hard part 6: training consumes up to ~37 img/s (mode A,
PERF_NOTES round 3) of 512² JPEG decode+bicubic+normalize on the host; the
reference leans on 4 torch DataLoader workers (utils.py:173-174).  This
measures the C++ native loader (native/loader.cc, threaded libjpeg +
adaptive bicubic) against the PIL fallback across thread counts on THIS
host and appends the result to bench_log.jsonl + a PERF_NOTES row.

Run it on a QUIET host (single CPU core — concurrent work corrupts it):
    python experiments/r5_loader_bench.py [data_root]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from sdbc_tpu.data import native_loader

    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdbc_r5/data"
    img_dir = os.path.join(root, "images", "images")
    if not os.path.isdir(img_dir):
        from tests.data_fixtures import build_cover_dataset

        root = "/tmp/sdbc_loaderbench"
        build_cover_dataset(root, n_train=192, n_test=8, img_size=512)
        img_dir = os.path.join(root, "images", "images")
    paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
        if f.endswith(".jpg"))[:192]
    assert len(paths) >= 64, f"only {len(paths)} jpegs under {img_dir}"
    print(f"[loader-bench] {len(paths)} x 512^2 JPEGs, "
          f"native={native_loader.available()}", flush=True)

    results = {}

    def run(label, fn, reps=3):
        fn(paths[:8])  # warm page cache + lib load
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(paths)
            dt = time.perf_counter() - t0
            assert out.shape == (len(paths), 512, 512, 3)
            best = dt if best is None else min(best, dt)
        rate = len(paths) / best
        results[label] = round(rate, 2)
        print(f"[loader-bench] {label}: {rate:.1f} img/s "
              f"({best:.2f}s best of {reps})", flush=True)

    if native_loader.available():
        for t in (1, 2, 4, 8):
            run(f"native-t{t}",
                lambda ps, t=t: native_loader.decode_batch(ps, 512,
                                                           threads=t))

    # PIL fallback (what a wheel without the C++ lib uses)
    from sdbc_tpu.utils.image import decode_and_prepare

    def pil_batch(ps):
        out = np.empty((len(ps), 512, 512, 3), np.float32)
        for i, p in enumerate(ps):
            out[i] = decode_and_prepare(p, 512)
        return out

    run("pil-1thread", pil_batch)

    consumption = 37.32  # mode-A train img/s (PERF_NOTES round 3 / BENCH)
    best_label = max(results, key=results.get)
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "backend": "host", "note": "r5 input-pipeline decode bench",
        "img_size": 512, "n": len(paths), "rates_img_per_s": results,
        "train_consumption_img_per_s": consumption,
        "headroom": round(results[best_label] / consumption, 2),
        "best": best_label,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_log.jsonl"), "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
