"""HTTP serving daemon — production inference surface (beyond the reference).

The reference's only serving story is re-running ``inference.py`` per batch
(/root/reference/inference.py:342-351).  This daemon keeps the compiled
sampling graph resident and serves it over plain HTTP — stdlib only, no web
framework:

    POST /generate   {"prompt": "...", ["negative_prompt"], ["seed"],
                      ["num_inference_steps"], ["guidance_scale"],
                      ["guidance_rescale"], ["num_images"],
                      ["prompt_weighting"]}
        → image/png (single image) or JSON {"images": [base64 png, ...]}
    GET  /healthz    → {"ok": true, "requests": N, ...}

Design notes (TPU serving):
  - ONE generation at a time: requests serialize through a lock — a single
    chip timeshares poorly and latency is dominated by the denoise loop, so
    FIFO beats interleaving.  ThreadingHTTPServer still accepts/queues
    concurrent connections.
  - the startup warmup compiles the batch-1 graph (first compile of SD-1.5
    shapes takes minutes; serving traffic should never pay it).  Other
    batch buckets compile on first use, served from the persistent cache
    on restart.
  - step count / scheduler changes recompile (static args); the warmup
    defaults are pinned via --num_inference_steps to keep the hot path hot.
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time

from sdbc_tpu.cli import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    common.add_model_args(p)
    common.add_img_size_arg(p)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8501)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--cache_interval", type=int, default=0,
                   help="DeepCache interval for the serving profile "
                        "(ddim/dpm; 0 = exact)")
    p.add_argument("--cache_tail", type=int, default=0)
    p.add_argument("--max_batch", type=int, default=4,
                   help="largest num_images accepted per request")
    p.add_argument("--refiner_ckpt", type=str, default="",
                   help="SDXL refiner checkpoint/diffusers dir: serve the "
                        "base->refiner ensemble (EnsemblePipeline)")
    p.add_argument("--refiner_frac", type=float, default=0.8)
    common.bool_flag(p, "warmup", True,
                     "compile the batch-1 graph before accepting traffic")
    return p


def make_app(pipe, args):
    """→ (handler_class, state dict).  Split from main() for tests."""
    from http.server import BaseHTTPRequestHandler

    lock = threading.Lock()
    state = {"requests": 0, "errors": 0, "busy": False,
             "started": time.time()}

    def generate(req: dict):
        prompt = req.get("prompt")
        if not isinstance(prompt, str) or not prompt.strip():
            raise ValueError("'prompt' (non-empty string) is required")
        n = int(req.get("num_images", 1))
        if not 1 <= n <= args.max_batch:
            raise ValueError(f"num_images must be in [1, {args.max_batch}]")
        steps = int(req.get("num_inference_steps",
                            args.num_inference_steps))
        imgs = pipe(
            [prompt],
            height=args.img_size, width=args.img_size,
            num_inference_steps=steps,
            guidance_scale=float(req.get("guidance_scale",
                                         args.guidance_scale)),
            guidance_rescale=float(req.get("guidance_rescale", 0.0)),
            negative_prompt=req.get("negative_prompt") or None,
            num_images_per_prompt=n,
            seed=int(req.get("seed", 42)),
            cache_interval=args.cache_interval,
            cache_tail=args.cache_tail,
            # community emphasis syntax + long prompts; a non-default k
            # chunk count compiles a new graph bucket on first use
            prompt_weighting=bool(req.get("prompt_weighting", False)))
        pngs = []
        for im in pipe.numpy_to_pil(imgs):
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            pngs.append(buf.getvalue())
        return pngs

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # one-line access log to stdout
            print(f"[serve] {self.address_string()} {fmt % a}", flush=True)

        def _send(self, code, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._send(code, json.dumps(obj).encode())

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **{k: v for k, v in
                                                state.items()}})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                # serialize generations: one chip, FIFO
                with lock:
                    state["busy"] = True
                    try:
                        pngs = generate(req)
                    finally:
                        state["busy"] = False
                state["requests"] += 1
                if len(pngs) == 1:
                    self._send(200, pngs[0], ctype="image/png")
                else:
                    self._json(200, {"images": [
                        base64.b64encode(p).decode() for p in pngs]})
            except ValueError as e:
                state["errors"] += 1
                self._json(400, {"error": str(e)})
            except Exception as e:  # keep the daemon alive on bad requests
                state["errors"] += 1
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler, state


def main(argv=None):
    from http.server import ThreadingHTTPServer

    args = build_parser().parse_args(argv)
    common.resolve_img_size(args)
    from sdbc_tpu.diffusion.pipeline import SDPipeline

    params, cfg = common.resolve_params_cfg(args)
    tok = common.make_tokenizer(args, cfg.clip.vocab_size)
    pipe = SDPipeline(params, cfg, tok,
                      compute_dtype=common.compute_dtype(args),
                      tokenizer2=common.make_tokenizer2(args, cfg))
    if args.refiner_ckpt:
        from sdbc_tpu.diffusion.pipeline import EnsemblePipeline

        rf_params, rf_cfg = common.resolve_refiner(args.refiner_ckpt,
                                                   cfg.scheduler)
        rf_pipe = SDPipeline(rf_params, rf_cfg, tok,
                             compute_dtype=common.compute_dtype(args),
                             tokenizer2=common.make_tokenizer2(args, rf_cfg))
        pipe = EnsemblePipeline(pipe, rf_pipe, handoff=args.refiner_frac)
        print(f"[serve] ensemble: refiner takes over at "
              f"{args.refiner_frac:.0%}", flush=True)
    if args.warmup:
        print(f"[serve] warming up ({args.num_inference_steps} steps, "
              f"{args.img_size}px, scheduler {cfg.scheduler})...", flush=True)
        t0 = time.time()
        pipe(["warmup"], height=args.img_size, width=args.img_size,
             num_inference_steps=args.num_inference_steps,
             cache_interval=args.cache_interval, cache_tail=args.cache_tail)
        print(f"[serve] warmup done in {time.time() - t0:.1f}s", flush=True)

    handler, _ = make_app(pipe, args)
    srv = ThreadingHTTPServer((args.host, args.port), handler)
    print(f"[serve] listening on http://{args.host}:{args.port} "
          "(POST /generate, GET /healthz)", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        print("[serve] shutting down")
        srv.server_close()


if __name__ == "__main__":
    main()
