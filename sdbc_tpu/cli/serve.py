"""HTTP serving daemon — production inference surface (beyond the reference).

The reference's only serving story is re-running ``inference.py`` per batch
(/root/reference/inference.py:342-351).  This daemon keeps the compiled
sampling graph resident and serves it over plain HTTP — stdlib only, no web
framework:

    POST /generate   {"prompt": "...", ["negative_prompt"], ["seed"],
                      ["num_inference_steps"], ["guidance_scale"],
                      ["guidance_rescale"], ["num_images"], ["size"],
                      ["prompt_weighting"], ["init_image" (base64 PNG/JPEG)],
                      ["strength"], ["mask_image" (base64, white=inpaint)],
                      ["hires_scale"], ["hires_strength"], ["hires_steps"],
                      ["lora" (adapter name from --lora_bank)],
                      ["scheduler" (per-request solver; first use of a
                       new one compiles its graph bucket)]}
        → image/png (single image) or JSON {"images": [base64 png, ...]}
    GET  /healthz    → {"ok": true, "requests": N, "batches": M, ...}

    img2img: POST an ``init_image`` (base64-encoded PNG/JPEG; resized to
    the request size) with ``strength`` ∈ (0, 1]; add ``mask_image``
    (white = regenerate) to inpaint.  ``size`` picks a square resolution
    from --allowed_sizes (each size is its own compiled graph bucket;
    non-default sizes compile on first use).

Design notes (TPU serving):
  - DYNAMIC BATCHING: requests queue into a single batcher thread that
    coalesces compatible jobs (same step count / guidance / weighting
    flags) into ONE pipeline call of up to --max_batch images.  A saturated
    chip runs batch 4 at ~1.7× the per-image throughput of batch 1, so
    under concurrent load this is close to free throughput; an idle server
    adds ZERO latency (the default --batch_window_ms 0 only coalesces jobs
    that queued while the previous batch was generating).  Each job keeps
    its own seed via injected per-job latents, so results are deterministic
    per (seed, batch composition); a lone request reproduces exactly.
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
import collections
import io
import json
import queue as queue_mod
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
                   help="largest num_images per request AND the dynamic "
                        "batcher's coalescing cap")
    p.add_argument("--allowed_sizes", type=str, default="",
                   help="comma-separated square sizes accepted via the "
                        "request 'size' field (default: --img_size only; "
                        "each size compiles its own graph bucket on "
                        "first use)")
    p.add_argument("--batch_window_ms", type=int, default=0,
                   help="extra wait after a job arrives to coalesce more "
                        "requests into its batch (0 = no added latency: "
                        "only jobs that queued during the previous "
                        "generation coalesce)")
    p.add_argument("--freeu", type=str, default="",
                   help="FreeU decoder rebalancing for the whole serving "
                        "profile: 'auto' (family preset) or b1,b2,s1,s2 "
                        "(static: part of the compiled graph)")
    p.add_argument("--cfg_interval", type=str, default="",
                   help="guidance-interval profile 'lo,hi' (grid "
                        "fractions, arXiv:2404.07724): CFG runs only on "
                        "steps in [lo,hi); outside, ONE cond-only UNet "
                        "eval (static: part of the compiled graph). "
                        "'0.0,0.7' is a good default tradeoff")
    p.add_argument("--refiner_ckpt", type=str, default="",
                   help="SDXL refiner checkpoint/diffusers dir: serve the "
                        "base->refiner ensemble (EnsemblePipeline)")
    p.add_argument("--refiner_frac", type=float, default=0.8)
    p.add_argument("--lora_bank", type=str, default="",
                   help="comma-separated name=path LoRA adapters served "
                        "side by side: requests pick one via the 'lora' "
                        "field (absent = base weights).  Each adapter is "
                        "merged once at startup into its own param tree "
                        "(one full model copy in HBM per adapter; the "
                        "compiled graph is shared — same shapes).  Not "
                        "combinable with --refiner_ckpt")
    common.bool_flag(p, "warmup", True,
                     "compile the batch-1 graph before accepting traffic")
    p.add_argument("--max_pending", type=int, default=32,
                   help="admission bound: jobs queued or running; beyond "
                        "it /generate answers 503 + Retry-After instead "
                        "of growing the queue without bound")
    p.add_argument("--request_timeout_s", type=float, default=300.0,
                   help="per-request deadline (queue wait + generation); "
                        "an expired request answers 504 and, if still "
                        "queued, is dropped before wasting a batch slot "
                        "(0 disables)")
    return p


class Overloaded(RuntimeError):
    """Admission-control rejection (--max_pending exceeded) → HTTP 503."""


class RequestTimeout(RuntimeError):
    """Per-request deadline expired (--request_timeout_s) → HTTP 504."""


class _Job:
    __slots__ = ("prompt", "neg", "n", "steps", "gs", "gr", "pw", "seed",
                 "size", "init", "mask", "strength", "hires", "lora",
                 "scheduler", "event", "images", "error", "cancelled")

    def __init__(self, prompt, neg, n, steps, gs, gr, pw, seed, size,
                 init=None, mask=None, strength=0.8, hires=None, lora="",
                 scheduler=""):
        self.prompt, self.neg, self.n = prompt, neg, n
        self.steps, self.gs, self.gr, self.pw = steps, gs, gr, pw
        self.seed, self.size = seed, size
        self.init, self.mask, self.strength = init, mask, strength
        self.hires = hires  # (scale, strength, steps) or None
        self.lora = lora    # adapter name ("" = base weights)
        self.scheduler = scheduler  # "" = the daemon's startup scheduler
        self.event = threading.Event()
        self.images = None
        self.error = None
        self.cancelled = False  # set by a timed-out waiter; batcher drops

    def key(self):
        """Jobs sharing this key can run in one compiled graph call.

        strength is part of the key only for img2img jobs (it sets the
        static t_start); text-to-image jobs ignore it.  The hires tuple is
        fully static (scale sets the base grid, strength the stage-2
        t_start, steps its grid).  Hires jobs also key on their seed: both
        stages draw noise from the head job's stream, so coalescing
        different-seed hires jobs would make results depend on batch
        composition — same-seed jobs coalesce (identical output), others
        run in their own batch and stay bit-reproducible.
        """
        return (self.steps, self.gs, self.gr, self.pw, self.size,
                self.init is not None, self.mask is not None,
                round(self.strength, 4) if self.init is not None else None,
                self.hires,
                self.seed if self.hires is not None else None,
                self.lora, self.scheduler)


def make_app(pipe, args, lora_pipes=None):
    """→ (handler_class, state dict).  Split from main() for tests.

    ``lora_pipes``: optional {name: SDPipeline} of adapter-merged
    pipelines served side by side (request field "lora"); "" is the base
    ``pipe``.  All entries share the tokenizer and — since the param
    shapes match — the compiled sampling graph.
    """
    import jax
    import numpy as np
    from http.server import BaseHTTPRequestHandler

    pipes = {"": pipe, **(lora_pipes or {})}
    # per-request scheduler views: an SDPipeline with a different
    # cfg.scheduler over the SAME param tree (constructor without a mesh
    # only stores references — no copy).  Each (scheduler, steps, bucket)
    # combination compiles its own graph on first use, served from the
    # persistent cache afterwards; the EnsemblePipeline carries no such
    # view (requests with "scheduler" are rejected there).
    _sched_views = {}
    _schedulers = ("ddim", "pndm", "ddpm", "dpm", "dpm_sde", "euler_a",
                   "lms", "unipc", "lcm", "heun")

    def pipe_for(lora: str, scheduler: str):
        base = pipes[lora]
        if not scheduler or scheduler == base.cfg.scheduler:
            return base
        key = (lora, scheduler)
        if key not in _sched_views:
            import dataclasses

            from sdbc_tpu.diffusion.pipeline import SDPipeline

            _sched_views[key] = SDPipeline(
                base.params,
                dataclasses.replace(base.cfg, scheduler=scheduler),
                base.tokenizer, compute_dtype=base.compute_dtype,
                tokenizer2=base.tokenizer2,
                safety_checker=base.safety_checker)
        return _sched_views[key]

    jobs: "queue_mod.Queue[_Job]" = queue_mod.Queue()
    pending: "collections.deque[_Job]" = collections.deque()
    state = {"requests": 0, "errors": 0, "busy": False, "batches": 0,
             "batched_images": 0, "started": time.time(),
             "pending_jobs": 0, "rejected_overload": 0,
             "timed_out": 0}
    admission = threading.Lock()  # guards state["pending_jobs"]

    def _admit(job: _Job) -> None:
        """Bounded admission: hold the slot count below --max_pending so a
        burst of slow requests cannot grow the queue (and host memory for
        their decoded init images) without bound."""
        with admission:
            if state["pending_jobs"] >= args.max_pending:
                state["rejected_overload"] += 1
                raise Overloaded(
                    f"server overloaded: {state['pending_jobs']} jobs "
                    f"pending (--max_pending {args.max_pending}); retry "
                    "later")
            state["pending_jobs"] += 1
        jobs.put(job)

    def _release(job: _Job) -> None:
        with admission:
            state["pending_jobs"] -= 1
    # rolling request latencies (seconds, queue wait + generation) for the
    # /healthz p50/p95 — bounded so a long-lived daemon stays O(1) memory
    latencies: "collections.deque[float]" = collections.deque(maxlen=512)

    f = pipe.cfg.vae_scale
    sizes = sorted({int(s) for s in
                    (args.allowed_sizes.split(",") if args.allowed_sizes
                     else []) if s.strip()} | {args.img_size})
    for s in sizes:
        if s % (f * 8) or s <= 0:
            raise SystemExit(f"--allowed_sizes: {s} is not a positive "
                             f"multiple of {f * 8}")
    from sdbc_tpu.cli.inference import _resolve_cfg_interval, _resolve_freeu
    freeu = _resolve_freeu(args, pipe.cfg) if getattr(args, "freeu", "") \
        else None
    cfg_interval = _resolve_cfg_interval(args)

    def job_latents(job: _Job) -> np.ndarray:
        """Per-job initial latents from the job's own seed — the same
        (lkey, sampler) split SDPipeline uses internally, so a lone job
        reproduces the unbatched call bit-for-bit on the deterministic
        schedulers."""
        lkey, _ = jax.random.split(jax.random.key(job.seed))
        shape = (job.n, job.size // f, job.size // f,
                 pipe.cfg.latent_channels)
        return np.asarray(jax.random.normal(lkey, shape), np.float32)

    def run_batch(batch):
        head = batch[0]
        # key() guarantees one (adapter, scheduler) pair per batch
        bpipe = pipe_for(head.lora, head.scheduler)
        prompts, negs, lats = [], [], []
        inits, masks = [], []
        for j in batch:
            prompts += [j.prompt] * j.n
            negs += [j.neg] * j.n
            lats.append(job_latents(j))
            if j.init is not None:
                inits += [j.init] * j.n
            if j.mask is not None:
                masks += [j.mask] * j.n
        from sdbc_tpu.diffusion.spec import SampleSpec

        # ONE request carrier for both routes (diffusion/spec.py): the
        # daemon profile knobs + the coalesced jobs' shared key fields
        spec = SampleSpec(height=head.size, width=head.size,
                          num_inference_steps=head.steps,
                          guidance_scale=head.gs,
                          guidance_rescale=head.gr,
                          negative_prompt=negs,
                          # sampler key for the stochastic schedulers;
                          # per-job reproducibility there holds for lone
                          # jobs only
                          seed=head.seed,
                          cache_interval=args.cache_interval,
                          cache_tail=args.cache_tail,
                          freeu=freeu, cfg_interval=cfg_interval,
                          prompt_weighting=head.pw)
        try:
            if head.hires is not None:
                # two-stage hires-fix (key() guarantees the whole batch
                # shares the tuple AND the seed, so every job reproduces
                # the unbatched hires call for its own seed)
                hs, hstr, hsteps = head.hires
                spec = spec.replace(hires_scale=hs, hires_strength=hstr,
                                    hires_steps=hsteps)
            else:
                spec = spec.replace(
                    latents=np.concatenate(lats, axis=0))
                if inits:  # key() guarantees the whole batch agrees
                    spec = spec.replace(
                        init_image=np.stack(inits),
                        strength=head.strength,
                        mask_image=np.stack(masks) if masks else None)
            imgs = bpipe.generate(prompts, spec)
            off = 0
            for j in batch:
                j.images = np.asarray(imgs[off:off + j.n])
                off += j.n
        except Exception as e:  # noqa: BLE001 — report to every waiter
            for j in batch:
                j.error = e
        finally:
            state["batches"] += 1
            state["batched_images"] += sum(j.n for j in batch)
            for j in batch:
                _release(j)
                j.event.set()

    def drain_queue():
        while True:
            try:
                pending.append(jobs.get_nowait())
            except queue_mod.Empty:
                return

    def batcher():
        while True:
            if not pending:
                try:
                    pending.append(jobs.get(timeout=1.0))
                except queue_mod.Empty:
                    continue
            if args.batch_window_ms > 0:
                time.sleep(args.batch_window_ms / 1000.0)
            drain_queue()
            head = pending.popleft()
            if head.cancelled:  # waiter already answered 504 — drop
                _release(head)
                continue
            batch, total = [head], head.n
            i = 0
            while i < len(pending):  # FIFO among compatible jobs
                cand = pending[i]
                if cand.cancelled:
                    del pending[i]
                    _release(cand)
                elif cand.key() == head.key() \
                        and total + cand.n <= args.max_batch:
                    del pending[i]
                    batch.append(cand)
                    total += cand.n
                else:
                    i += 1
            state["busy"] = True
            try:
                run_batch(batch)
            finally:
                state["busy"] = False

    threading.Thread(target=batcher, daemon=True,
                     name="sdbc-serve-batcher").start()

    def decode_b64_image(b64: str, size: int, mode: str) -> np.ndarray:
        """base64 PNG/JPEG → float32 [0,1] array (size, size[, 3])."""
        from PIL import Image

        try:
            raw = base64.b64decode(b64, validate=True)
            img = Image.open(io.BytesIO(raw))
            img.load()
        except Exception as e:
            raise ValueError(f"could not decode base64 image: {e}")
        img = img.convert(mode)
        if img.size != (size, size):
            img = img.resize((size, size),
                             Image.BICUBIC if mode == "RGB"
                             else Image.NEAREST)
        return np.asarray(img, np.float32) / 255.0

    def generate(req: dict):
        prompt = req.get("prompt")
        if not isinstance(prompt, str) or not prompt.strip():
            raise ValueError("'prompt' (non-empty string) is required")
        n = int(req.get("num_images", 1))
        if not 1 <= n <= args.max_batch:
            raise ValueError(f"num_images must be in [1, {args.max_batch}]")
        size = int(req.get("size", args.img_size))
        if size not in sizes:
            raise ValueError(f"size must be one of {sizes} "
                             "(--allowed_sizes)")
        if req.get("mask_image") and not req.get("init_image"):
            raise ValueError("mask_image (inpainting) requires init_image")
        init = mask = None
        if req.get("init_image"):
            init = decode_b64_image(req["init_image"], size, "RGB")
            strength = float(req.get("strength", 0.8))
            if not 0.0 < strength <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got "
                                 f"{strength}")
            if req.get("mask_image"):
                mask = decode_b64_image(req["mask_image"], size, "L")
        lora = str(req.get("lora") or "")
        if lora and lora not in pipes:
            raise ValueError(
                f"unknown lora adapter {lora!r}; served: "
                f"{sorted(n for n in pipes if n) or '(none — --lora_bank)'}")
        scheduler = str(req.get("scheduler") or "")
        if scheduler:
            if scheduler not in _schedulers:
                raise ValueError(f"unknown scheduler {scheduler!r}; one "
                                 f"of {list(_schedulers)}")
            if not hasattr(pipe, "hires"):  # EnsemblePipeline
                raise ValueError("per-request scheduler is not available "
                                 "under --refiner_ckpt ensemble serving")
            if scheduler == pipes[lora].cfg.scheduler:
                # normalize to '' — same pipeline as the daemon default,
                # so explicit-name and default requests coalesce into one
                # batch instead of keying apart
                scheduler = ""
        hires = None
        if req.get("hires_scale"):
            if not hasattr(pipe, "hires"):  # EnsemblePipeline
                raise ValueError("hires_scale is not available under "
                                 "--refiner_ckpt ensemble serving")
            if init is not None:
                raise ValueError("hires_scale cannot combine with "
                                 "init_image (it drives both stages "
                                 "itself)")
            hs = float(req["hires_scale"])
            if hs <= 1.0:
                raise ValueError(f"hires_scale must be > 1, got {hs}")
            hstr = float(req.get("hires_strength", 0.7))
            if not 0.0 < hstr <= 1.0:
                raise ValueError(f"hires_strength must be in (0, 1], got "
                                 f"{hstr}")
            hires = (round(hs, 4), round(hstr, 4),
                     int(req.get("hires_steps", 0)))
        job = _Job(prompt=prompt,
                   neg=str(req.get("negative_prompt") or ""),
                   n=n,
                   steps=int(req.get("num_inference_steps",
                                     args.num_inference_steps)),
                   gs=float(req.get("guidance_scale", args.guidance_scale)),
                   gr=float(req.get("guidance_rescale", 0.0)),
                   pw=bool(req.get("prompt_weighting", False)),
                   seed=int(req.get("seed", 42)),
                   size=size, init=init, mask=mask,
                   strength=float(req.get("strength", 0.8)), hires=hires,
                   lora=lora, scheduler=scheduler)
        t_enq = time.monotonic()
        _admit(job)  # raises Overloaded at the --max_pending bound
        if not job.event.wait(args.request_timeout_s or None):
            # still queued: mark for the batcher to drop without wasting
            # a batch slot; if already running, the batch completes and
            # its images are discarded (the device call is not abortable)
            job.cancelled = True
            state["timed_out"] += 1
            raise RequestTimeout(
                f"request exceeded --request_timeout_s "
                f"{args.request_timeout_s:g}s (queue wait + generation)")
        latencies.append(time.monotonic() - t_enq)
        if job.error is not None:
            raise job.error
        pngs = []
        for im in pipe.numpy_to_pil(job.images):
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
                lat = sorted(latencies)
                pct = (lambda p: round(lat[min(len(lat) - 1,
                                               int(p * len(lat)))], 3)) \
                    if lat else (lambda p: None)
                self._json(200, {"ok": True,
                                 "latency_p50_s": pct(0.50),
                                 "latency_p95_s": pct(0.95),
                                 "lora_adapters": sorted(n for n in pipes
                                                         if n),
                                 **{k: v for k, v in state.items()}})
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                pngs = generate(req)
                state["requests"] += 1
                if len(pngs) == 1:
                    self._send(200, pngs[0], ctype="image/png")
                else:
                    self._json(200, {"images": [
                        base64.b64encode(p).decode() for p in pngs]})
            except ValueError as e:
                state["errors"] += 1
                self._json(400, {"error": str(e)})
            except Overloaded as e:
                state["errors"] += 1
                self.send_response(503)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "5")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except RequestTimeout as e:
                state["errors"] += 1
                self._json(504, {"error": str(e)})
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
    lora_pipes = {}
    if args.lora_bank:
        if args.refiner_ckpt:
            raise SystemExit("--lora_bank cannot combine with "
                             "--refiner_ckpt (adapters merge into the "
                             "base model, not the ensemble)")
        from sdbc_tpu.train import lora as lora_mod

        for entry in args.lora_bank.split(","):
            entry = entry.strip()
            if not entry:
                continue
            name, _, path = entry.partition("=")
            if not name or not path:
                raise SystemExit(f"--lora_bank entry {entry!r} is not "
                                 "name=path")
            merged = lora_mod.merge_file(params, path)
            lora_pipes[name] = SDPipeline(
                merged, cfg, tok, compute_dtype=common.compute_dtype(args),
                tokenizer2=common.make_tokenizer2(args, cfg))
            print(f"[serve] lora adapter {name!r} merged from {path} "
                  "(one full param copy)", flush=True)
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
        from sdbc_tpu.cli.inference import (_resolve_cfg_interval,
                                            _resolve_freeu)

        pipe(["warmup"], height=args.img_size, width=args.img_size,
             num_inference_steps=args.num_inference_steps,
             cache_interval=args.cache_interval, cache_tail=args.cache_tail,
             freeu=_resolve_freeu(args, cfg) if args.freeu else None,
             cfg_interval=_resolve_cfg_interval(args))
        print(f"[serve] warmup done in {time.time() - t0:.1f}s", flush=True)

    handler, _ = make_app(pipe, args, lora_pipes=lora_pipes)
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
