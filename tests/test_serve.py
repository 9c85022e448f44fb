"""HTTP serving daemon tests (tiny config, ephemeral port, stdlib client)."""
import base64
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tiny_cfg, tiny_params):
    from http.server import ThreadingHTTPServer

    from sdbc_tpu.cli.serve import build_parser, make_app
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline

    args = build_parser().parse_args(
        ["--tiny", "--img_size", "32", "--num_inference_steps", "2",
         "--max_batch", "2", "--no-bf16"])
    from sdbc_tpu.cli import common

    common.resolve_img_size(args)
    pipe = SDPipeline(tiny_params, tiny_cfg,
                      CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size),
                      compute_dtype=jnp.float32)
    handler, state = make_app(pipe, args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield {"url": f"http://127.0.0.1:{srv.server_address[1]}",
           "state": state}
    srv.shutdown()
    srv.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=300)


def test_healthz(server):
    with urllib.request.urlopen(server["url"] + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["ok"] is True


def test_generate_png(server):
    with _post(server["url"], {"prompt": "a tiny cover", "seed": 7}) as r:
        assert r.headers["Content-Type"] == "image/png"
        data = r.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert server["state"]["requests"] >= 1


def test_generate_deterministic(server):
    a = _post(server["url"], {"prompt": "determinism", "seed": 3}).read()
    b = _post(server["url"], {"prompt": "determinism", "seed": 3}).read()
    assert a == b
    c = _post(server["url"], {"prompt": "determinism", "seed": 4}).read()
    assert a != c


def test_generate_batch_base64(server):
    with _post(server["url"], {"prompt": "two covers",
                               "num_images": 2}) as r:
        body = json.loads(r.read())
    imgs = [base64.b64decode(x) for x in body["images"]]
    assert len(imgs) == 2
    assert all(i[:8] == b"\x89PNG\r\n\x1a\n" for i in imgs)


def test_bad_requests(server):
    for payload, msg in (({}, "prompt"),
                         ({"prompt": "x", "num_images": 99}, "num_images")):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server["url"], payload)
        assert ei.value.code == 400
        assert msg in json.loads(ei.value.read())["error"]
    # daemon stays alive after errors
    with urllib.request.urlopen(server["url"] + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"]


def test_unknown_path(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server["url"] + "/nope", timeout=30)
    assert ei.value.code == 404


def test_concurrent_requests_serialize(server):
    """Concurrent posts all succeed (the lock serializes generation)."""
    results = []

    def hit(seed):
        with _post(server["url"], {"prompt": "load", "seed": seed}) as r:
            results.append(r.read()[:8])

    threads = [threading.Thread(target=hit, args=(s,)) for s in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 3
    assert all(r == b"\x89PNG\r\n\x1a\n" for r in results)


def test_serve_ensemble_generate():
    """The daemon serves an EnsemblePipeline (base→refiner) unchanged —
    the wrapper matches SDPipeline's calling convention."""
    from http.server import ThreadingHTTPServer

    from sdbc_tpu.cli import common
    from sdbc_tpu.cli.serve import build_parser, make_app
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import (EnsemblePipeline,
                                             PipelineConfig, SDPipeline)
    from sdbc_tpu.models import clip, unet, vae

    xl_cfg = PipelineConfig.tiny_xl()
    ks = jax.random.split(jax.random.key(7), 4)
    xl_params = {"text_encoder": clip.init(ks[0], xl_cfg.clip),
                 "text_encoder_2": clip.init(ks[1], xl_cfg.clip2),
                 "unet": unet.init(ks[2], xl_cfg.unet),
                 "vae": vae.init(ks[3], xl_cfg.vae)}
    rf_cfg = PipelineConfig.tiny_xl_refiner()
    rks = jax.random.split(jax.random.key(17), 3)
    rf_params = {"text_encoder_2": clip.init(rks[0], rf_cfg.clip2),
                 "unet": unet.init(rks[1], rf_cfg.unet),
                 "vae": vae.init(rks[2], rf_cfg.vae)}
    tok = CLIPTokenizer.fallback(xl_cfg.clip.vocab_size)
    ens = EnsemblePipeline(
        SDPipeline(xl_params, xl_cfg, tok, compute_dtype=jnp.float32),
        SDPipeline(rf_params, rf_cfg, tok, compute_dtype=jnp.float32),
        handoff=0.5)

    args = build_parser().parse_args(
        ["--tiny", "--img_size", "32", "--num_inference_steps", "2",
         "--max_batch", "2", "--no-bf16"])
    common.resolve_img_size(args)
    handler, state = make_app(ens, args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        with _post(url, {"prompt": "a tiny cover", "seed": 7}) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
        assert state["requests"] >= 1
    finally:
        srv.shutdown()
        srv.server_close()


def test_dynamic_batching_coalesces(tiny_cfg, tiny_params):
    """Two compatible requests posted inside the batch window run as ONE
    pipeline call (one batch), each keeping its own seed's latents."""
    from http.server import ThreadingHTTPServer

    from sdbc_tpu.cli import common
    from sdbc_tpu.cli.serve import build_parser, make_app
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline

    args = build_parser().parse_args(
        ["--tiny", "--img_size", "32", "--num_inference_steps", "2",
         "--max_batch", "4", "--batch_window_ms", "1500", "--no-bf16"])
    common.resolve_img_size(args)
    pipe = SDPipeline(tiny_params, tiny_cfg,
                      CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size),
                      compute_dtype=jnp.float32)
    handler, state = make_app(pipe, args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        results = {}

        def hit(seed):
            with _post(url, {"prompt": "coalesce me", "seed": seed}) as r:
                results[seed] = r.read()

        threads = [threading.Thread(target=hit, args=(s,)) for s in (1, 2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        assert set(results) == {1, 2}
        assert all(v[:8] == b"\x89PNG\r\n\x1a\n" for v in results.values())
        assert results[1] != results[2]          # per-job seeds respected
        assert state["batches"] == 1              # ONE coalesced call
        assert state["batched_images"] == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_incompatible_requests_do_not_coalesce(tiny_cfg, tiny_params):
    """Different step counts need different compiled graphs — the batcher
    must keep them in separate batches even inside one window."""
    from http.server import ThreadingHTTPServer

    from sdbc_tpu.cli import common
    from sdbc_tpu.cli.serve import build_parser, make_app
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline

    args = build_parser().parse_args(
        ["--tiny", "--img_size", "32", "--num_inference_steps", "2",
         "--max_batch", "4", "--batch_window_ms", "1500", "--no-bf16"])
    common.resolve_img_size(args)
    pipe = SDPipeline(tiny_params, tiny_cfg,
                      CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size),
                      compute_dtype=jnp.float32)
    handler, state = make_app(pipe, args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        results = []

        def hit(steps):
            with _post(url, {"prompt": "split us", "seed": 1,
                             "num_inference_steps": steps}) as r:
                results.append(r.read()[:8])

        threads = [threading.Thread(target=hit, args=(s,)) for s in (2, 3)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        assert len(results) == 2
        assert all(r == b"\x89PNG\r\n\x1a\n" for r in results)
        assert state["batches"] == 2              # no cross-key coalescing
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_img2img_and_size_validation(tiny_cfg, tiny_params):
    """POST with a base64 init_image runs the img2img path; mask inpaints;
    bad size / orphan mask / bad strength are 400s."""
    import io as io_mod

    from http.server import ThreadingHTTPServer

    from PIL import Image

    from sdbc_tpu.cli import common
    from sdbc_tpu.cli.serve import build_parser, make_app
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline

    args = build_parser().parse_args(
        ["--tiny", "--img_size", "32", "--num_inference_steps", "2",
         "--max_batch", "2", "--no-bf16"])
    common.resolve_img_size(args)
    pipe = SDPipeline(tiny_params, tiny_cfg,
                      CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size),
                      compute_dtype=jnp.float32)
    handler, state = make_app(pipe, args)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        rng = np.random.default_rng(3)
        buf = io_mod.BytesIO()
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     np.uint8)).save(buf, format="PNG")
        b64img = base64.b64encode(buf.getvalue()).decode()

        with _post(url, {"prompt": "redraw", "seed": 5,
                         "init_image": b64img, "strength": 0.5}) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

        mbuf = io_mod.BytesIO()
        Image.fromarray(np.full((32, 32), 255, np.uint8)).save(
            mbuf, format="PNG")
        b64mask = base64.b64encode(mbuf.getvalue()).decode()
        with _post(url, {"prompt": "inpaint", "seed": 5,
                         "init_image": b64img, "mask_image": b64mask,
                         "strength": 0.5}) as r:
            assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"

        for payload, msg in (
                ({"prompt": "x", "size": 48}, "size"),
                ({"prompt": "x", "mask_image": b64mask}, "init_image"),
                ({"prompt": "x", "init_image": b64img, "strength": 2.0},
                 "strength"),
                ({"prompt": "x", "init_image": "!!notbase64!!"}, "decode")):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(url, payload)
            assert ei.value.code == 400
            assert msg in json.loads(ei.value.read())["error"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_serve_hires(server):
    """hires_scale runs the two-stage upscale in the daemon; bad values
    and init_image combination are 400s."""
    with _post(server["url"], {"prompt": "big", "seed": 5,
                               "num_inference_steps": 2,
                               "hires_scale": 2.0,
                               "hires_strength": 0.6,
                               "hires_steps": 2}) as r:
        assert r.read()[:8] == b"\x89PNG\r\n\x1a\n"
    for payload, msg in (
            ({"prompt": "x", "hires_scale": 1.0}, "hires_scale"),
            ({"prompt": "x", "hires_scale": 2.0, "hires_strength": 2.0},
             "hires_strength")):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server["url"], payload)
        assert ei.value.code == 400
        assert msg in json.loads(ei.value.read())["error"]


def test_hires_jobs_key_on_seed():
    """Different-seed hires jobs must not coalesce (both stages draw noise
    from the head job's stream); same-seed ones and non-hires jobs keep
    their coalescing behavior."""
    from sdbc_tpu.cli.serve import _Job

    mk = lambda seed, hires: _Job("p", "", 1, 10, 7.5, 0.0, False, seed,
                                  64, hires=hires)
    h = (2.0, 0.7, 0)
    assert mk(1, h).key() != mk(2, h).key()
    assert mk(1, h).key() == mk(1, h).key()
    assert mk(1, None).key() == mk(2, None).key()


def test_healthz_latency_percentiles(server):
    """healthz reports rolling p50/p95 request latency once traffic has
    flowed (None before any request completes)."""
    import json as json_mod
    import urllib.request

    base = server["url"]
    with urllib.request.urlopen(f"{base}/healthz") as r:
        h = json_mod.loads(r.read())
    if h["requests"] == 0:
        assert h["latency_p50_s"] is None
    req = urllib.request.Request(
        f"{base}/generate",
        data=json_mod.dumps({"prompt": "a cover",
                             "num_inference_steps": 2}).encode(),
        headers={"Content-Type": "application/json"})
    urllib.request.urlopen(req).read()
    with urllib.request.urlopen(f"{base}/healthz") as r:
        h = json_mod.loads(r.read())
    assert h["latency_p50_s"] is not None and h["latency_p50_s"] >= 0
    assert h["latency_p95_s"] >= h["latency_p50_s"] - 1e-9


def test_serve_lora_bank(tiny_cfg, tiny_params, tmp_path):
    """Per-request LoRA adapter selection: a named adapter produces a
    different image than the base, unknown names 400, and jobs with
    different adapters never coalesce."""
    from http.server import ThreadingHTTPServer

    from sdbc_tpu.cli import common
    from sdbc_tpu.cli.serve import _Job, build_parser, make_app
    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import SDPipeline
    from sdbc_tpu.train import lora as lora_mod

    # a rank-2 adapter with a NONZERO delta (b=0 init would equal base)
    adapter = lora_mod.init_lora(jax.random.key(1), tiny_params, 2,
                                 components=("unet",))
    adapter = {k: {"a": v["a"],
                   "b": jax.random.normal(jax.random.key(2),
                                          v["b"].shape) * 0.05}
               for k, v in adapter.items()}
    path = str(tmp_path / "style.npz")
    lora_mod.save_lora(path, adapter, 2, 4.0)

    args = build_parser().parse_args(
        ["--tiny", "--img_size", "32", "--num_inference_steps", "2",
         "--max_batch", "2", "--no-bf16",
         "--lora_bank", f"style={path}"])
    common.resolve_img_size(args)
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    base = SDPipeline(tiny_params, tiny_cfg, tok,
                      compute_dtype=jnp.float32)
    merged = lora_mod.merge_file(tiny_params, path)
    lp = {"style": SDPipeline(merged, tiny_cfg, tok,
                              compute_dtype=jnp.float32)}
    handler, _ = make_app(base, args, lora_pipes=lp)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        a = _post(url, {"prompt": "a cover", "seed": 3,
                        "num_inference_steps": 2}).read()
        b = _post(url, {"prompt": "a cover", "seed": 3,
                        "num_inference_steps": 2, "lora": "style"}).read()
        assert a != b  # the adapter changes the image
        # deterministic per adapter
        b2 = _post(url, {"prompt": "a cover", "seed": 3,
                         "num_inference_steps": 2, "lora": "style"}).read()
        assert b == b2
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, {"prompt": "x", "lora": "nope"})
        assert ei.value.code == 400
        import json as json_mod
        with urllib.request.urlopen(url + "/healthz") as r:
            h = json_mod.loads(r.read())
        assert h["lora_adapters"] == ["style"]
    finally:
        srv.shutdown()
        srv.server_close()

    # coalescing key separates adapters
    mk = lambda lora: _Job("p", "", 1, 2, 7.5, 0.0, False, 1, 32,
                           lora=lora)
    assert mk("").key() != mk("style").key()


def test_serve_per_request_scheduler(server):
    """A request can pick its own scheduler: results differ from the
    startup scheduler's, are deterministic, unknown names 400, and
    different-scheduler jobs never coalesce."""
    from sdbc_tpu.cli.serve import _Job

    url = server["url"]
    base = _post(url, {"prompt": "solver pick", "seed": 5,
                       "num_inference_steps": 2}).read()
    # NB dpm at 2 steps degenerates to first-order == ddim (lower-order
    # first+final), so use heun (trapezoidal corrector differs at any N)
    heun = _post(url, {"prompt": "solver pick", "seed": 5,
                       "num_inference_steps": 2,
                       "scheduler": "heun"}).read()
    heun2 = _post(url, {"prompt": "solver pick", "seed": 5,
                        "num_inference_steps": 2,
                        "scheduler": "heun"}).read()
    assert base != heun and heun == heun2
    # the daemon's own scheduler name routes to the base pipe (no view)
    same = _post(url, {"prompt": "solver pick", "seed": 5,
                       "num_inference_steps": 2,
                       "scheduler": "ddim"}).read()
    assert same == base
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(url, {"prompt": "x", "scheduler": "plms9000"})
    assert ei.value.code == 400
    mk = lambda s: _Job("p", "", 1, 2, 7.5, 0.0, False, 1, 32, scheduler=s)
    assert mk("").key() != mk("dpm").key()
