"""End-to-end sampling pipeline tests (tiny configs, few steps)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import SDPipeline
from sdbc_tpu.utils.prng import per_sample_fixed_latents


@pytest.fixture(scope="module")
def pipe(tiny_cfg, tiny_params):
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    return SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32)


def test_generate_range_and_shape(pipe):
    imgs = pipe(["a book cover"], height=32, width=32, num_inference_steps=3)
    assert imgs.shape == (1, 32, 32, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_fixed_latents_deterministic(pipe):
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=42)
    a = pipe(["x"], num_inference_steps=3, latents=lat)
    b = pipe(["x"], num_inference_steps=3, latents=lat)
    np.testing.assert_array_equal(a, b)


def test_guidance_scale_matters(pipe):
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=1)
    a = pipe(["a red cover"], num_inference_steps=3, latents=lat,
             guidance_scale=1.0)
    b = pipe(["a red cover"], num_inference_steps=3, latents=lat,
             guidance_scale=7.5)
    assert not np.allclose(a, b)


def test_prompt_matters(pipe):
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=2)
    a = pipe(["a red cover"], num_inference_steps=3, latents=lat)
    b = pipe(["a blue spaceship"], num_inference_steps=3, latents=lat)
    assert not np.allclose(a, b)


@pytest.mark.parametrize("scheduler", ["pndm", "ddpm", "lms", "unipc"])
def test_other_schedulers_run(tiny_cfg, tiny_params, scheduler):
    cfg = dataclasses.replace(tiny_cfg, scheduler=scheduler)
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    imgs = p(["y"], height=32, width=32, num_inference_steps=3)
    assert imgs.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(imgs))


def test_batch_generation(pipe):
    imgs = pipe(["a", "b"], height=32, width=32, num_inference_steps=2)
    assert imgs.shape == (2, 32, 32, 3)


def test_cache_interval_fast_mode(pipe):
    """DeepCache fast path: runs, deterministic, approximates the exact path."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=9)
    exact = pipe(["z"], num_inference_steps=6, latents=lat)
    fast1 = pipe(["z"], num_inference_steps=6, latents=lat, cache_interval=3)
    fast2 = pipe(["z"], num_inference_steps=6, latents=lat, cache_interval=3)
    np.testing.assert_array_equal(fast1, fast2)
    assert np.isfinite(fast1).all()
    # approximate but correlated with the exact result
    assert np.abs(exact - fast1).mean() < 0.2


@pytest.mark.parametrize("scheduler", ["pndm", "dpm", "unipc"])
def test_v_prediction_wired_on_eps_schedulers(tiny_cfg, tiny_params, scheduler):
    """A single PNDM/DPM/UniPC step equals the DDIM step (known identity) —
    but only if the pipeline converts the v-prediction model output before
    the eps/x0-parameterised steps (the round-1 advisor finding)."""
    cfg_v = dataclasses.replace(
        tiny_cfg, schedule=dataclasses.replace(
            tiny_cfg.schedule, prediction_type="v_prediction"))
    tok = CLIPTokenizer.fallback(cfg_v.clip.vocab_size)
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=5)

    ddim = SDPipeline(tiny_params, dataclasses.replace(cfg_v, scheduler="ddim"),
                      tok, compute_dtype=jnp.float32)
    other = SDPipeline(tiny_params, dataclasses.replace(cfg_v,
                                                        scheduler=scheduler),
                       tok, compute_dtype=jnp.float32)
    a = ddim(["v"], height=32, width=32, num_inference_steps=1, latents=lat)
    b = other(["v"], height=32, width=32, num_inference_steps=1, latents=lat)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_unknown_scheduler_rejected(tiny_cfg, tiny_params):
    import dataclasses

    from sdbc_tpu.diffusion.pipeline import sample

    cfg = dataclasses.replace(tiny_cfg, scheduler="nope")
    lat = jnp.zeros((1, 8, 8, 4))
    ids = jnp.zeros((1, tiny_cfg.clip.ctx), jnp.int32)
    with pytest.raises(ValueError, match="unknown scheduler"):
        sample(tiny_params, ids, ids, lat, jax.random.key(0), 7.5, cfg=cfg,
               num_inference_steps=2, compute_dtype=jnp.float32)


def test_cache_interval_requires_ddim(tiny_cfg, tiny_params):
    import dataclasses

    from sdbc_tpu.diffusion.pipeline import sample

    cfg = dataclasses.replace(tiny_cfg, scheduler="pndm")
    lat = jnp.zeros((1, 8, 8, 4))
    ids = jnp.zeros((1, tiny_cfg.clip.ctx), jnp.int32)
    with pytest.raises(ValueError, match="ddim"):
        sample(tiny_params, ids, ids, lat, jax.random.key(0), 7.5, cfg=cfg,
               num_inference_steps=2, compute_dtype=jnp.float32,
               cache_interval=2)


def test_cache_interval_dpm(tiny_cfg, tiny_params):
    """DeepCache composes with DPM-Solver++: runs, deterministic, finite."""
    import dataclasses

    from sdbc_tpu.diffusion.pipeline import sample

    cfg = dataclasses.replace(tiny_cfg, scheduler="dpm")
    lat = jnp.zeros((1, 8, 8, 4))
    ids = jnp.zeros((1, tiny_cfg.clip.ctx), jnp.int32)
    a = sample(tiny_params, ids, ids, lat, jax.random.key(0), 7.5, cfg=cfg,
               num_inference_steps=6, compute_dtype=jnp.float32,
               cache_interval=3, cache_tail=1)
    b = sample(tiny_params, ids, ids, lat, jax.random.key(0), 7.5, cfg=cfg,
               num_inference_steps=6, compute_dtype=jnp.float32,
               cache_interval=3, cache_tail=1)
    assert np.isfinite(np.asarray(a)).all()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # exact (uncached) dpm differs — the cache really engages
    c = sample(tiny_params, ids, ids, lat, jax.random.key(0), 7.5, cfg=cfg,
               num_inference_steps=6, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_negative_prompt(pipe):
    """negative_prompt swaps the CFG unconditional branch (the diffusers
    StableDiffusionPipeline parameter): '' or None reproduce the default;
    real text changes the output; per-prompt lists must match length."""
    import pytest

    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    base = pipe("a book cover", **kw)
    same = pipe("a book cover", negative_prompt="", **kw)
    np.testing.assert_array_equal(base, same)
    neg = pipe("a book cover", negative_prompt="blurry, low quality", **kw)
    assert not np.allclose(base, neg)
    lst = pipe(["a book cover"], negative_prompt=["blurry, low quality"], **kw)
    np.testing.assert_array_equal(neg, lst)
    with pytest.raises(ValueError, match="negative prompts"):
        pipe(["a", "b"], negative_prompt=["x"], **kw)


def test_num_images_per_prompt(pipe):
    """diffusers parameter: each prompt repeats n times with DISTINCT
    initial latents from the one seed stream."""
    import pytest

    kw = dict(height=32, width=32, num_inference_steps=2, seed=3)
    imgs = pipe("a book cover", num_images_per_prompt=2, **kw)
    assert imgs.shape == (2, 32, 32, 3)
    assert not np.allclose(imgs[0], imgs[1])
    # deterministic for a fixed seed
    again = pipe("a book cover", num_images_per_prompt=2, **kw)
    np.testing.assert_array_equal(imgs, again)
    with pytest.raises(ValueError, match="latents"):
        pipe("a book cover", num_images_per_prompt=2,
             latents=np.zeros((1, 8, 8, 4), np.float32), **kw)


def test_rectangular_generation(pipe):
    """Portrait/landscape shapes (book covers are 2:3) flow through the
    UNet's up/down paths and rectangular-token attention — the reference
    only ever generates square 512^2."""
    imgs = pipe("a portrait book cover", height=48, width=32,
                num_inference_steps=2)
    assert imgs.shape == (1, 48, 32, 3)
    assert np.isfinite(imgs).all()


@pytest.mark.parametrize("scheduler", ["euler_a", "dpm_sde"])
def test_stochastic_schedulers_run(tiny_cfg, tiny_params, scheduler):
    """euler_a / dpm_sde end-to-end: deterministic per seed, genuinely
    stochastic across seeds even at fixed initial latents (unlike
    ddim/pndm/dpm)."""
    cfg = dataclasses.replace(tiny_cfg, scheduler=scheduler)
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=3)
    a = p(["e"], num_inference_steps=3, latents=lat, seed=7)
    b = p(["e"], num_inference_steps=3, latents=lat, seed=7)
    c = p(["e"], num_inference_steps=3, latents=lat, seed=8)
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    assert not np.allclose(a, c)


def test_guidance_rescale(pipe):
    """rescale changes high-scale outputs; at guidance_scale=1 the guided
    output IS the conditional branch, so rescale is a numerical no-op."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=12)
    base = pipe(["r"], num_inference_steps=3, latents=lat)
    resc = pipe(["r"], num_inference_steps=3, latents=lat,
                guidance_rescale=0.7)
    assert np.isfinite(resc).all()
    assert not np.allclose(base, resc)
    g1 = pipe(["r"], num_inference_steps=3, latents=lat, guidance_scale=1.0)
    g1r = pipe(["r"], num_inference_steps=3, latents=lat, guidance_scale=1.0,
               guidance_rescale=0.7)
    np.testing.assert_allclose(g1, g1r, atol=1e-4)


def test_clip_skip(pipe, tiny_cfg, tiny_params):
    """clip_skip=2 conditions on the penultimate hidden state: pipeline
    output changes; 0 and 1 are both the full encoder (identical)."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=14)
    kw = dict(num_inference_steps=2, latents=lat)
    base = pipe(["c"], **kw)
    skip1 = pipe(["c"], clip_skip=1, **kw)
    np.testing.assert_array_equal(base, skip1)
    skip2 = pipe(["c"], clip_skip=2, **kw)
    assert not np.allclose(base, skip2)

    # the encoder-level semantics: skip_layers=1 == python loop over all
    # but the last layer + final LayerNorm (independent reference)
    from sdbc_tpu.models import clip as clip_mod
    from sdbc_tpu.ops import nn as nn_ops

    c = tiny_cfg.clip
    te = tiny_params["text_encoder"]
    ids = jnp.asarray([[1, 5, 9] + [0] * (c.ctx - 3)], jnp.int32)
    got = clip_mod.apply(te, ids, c, skip_layers=1)
    x = nn_ops.embedding(te["token_embedding"], ids)
    x = x + te["position_embedding"]["table"][: c.ctx][None]
    for i in range(c.layers - 1):
        layer = jax.tree.map(lambda p: p[i], te["layers"])
        x = clip_mod._layer_apply(layer, x, c)
    want = nn_ops.layer_norm(te["final_ln"], x, eps=c.eps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
    with pytest.raises(ValueError, match="skip_layers"):
        clip_mod.apply(te, ids, c, skip_layers=c.layers)


@pytest.mark.parametrize("scheduler", ["euler_a", "lms", "dpm", "dpm_sde"])
def test_karras_sigmas_pipeline(pipe, tiny_cfg, tiny_params, scheduler):
    """use_karras_sigmas end-to-end on each sigma-space sampler: finite,
    deterministic, and genuinely a different grid than the integer path."""
    cfg = dataclasses.replace(tiny_cfg, scheduler=scheduler)
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=21)
    kw = dict(num_inference_steps=4, latents=lat)
    grid = p(["k"], **kw)
    kar1 = p(["k"], use_karras_sigmas=True, **kw)
    kar2 = p(["k"], use_karras_sigmas=True, **kw)
    assert kar1.shape == grid.shape
    assert np.isfinite(kar1).all()
    np.testing.assert_array_equal(kar1, kar2)
    assert not np.allclose(grid, kar1)


def test_karras_sigmas_rejected_on_integer_schedulers(pipe):
    with pytest.raises(ValueError, match="karras"):
        pipe(["k"], num_inference_steps=2, use_karras_sigmas=True)


def test_karras_img2img_runs(tiny_cfg, tiny_params):
    """img2img on the karras grid (dpm): the σ-level noising path engages
    and a strength<1 run differs from text-to-image."""
    from PIL import Image

    cfg = dataclasses.replace(tiny_cfg, scheduler="dpm")
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8))
    a = p.img2img(["k"], img, strength=0.5, num_inference_steps=4,
                  height=32, width=32, use_karras_sigmas=True, seed=3)
    b = p.img2img(["k"], img, strength=0.5, num_inference_steps=4,
                  height=32, width=32, use_karras_sigmas=True, seed=3)
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)


def test_unipc_multistep_differs_from_dpm_but_close(tiny_cfg, tiny_params):
    """At several steps the UniPC corrector must change the trajectory
    relative to DPM-2M (whose predictor it shares) while staying close —
    both are order-2 solvers of the same ODE."""
    from sdbc_tpu.data.tokenizer import CLIPTokenizer

    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=31)
    p_dpm = SDPipeline(tiny_params,
                       dataclasses.replace(tiny_cfg, scheduler="dpm"),
                       tok, compute_dtype=jnp.float32)
    p_uni = SDPipeline(tiny_params,
                       dataclasses.replace(tiny_cfg, scheduler="unipc"),
                       tok, compute_dtype=jnp.float32)
    a = p_dpm(["q"], height=32, width=32, num_inference_steps=6, latents=lat)
    b = p_uni(["q"], height=32, width=32, num_inference_steps=6, latents=lat)
    assert not np.array_equal(a, b)          # the corrector did something
    assert np.abs(a - b).mean() < 0.15        # ...but solves the same ODE


def test_unipc_mask_and_t_end_rejected(tiny_cfg, tiny_params):
    from sdbc_tpu.diffusion.pipeline import sample

    cfg = dataclasses.replace(tiny_cfg, scheduler="unipc")
    lat = jnp.zeros((1, 8, 8, 4))
    ids = jnp.zeros((1, tiny_cfg.clip.ctx), jnp.int32)
    img = jnp.zeros((1, 32, 32, 3))
    mask = jnp.ones((1, 8, 8, 1))
    with pytest.raises(ValueError, match="unipc"):
        sample(tiny_params, ids, ids, lat, jax.random.key(0), 7.5, cfg=cfg,
               num_inference_steps=2, compute_dtype=jnp.float32,
               init_image=img, mask=mask)
    with pytest.raises(ValueError, match="UniPC"):
        sample(tiny_params, ids, ids, lat, jax.random.key(0), 7.5, cfg=cfg,
               num_inference_steps=4, compute_dtype=jnp.float32, t_end=2)


def test_freeu(pipe):
    """freeu changes the sampled output and stays finite; a bad tuple is
    rejected before tracing."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=41)
    kw = dict(num_inference_steps=2, latents=lat)
    base = pipe(["f"], **kw)
    from sdbc_tpu.models.unet import FREEU_SD15

    on = pipe(["f"], freeu=FREEU_SD15, **kw)
    assert np.isfinite(on).all()
    assert not np.allclose(base, on)
    unit = pipe(["f"], freeu=(1.0, 1.0, 1.0, 1.0), **kw)
    np.testing.assert_array_equal(base, unit)
    with pytest.raises(ValueError, match="freeu"):
        pipe(["f"], freeu=(1.0, 1.0), **kw)


def test_zero_snr_pipeline(tiny_cfg, tiny_params):
    """zero-SNR + trailing spacing end-to-end on ddim and unipc (v-pred);
    eps-parameterised schedulers are rejected."""
    from sdbc_tpu.diffusion.pipeline import sample

    sch = dataclasses.replace(tiny_cfg.schedule,
                              prediction_type="v_prediction",
                              rescale_zero_snr=True,
                              timestep_spacing="trailing")
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=43)
    for scheduler in ("ddim", "unipc"):
        cfg = dataclasses.replace(tiny_cfg, schedule=sch,
                                  scheduler=scheduler)
        tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
        p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
        out = p(["z"], height=32, width=32, num_inference_steps=3,
                latents=lat)
        assert np.isfinite(out).all()

    cfg = dataclasses.replace(tiny_cfg, schedule=sch, scheduler="dpm")
    ids = jnp.zeros((1, tiny_cfg.clip.ctx), jnp.int32)
    with pytest.raises(ValueError, match="zero"):
        sample(tiny_params, ids, ids, jnp.zeros((1, 8, 8, 4)),
               jax.random.key(0), 7.5, cfg=cfg, num_inference_steps=2,
               compute_dtype=jnp.float32)
    # trailing spacing alone works on dpm, but not pndm
    sch2 = dataclasses.replace(tiny_cfg.schedule,
                               timestep_spacing="trailing")
    cfg2 = dataclasses.replace(tiny_cfg, schedule=sch2, scheduler="pndm")
    with pytest.raises(ValueError, match="trailing"):
        sample(tiny_params, ids, ids, jnp.zeros((1, 8, 8, 4)),
               jax.random.key(0), 7.5, cfg=cfg2, num_inference_steps=2,
               compute_dtype=jnp.float32)
    cfg3 = dataclasses.replace(tiny_cfg, schedule=sch2, scheduler="dpm")
    tok = CLIPTokenizer.fallback(cfg3.clip.vocab_size)
    p3 = SDPipeline(tiny_params, cfg3, tok, compute_dtype=jnp.float32)
    out3 = p3(["t"], height=32, width=32, num_inference_steps=3,
              latents=lat)
    assert np.isfinite(out3).all()


# ---------------------------------------------------------------------------
# cfg_interval (guidance interval, arXiv:2404.07724)


def test_cfg_interval_full_equals_base(pipe):
    """(0, 1) applies CFG on every step — identical to the default path."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=21)
    base = pipe(["g"], num_inference_steps=4, latents=lat)
    full = pipe(["g"], num_inference_steps=4, latents=lat,
                cfg_interval=(0.0, 1.0))
    np.testing.assert_allclose(base, full, atol=1e-6)


def test_cfg_interval_empty_equals_gs1(pipe):
    """(0, 0) never guides: the cond-only eval equals guidance_scale=1
    exactly (u + 1·(c − u) = c), proving the single-batch branch is the
    same UNet math."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=22)
    gs1 = pipe(["g"], num_inference_steps=4, latents=lat,
               guidance_scale=1.0)
    off = pipe(["g"], num_inference_steps=4, latents=lat,
               cfg_interval=(0.0, 0.0))
    np.testing.assert_allclose(gs1, off, atol=1e-5)


@pytest.mark.parametrize("scheduler", ["dpm", "unipc"])
def test_cfg_interval_mid_runs(tiny_cfg, tiny_params, scheduler):
    """A middle interval runs finite and differs from both extremes on the
    multistep schedulers (mixed guided/unguided eval history)."""
    cfg = dataclasses.replace(tiny_cfg, scheduler=scheduler)
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=23)
    base = p(["g"], num_inference_steps=4, latents=lat)
    off = p(["g"], num_inference_steps=4, latents=lat,
            cfg_interval=(0.0, 0.0))
    mid = p(["g"], num_inference_steps=4, latents=lat,
            cfg_interval=(0.25, 0.75))
    assert np.isfinite(mid).all()
    assert not np.allclose(mid, base)
    assert not np.allclose(mid, off)


def test_cfg_interval_rejections(pipe, tiny_cfg, tiny_params):
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=24)
    with pytest.raises(ValueError, match="cache_interval"):
        pipe(["g"], num_inference_steps=4, latents=lat,
             cfg_interval=(0.0, 0.5), cache_interval=2)
    with pytest.raises(ValueError, match="lo <= hi"):
        pipe(["g"], num_inference_steps=4, latents=lat,
             cfg_interval=(0.7, 0.3))
    with pytest.raises(ValueError, match="exactly 2"):
        pipe(["g"], num_inference_steps=4, latents=lat,
             cfg_interval=(0.1, 0.5, 0.9))
    cfg = dataclasses.replace(tiny_cfg, scheduler="pndm")
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    p = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    with pytest.raises(ValueError, match="pndm"):
        p(["g"], num_inference_steps=4, latents=lat,
          cfg_interval=(0.0, 0.5))


def test_lcm_scheduler_pipeline(tiny_params):
    """--scheduler lcm: 4-step consistency sampling runs end-to-end,
    deterministic per seed, distinct from the DDIM path."""
    import jax.numpy as jnp

    from sdbc_tpu.data.tokenizer import CLIPTokenizer
    from sdbc_tpu.diffusion.pipeline import PipelineConfig, SDPipeline

    cfg = PipelineConfig.tiny("lcm")
    tok = CLIPTokenizer.fallback(cfg.clip.vocab_size)
    pipe = SDPipeline(tiny_params, cfg, tok, compute_dtype=jnp.float32)
    a = pipe(["a cover"], height=32, width=32, num_inference_steps=4,
             guidance_scale=1.5, seed=3)
    b = pipe(["a cover"], height=32, width=32, num_inference_steps=4,
             guidance_scale=1.5, seed=3)
    assert a.shape == (1, 32, 32, 3)
    assert 0.0 <= a.min() and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)
    d = SDPipeline(tiny_params, PipelineConfig.tiny("ddim"), tok,
                   compute_dtype=jnp.float32)(
        ["a cover"], height=32, width=32, num_inference_steps=4,
        guidance_scale=1.5, seed=3)
    assert not np.allclose(a, d)


def test_heun_scheduler_sampling(tiny_cfg, tiny_params):
    """Heun (2 model evals/step) samples finite reproducible images on
    both the leading grid and the Karras ramp, and supports img2img."""
    import dataclasses

    from sdbc_tpu.diffusion.pipeline import img2img_t_start, sample

    cfg = dataclasses.replace(tiny_cfg, scheduler="heun")
    cond = jnp.ones((1, cfg.clip.ctx), jnp.int32)
    uncond = jnp.zeros((1, cfg.clip.ctx), jnp.int32)
    lat = jax.random.normal(jax.random.key(4),
                            (1, 8, 8, cfg.unet.in_channels), jnp.float32)
    kw = dict(cfg=cfg, num_inference_steps=3, compute_dtype=jnp.float32)
    hw = 8 * cfg.vae_scale
    a = sample(tiny_params, cond, uncond, lat, jax.random.key(0), 7.5, **kw)
    b = sample(tiny_params, cond, uncond, lat, jax.random.key(0), 7.5, **kw)
    assert a.shape == (1, hw, hw, 3)
    assert bool(jnp.isfinite(a).all())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    k = sample(tiny_params, cond, uncond, lat, jax.random.key(0), 7.5,
               use_karras_sigmas=True, **kw)
    assert bool(jnp.isfinite(k).all())
    assert np.abs(np.asarray(k) - np.asarray(a)).max() > 0  # distinct grid

    init = jnp.clip(jax.random.uniform(jax.random.key(5), (1, hw, hw, 3)),
                    0, 1)
    t0 = img2img_t_start(3, 0.7, cfg.schedule.steps_offset)
    i2i = sample(tiny_params, cond, uncond, lat, jax.random.key(0), 7.5,
                 init_image=init, t_start=t0, **kw)
    assert bool(jnp.isfinite(i2i).all())
