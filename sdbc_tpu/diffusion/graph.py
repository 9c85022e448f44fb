"""Single jit-compiled classifier-free-guidance sampling graph.

Replaces ``StableDiffusionPipeline.__call__`` (reference call sites
inference.py:342-351 and finetune_sd.py:264-271): tokenize → CLIP encode
(cond + uncond) → N-step scheduler loop with 2×-batched UNet for guidance →
VAE decode → images.  The whole denoise+decode path is ONE ``lax.fori_loop``
inside ONE jit, so XLA fuses scheduler math into the UNet graph and the host
is never touched between steps.

Fixed-seed parity: latents are injectable (the reference's fixed-latent
protocol, inference.py:263-274) — pass ``latents`` drawn from
utils.prng.torch_compat_randn for bit-comparable runs.
"""
from __future__ import annotations

import dataclasses
import functools
import warnings
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.models import clip as clip_mod
from sdbc_tpu.models import controlnet as controlnet_mod
from sdbc_tpu.models import unet as unet_mod
from sdbc_tpu.models import vae as vae_mod
from sdbc_tpu.diffusion import schedulers as sched_mod
from sdbc_tpu.ops import nn as nn_mod


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    clip: clip_mod.CLIPTextConfig
    unet: unet_mod.UNetConfig
    vae: vae_mod.VAEConfig
    schedule: sched_mod.ScheduleConfig
    # "ddim" | "pndm" | "ddpm" | "dpm" | "dpm_sde" | "euler_a" | "lms"
    # | "unipc"
    scheduler: str = "ddim"
    # optional spatially-conditioned control branch (models/controlnet.py);
    # set when serving with a ControlNet — params then carry a "controlnet"
    # subtree alongside text_encoder/unet/vae
    controlnet: Optional[controlnet_mod.ControlNetConfig] = None
    # SDXL's second text encoder (OpenCLIP-bigG with text projection);
    # params then carry "text_encoder_2" and the UNet config must set
    # addition_embed_dim (the pooled embed feeds the text_time embedding)
    clip2: Optional[clip_mod.CLIPTextConfig] = None
    # SDXL-refiner flavor: params carry ONLY text_encoder_2 (context =
    # bigG penultimate state alone), and the micro-conditioning is 5 ids
    # (orig size, crop, AESTHETIC SCORE — per CFG branch) instead of 6.
    # clip is set = clip2 so the tokenizer/ctx plumbing is unchanged.
    refiner: bool = False

    @property
    def is_sdxl(self) -> bool:
        return self.clip2 is not None

    @property
    def vae_scale(self) -> int:
        """Spatial down-factor of the VAE (8 for SD-1.x)."""
        return 2 ** (len(self.vae.block_out_channels) - 1)

    @property
    def latent_channels(self) -> int:
        """Channel count of the DIFFUSED latent (the VAE's latent space).

        Equals unet.in_channels for the standard families; the dedicated
        inpainting UNets take extra conditioning channels on top."""
        return self.vae.latent_channels

    @property
    def is_inpaint_unet(self) -> bool:
        """Dedicated inpainting UNet (the runwayml/sd-inpainting layout):
        conv_in takes latent ⧺ mask ⧺ masked-image-latent = 2·C+1
        channels; mask_image routes to the channel-concat protocol instead
        of the per-step latent blend."""
        return self.unet.in_channels == 2 * self.vae.latent_channels + 1

    def with_controlnet(self) -> "PipelineConfig":
        """This config + the matching ControlNet branch config.

        The conditioning embedder's stride-2 count must equal the VAE's
        downscale factor; SD-1.5/2.x (f8) get the diffusers-parity
        (16, 32, 96, 256) ramp, other scales a truncated ramp.
        """
        import math

        n = int(math.log2(self.vae_scale)) + 1
        if n == 4:      # f8 (SD-1.5/2.x): diffusers-parity ramp
            ramp = (16, 32, 96, 256)
        elif n < 4:     # shallow VAEs (tiny): truncated ramp
            ramp = (8, 16, 96, 256)[:n]
        else:           # deeper VAEs (f16+): extend at the widest stage
            ramp = (16, 32, 96, 256) + (256,) * (n - 4)
        cn = controlnet_mod.ControlNetConfig(unet=self.unet,
                                             conditioning_channels=ramp)
        return dataclasses.replace(self, controlnet=cn)

    @staticmethod
    def sd15(scheduler: str = "ddim") -> "PipelineConfig":
        return PipelineConfig(clip_mod.CLIPTextConfig.sd15(),
                              unet_mod.UNetConfig.sd15(),
                              vae_mod.VAEConfig.sd15(),
                              sched_mod.ScheduleConfig.sd15(), scheduler)

    @staticmethod
    def sd21(scheduler: str = "ddim",
             prediction_type: str = "v_prediction") -> "PipelineConfig":
        """SD-2.x family (beyond the reference's SD-1.5): OpenCLIP-shape
        text encoder, per-level head counts, v-prediction by default
        (SD-2.1 768); pass prediction_type="epsilon" for the 512 -base
        checkpoints.  Same VAE as SD-1.x."""
        sched = dataclasses.replace(sched_mod.ScheduleConfig.sd15(),
                                    prediction_type=prediction_type)
        return PipelineConfig(clip_mod.CLIPTextConfig.sd2(),
                              unet_mod.UNetConfig.sd21(),
                              vae_mod.VAEConfig.sd15(), sched, scheduler)

    @staticmethod
    def sdxl(scheduler: str = "ddim") -> "PipelineConfig":
        """SDXL-base family (beyond the reference's SD-1.5): dual text
        encoders (CLIP-L ⧺ OpenCLIP-bigG penultimate states, 2048-d
        context), pooled-text + size/crop micro-conditioning through the
        text_time addition embedding, 3-level depth-(1,2,10) UNet,
        0.13025 VAE scale.  Native resolution 1024²."""
        return PipelineConfig(clip_mod.CLIPTextConfig.sd15(),
                              unet_mod.UNetConfig.sdxl(),
                              vae_mod.VAEConfig.sdxl(),
                              sched_mod.ScheduleConfig.sd15(), scheduler,
                              clip2=clip_mod.CLIPTextConfig.sdxl_g())

    @staticmethod
    def sdxl_refiner(scheduler: str = "ddim") -> "PipelineConfig":
        """SDXL-refiner: the ensemble-of-expert-denoisers tail model
        (high-resolution detail specialist, typically driven through
        ``SDPipeline.img2img`` on the base model's output or the
        denoising_start/denoising_end latent handoff).  Single bigG
        encoder, aesthetic-score micro-conditioning."""
        big_g = clip_mod.CLIPTextConfig.sdxl_g()
        return PipelineConfig(big_g,
                              unet_mod.UNetConfig.sdxl_refiner(),
                              vae_mod.VAEConfig.sdxl(),
                              sched_mod.ScheduleConfig.sd15(), scheduler,
                              clip2=big_g, refiner=True)

    @staticmethod
    def tiny(scheduler: str = "ddim") -> "PipelineConfig":
        return PipelineConfig(clip_mod.CLIPTextConfig.tiny(),
                              unet_mod.UNetConfig.tiny(),
                              vae_mod.VAEConfig.tiny(),
                              sched_mod.ScheduleConfig.sd15(), scheduler)

    @staticmethod
    def tiny_xl(scheduler: str = "ddim") -> "PipelineConfig":
        """Toy SDXL: every family-specific path (dual encoders, pooled
        projection, depth-stacked transformers, no-attention level,
        addition embedding) at test scale.  addition_embed_dim = 16
        (clip2 projection) + 6·4 (time ids) = 40 = UNetConfig.tiny_xl's."""
        clip2 = dataclasses.replace(clip_mod.CLIPTextConfig.tiny(),
                                    projection_dim=16)
        return PipelineConfig(clip_mod.CLIPTextConfig.tiny(),
                              unet_mod.UNetConfig.tiny_xl(),
                              vae_mod.VAEConfig.tiny(),
                              sched_mod.ScheduleConfig.sd15(), scheduler,
                              clip2=clip2)

    @staticmethod
    def tiny_xl_refiner(scheduler: str = "ddim") -> "PipelineConfig":
        """Toy refiner: single-encoder SDXL conditioning at test scale.
        addition_embed_dim = 16 (clip2 projection) + 5·4 (orig/crop/
        aesthetic time ids) = 36; context dim = the tiny bigG's 32."""
        clip2 = dataclasses.replace(clip_mod.CLIPTextConfig.tiny(),
                                    projection_dim=16)
        u = dataclasses.replace(unet_mod.UNetConfig.tiny_xl(),
                                cross_attention_dim=32,
                                addition_embed_dim=36)
        return PipelineConfig(clip2, u, vae_mod.VAEConfig.tiny(),
                              sched_mod.ScheduleConfig.sd15(), scheduler,
                              clip2=clip2, refiner=True)


def encode_text(params, ids, cfg: PipelineConfig, compute_dtype=jnp.bfloat16,
                clip_skip: int = 0):
    """``clip_skip`` follows the community convention: 0/1 = full encoder,
    2 = stop one layer early (penultimate hidden state), etc.

    Long prompts: ids wider than the encoder context must be a multiple of
    it — each ``ctx``-token window is encoded independently (own position
    table + causal mask) and the windows concatenated along the sequence
    axis, the standard community chunking scheme (data/prompt_weights.py).
    The reshape folds the windows into the batch, so the k>1 encode is one
    bigger batched matmul, not k sequential passes.
    """
    ctx = cfg.clip.ctx
    b, width = ids.shape
    if width != ctx:
        if width % ctx:
            raise ValueError(f"token ids width {width} is not a multiple of "
                             f"the encoder context {ctx}")
        emb = clip_mod.apply(params["text_encoder"], ids.reshape(-1, ctx),
                             cfg.clip, compute_dtype=compute_dtype,
                             skip_layers=max(clip_skip - 1, 0))
        return emb.reshape(b, width, emb.shape[-1])
    return clip_mod.apply(params["text_encoder"], ids, cfg.clip,
                          compute_dtype=compute_dtype,
                          skip_layers=max(clip_skip - 1, 0))


def encode_text_xl(params, ids, ids2, cfg: PipelineConfig,
                   compute_dtype=jnp.bfloat16, clip_skip: int = 0,
                   weights=None, weights2=None):
    """SDXL dual-encoder conditioning.

    ids/ids2: (B, 77·k) from the CLIP-L and OpenCLIP tokenizers
    respectively (k > 1 = chunked long prompts: each 77-token window is
    encoded independently, like encode_text; the pooled output comes from
    the FIRST window — the community convention for long SDXL prompts).
    Returns (context, pooled): the two encoders' hidden states concatenated
    feature-wise (768 ⧺ 1280 = 2048) and the second encoder's projected
    pooled output (1280).

    ``weights``/``weights2`` (optional, (B, 77·k)): per-token emphasis
    weights applied to each encoder's hidden state separately
    (_apply_token_weights — mean-restored per encoder so each half keeps
    its trained magnitude).  The pooled output is never weighted: it
    carries global content, and emphasis is a cross-attention concept.

    SDXL conditions on hidden_states[-2] — the penultimate layer WITHOUT the
    final LayerNorm (unlike the SD-1.x clip-skip convention, which final-LNs
    the early state).  ``clip_skip`` keeps the community numbering: 0/1/2 all
    mean the SDXL-default penultimate state; 3 stops one layer earlier, etc.
    The pooled output always runs the full second-encoder stack.
    """
    if ids.shape[1] != ids2.shape[1]:
        raise ValueError(
            f"SDXL dual-encoder contexts differ: ids {ids.shape[1]} vs "
            f"ids2 {ids2.shape[1]} tokens — the two hidden states are "
            "concatenated feature-wise, so both tokenizers must encode at "
            "one shared length")
    skip = max(clip_skip - 1, 1)
    ctx = cfg.clip.ctx
    b, width = ids.shape
    if width != ctx:
        if width % ctx:
            raise ValueError(f"token ids width {width} is not a multiple of "
                             f"the encoder context {ctx}")
        k = width // ctx
        h1 = None
        if not cfg.refiner:
            h1 = clip_mod.apply(params["text_encoder"], ids.reshape(-1, ctx),
                                cfg.clip, compute_dtype=compute_dtype,
                                skip_layers=skip, final_ln=False)
            h1 = h1.reshape(b, width, h1.shape[-1])
        h2, pooled = clip_mod.apply_with_pooled(
            params["text_encoder_2"], ids2.reshape(-1, ctx), cfg.clip2,
            compute_dtype=compute_dtype, skip_layers=skip)
        h2 = h2.reshape(b, width, h2.shape[-1])
        pooled = pooled.reshape(b, k, -1)[:, 0]  # first window's pooled
    else:
        h1 = None
        if not cfg.refiner:
            h1 = clip_mod.apply(params["text_encoder"], ids, cfg.clip,
                                compute_dtype=compute_dtype,
                                skip_layers=skip, final_ln=False)
        h2, pooled = clip_mod.apply_with_pooled(
            params["text_encoder_2"], ids2, cfg.clip2,
            compute_dtype=compute_dtype, skip_layers=skip)
    if h1 is not None and weights is not None:
        h1 = _apply_token_weights(h1, weights)
    if weights2 is not None:
        h2 = _apply_token_weights(h2, weights2)
    if cfg.refiner:  # single-encoder flavor: bigG context alone
        return h2, pooled
    return jnp.concatenate([h1, h2], axis=-1), pooled


def _xl_added_cond(pooled, time_ids, fourier_dim):
    """concat(pooled, Fourier(time_ids)) — the text_time embedding input.

    time_ids: (B, 6) = (orig_h, orig_w, crop_top, crop_left, target_h,
    target_w), each expanded to ``fourier_dim`` features with the same
    sinusoidal map as the timestep embedding (diffusers add_time_proj).
    """
    b = time_ids.shape[0]
    ft = nn_mod.timestep_embedding(time_ids.reshape(-1), fourier_dim,
                                   dtype=jnp.float32).reshape(b, -1)
    return jnp.concatenate([pooled.astype(jnp.float32), ft], axis=-1)


def _apply_token_weights(emb, w):
    """Scale each token's hidden state by its prompt weight, then restore
    the per-sample mean (the established emphasis semantics: relative
    attention shifts, overall conditioning magnitude — which the UNet was
    trained against — stays).  Guarded against a degenerate zero mean."""
    emb_f = emb.astype(jnp.float32)
    mean0 = emb_f.mean(axis=(1, 2), keepdims=True)
    out = emb_f * w.astype(jnp.float32)[..., None]
    mean1 = out.mean(axis=(1, 2), keepdims=True)
    safe = jnp.where(jnp.abs(mean1) < 1e-7, 1.0, mean1)
    return (out * jnp.where(jnp.abs(mean1) < 1e-7, 1.0, mean0 / safe)
            ).astype(emb.dtype)


def _scheduler_loop(lo, hi, lat, model_at, update, *, state0=(), key=None,
                    cache0=None):
    """The ONE fori_loop driver behind every scheduler x {cached, uncached}
    sampling loop (replaces 16+ hand-written near-identical bodies).

    carry = (state, lat, key, cache); slots a scheduler does not use hold
    empty tuples, which contribute no leaves — the flattened loop carry
    (and hence the traced jaxpr) is byte-identical to the old per-scheduler
    bodies (gated by experiments/trace_hash_all.py).

    model_at(i, lat, cache) -> (t, out, cache): the grid point, the guided
      model output there, and the (DeepCache) trunk cache — the uncached
      paths thread the empty-tuple cache through untouched.
    update(i, t, out, lat, state, sub) -> (state, lat): everything the
      scheduler does after the model call (eps/x0 conversion, the step
      itself, the inpaint blend).  ``sub`` is a fresh PRNG subkey (None for
      deterministic schedulers), split BEFORE the model call to match the
      original stochastic bodies' trace order.
    """
    stochastic = key is not None
    carry0 = (state0, lat, key if stochastic else (),
              cache0 if cache0 is not None else ())

    def body(i, carry):
        state, lat, k, cache = carry
        sub = None
        if stochastic:
            k, sub = jax.random.split(k)
        t, out, cache = model_at(i, lat, cache)
        state, lat = update(i, t, out, lat, state, sub)
        return state, lat, k, cache

    _, lat, _, _ = jax.lax.fori_loop(lo, hi, body, carry0)
    return lat


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_inference_steps", "compute_dtype", "decode",
                     "cache_interval", "cache_tail", "attn_impl",
                     "chunked_decode", "t_start", "t_end", "pack_heads",
                     "guidance_rescale", "clip_skip", "use_karras_sigmas",
                     "freeu", "cfg_interval"))
def sample(params, cond_ids, uncond_ids, latents, key, guidance_scale,
           *, cfg: PipelineConfig, num_inference_steps: int = 50,
           compute_dtype=jnp.bfloat16, decode: bool = True,
           cache_interval: int = 0, cache_tail: int = 0,
           attn_impl: str = "inference", chunked_decode=None,
           init_image=None, init_latents=None,
           t_start: int = 0, t_end: Optional[int] = None,
           mask=None,
           pack_heads: Optional[bool] = None,
           guidance_rescale: float = 0.0, clip_skip: int = 0,
           use_karras_sigmas: bool = False, freeu=None,
           cfg_interval=None,
           masked_image=None,
           control_image=None, controlnet_scale=1.0,
           cond_weights=None, uncond_weights=None,
           cond_ids2=None, uncond_ids2=None, time_ids=None,
           cond_weights2=None, uncond_weights2=None,
           aesthetic_score=6.0, negative_aesthetic_score=2.5):
    """Run the full CFG sampling graph.

    params: {"text_encoder", "unet", "vae"} param trees (fp32 masters; cast here)
    cond_ids/uncond_ids: (B, ctx) int32 token ids
    latents: (B, h/8, w/8, 4) initial noise (inject for fixed-seed parity)
    key: PRNG key (used by the ddpm/euler_a stochastic samplers only)
    cache_interval: >1 enables DeepCache-style fast sampling on the DDIM
      path — the UNet's deep trunk is recomputed every cache_interval steps
      and reused in between (approximate; 0/1 = exact reference sampling)
    attn_impl: attention dispatch inside the UNet ("inference" = fixed-cap
      Pallas kernel on TPU; "xla" = partitionable einsum path — required
      when the params are model-axis (TP) sharded, since the SPMD
      partitioner cannot split a pallas_call)

    img2img / inpainting (the diffusers-0.7.2 Img2Img / Inpaint pipeline
    surface of the reference's engine — the reference itself only drives
    text-to-image, inference.py:342-351):
      init_image: (B, H, W, 3) float in [0, 1].  When given, ``latents``
        is interpreted as the NOISE added to the VAE-encoded init image at
        timestep ts[t_start] (the diffusers img2img protocol) instead of
        the starting latent itself.
      init_latents: (B, h/8, w/8, C) float MODEL-SPACE latents (already
        scaled by vae.scaling_factor, e.g. a ``decode=False`` result) —
        latent-space img2img: identical re-noising protocol to
        ``init_image`` but without the VAE encode, so a resized first-pass
        latent feeds a hires-fix second stage directly.  Mutually
        exclusive with ``init_image``.
      t_start: static loop start index into the timestep grid; use
        ``img2img_t_start`` for the strength → t_start map.
      mask: (B, h/8, w/8, 1) float in [0, 1]; 1 = regenerate (white in the
        diffusers mask convention), 0 = keep the init image.  After each
        scheduler step the kept region is replaced by the init latents
        noised to the CURRENT noise level (clean at the final step) —
        the corrected blend semantics (diffusers 0.7.2 blended at the
        pre-step level, acknowledged upstream and fixed in later releases;
        same deliberate-fix policy as the strided DDPM posterior).
      Supported for ddim/dpm/ddpm; PNDM's multistep warmup does not
      truncate cleanly (diffusers' own PLMS img2img re-runs the warmup at
      t_start, changing the method's order) — rejected loudly.
    masked_image: (B, H, W, 3) float in [0, 1] — the DEDICATED inpainting
      UNet protocol (the runwayml/sd-inpainting checkpoint layout,
      cfg.is_inpaint_unet: conv_in takes 2·C+1 channels).  The binarized
      mask and the VAE-encoded masked image are concatenated to the latent
      as extra input channels on EVERY UNet call; sampling is a full
      denoise from pure noise (``latents``), with no per-step blend and no
      re-noising — pass ``mask`` but NOT ``init_image``.  SDPipeline
      routes mask_image here automatically when the config is an
      inpainting UNet.
    freeu: optional STATIC (b1, b2, s1, s2) floats — FreeU
      (arXiv:2309.11497) decoder feature rebalancing at sampling time
      (backbone half-channel gain b, skip low-frequency scale s at the two
      deepest up blocks; models/unet.py FREEU_SD15/SD21/SDXL presets).
      None (the default) leaves the compiled graph byte-identical.
    cfg_interval: optional STATIC (lo, hi) step-fraction pair — classifier-
      free guidance is applied only on steps lo·N <= i < hi·N (Kynkäänniemi
      et al. 2024, arXiv:2404.07724: guidance at the highest and lowest
      noise levels hurts quality and wastes compute).  Outside the interval
      ONE cond-only UNet eval runs (batch B instead of 2B), so e.g.
      (0.1, 0.6) cuts UNet cost by ~25% at matched-or-better quality.
      None (the default) keeps the compiled graph byte-identical.
    use_karras_sigmas: replace the leading integer timestep grid with the
      Karras et al. 2022 ρ=7 sigma ramp between the same σ endpoints
      (markedly better low-step quality); euler_a / lms / dpm / dpm_sde /
      heun only.  The
      UNet is conditioned on each σ's continuous interpolated timestep.
    control_image: (B, H, W, 3) float conditioning image in [0, 1] (edges,
      depth, ...) routed through params["controlnet"] (models/controlnet.py);
      per-skip residuals are injected into the UNet every step.  The
      conditioning embedder output is hoisted out of the denoise loop (it
      depends only on the image).  ``controlnet_scale`` multiplies the
      residuals (traced: changing it does not recompile).
    cond_weights / uncond_weights: (B, ctx) float per-token emphasis weights
      (data/prompt_weights.py, the community ``(word:1.3)`` syntax) applied
      to the encoded hidden states with mean restoration; None = off (the
      default graph is unchanged).  With chunked long prompts the ids/
      weights widths are k*ctx and both CFG branches must agree on k.
    cond_ids2 / uncond_ids2 / time_ids (SDXL — cfg.clip2 set): token ids
      from the second (OpenCLIP) tokenizer and the (B, 6) micro-conditioning
      (orig_h, orig_w, crop_top, crop_left, target_h, target_w); time_ids
      defaults to ((H, W, 0, 0, H, W)) of the requested resolution.
    Returns (B, H, W, 3) float images in [0, 1] (or raw latents if decode=False).
    """
    if cache_interval and cache_interval > 1 and cfg.scheduler not in (
            "ddim", "dpm"):
        raise ValueError("cache_interval (DeepCache fast mode) is implemented "
                         "for the ddim and dpm schedulers only")
    if (init_image is not None or init_latents is not None or t_start
            or (mask is not None and masked_image is None)) \
            and cfg.scheduler in ("pndm", "lms"):
        raise ValueError("img2img/inpaint (init_image/t_start/mask) is "
                         "implemented for the ddim, dpm and ddpm schedulers "
                         "only — the PNDM/LMS multistep warmup does not "
                         "truncate cleanly at t_start")
    if init_latents is not None and init_image is not None:
        raise ValueError("init_latents (latent-space img2img, e.g. the "
                         "hires-fix second stage) and init_image (pixel-"
                         "space img2img) are mutually exclusive")
    if init_latents is not None and masked_image is not None:
        raise ValueError("init_latents cannot combine with masked_image "
                         "(the dedicated inpainting UNet is a full denoise "
                         "from pure noise)")
    if masked_image is not None:
        # dedicated inpainting UNet (runwayml/sd-inpainting layout): the
        # mask + masked-image latents ride as EXTRA INPUT CHANNELS every
        # step — a full denoise from noise, no per-step latent blend
        if not cfg.is_inpaint_unet:
            raise ValueError(
                f"masked_image is the channel-concat inpainting protocol — "
                f"it needs an inpainting UNet (in_channels == "
                f"{2 * cfg.latent_channels + 1}, got {cfg.unet.in_channels})")
        if mask is None:
            raise ValueError("masked_image requires mask")
        if init_image is not None or t_start:
            raise ValueError("masked_image starts from pure noise — "
                             "init_image/t_start (the re-noising protocol) "
                             "cannot combine with it")
        if cache_interval and cache_interval > 1:
            raise ValueError("masked_image cannot combine with "
                             "cache_interval — the cached trunk is shaped "
                             "for the plain latent input")
    elif cfg.is_inpaint_unet:
        raise ValueError("this config is a dedicated inpainting UNet "
                         f"(in_channels={cfg.unet.in_channels}): every call "
                         "must pass init_image + mask_image (plain "
                         "text-to-image is undefined for its conv_in)")
    if cfg.schedule.timestep_spacing == "trailing" \
            and cfg.scheduler == "pndm":
        raise ValueError("timestep_spacing='trailing' is not implemented "
                         "for pndm (its Heun-style warmup re-runs the "
                         "second grid point, which the trailing grid "
                         "formula does not define) — use ddim/dpm/unipc/"
                         "euler_a/lms")
    if cfg.schedule.rescale_zero_snr \
            and cfg.scheduler not in ("ddim", "unipc"):
        raise ValueError(
            "rescale_zero_snr schedules sample from EXACTLY zero SNR, "
            "where the eps-parameterised steps divide by alpha=0 and the "
            "sigma-space samplers' terminal sigma is infinite — use the "
            "ddim or unipc schedulers (both step in x0 form; "
            "arXiv:2305.08891 uses DDIM)")
    if mask is not None and masked_image is None \
            and cfg.scheduler == "unipc":
        raise ValueError("inpainting (mask) is not implemented for unipc — "
                         "the per-step latent blend invalidates the "
                         "corrector's last_sample (it would overwrite the "
                         "kept region); use ddim/dpm/ddpm for inpainting "
                         "(the channel-concat inpaint UNets are exempt)")
    if mask is not None and init_image is None and init_latents is None \
            and masked_image is None:
        raise ValueError("mask (inpainting) requires init_image")
    if use_karras_sigmas and cfg.scheduler not in ("euler_a", "lms", "dpm",
                                                   "dpm_sde", "heun"):
        raise ValueError("use_karras_sigmas applies to the sigma-space "
                         "samplers (euler_a, lms, dpm, dpm_sde, heun) "
                         "only — ddim/pndm/ddpm are defined on the "
                         "integer training grid")
    cfg_lo = cfg_hi = None
    if cfg_interval is not None:
        lo, hi = cfg_interval
        if not 0.0 <= lo <= hi <= 1.0:
            raise ValueError(f"cfg_interval must be 0 <= lo <= hi <= 1, "
                             f"got {cfg_interval}")
        if cache_interval and cache_interval > 1:
            raise ValueError("cfg_interval cannot combine with "
                             "cache_interval — the DeepCache trunk cache is "
                             "shaped for the 2B CFG batch and would go stale "
                             "across the interval boundary")
        if control_image is not None:
            raise ValueError("cfg_interval cannot combine with "
                             "control_image — the hoisted ControlNet "
                             "conditioning embeddings are built for the 2B "
                             "CFG batch")
        if cfg.scheduler == "pndm":
            raise ValueError("cfg_interval is not implemented for pndm — "
                             "its warmup grid is longer than "
                             "num_inference_steps, so the step-fraction "
                             "bounds would not line up")
        cfg_lo = int(round(lo * num_inference_steps))
        cfg_hi = int(round(hi * num_inference_steps))
    if not 0 <= t_start <= num_inference_steps:
        raise ValueError(f"t_start={t_start} outside [0, {num_inference_steps}]")
    if t_end is not None:
        # ensemble-of-expert-denoisers handoff (SDXL base → refiner): the
        # base stage stops at step t_end and hands its RAW latents (decode=
        # False) to the tail model, which resumes at t_start=t_end on the
        # SAME grid (pass latents directly, no init_image — the loop then
        # starts from them without re-noising)
        if cfg.scheduler in ("pndm", "lms", "unipc"):
            raise ValueError("t_end (denoising_end) is implemented for the "
                             "single-step schedulers (ddim/dpm/ddpm/"
                             "euler_a) only — the PNDM/LMS/UniPC multistep "
                             "state does not hand off cleanly")
        if not t_start <= t_end <= num_inference_steps:
            raise ValueError(f"t_end={t_end} outside "
                             f"[{t_start}, {num_inference_steps}]")
        if mask is not None:
            raise ValueError("t_end cannot combine with mask (inpainting "
                             "blends against the final noise level — a "
                             "truncated run would hand off a half-blended "
                             "composite)")
    t_stop = num_inference_steps if t_end is None else t_end
    if control_image is not None:
        if "controlnet" not in params or cfg.controlnet is None:
            raise ValueError("control_image needs params['controlnet'] and "
                             "cfg.controlnet (PipelineConfig.with_controlnet)")
        if cache_interval and cache_interval > 1:
            raise ValueError("control_image cannot combine with "
                             "cache_interval — the ControlNet residuals land "
                             "inside the cached trunk (a reused trunk would "
                             "silently freeze the conditioning)")
    sched = sched_mod.make_schedule(cfg.schedule)
    dt = compute_dtype

    if cond_ids.shape[1] != uncond_ids.shape[1]:
        raise ValueError(
            f"cond/uncond token widths differ ({cond_ids.shape[1]} vs "
            f"{uncond_ids.shape[1]}) — chunked long prompts must pad both "
            "CFG branches to the same window count "
            "(data/prompt_weights.batch_encode_weighted min_chunks)")
    added2 = None
    if cfg.is_sdxl:
        if cond_ids2 is None or uncond_ids2 is None:
            raise ValueError("SDXL configs (cfg.clip2 set) need cond_ids2/"
                             "uncond_ids2 from the second tokenizer")
        ctx_c, pool_c = encode_text_xl(params, cond_ids, cond_ids2, cfg, dt,
                                       clip_skip=clip_skip,
                                       weights=cond_weights,
                                       weights2=cond_weights2)
        ctx_u, pool_u = encode_text_xl(params, uncond_ids, uncond_ids2, cfg,
                                       dt, clip_skip=clip_skip,
                                       weights=uncond_weights,
                                       weights2=uncond_weights2)
        if cfg.refiner:
            # refiner micro-conditioning: 5 ids, the last an AESTHETIC
            # SCORE that differs between the CFG branches (diffusers
            # requires_aesthetics_score: cond 6.0, uncond 2.5 defaults)
            if time_ids is not None:
                raise ValueError("refiner configs derive their own "
                                 "(orig, crop, aesthetic) time ids — use "
                                 "aesthetic_score/negative_aesthetic_score "
                                 "instead of time_ids")
            hh = latents.shape[1] * cfg.vae_scale
            ww = latents.shape[2] * cfg.vae_scale
            base4 = jnp.tile(jnp.asarray([[hh, ww, 0, 0]], jnp.float32),
                             (latents.shape[0], 1))
            score = lambda s: jnp.full((latents.shape[0], 1),
                                       jnp.asarray(s, jnp.float32))
            tid_u = jnp.concatenate(
                [base4, score(negative_aesthetic_score)], axis=-1)
            tid_c = jnp.concatenate([base4, score(aesthetic_score)],
                                    axis=-1)
            time_ids2 = jnp.concatenate([tid_u, tid_c], axis=0)
        else:
            if time_ids is None:
                hh = latents.shape[1] * cfg.vae_scale
                ww = latents.shape[2] * cfg.vae_scale
                time_ids = jnp.tile(
                    jnp.asarray([[hh, ww, 0, 0, hh, ww]], jnp.float32),
                    (latents.shape[0], 1))
            time_ids2 = jnp.concatenate([time_ids, time_ids], axis=0)
        # uncond ⧺ cond row order matches the context concat below
        added2 = _xl_added_cond(
            jnp.concatenate([pool_u, pool_c], axis=0), time_ids2,
            cfg.unet.addition_time_embed_dim)
    else:
        ctx_c = encode_text(params, cond_ids, cfg, dt, clip_skip=clip_skip)
        ctx_u = encode_text(params, uncond_ids, cfg, dt, clip_skip=clip_skip)
        # prompt-emphasis weights (data/prompt_weights.py): token-wise scale
        # with mean restoration; None (the default) leaves the graph
        # untouched
        if cond_weights is not None:
            ctx_c = _apply_token_weights(ctx_c, cond_weights)
        if uncond_weights is not None:
            ctx_u = _apply_token_weights(ctx_u, uncond_weights)
    context = jnp.concatenate([ctx_u, ctx_c], axis=0)  # (2B, ctx, hid)
    uparams = params["unet"]
    if pack_heads is None:
        # default OFF: the isolated 64²-level MHA layer measures 1.50× with
        # d=40→64 packing, but the FULL graph measures 1.336 vs 1.376 img/s
        # (back-to-back, batch 4 ddim-50) — the 1.6× projection FLOPs at the
        # 320-ch level cost more than the kernel+relayout savings once XLA
        # has fused the projections with their neighbors (PERF_NOTES.md,
        # round 3).  SDBC_PACK_HEADS=1 re-enables for re-measurement on
        # other TPU generations.
        import os as _os
        pack_heads = (attn_impl == "inference"
                      and _os.environ.get("SDBC_PACK_HEADS", "0") == "1"
                      and _os.environ.get("SDBC_MHA", "legacy") == "legacy")
    if pack_heads:
        uparams = unet_mod.pack_attention_heads(uparams, cfg.unet)
    lat = latents.astype(dt)
    gs = jnp.asarray(guidance_scale, jnp.float32)

    orig_lat = noise0 = None
    if init_image is not None:
        k_enc, key = jax.random.split(key)
        mean, logvar = vae_mod.encode_moments(
            params["vae"], init_image.astype(dt) * 2.0 - 1.0, cfg.vae)
        orig_lat = (vae_mod.sample(mean, logvar, k_enc).astype(jnp.float32)
                    * cfg.vae.scaling_factor)
        noise0 = latents.astype(jnp.float32)
    elif init_latents is not None:
        # latent-space img2img (the hires-fix second stage): the caller
        # already holds model-space latents (e.g. a decode=False first pass
        # resized with jax.image.resize) — same re-noising protocol as
        # init_image, minus the VAE posterior sample
        orig_lat = init_latents.astype(jnp.float32)
        noise0 = latents.astype(jnp.float32)

    def noise_to(ts_first):
        """Start latent: init latents noised to the grid's first timestep."""
        return sched_mod.ddpm_add_noise(
            sched, orig_lat, noise0, jnp.full((orig_lat.shape[0],), ts_first,
                                              jnp.int32)).astype(dt)

    def noise_to_sigma(s):
        """Start latent noised to a continuous σ level (ā = 1/(1+σ²));
        exactly ddpm_add_noise evaluated off-grid (karras img2img)."""
        a = 1.0 / (1.0 + jnp.asarray(s, jnp.float32) ** 2)
        return (jnp.sqrt(a) * orig_lat
                + jnp.sqrt(1.0 - a) * noise0).astype(dt)

    inpaint_extra = None
    if masked_image is not None:
        # runwayml-style inpainting UNet conditioning, computed ONCE: the
        # binarized latent-res mask and the VAE-encoded masked image ride
        # as 5 extra input channels on every UNet call (uncond and cond
        # branches alike); the diffusers input order is
        # cat([latents, mask, masked_image_latents])
        k_msk, key = jax.random.split(key)
        mm, mlv = vae_mod.encode_moments(
            params["vae"], masked_image.astype(dt) * 2.0 - 1.0, cfg.vae)
        mlat = (vae_mod.sample(mm, mlv, k_msk).astype(jnp.float32)
                * cfg.vae.scaling_factor)
        inpaint_extra = jnp.concatenate(
            [mask.astype(jnp.float32), mlat], axis=-1).astype(dt)

    if mask is not None and masked_image is None:
        keep = (1.0 - mask.astype(jnp.float32))

        def blend_sigma(lat_next, s_next):
            """Inpaint blend at a continuous σ level (σ=0 ⇒ ā=1 ⇒ the
            clean original, so the terminal step needs no special case)."""
            a = 1.0 / (1.0 + jnp.asarray(s_next, jnp.float32) ** 2)
            noised = (jnp.sqrt(a) * orig_lat
                      + jnp.sqrt(1.0 - a) * noise0)
            out = (noised * keep
                   + lat_next.astype(jnp.float32) * (1.0 - keep))
            return out.astype(lat_next.dtype)

        def blend(lat_next, t_next):
            """Replace the kept region by the init latents at t_next's
            noise level (clean original once t_next < 0, the final step)."""
            tb = jnp.full((orig_lat.shape[0],), jnp.maximum(t_next, 0),
                          jnp.int32)
            noised = jnp.where(
                t_next >= 0,
                sched_mod.ddpm_add_noise(sched, orig_lat, noise0, tb),
                orig_lat)
            out = (noised * keep
                   + lat_next.astype(jnp.float32) * (1.0 - keep))
            return out.astype(lat_next.dtype)
    else:
        blend = blend_sigma = None

    def cfg_combine(out_u, out_c):
        out = out_u + gs * (out_c - out_u)
        if guidance_rescale > 0.0:
            # CFG rescale (Lin et al. 2023, arXiv:2305.08891 eq. 16): CFG
            # inflates the prediction's std, washing out detail at high
            # scales; renormalize toward the conditional branch's std and
            # lerp by the rescale factor.  Static flag: the default-0
            # sampling graph is byte-identical to before.
            axes = tuple(range(1, out.ndim))
            std_c = jnp.std(out_c, axis=axes, keepdims=True)
            std_g = jnp.maximum(jnp.std(out, axis=axes, keepdims=True), 1e-8)
            out = (guidance_rescale * (out * std_c / std_g)
                   + (1.0 - guidance_rescale) * out)
        return out

    if control_image is not None:
        # hoisted: the conditioning embedding depends only on the control
        # image, never on the latent or step — one strided conv stack per
        # call instead of one per step (the diffusers ControlNetModel
        # recomputes it every step).  Multi-ControlNet (the diffusers
        # MultiControlNetModel surface): params["controlnet"], the control
        # images and the scales may all be LISTS — every branch shares the
        # base UNet's encoder layout (cfg.controlnet), the injected
        # residuals sum.
        _cns = params["controlnet"]
        if not isinstance(_cns, (list, tuple)):
            _cns = [_cns]
        _cimgs = (list(control_image)
                  if isinstance(control_image, (list, tuple))
                  else [control_image])
        if len(_cimgs) != len(_cns):
            raise ValueError(
                f"{len(_cimgs)} control images for {len(_cns)} ControlNet "
                "branches — pass exactly one image per branch")
        _cscales = (list(controlnet_scale)
                    if isinstance(controlnet_scale, (list, tuple))
                    else [controlnet_scale] * len(_cns))
        if len(_cscales) != len(_cns):
            raise ValueError(
                f"{len(_cscales)} controlnet scales for {len(_cns)} "
                "branches — pass one scale, or one per branch")
        _cond_embs = [
            controlnet_mod.embed_cond(
                cn, jnp.concatenate([img, img], axis=0).astype(dt),
                cfg.controlnet)
            for cn, img in zip(_cns, _cimgs)]
        _cscales = [jnp.asarray(s, jnp.float32) for s in _cscales]

    def _hoist_tproj(ts_grid):
        """Per-step time-projection tables for the whole sampling grid —
        the UNet's (always) plus the ControlNet encoder-half's (when a
        control image is attached), bundled under a reserved "ctrl" key
        that model_out_fn strips back out.  index_temb slices both trees
        uniformly (every leaf is a (T, ...) table)."""
        tp = unet_mod.precompute_temb(uparams, ts_grid, cfg.unet, dtype=dt,
                                      added_cond=added2)
        if control_image is not None:
            tp = dict(tp)
            tp["ctrl"] = [controlnet_mod.precompute_temb(
                cn, ts_grid, cfg.controlnet, dtype=dt, added_cond=added2)
                for cn in _cns]
        return tp

    def _control_residuals(lat2, t, ctp=None):
        if control_image is None:
            return None
        # float timesteps: the karras grids condition on continuous t (the
        # ControlNet runs its own time MLP — the sinusoidal embedding
        # accepts floats).  ``ctp``: this step's slice of the hoisted
        # ControlNet time-projection tables (None → recompute in-graph,
        # with the SDXL addition embedding when the family carries one).
        ctb = jnp.full((lat2.shape[0],), t, jnp.float32)
        ctps = ctp if ctp is not None else [None] * len(_cns)
        total = None
        for cn, ce, sc, cp in zip(_cns, _cond_embs, _cscales, ctps):
            r = controlnet_mod.apply(
                cn, lat2, ctb, context, ce, cfg.controlnet,
                conditioning_scale=sc, attn_impl=attn_impl, temb_proj=cp,
                added_cond=None if cp is not None else added2)
            total = r if total is None else jax.tree.map(
                lambda a, b: a + b, total, r)
        return total

    def model_out_fn(lat, t, tp=None, i=None):
        def guided():
            lat2 = jnp.concatenate([lat, lat], axis=0)
            tb = jnp.full((lat2.shape[0],), t, jnp.int32)
            if inpaint_extra is not None:
                lat2 = jnp.concatenate(
                    [lat2, jnp.concatenate([inpaint_extra, inpaint_extra],
                                           axis=0)], axis=-1)
            tpg, ctp = tp, None
            if tpg is not None and "ctrl" in tpg:
                ctp = tpg["ctrl"]
                tpg = {k: v for k, v in tpg.items() if k != "ctrl"}
            out = unet_mod.apply(uparams, lat2, tb, context, cfg.unet,
                                 attn_impl=attn_impl, temb_proj=tpg,
                                 freeu=freeu,
                                 control_residuals=_control_residuals(
                                     lat2, t, ctp))
            out_u, out_c = jnp.split(out.astype(jnp.float32), 2, axis=0)
            return cfg_combine(out_u, out_c)

        if cfg_lo is None or i is None:
            return guided()

        def cond_only():
            # guidance disabled on this step: ONE UNet eval on the cond
            # branch alone (= guidance_scale 1 exactly, since
            # u + 1·(c − u) = c); the SDXL temb tables are (2B, ...) per
            # step — slice the cond half
            tb = jnp.full((lat.shape[0],), t, jnp.int32)
            tpc = tp
            if added2 is not None and tpc is not None:
                tpc = jax.tree_util.tree_map(
                    lambda a: a[a.shape[0] // 2:], tpc)
            lat1 = lat if inpaint_extra is None \
                else jnp.concatenate([lat, inpaint_extra], axis=-1)
            out = unet_mod.apply(uparams, lat1, tb, ctx_c, cfg.unet,
                                 attn_impl=attn_impl, temb_proj=tpc,
                                 freeu=freeu)
            return out.astype(jnp.float32)

        # static bounds, traced loop index: XLA compiles both branches,
        # the TPU executes exactly one per step
        pred = jnp.logical_and(i >= cfg_lo, i < cfg_hi)
        return jax.lax.cond(pred, guided, cond_only)

    def make_cached_unet(tproj):
        """DeepCache machinery shared by the ddim and dpm fast paths.

        Returns (cache0, model_out_cached) where model_out_cached(lat, t,
        i, cache) -> (guided model output, new cache): the UNet's deep
        trunk is recomputed every ``cache_interval`` steps and reused in
        between (opt-in approximate sampling; DeepCache, arXiv:2312.00858).
        """
        b2 = 2 * lat.shape[0]
        total_tail = cfg.unet.layers_per_block + 1
        aggressive = 0 < cache_tail < total_tail
        deep_ch = cfg.unet.block_out_channels[0] if aggressive \
            else cfg.unet.block_out_channels[1]
        cache0 = jnp.zeros((b2,) + lat.shape[1:3] + (deep_ch,), dt)

        def model_out_cached(lat, t, i, cache):
            lat2 = jnp.concatenate([lat, lat], axis=0)
            tb = jnp.full((b2,), t, jnp.int32)
            tp = unet_mod.index_temb(tproj, i)
            # cache phase is relative to the loop START: an img2img run
            # (t_start > 0) must recompute the trunk on its first executed
            # step, not whenever i happens to hit a multiple of the
            # interval (the guard keeps the t_start=0 trace byte-stable)
            ii = i - t_start if t_start else i

            def full(cache):
                return unet_mod.apply(uparams, lat2, tb, context,
                                      cfg.unet, return_deep=True,
                                      cache_tail=cache_tail,
                                      attn_impl=attn_impl,
                                      temb_proj=tp, freeu=freeu)

            def reuse(cache):
                out = unet_mod.apply(uparams, lat2, tb, context,
                                     cfg.unet, cached_deep=cache,
                                     cache_tail=cache_tail,
                                     attn_impl=attn_impl,
                                     temb_proj=tp)
                return out, cache

            out, cache = jax.lax.cond(ii % cache_interval == 0, full,
                                      reuse, cache)
            out_u, out_c = jnp.split(out.astype(jnp.float32), 2, axis=0)
            return cfg_combine(out_u, out_c), cache

        return cache0, model_out_cached

    def _model_at(ts_grid, tproj, cached=False):
        """(model_at, cache0) pair for _scheduler_loop over a grid.

        ``cached=True`` wires the DeepCache trunk (make_cached_unet) in;
        the uncached closure threads the loop's empty cache slot through
        untouched.  ``t`` is gathered once here and handed to the update
        so the traced gather count matches the old hand-written bodies.
        """
        if cached:
            cache0, model_out_cached = make_cached_unet(tproj)

            def model_at(i, lat, cache):
                t = ts_grid[i]
                out, cache = model_out_cached(lat, t, i, cache)
                return t, out, cache

            return model_at, cache0

        def model_at(i, lat, cache):
            t = ts_grid[i]
            return (t,
                    model_out_fn(lat, t, unet_mod.index_temb(tproj, i), i),
                    cache)

        return model_at, None

    def _to_eps(out, t, lat):
        """eps-parameterised model output (the old eps_fn epilogue): the
        dpm/pndm/ddpm/euler steps consume eps; v-prediction checkpoints
        convert here (CFG and the v→eps map are both linear in the model
        output, so guiding first then converting is exact)."""
        if cfg.schedule.prediction_type != "epsilon":
            out, _ = sched_mod.to_eps_x0(sched, out, t, lat,
                                         cfg.schedule.prediction_type)
        return out

    if cfg.scheduler == "ddim":
        ts = sched_mod.ddim_timesteps(cfg.schedule, num_inference_steps)
        ratio = sched_mod.inference_stride(cfg.schedule, num_inference_steps)
        if orig_lat is not None:
            lat = noise_to(ts[t_start]) if t_start < num_inference_steps \
                else orig_lat.astype(dt)
        # hoist the per-ResBlock time projections out of the loop (~3.5 ms/
        # step of latency-bound (8,1280)-sized matmuls at SD-1.5 shapes)
        tproj = _hoist_tproj(ts)
        model_at, cache0 = _model_at(ts, tproj,
                                     bool(cache_interval
                                          and cache_interval > 1))

        def update(i, t, out, lat, state, sub):
            nlat = sched_mod.ddim_step(
                sched, out, t, t - ratio, lat,
                prediction_type=cfg.schedule.prediction_type)
            if blend is not None:
                nlat = blend(nlat, t - ratio)
            return state, nlat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              cache0=cache0)

    elif cfg.scheduler == "dpm" and use_karras_sigmas:
        # DPM-Solver++(2M) on the Karras σ grid (λ = −log σ carries the
        # lambda-space update over verbatim); composes with DeepCache the
        # same way as the integer-grid path.
        sigmas_np, ts_np = sched_mod.karras_grid(cfg.schedule,
                                                 num_inference_steps)
        sigmas, ts_f = jnp.asarray(sigmas_np), jnp.asarray(ts_np)
        if orig_lat is not None:
            lat = noise_to_sigma(sigmas[t_start]) \
                if t_start < num_inference_steps else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts_f)
        lower_order_final = num_inference_steps < 15
        state0 = sched_mod.dpm_init_state(lat.shape)
        model_at, cache0 = _model_at(ts_f, tproj,
                                     bool(cache_interval
                                          and cache_interval > 1))

        def update(i, t, out, lat, state, sub):
            eps, _ = sched_mod.sigma_to_eps_x0(
                out, sigmas[i], lat, cfg.schedule.prediction_type)
            first = jnp.logical_and(lower_order_final,
                                    i == num_inference_steps - 1)
            state, lat = sched_mod.dpm_step_sigma(
                state, eps, sigmas[i], sigmas[i + 1], lat,
                first_order=first)
            if blend_sigma is not None:
                lat = blend_sigma(lat, sigmas[i + 1])
            return state, lat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              state0=state0, cache0=cache0)

    elif cfg.scheduler == "dpm":
        # DPM-Solver++(2M): DDIM-level quality at ~20-25 steps (bonus
        # scheduler beyond the reference's three)
        ts = sched_mod.dpm_timesteps(cfg.schedule, num_inference_steps)
        ratio = sched_mod.inference_stride(cfg.schedule, num_inference_steps)
        if orig_lat is not None:
            lat = noise_to(ts[t_start]) if t_start < num_inference_steps \
                else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts)
        # lower-order-final safeguard (diffusers semantics): at small step
        # counts the last step drops to first order for stability
        lower_order_final = num_inference_steps < 15

        state0 = sched_mod.dpm_init_state(lat.shape)
        # DeepCache over DPM-Solver++: the two fast paths compose — the
        # solver consumes whatever eps the (cached) UNet produces
        model_at, cache0 = _model_at(ts, tproj,
                                     bool(cache_interval
                                          and cache_interval > 1))

        def update(i, t, out, lat, state, sub):
            eps = _to_eps(out, t, lat)
            first = jnp.logical_and(lower_order_final,
                                    i == num_inference_steps - 1)
            state, lat = sched_mod.dpm_step(sched, cfg.schedule, state,
                                            eps, t, t - ratio, lat,
                                            first_order=first)
            if blend is not None:
                lat = blend(lat, t - ratio)
            return state, lat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              state0=state0, cache0=cache0)

    elif cfg.scheduler == "dpm_sde" and use_karras_sigmas:
        # SDE-DPM-Solver++(2M) on the Karras σ grid.
        sigmas_np, ts_np = sched_mod.karras_grid(cfg.schedule,
                                                 num_inference_steps)
        sigmas, ts_f = jnp.asarray(sigmas_np), jnp.asarray(ts_np)
        if orig_lat is not None:
            lat = noise_to_sigma(sigmas[t_start]) \
                if t_start < num_inference_steps else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts_f)
        lower_order_final = num_inference_steps < 15
        state0 = sched_mod.dpm_init_state(lat.shape)
        model_at, _ = _model_at(ts_f, tproj)

        def update(i, t, out, lat, state, sub):
            eps, _ = sched_mod.sigma_to_eps_x0(
                out, sigmas[i], lat, cfg.schedule.prediction_type)
            first = jnp.logical_and(lower_order_final,
                                    i == num_inference_steps - 1)
            z = jax.random.normal(sub, lat.shape, jnp.float32)
            state, lat = sched_mod.dpm_sde_step_sigma(
                state, eps, sigmas[i], sigmas[i + 1], lat, z,
                first_order=first)
            if blend_sigma is not None:
                lat = blend_sigma(lat, sigmas[i + 1])
            return state, lat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              state0=state0, key=key)

    elif cfg.scheduler == "dpm_sde":
        # SDE-DPM-Solver++(2M), midpoint solver type (the stochastic
        # counterpart of dpm): fresh noise every step, the sample's own
        # term contracts by e^{-h}; forward marginals are preserved
        # exactly on exact data (bonus scheduler beyond the reference).
        ts = sched_mod.dpm_timesteps(cfg.schedule, num_inference_steps)
        ratio = sched_mod.inference_stride(cfg.schedule, num_inference_steps)
        if orig_lat is not None:
            lat = noise_to(ts[t_start]) if t_start < num_inference_steps \
                else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts)
        lower_order_final = num_inference_steps < 15
        state0 = sched_mod.dpm_init_state(lat.shape)
        model_at, _ = _model_at(ts, tproj)

        def update(i, t, out, lat, state, sub):
            eps = _to_eps(out, t, lat)
            first = jnp.logical_and(lower_order_final,
                                    i == num_inference_steps - 1)
            z = jax.random.normal(sub, lat.shape, jnp.float32)
            state, lat = sched_mod.dpm_sde_step(sched, cfg.schedule, state,
                                                eps, t, t - ratio, lat, z,
                                                first_order=first)
            if blend is not None:
                lat = blend(lat, t - ratio)
            return state, lat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              state0=state0, key=key)

    elif cfg.scheduler == "unipc":
        # UniPC (Zhao et al. 2023, arXiv:2302.04867; bh2 data-prediction,
        # solver order 2): predictor-corrector sharing ONE model evaluation
        # per step — the corrector refines the current sample with the
        # output just computed at it, then the predictor advances.
        # DPM-2M-class cost with better few-step quality (bonus scheduler
        # beyond the reference's three).
        ts = sched_mod.unipc_timesteps(cfg.schedule, num_inference_steps)
        ratio = sched_mod.inference_stride(cfg.schedule, num_inference_steps)
        if orig_lat is not None:
            lat = noise_to(ts[t_start]) if t_start < num_inference_steps \
                else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts)
        state0 = sched_mod.unipc_init_state(lat.shape)
        model_at, _ = _model_at(ts, tproj)

        def update(i, t, out, lat, state, sub):
            _, x0 = sched_mod.to_eps_x0(sched, out, t, lat,
                                        cfg.schedule.prediction_type)
            state, lat = sched_mod.unipc_step(
                sched, state, x0, t, t - ratio, lat,
                last_step=i == t_stop - 1)
            return state, lat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              state0=state0)

    elif cfg.scheduler == "lcm":
        # LCM (Luo et al. 2023, arXiv:2310.04378): consistency-distilled
        # few-step sampling — each step maps the current sample straight to
        # the boundary-conditioned x0 estimate and re-noises it to the next
        # distillation grid point (fresh noise; the final step returns it
        # clean).  Meant for LCM-LoRA weights merged onto a STANDARD UNet
        # at 2-8 steps with low guidance; the math runs on any weights.
        # Fully-distilled LCM checkpoints (time_cond_proj_dim w-embedding
        # conditioning) are NOT supported — the loader rejects them
        # (models/port.py) — and guidance here is classifier-free, not the
        # distilled w-embedding.  Grid: diffusers LCMScheduler default
        # (50 teacher steps).
        ts = sched_mod.lcm_timesteps(cfg.schedule, num_inference_steps)
        ts_next = jnp.concatenate(
            [ts[1:], -jnp.ones((1,), ts.dtype)])
        if orig_lat is not None:
            lat = noise_to(ts[t_start]) if t_start < num_inference_steps \
                else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts)
        model_at, _ = _model_at(ts, tproj)

        def update(i, t, out, lat, state, sub):
            _, x0 = sched_mod.to_eps_x0(sched, out, t, lat,
                                        cfg.schedule.prediction_type)
            noise = jax.random.normal(sub, lat.shape, jnp.float32)
            nlat = sched_mod.lcm_step(
                sched, x0, t, ts_next[i], lat, noise,
                last_step=i == num_inference_steps - 1)
            if blend is not None:
                nlat = blend(nlat, ts_next[i])
            return state, nlat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              key=key)

    elif cfg.scheduler == "heun":
        # Heun 2nd order (k-diffusion sample_heun, arXiv:2206.00364
        # Alg. 1): Euler predictor + trapezoidal corrector — TWO model
        # evals per step (2N-1 total; the terminal step is plain Euler).
        # Runs on the leading integer grid's sigmas, or the Karras ramp
        # with use_karras_sigmas (its native habitat).  Bonus scheduler
        # beyond the reference's three.
        if use_karras_sigmas:
            sigmas_np, ts_np = sched_mod.karras_grid(cfg.schedule,
                                                     num_inference_steps)
        else:
            sigmas_np, ts_np = sched_mod.leading_sigma_grid(
                cfg.schedule, num_inference_steps)
        sigmas, ts_f = jnp.asarray(sigmas_np), jnp.asarray(ts_np)
        if orig_lat is not None:
            lat = noise_to_sigma(sigmas[t_start]) \
                if t_start < num_inference_steps else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts_f)
        model_at, _ = _model_at(ts_f, tproj)

        def _eps_at_sigma(out, i, x):
            e, _ = sched_mod.sigma_to_eps_x0(out, sigmas[i], x,
                                             cfg.schedule.prediction_type)
            return e

        def update(i, t, out, lat, state, sub):
            eps1 = _eps_at_sigma(out, i, lat)
            mid = sched_mod.euler_step_sigma(eps1, sigmas[i],
                                             sigmas[i + 1], lat)
            out2 = model_out_fn(mid, ts_f[i + 1],
                                unet_mod.index_temb(tproj, i + 1), i)
            eps2 = _eps_at_sigma(out2, i + 1, mid)
            nlat = sched_mod.heun_step_sigma(eps1, eps2, sigmas[i],
                                             sigmas[i + 1], lat)
            if blend_sigma is not None:
                nlat = blend_sigma(nlat, sigmas[i + 1])
            return state, nlat

        if t_stop > t_start:
            lat = _scheduler_loop(t_start, t_stop - 1, lat, model_at,
                                  update)
            iN = t_stop - 1
            outN = model_out_fn(lat, ts_f[iN],
                                unet_mod.index_temb(tproj, iN), iN)
            epsN = _eps_at_sigma(outN, iN, lat)
            if t_stop < num_inference_steps and float(sigmas_np[iN + 1]) > 0:
                # truncated grid (denoising_end / ensemble handoff):
                # σ_{iN+1} > 0 and a model eval exists there, so keep the
                # 2nd-order corrector — k-diffusion degrades to Euler only
                # when sigma_next == 0
                mid = sched_mod.euler_step_sigma(epsN, sigmas[iN],
                                                 sigmas[iN + 1], lat)
                out2 = model_out_fn(mid, ts_f[iN + 1],
                                    unet_mod.index_temb(tproj, iN + 1), iN)
                eps2 = _eps_at_sigma(out2, iN + 1, mid)
                lat = sched_mod.heun_step_sigma(epsN, eps2, sigmas[iN],
                                                sigmas[iN + 1], lat)
            else:
                # terminal step of a full run: plain Euler (no model eval
                # exists at the terminal sigma 0)
                lat = sched_mod.euler_step_sigma(epsN, sigmas[iN],
                                                 sigmas[iN + 1], lat)
            if blend_sigma is not None:
                lat = blend_sigma(lat, sigmas[iN + 1])

    elif cfg.scheduler == "euler_a" and use_karras_sigmas:
        # Euler ancestral on the Karras σ grid (arXiv:2206.00364 eq. 5):
        # the UNet sees the CONTINUOUS interpolated timestep of each σ via
        # the precomputed temb tables; all step math is σ-space.
        sigmas_np, ts_np = sched_mod.karras_grid(cfg.schedule,
                                                 num_inference_steps)
        sigmas, ts_f = jnp.asarray(sigmas_np), jnp.asarray(ts_np)
        if orig_lat is not None:
            lat = noise_to_sigma(sigmas[t_start]) \
                if t_start < num_inference_steps else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts_f)
        model_at, _ = _model_at(ts_f, tproj)

        def update(i, t, out, lat, state, sub):
            eps, _ = sched_mod.sigma_to_eps_x0(out, sigmas[i], lat,
                                               cfg.schedule.prediction_type)
            noise = jax.random.normal(sub, lat.shape, jnp.float32)
            nlat = sched_mod.euler_step_sigma(eps, sigmas[i], sigmas[i + 1],
                                              lat, noise=noise,
                                              ancestral=True)
            if blend_sigma is not None:
                nlat = blend_sigma(nlat, sigmas[i + 1])
            return state, nlat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              key=key)

    elif cfg.scheduler == "euler_a":
        # Euler ancestral (k-diffusion) — stochastic sampling with a noise
        # split distinct from DDPM's posterior (bonus scheduler; the plain
        # Euler step is exactly DDIM eta=0 on this grid, so it isn't a
        # separate mode)
        ts = sched_mod.ddim_timesteps(cfg.schedule, num_inference_steps)
        ratio = sched_mod.inference_stride(cfg.schedule, num_inference_steps)
        if orig_lat is not None:
            lat = noise_to(ts[t_start]) if t_start < num_inference_steps \
                else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts)
        model_at, _ = _model_at(ts, tproj)

        def update(i, t, out, lat, state, sub):
            eps = _to_eps(out, t, lat)
            noise = jax.random.normal(sub, lat.shape, jnp.float32)
            nlat = sched_mod.euler_step(sched, eps, t, t - ratio, lat,
                                        noise=noise, ancestral=True)
            if blend is not None:
                nlat = blend(nlat, t - ratio)
            return state, nlat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              key=key)

    elif cfg.scheduler == "lms" and use_karras_sigmas:
        # k-LMS on the Karras σ grid: the exact Lagrange coefficient
        # integration runs over the karras sigmas instead of the leading
        # grid's — everything else is the same multistep update.
        sigmas_np, ts_np = sched_mod.karras_grid(cfg.schedule,
                                                 num_inference_steps)
        sigmas, ts_f = jnp.asarray(sigmas_np), jnp.asarray(ts_np)
        coeffs = sched_mod.lms_coeff_table_sigmas(sigmas_np)
        tproj = _hoist_tproj(ts_f)
        model_at, _ = _model_at(ts_f, tproj)

        def update(i, t, out, lat, state, sub):
            eps, _ = sched_mod.sigma_to_eps_x0(out, sigmas[i], lat,
                                               cfg.schedule.prediction_type)
            state, lat = sched_mod.lms_step_sigma(state, eps, sigmas[i],
                                                  sigmas[i + 1], lat,
                                                  coeffs[i])
            return state, lat

        state0 = sched_mod.lms_init_state(lat.shape)
        lat = _scheduler_loop(0, num_inference_steps, lat, model_at, update,
                              state0=state0)

    elif cfg.scheduler == "lms":
        # k-LMS (diffusers-0.7.2 LMSDiscreteScheduler): deterministic
        # 4th-order multistep on the eps history; coefficient table is
        # computed exactly host-side (static grid) and indexed in-loop
        ts = sched_mod.lms_timesteps(cfg.schedule, num_inference_steps)
        ratio = sched_mod.inference_stride(cfg.schedule, num_inference_steps)
        coeffs = sched_mod.lms_coeff_table(cfg.schedule, num_inference_steps)
        tproj = _hoist_tproj(ts)
        model_at, _ = _model_at(ts, tproj)

        def update(i, t, out, lat, state, sub):
            eps = _to_eps(out, t, lat)
            state, lat = sched_mod.lms_step(sched, state, eps, t, t - ratio,
                                            lat, coeffs[i])
            return state, lat

        state0 = sched_mod.lms_init_state(lat.shape)
        lat = _scheduler_loop(0, num_inference_steps, lat, model_at, update,
                              state0=state0)

    elif cfg.scheduler == "pndm":
        ts = sched_mod.pndm_timesteps(cfg.schedule, num_inference_steps)
        tproj = _hoist_tproj(ts)
        model_at, _ = _model_at(ts, tproj)

        def update(i, t, out, lat, state, sub):
            eps = _to_eps(out, t, lat)
            state, lat = sched_mod.pndm_step(
                sched, cfg.schedule, state, eps, t, lat, num_inference_steps)
            return state, lat

        state0 = sched_mod.pndm_init_state(lat.shape, lat.dtype)
        lat = _scheduler_loop(0, ts.shape[0], lat, model_at, update,
                              state0=state0)

    elif cfg.scheduler == "ddpm":
        ratio = sched_mod.inference_stride(cfg.schedule, num_inference_steps)
        ts = sched_mod.ddim_timesteps(cfg.schedule, num_inference_steps)
        if orig_lat is not None:
            lat = noise_to(ts[t_start]) if t_start < num_inference_steps \
                else orig_lat.astype(dt)
        tproj = _hoist_tproj(ts)
        model_at, _ = _model_at(ts, tproj)

        def update(i, t, out, lat, state, sub):
            eps = _to_eps(out, t, lat)
            # posterior over the ACTUAL stride (see ddpm_step): the next
            # grid point, not t-1
            nlat = sched_mod.ddpm_step(sched, eps, t, lat, sub,
                                       clip_sample=False, t_prev=t - ratio)
            if blend is not None:
                nlat = blend(nlat, t - ratio)
            return state, nlat

        lat = _scheduler_loop(t_start, t_stop, lat, model_at, update,
                              key=key)
    else:
        raise ValueError(f"unknown scheduler {cfg.scheduler}")

    if not decode:
        return lat
    lat_s = lat.astype(dt) / cfg.vae.scaling_factor
    if chunked_decode is None:
        # auto: chunk only when the batch cannot be device-sharded.  Callers
        # that know (SDPipeline passes mesh is None) override — on a
        # multi-chip HOST serving from one chip, device_count alone would
        # wrongly pick the slow batched decode.
        chunked_decode = jax.device_count() == 1
    if (chunked_decode and lat.shape[0] > 1
            and lat.shape[1] * lat.shape[2] >= 4096):
        # decode image-by-image — XLA's spatial tiling of the
        # batch-4 512² decode is pathological (199.9 ms vs 85.6 chunked on
        # v5e — experiments/r2_vae_chunk.py) and the chip is saturated per
        # image, so the sequential map costs nothing.  A data-sharded batch
        # keeps the batch decode: lax.map over the batch axis would
        # serialize what the sharded decode runs in parallel.
        img = jax.lax.map(
            lambda l: vae_mod.decode(params["vae"], l[None], cfg.vae)[0],
            lat_s)
    else:
        img = vae_mod.decode(params["vae"], lat_s, cfg.vae)
    return jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)


def img2img_t_start(num_inference_steps: int, strength: float,
                    steps_offset: int = 0) -> int:
    """diffusers img2img strength → static loop start index.

    strength ∈ (0, 1]: fraction of the diffusion run re-applied to the init
    image (1.0 ≈ full text-to-image from a noised init).  Mirrors the
    diffusers Img2Img get_timesteps arithmetic: init_timestep =
    min(int(steps·strength) + offset, steps); t_start = steps −
    init_timestep + offset (clipped at 0).
    """
    if not 0.0 < strength <= 1.0:
        raise ValueError(f"strength must be in (0, 1], got {strength}")
    init_timestep = min(int(num_inference_steps * strength) + steps_offset,
                        num_inference_steps)
    return max(num_inference_steps - init_timestep + steps_offset, 0)


def preprocess_image(image, height: int, width: int) -> np.ndarray:
    """PIL image / (H,W,3) / (B,H,W,3) array → (B,H,W,3) float32 in [0,1].

    PIL inputs are bicubic-resized to (width, height); array inputs must
    already match (resizing numeric data would silently change user
    pixels).  uint8 arrays are scaled by 1/255.
    """
    if hasattr(image, "convert"):  # PIL.Image duck-type
        from PIL import Image

        image = image.convert("RGB")
        if image.size != (width, height):
            image = image.resize((width, height), Image.BICUBIC)
        return (np.asarray(image, np.float32) / 255.0)[None]
    arr = np.asarray(image)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"init image must be (H,W,3) or (B,H,W,3), "
                         f"got {arr.shape}")
    if arr.shape[1] != height or arr.shape[2] != width:
        raise ValueError(f"init image array is {arr.shape[1]}x{arr.shape[2]} "
                         f"but height/width = {height}x{width}; resize it "
                         "or pass a PIL image to resize automatically")
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return arr.astype(np.float32)


def preprocess_mask(mask, lat_h: int, lat_w: int) -> np.ndarray:
    """Inpainting mask → (B, lat_h, lat_w, 1) float32, 1 = regenerate.

    Accepts a PIL image (converted to L, nearest-resized to the latent
    grid — the diffusers convention: white = inpaint) or an array at either
    image or latent resolution (pixel-space arrays are max-pooled down so a
    partially-masked latent cell regenerates).
    """
    if hasattr(mask, "convert"):
        from PIL import Image

        m = mask.convert("L").resize((lat_w, lat_h), Image.NEAREST)
        arr = np.asarray(m, np.float32) / 255.0
        arr = arr[None]
    else:
        arr = np.asarray(mask, np.float32)
        if arr.ndim == 2:
            arr = arr[None]
        if arr.ndim == 4 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        if arr.ndim != 3:
            raise ValueError(f"mask must be (H,W) or (B,H,W), got {arr.shape}")
        if arr.shape[1:] != (lat_h, lat_w):
            fh, fw = arr.shape[1] // lat_h, arr.shape[2] // lat_w
            if fh * lat_h != arr.shape[1] or fw * lat_w != arr.shape[2]:
                raise ValueError(
                    f"mask {arr.shape[1]}x{arr.shape[2]} is neither the "
                    f"latent grid {lat_h}x{lat_w} nor an integer multiple")
            arr = arr.reshape(arr.shape[0], lat_h, fh, lat_w, fw).max((2, 4))
    if arr.min() < 0.0 or arr.max() > 1.0:
        raise ValueError("mask values must lie in [0, 1]")
    return arr[..., None].astype(np.float32)
