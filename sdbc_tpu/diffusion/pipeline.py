"""SDPipeline — the diffusers-pipeline-shaped host-side serving object.

Split from the sampling-graph module (VERDICT r4 weak #5): the jitted CFG
graph and its helpers live in diffusion/graph.py, the base→refiner wrapper
in diffusion/ensemble.py; this module keeps the full public surface
(PipelineConfig / sample / SDPipeline / EnsemblePipeline / preprocess
helpers re-exported) so every existing import path keeps working.  The
split is gated by experiments/trace_hash_all.py — byte-identical jaxprs
before/after.
"""
from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.diffusion.graph import (  # noqa: F401  (public re-exports)
    PipelineConfig, encode_text, encode_text_xl, _xl_added_cond,
    _apply_token_weights, _scheduler_loop, sample, img2img_t_start,
    preprocess_image, preprocess_mask)

class SDPipeline:
    """Thin host-side wrapper: tokenization + batching around `sample`.

    The diffusers-pipeline-shaped object the task layer uses
    (visualize_prompts / get_fid_images / enter_prompt).
    """

    def __init__(self, params, cfg: PipelineConfig, tokenizer,
                 compute_dtype=jnp.bfloat16, mesh=None, spatial=False,
                 attn_impl: Optional[str] = None, tokenizer2=None,
                 safety_checker=None):
        """``mesh``: optional jax.sharding.Mesh for multi-chip serving.  The
        batch shards over its ``data`` axis; a ``model`` axis > 1 additionally
        shards the weights Megatron-style (parallel/specs.py) so one sample
        batch spans chips — XLA inserts the collectives.  With a model axis
        the UNet attention automatically uses the XLA path (partitions over
        heads); the Pallas kernels are opaque to the SPMD partitioner.

        ``attn_impl``: force an attention implementation ("inference",
        "xla", ...; ops/attention.py) instead of the automatic dispatch
        (Pallas fixed-cap kernel single-device, XLA under TP/spatial
        sharding where a pallas_call is opaque to the partitioner).

        ``spatial``: shard the latent IMAGE ROWS over the ``data`` axis
        instead of the batch — the batch-1-latency decomposition (a lone
        CFG pair can't fill a data axis).  The UNet/VAE run unmodified;
        GSPMD inserts the conv halo exchanges, cross-shard GroupNorm
        stats, and attention gathers (equivalence-tested on the 8-device
        mesh).  Best when latent rows (height/8) divide the axis; composes
        with a ``model`` axis (rows x heads).
        """
        self._attn_impl = "inference"
        self.spatial = bool(spatial)
        if self.spatial:
            if mesh is None:
                raise ValueError("spatial=True requires mesh= (there is no "
                                 "axis to shard the rows over)")
            if mesh.shape.get("data", 1) < 2:
                raise ValueError(
                    f"spatial=True needs a data axis >= 2 to shard rows "
                    f"over; this mesh has data={mesh.shape.get('data', 1)} "
                    "(e.g. --tp equals the device count) — drop spatial "
                    "or lower tp")
            # pallas kernels are opaque to the SPMD partitioner: the XLA
            # attention path lets the row sharding flow through
            self._attn_impl = "xla"
        if mesh is not None:
            from sdbc_tpu.parallel import specs as spec_mod

            if mesh.shape.get("model", 1) > 1:
                excl = spec_mod.validate_tp(cfg, mesh.shape["model"])
                params = spec_mod.shard_tree(
                    params, mesh, spec_mod.tp_specs(params, mesh,
                                                    exclude=excl))
                # the Pallas inference kernel is opaque to the SPMD
                # partitioner; the XLA attention path splits over heads
                self._attn_impl = "xla"
            else:
                from sdbc_tpu.parallel.mesh import replicate_tree

                params = replicate_tree(params, mesh)
        if attn_impl is not None:
            self._attn_impl = attn_impl
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        # SDXL (cfg.clip2 set): the second (OpenCLIP) tokenizer.  Its BPE
        # table matches the first's; only the pad token differs ("!" id 0
        # instead of the eos token) — so falling back to the primary
        # tokenizer changes pad ids only, which the bigG encoder was
        # trained to ignore past eos.  Explicit is still better: pass the
        # checkpoint's own tokenizer_2 when porting real weights.
        self.tokenizer2 = tokenizer2
        if cfg.is_sdxl and tokenizer2 is None:
            self.tokenizer2 = tokenizer
        self.compute_dtype = compute_dtype
        # optional checker(images, prompts) -> (images, flags): the
        # StableDiffusionPipeline safety slot (models/safety.py — None is
        # the reference's operating mode; ClipSafetyChecker is the full
        # CLIP-vision implementation).  Applied to DECODED outputs only.
        self.safety_checker = safety_checker
        self.last_nsfw_flags = None

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        return np.asarray(self.tokenizer.batch_encode(prompts, self.cfg.clip.ctx),
                          np.int32)

    def tokenize2(self, prompts: Sequence[str]) -> np.ndarray:
        return np.asarray(
            self.tokenizer2.batch_encode(prompts, self.cfg.clip2.ctx),
            np.int32)

    BATCH_BUCKETS = (1, 2, 4, 8, 16, 32)

    def __call__(self, prompts, *, height: int = 512, width: int = 512,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 latents: Optional[np.ndarray] = None, seed: int = 42,
                 decode: bool = True, cache_interval: int = 0,
                 cache_tail: int = 0, negative_prompt=None,
                 num_images_per_prompt: int = 1, init_image=None,
                 init_latents=None,
                 strength: float = 0.8, mask_image=None,
                 guidance_rescale: float = 0.0, clip_skip: int = 0,
                 use_karras_sigmas: bool = False, freeu=None,
                 cfg_interval=None,
                 control_image=None,
                 controlnet_scale: float = 1.0,
                 prompt_weighting: bool = False, max_prompt_chunks: int = 3,
                 aesthetic_score: float = 6.0,
                 negative_aesthetic_score: float = 2.5,
                 denoising_start: Optional[float] = None,
                 denoising_end: Optional[float] = None):
        """``negative_prompt``: str or per-prompt list encoded as the CFG
        unconditional branch instead of "" (the diffusers-0.7.2
        StableDiffusionPipeline parameter the reference's engine exposes);
        same compiled graph — only the uncond token ids change.
        ``num_images_per_prompt``: diffusers parameter — each prompt is
        repeated n times with distinct initial latents (one seed stream).

        ``init_image`` (PIL or array, see preprocess_image) switches to
        img2img: the image is VAE-encoded and noised to ``strength``'s
        start point, and only the remaining steps run (the diffusers
        Img2Img pipeline of the reference's engine).  ``mask_image``
        (white = regenerate, see preprocess_mask) additionally inpaints:
        the kept region is re-blended from the init image every step.
        With ``init_image``, explicit ``latents`` are the ADDED NOISE
        (latent-shaped), not the starting latent.

        ``control_image`` (PIL or array in [0, 1], full image resolution)
        activates the ControlNet branch — the pipeline must have been built
        with ``cfg.with_controlnet()`` and params["controlnet"]
        (models/controlnet.py).  ``controlnet_scale`` multiplies the
        injected residuals without recompiling.

        ``prompt_weighting=True`` enables the community emphasis syntax
        ("(word:1.3)", "((up))", "[down]") AND chunked long prompts: text
        beyond 75 content tokens spans up to ``max_prompt_chunks``
        77-token CLIP windows concatenated for cross-attention
        (data/prompt_weights.py).  Off by default — plain prompts
        containing literal brackets keep their exact legacy tokenization
        and the default compiled graph is byte-identical."""
        if isinstance(prompts, str):
            prompts = [prompts]
        if cfg_interval is not None and len(tuple(cfg_interval)) != 2:
            raise ValueError(f"cfg_interval takes exactly 2 floats "
                             f"(lo, hi step fractions), got "
                             f"{tuple(cfg_interval)}")
        if freeu is not None and len(tuple(freeu)) != 4:
            raise ValueError(f"freeu takes exactly 4 floats (b1, b2, s1, "
                             f"s2), got {tuple(freeu)}")
        if mask_image is not None and init_image is None:
            raise ValueError("mask_image (inpainting) requires init_image")
        if init_latents is not None and init_image is not None:
            raise ValueError("init_latents (latent-space img2img) and "
                             "init_image (pixel-space img2img) are "
                             "mutually exclusive")
        b = len(prompts)
        if negative_prompt is None:
            negative_prompt = [""] * b
        elif isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * b
        elif len(negative_prompt) != b:
            raise ValueError(f"{len(negative_prompt)} negative prompts for "
                             f"{b} prompts")
        if num_images_per_prompt > 1:
            rep = lambda xs: [x for x in xs for _ in
                              range(num_images_per_prompt)]
            prompts, negative_prompt = rep(prompts), rep(negative_prompt)
            b = len(prompts)
            if latents is not None and latents.shape[0] != b:
                raise ValueError("explicit latents must be batched to "
                                 "prompts*num_images_per_prompt (identical "
                                 "latents would yield identical images)")
        # pad ragged batches up to a bucket: one compiled graph per bucket
        # instead of one per distinct batch size (single-jit discipline)
        bucket = next((s for s in self.BATCH_BUCKETS if s >= b), b)
        if self.mesh is not None and not self.spatial:
            # round the bucket up to a multiple of the data axis so the
            # batch ALWAYS shards (a silent skip would quietly serve a
            # multi-chip mesh at single-chip throughput).  Spatial mode
            # shards rows, not the batch — no rounding needed.
            n = self.mesh.shape["data"]
            bucket = -(-bucket // n) * n
        if bucket != b:
            prompts = list(prompts) + [""] * (bucket - b)
            negative_prompt = list(negative_prompt) + [""] * (bucket - b)
        cond_w = uncond_w = None
        cond2 = uncond2 = cond_w2 = uncond_w2 = None
        if prompt_weighting:
            # community emphasis syntax "(word:1.3)" + chunked long prompts
            # (data/prompt_weights.py).  Every (tokenizer, CFG-branch) pair
            # is padded to ONE shared window count; one compiled graph per
            # (bucket, k) pair.  SDXL: both encoders get their own ids +
            # weights (same BPE table ⇒ normally identical, but a ported
            # tokenizer_2 dir may differ in pad id).
            from sdbc_tpu.data.prompt_weights import batch_encode_weighted

            ctx = self.cfg.clip.ctx
            toks = [self.tokenizer]
            if self.cfg.is_sdxl:
                toks.append(self.tokenizer2)
            probe = [batch_encode_weighted(t, txt, ctx, max_prompt_chunks)
                     for t in toks for txt in (prompts, negative_prompt)]
            k = max(a.shape[1] // ctx for a, _ in probe)
            enc = [batch_encode_weighted(t, txt, ctx, max_prompt_chunks,
                                         min_chunks=k)
                   for t in toks for txt in (prompts, negative_prompt)]
            (cids, cw), (uids, uw) = enc[0], enc[1]
            cond, uncond = jnp.asarray(cids), jnp.asarray(uids)
            cond_w, uncond_w = jnp.asarray(cw), jnp.asarray(uw)
            if self.cfg.is_sdxl:
                (cids2, cw2), (uids2, uw2) = enc[2], enc[3]
                cond2, uncond2 = jnp.asarray(cids2), jnp.asarray(uids2)
                cond_w2, uncond_w2 = jnp.asarray(cw2), jnp.asarray(uw2)
        else:
            cond = jnp.asarray(self.tokenize(prompts))
            uncond = jnp.asarray(self.tokenize(negative_prompt))
            if self.cfg.is_sdxl:
                cond2 = jnp.asarray(self.tokenize2(prompts))
                uncond2 = jnp.asarray(self.tokenize2(negative_prompt))
        # independent streams for the initial latents and the (ddpm)
        # sampler: never reuse a consumed key.  The fixed-latent parity
        # path (latents given) keeps key(seed) for the sampler, matching
        # the recorded protocol.
        sampler_key = jax.random.key(seed)
        if denoising_start is not None and latents is None:
            raise ValueError("denoising_start requires latents= (the "
                             "base stage's decode=False output)")
        if latents is None:
            lkey, sampler_key = jax.random.split(jax.random.key(seed))
            f = self.cfg.vae_scale
            latents = jax.random.normal(
                lkey, (len(prompts), height // f, width // f,
                       self.cfg.latent_channels), jnp.float32)
        else:
            latents = jnp.asarray(latents)
            if latents.ndim == 3:
                latents = latents[None]
            # accept torch-layout NCHW fixed latents from the parity protocol
            if latents.shape[-1] != self.cfg.latent_channels \
                    and latents.shape[1] == self.cfg.latent_channels:
                latents = jnp.transpose(latents, (0, 2, 3, 1))
            if latents.shape[0] > b:
                # compare against the REQUESTED count, not the bucket-padded
                # prompt list: extra latents that happen to fit the bucket
                # would silently feed the "" padding slots
                raise ValueError(
                    f"{latents.shape[0]} latents for {b} requested images — "
                    "the mismatch would only surface as an opaque shape "
                    "error inside the UNet trace")
            if latents.shape[0] < len(prompts):  # pad to the bucket
                reps = [latents[-1:]] * (len(prompts) - latents.shape[0])
                latents = jnp.concatenate([latents] + reps, axis=0)

        img_arr = mask_arr = None
        t_start = 0
        t_end = None
        if denoising_end is not None:
            # SDXL ensemble base stage (diffusers denoising_end): run only
            # the first round(n·e) steps; pair with decode=False to hand
            # the raw latents to a refiner
            if not 0.0 < denoising_end <= 1.0:
                raise ValueError(f"denoising_end must be in (0, 1], got "
                                 f"{denoising_end}")
            t_end = int(round(num_inference_steps * denoising_end))
        if denoising_start is not None:
            # SDXL ensemble tail stage (diffusers denoising_start): resume
            # at round(n·s) from the ``latents=`` handed over by the base
            # stage — no re-noising (init_image is the img2img protocol
            # and is mutually exclusive)
            if init_image is not None or init_latents is not None:
                raise ValueError("denoising_start resumes from raw handed-"
                                 "over latents; it cannot combine with "
                                 "init_image/init_latents (use strength "
                                 "for img2img)")
            if not 0.0 <= denoising_start < 1.0:
                raise ValueError(f"denoising_start must be in [0, 1), got "
                                 f"{denoising_start}")
            t_start = int(round(num_inference_steps * denoising_start))
        masked_arr = None
        if init_image is not None:
            img_arr = preprocess_image(init_image, height, width)
            if img_arr.shape[0] == 1 and b > 1:
                img_arr = np.tile(img_arr, (b, 1, 1, 1))
            if img_arr.shape[0] != b:
                raise ValueError(f"{img_arr.shape[0]} init images for {b} "
                                 "requested images (pass 1, or one per image)")
            if img_arr.shape[0] < len(prompts):  # pad to the bucket
                pad = np.zeros((len(prompts) - img_arr.shape[0],)
                               + img_arr.shape[1:], np.float32)
                img_arr = np.concatenate([img_arr, pad], axis=0)
            if mask_image is not None and self.cfg.is_inpaint_unet:
                # dedicated inpainting UNet: the image conditions the UNet
                # through its masked VAE encoding (channel concat), not
                # through re-noising — full denoise from noise, t_start 0.
                # Diffusers masks in [-1, 1] space (masked pixels → 0),
                # which is 0.5 in this [0, 1] convention; the pixel mask is
                # binarized at 0.5 before masking (prepare_mask_and_
                # masked_image semantics).
                pm = preprocess_mask(mask_image, height, width)
                if pm.shape[0] == 1 and b > 1:
                    pm = np.tile(pm, (b, 1, 1, 1))
                if pm.shape[0] < img_arr.shape[0]:
                    pad = np.ones((img_arr.shape[0] - pm.shape[0],)
                                  + pm.shape[1:], np.float32)
                    pm = np.concatenate([pm, pad], axis=0)
                pm = (pm >= 0.5).astype(np.float32)
                masked_arr = img_arr * (1.0 - pm) + 0.5 * pm
                img_arr = None  # no re-noising protocol
            else:
                t_start = img2img_t_start(num_inference_steps, strength,
                                          self.cfg.schedule.steps_offset)
            if mask_image is not None:
                f = self.cfg.vae_scale
                mask_arr = preprocess_mask(mask_image, height // f, width // f)
                if mask_arr.shape[0] == 1 and b > 1:
                    mask_arr = np.tile(mask_arr, (b, 1, 1, 1))
                if mask_arr.shape[0] != b:
                    raise ValueError(f"{mask_arr.shape[0]} masks for {b} "
                                     "requested images (pass 1, or one per "
                                     "image)")
                if mask_arr.shape[0] < len(prompts):
                    pad = np.ones((len(prompts) - mask_arr.shape[0],)
                                  + mask_arr.shape[1:], np.float32)
                    mask_arr = np.concatenate([mask_arr, pad], axis=0)
                if masked_arr is not None:
                    # binary in the latent grid too (nearest/max-pool keeps
                    # {0,1} masks binary; fractional user masks round here)
                    mask_arr = (mask_arr >= 0.5).astype(np.float32)
        elif self.cfg.is_inpaint_unet:
            raise ValueError("this checkpoint is a dedicated inpainting "
                             "UNet (conv_in takes mask + masked-image "
                             "channels): pass init_image + mask_image — "
                             "plain text-to-image is undefined for it")
        lat_init = None
        if init_latents is not None:
            f = self.cfg.vae_scale
            lat_init = jnp.asarray(init_latents, jnp.float32)
            want = (height // f, width // f, self.cfg.latent_channels)
            if tuple(lat_init.shape[1:]) != want:
                raise ValueError(
                    f"init_latents shape {tuple(lat_init.shape[1:])} does "
                    f"not match the requested {height}x{width} latent grid "
                    f"{want} — resize first (jax.image.resize) or pass the "
                    "matching height/width")
            if lat_init.shape[0] == 1 and b > 1:
                lat_init = jnp.tile(lat_init, (b, 1, 1, 1))
            if lat_init.shape[0] != b:
                raise ValueError(f"{lat_init.shape[0]} init latents for "
                                 f"{b} requested images (pass 1, or one "
                                 "per image)")
            if lat_init.shape[0] < len(prompts):  # pad to the bucket
                pad = jnp.zeros((len(prompts) - lat_init.shape[0],)
                                + lat_init.shape[1:], jnp.float32)
                lat_init = jnp.concatenate([lat_init, pad], axis=0)
            t_start = img2img_t_start(num_inference_steps, strength,
                                      self.cfg.schedule.steps_offset)
        ctrl_arr = None
        if control_image is not None:
            def prep_ctrl(img):
                arr = preprocess_image(img, height, width)
                if arr.shape[0] == 1 and b > 1:
                    arr = np.tile(arr, (b, 1, 1, 1))
                if arr.shape[0] != b:
                    raise ValueError(f"{arr.shape[0]} control images for "
                                     f"{b} requested images (pass 1, or "
                                     "one per image)")
                if arr.shape[0] < len(prompts):  # pad to the bucket
                    pad = np.zeros((len(prompts) - arr.shape[0],)
                                   + arr.shape[1:], np.float32)
                    arr = np.concatenate([arr, pad], axis=0)
                return arr

            # multi-ControlNet: a list of images, one per attached branch
            ctrl_arr = ([prep_ctrl(c) for c in control_image]
                        if isinstance(control_image, (list, tuple))
                        else prep_ctrl(control_image))
        if self.mesh is not None:
            from sdbc_tpu.parallel.mesh import (data_sharding, replicate,
                                                spatial_sharding)

            if self.spatial:
                # rows over `data`; batch/tokens replicated
                n = self.mesh.shape["data"]
                if latents.shape[1] % n:
                    warnings.warn(
                        f"spatial serving: {latents.shape[1]} latent rows "
                        f"don't divide the data axis ({n}); trailing shards "
                        "run partially empty — pick height so height/"
                        f"{self.cfg.vae_scale} is a multiple of {n}")
                rep = replicate(self.mesh)
                latents = jax.device_put(latents,
                                         spatial_sharding(self.mesh))
                cond = jax.device_put(cond, rep)
                uncond = jax.device_put(uncond, rep)
                if cond_w is not None:
                    cond_w = jax.device_put(cond_w, rep)
                    uncond_w = jax.device_put(uncond_w, rep)
                if cond2 is not None:
                    cond2 = jax.device_put(cond2, rep)
                    uncond2 = jax.device_put(uncond2, rep)
                if cond_w2 is not None:
                    cond_w2 = jax.device_put(cond_w2, rep)
                    uncond_w2 = jax.device_put(uncond_w2, rep)
                # img2img/inpaint/ControlNet inputs are spatial too: shard
                # their IMAGE ROWS over `data` like the latents (dim 1 in
                # both the full-res (B,H,W,C) and latent (B,h,w,C)
                # layouts); GSPMD propagates the row sharding through the
                # VAE init encode and the ControlNet conditioning embedder
                # exactly as it does through the UNet/decode
                put_sp = lambda x: jax.device_put(
                    x, spatial_sharding(self.mesh))
                if img_arr is not None:
                    img_arr = put_sp(img_arr)
                if lat_init is not None:
                    lat_init = put_sp(lat_init)
                if mask_arr is not None:
                    mask_arr = put_sp(mask_arr)
                if masked_arr is not None:
                    masked_arr = put_sp(masked_arr)
                if ctrl_arr is not None:
                    ctrl_arr = ([put_sp(c) for c in ctrl_arr]
                                if isinstance(ctrl_arr, list)
                                else put_sp(ctrl_arr))
            else:
                put = lambda x: jax.device_put(
                    x, data_sharding(self.mesh, jnp.ndim(x)))
                cond, uncond, latents = put(cond), put(uncond), put(latents)
                if cond_w is not None:
                    cond_w, uncond_w = put(cond_w), put(uncond_w)
                if cond2 is not None:
                    cond2, uncond2 = put(cond2), put(uncond2)
                if cond_w2 is not None:
                    cond_w2, uncond_w2 = put(cond_w2), put(uncond_w2)
                if img_arr is not None:
                    img_arr = put(img_arr)
                if lat_init is not None:
                    lat_init = put(lat_init)
                if mask_arr is not None:
                    mask_arr = put(mask_arr)
                if masked_arr is not None:
                    masked_arr = put(masked_arr)
                if ctrl_arr is not None:
                    ctrl_arr = ([put(c) for c in ctrl_arr]
                                if isinstance(ctrl_arr, list)
                                else put(ctrl_arr))
        imgs = sample(self.params, cond, uncond, latents, sampler_key,
                      guidance_scale, cfg=self.cfg,
                      num_inference_steps=num_inference_steps,
                      compute_dtype=self.compute_dtype, decode=decode,
                      cache_interval=cache_interval, cache_tail=cache_tail,
                      attn_impl=self._attn_impl,
                      chunked_decode=self.mesh is None,
                      init_image=img_arr, init_latents=lat_init,
                      t_start=t_start, t_end=t_end,
                      mask=mask_arr, masked_image=masked_arr,
                      guidance_rescale=float(guidance_rescale),
                      clip_skip=int(clip_skip),
                      use_karras_sigmas=bool(use_karras_sigmas),
                      freeu=tuple(float(v) for v in freeu) if freeu
                      else None,
                      cfg_interval=tuple(float(v) for v in cfg_interval)
                      if cfg_interval is not None else None,
                      control_image=ctrl_arr,
                      controlnet_scale=controlnet_scale,
                      cond_weights=cond_w, uncond_weights=uncond_w,
                      cond_ids2=cond2, uncond_ids2=uncond2,
                      cond_weights2=cond_w2, uncond_weights2=uncond_w2,
                      aesthetic_score=float(aesthetic_score),
                      negative_aesthetic_score=float(
                          negative_aesthetic_score))
        out = np.asarray(imgs)[:b]
        if decode and self.safety_checker is not None:
            from sdbc_tpu.models.safety import apply_safety_checker

            out, self.last_nsfw_flags = apply_safety_checker(
                self.safety_checker, out, prompts[:b])
        return out

    def generate(self, prompts, spec):
        """Serve one ``SampleSpec`` (diffusion/spec.py) — the consolidated
        request surface: the CLI, the serve daemon and the eval drivers
        construct a spec instead of hand-threading ~25 kwargs; this is the
        only router, and ``spec.call_kwargs()`` the only expansion site.
        Routes to the hires two-stage flow when ``hires_scale`` > 1.
        """
        if spec.hires_scale and spec.hires_scale > 1.0:
            return self.hires(prompts, **spec.hires_kwargs())
        return self(prompts, **spec.call_kwargs())

    def hires(self, prompts, *, height: int = 1024, width: int = 1024,
              hires_scale: float = 2.0, hires_strength: float = 0.7,
              hires_steps: Optional[int] = None, hires_mode: str = "latent",
              num_inference_steps: int = 50, seed: int = 42,
              latents=None, decode: bool = True, **kw):
        """Two-stage hires-fix: compose at base resolution, upscale, then
        re-diffuse detail at the target resolution.

        SD-1.x composes reliably only near its 512² training resolution —
        a direct 1024² sample produces duplicated subjects.  The community
        hires-fix (AUTOMATIC1111's txt2img second pass; the reference's
        engine has no equivalent) runs text-to-image at
        height/width ÷ ``hires_scale`` (snapped to the UNet's spatial
        granularity), upscales, and finishes with an img2img pass at
        ``hires_strength``.

        hires_mode:
          "latent" — bicubic-resize the RAW first-pass latents
            (jax.image.resize) and re-noise them (no VAE roundtrip; the
            default, and the cheapest on TPU: the whole flow stays on
            device, HBM-resident).
          "image"  — decode, bicubic-upscale in pixel space, re-encode
            through the VAE (slower; crisper at scale > 2 where latent
            interpolation blurs).
        ``hires_steps`` — second-stage grid size (defaults to
        ``num_inference_steps``); with strength s only ceil(s·steps) UNet
        steps actually run.  Remaining kwargs go to BOTH stages.
        """
        if hires_mode not in ("latent", "image"):
            raise ValueError(f"hires_mode must be 'latent' or 'image', "
                             f"got {hires_mode!r}")
        for bad in ("strength", "init_image", "init_latents", "mask_image",
                    "denoising_start", "denoising_end"):
            if bad in kw:
                raise ValueError(f"hires() drives both stages itself — "
                                 f"{bad} cannot be passed through (use "
                                 "hires_strength for the second stage)")
        if hires_scale <= 1.0:
            raise ValueError(f"hires_scale must be > 1 (got {hires_scale}) "
                             "— use a plain call for same-size sampling")
        if self.cfg.scheduler in ("pndm", "lms"):
            raise ValueError("hires needs a t_start-capable scheduler "
                             "(ddim/dpm/ddpm/euler_a/...) — the PNDM/LMS "
                             "warmup does not truncate at the second "
                             "stage's strength start")
        f = self.cfg.vae_scale
        # conservative pixel granularity: 8·vae_scale covers the UNet's
        # down path for every shipped family (SD-1.x/2.x/XL: f=8 → 64 px)
        m = f * 8
        snap = lambda v: max(m, int(round(v / hires_scale / m)) * m)
        bh, bw = snap(height), snap(width)
        if height % m or width % m:
            raise ValueError(f"hires target {height}x{width} must be a "
                             f"multiple of {m}")
        out1 = self.__call__(prompts, height=bh, width=bw,
                             num_inference_steps=num_inference_steps,
                             seed=seed, latents=latents,
                             decode=(hires_mode == "image"), **kw)
        steps2 = hires_steps if hires_steps is not None \
            else num_inference_steps
        # distinct second-stage noise stream: fold the stage index into the
        # seed (explicit-key discipline; seed+1 could collide with a user's
        # own adjacent-seed batch sweep)
        seed2 = int(np.uint32(seed) ^ np.uint32(0x9E3779B9))
        if hires_mode == "latent":
            b, c = out1.shape[0], out1.shape[-1]
            up = jax.image.resize(
                jnp.asarray(out1, jnp.float32),
                (b, height // f, width // f, c), method="bicubic")
            return self.__call__(prompts, height=height, width=width,
                                 init_latents=up, strength=hires_strength,
                                 num_inference_steps=steps2, seed=seed2,
                                 decode=decode, **kw)
        imgs = np.asarray(jax.image.resize(
            jnp.asarray(out1, jnp.float32),
            (out1.shape[0], height, width, 3), method="bicubic"))
        return self.img2img(prompts, np.clip(imgs, 0.0, 1.0),
                            strength=hires_strength, height=height,
                            width=width, num_inference_steps=steps2,
                            seed=seed2, decode=decode, **kw)

    def img2img(self, prompts, image, *, strength: float = 0.8, **kw):
        """Image-to-image: re-diffuse ``image`` under ``prompts``.

        The diffusers StableDiffusionImg2ImgPipeline surface (same engine
        version the reference pins); height/width default to the image's
        own size for array inputs.  strength ∈ (0, 1] — how much of the
        diffusion run to re-apply.
        """
        if not hasattr(image, "convert"):
            arr = np.asarray(image)
            kw.setdefault("height", arr.shape[-3])
            kw.setdefault("width", arr.shape[-2])
        return self(prompts, init_image=image, strength=strength, **kw)

    def inpaint(self, prompts, image, mask_image, *,
                strength: float = 0.8, **kw):
        """Inpainting: regenerate the white region of ``mask_image`` inside
        ``image`` under ``prompts`` (diffusers StableDiffusionInpaintPipeline
        surface, corrected per-step blend — see ``sample``)."""
        if not hasattr(image, "convert"):
            arr = np.asarray(image)
            kw.setdefault("height", arr.shape[-3])
            kw.setdefault("width", arr.shape[-2])
        return self(prompts, init_image=image, mask_image=mask_image,
                    strength=strength, **kw)

    def numpy_to_pil(self, imgs: np.ndarray):
        from PIL import Image

        return [Image.fromarray(np.uint8(np.round(i * 255.0))) for i in imgs]


# re-exported for the established import path (sdbc_tpu.diffusion.pipeline
# is the public module; the class moved to diffusion/ensemble.py)
from sdbc_tpu.diffusion.ensemble import EnsemblePipeline  # noqa: E402,F401
