"""EnsemblePipeline — SDXL base → refiner expert-denoiser serving wrapper.

Split out of diffusion/pipeline.py (VERDICT r4 weak #5); see the class
docstring for the handoff protocol.
"""
from __future__ import annotations

import numpy as np

from sdbc_tpu.diffusion.pipeline import SDPipeline

class EnsemblePipeline:
    """SDXL base → refiner ensemble-of-expert-denoisers serving wrapper.

    The base model runs the high-noise fraction of the grid
    (``denoising_end=handoff``, raw-latent output) and the refiner resumes
    at the SAME grid index (``denoising_start=handoff``, no re-noising) —
    the diffusers StableDiffusionXLPipeline + Img2ImgPipeline ensemble
    protocol.  Drop-in for SDPipeline's calling convention (the CLI modes
    and eval drivers call it identically); img2img ``strength`` runs the
    base stage's truncated start, inpainting masks are rejected (a
    truncated run would hand off a half-blended composite).
    """

    def __init__(self, base: SDPipeline, refiner: SDPipeline,
                 handoff: float = 0.8):
        if not getattr(refiner.cfg, "refiner", False):
            raise ValueError("EnsemblePipeline's second model must be a "
                             "refiner config (PipelineConfig.refiner=True)")
        if getattr(base.cfg, "refiner", False):
            raise ValueError("EnsemblePipeline's first model is the base "
                             "(got a refiner config in the base slot)")
        if base.cfg.schedule != refiner.cfg.schedule \
                or base.cfg.scheduler != refiner.cfg.scheduler:
            raise ValueError(
                "base and refiner must share the schedule AND scheduler — "
                "the handoff resumes mid-grid, so the two stages' timestep "
                f"grids must be identical (base {base.cfg.scheduler}/"
                f"{base.cfg.schedule} vs refiner {refiner.cfg.scheduler}/"
                f"{refiner.cfg.schedule})")
        if base.cfg.vae_scale != refiner.cfg.vae_scale:
            raise ValueError("base and refiner VAEs disagree on the latent "
                             "geometry (vae_scale) — the handed-off latents "
                             "would decode at a different resolution")
        if not 0.0 < handoff < 1.0:
            raise ValueError(f"handoff must be in (0, 1), got {handoff}")
        self.base = base
        self.refiner = refiner
        self.handoff = float(handoff)
        self.cfg = base.cfg

    def __call__(self, prompts, *, aesthetic_score: float = 6.0,
                 negative_aesthetic_score: float = 2.5, decode: bool = True,
                 **kw):
        if kw.get("mask_image") is not None:
            raise ValueError("inpainting through the ensemble is not "
                             "supported (the handoff would blend against "
                             "an intermediate noise level) — inpaint on the "
                             "base model, then refine with img2img")
        lat = self.base(prompts, decode=False, denoising_end=self.handoff,
                        **kw)
        # stage-1-only inputs: the refiner resumes from the handed-over
        # latents, so image/noise initialization does not apply to it
        kw2 = {k: v for k, v in kw.items()
               if k not in ("latents", "init_image", "strength",
                            "control_image", "controlnet_scale")}
        return self.refiner(prompts, latents=lat,
                            denoising_start=self.handoff, decode=decode,
                            aesthetic_score=aesthetic_score,
                            negative_aesthetic_score=negative_aesthetic_score,
                            **kw2)

    def img2img(self, prompts, image, *, strength: float = 0.3, **kw):
        return self.base.img2img.__func__(self, prompts, image,
                                          strength=strength, **kw)

    def generate(self, prompts, spec):
        """SampleSpec surface (see SDPipeline.generate).  The ensemble
        drives the handoff itself, so hires and explicit denoising bounds
        are rejected rather than silently misrouted."""
        if spec.hires_scale and spec.hires_scale > 1.0:
            raise ValueError("hires is not available under --refiner_ckpt "
                             "ensemble serving (the refiner already runs "
                             "a tail pass)")
        if spec.denoising_start is not None or spec.denoising_end is not None:
            raise ValueError("the ensemble sets denoising_start/end from "
                             "--refiner_frac; they cannot be requested "
                             "per call")
        kw = spec.call_kwargs()
        for k in ("denoising_start", "denoising_end"):
            kw.pop(k)
        return self(prompts, **kw)

    def numpy_to_pil(self, imgs: np.ndarray):
        return self.base.numpy_to_pil(imgs)
