"""SampleSpec — the one sampling-request carrier (VERDICT r4 item 6).

Every serving surface used to hand-thread ~25 keyword arguments into
``SDPipeline.__call__`` (and again into ``hires`` / ``EnsemblePipeline`` /
the serve daemon / the CLI).  A ``SampleSpec`` carries the whole request;
``SDPipeline.generate(prompts, spec)`` routes it (hires two-stage when
``hires_scale`` > 1, plain call otherwise), and ``call_kwargs()`` is the
single place the fields expand back into the legacy kwargs surface.

The spec also DOCUMENTS the jit static-arg surface: every field in
``STATIC_FIELDS`` participates in graph specialization — changing it
compiles a new graph (served from the persistent cache afterwards);
fields in ``TRACED_FIELDS`` are data and never recompile.  The
recompile-count contract is enforced by tests/test_recompile.py against
the live jit cache.

Matches the request surface of the reference engine's
``StableDiffusionPipeline.__call__`` (diffusers 0.7.2; reference call
sites inference.py:342-351, finetune_sd.py:264-271) plus the
beyond-reference extensions (img2img/inpaint/ControlNet/hires/SDXL).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple, Union

# Fields that are jit-STATIC (change ⇒ a new compiled graph):
#   - shape-determining: height/width, num_inference_steps,
#     num_images_per_prompt (batch bucket), hires trio, strength (via the
#     static t_start grid index for img2img), denoising_start/end (static
#     loop bounds), prompt_weighting + max_prompt_chunks (window count)
#   - graph-structure: scheduler knobs (cache_interval/cache_tail,
#     use_karras_sigmas, freeu, cfg_interval, clip_skip, guidance_rescale),
#     decode
STATIC_FIELDS = frozenset({
    "height", "width", "num_inference_steps", "decode", "cache_interval",
    "cache_tail", "use_karras_sigmas", "freeu", "cfg_interval",
    "clip_skip", "guidance_rescale", "prompt_weighting",
    "max_prompt_chunks", "strength", "denoising_start", "denoising_end",
    "num_images_per_prompt", "hires_scale", "hires_strength",
    "hires_steps", "hires_mode",
})

# Traced / host-data fields (never recompile — same graph, new operands).
# Nuance (tests/test_recompile.py): the FIRST explicit-``latents`` call
# retraces once — host arrays are uncommitted while internally-drawn
# latents are device-committed, and pjit keys its entry cache on
# committedness; the XLA executable is shared and all later
# explicit-latents calls (the serve daemon's steady state) hit that entry.
TRACED_FIELDS = frozenset({
    "guidance_scale", "seed", "negative_prompt", "latents", "init_image",
    "init_latents", "mask_image", "control_image", "controlnet_scale",
    "aesthetic_score", "negative_aesthetic_score",
})


@dataclasses.dataclass(frozen=True)
class SampleSpec:
    """One sampling request.  Field semantics = SDPipeline.__call__."""

    # geometry / protocol (static)
    height: int = 512
    width: int = 512
    num_inference_steps: int = 50
    num_images_per_prompt: int = 1
    decode: bool = True
    # guidance (guidance_scale is traced; rescale is static graph structure)
    guidance_scale: float = 7.5
    guidance_rescale: float = 0.0
    cfg_interval: Optional[Tuple[float, float]] = None
    # scheduler / graph knobs (static)
    cache_interval: int = 0
    cache_tail: int = 0
    use_karras_sigmas: bool = False
    freeu: Optional[Tuple[float, float, float, float]] = None
    clip_skip: int = 0
    denoising_start: Optional[float] = None
    denoising_end: Optional[float] = None
    # prompts / conditioning (traced)
    negative_prompt: Union[None, str, Sequence[str]] = None
    prompt_weighting: bool = False
    max_prompt_chunks: int = 3
    seed: int = 42
    latents: Any = None
    # img2img / inpaint / controlnet
    init_image: Any = None
    init_latents: Any = None
    strength: float = 0.8
    mask_image: Any = None
    control_image: Any = None
    controlnet_scale: Union[float, Sequence[float]] = 1.0
    # SDXL micro-conditioning (traced)
    aesthetic_score: float = 6.0
    negative_aesthetic_score: float = 2.5
    # hires-fix second stage (static; hires_scale > 1 activates)
    hires_scale: float = 0.0
    hires_strength: float = 0.7
    hires_steps: int = 0
    hires_mode: str = "latent"

    def call_kwargs(self) -> dict:
        """Expand into SDPipeline.__call__ kwargs (the ONE expansion site).

        Hires fields are routing information for ``generate`` and are
        excluded — __call__ does not accept them.
        """
        # no dataclasses.asdict: it deep-copies values, and latents /
        # init images are big host arrays
        d = {f.name: getattr(self, f.name)
             for f in dataclasses.fields(self)}
        for k in ("hires_scale", "hires_strength", "hires_steps",
                  "hires_mode"):
            d.pop(k)
        return d

    def hires_kwargs(self) -> dict:
        """Expand into SDPipeline.hires kwargs (hires drives both stages
        itself, so the single-stage img2img/handoff fields are dropped)."""
        d = self.call_kwargs()
        for k in ("init_image", "init_latents", "mask_image", "strength",
                  "denoising_start", "denoising_end"):
            d.pop(k)
        d.update(hires_scale=self.hires_scale,
                 hires_strength=self.hires_strength,
                 hires_steps=self.hires_steps or None,
                 hires_mode=self.hires_mode)
        return d

    def replace(self, **kw) -> "SampleSpec":
        return dataclasses.replace(self, **kw)


_ALL_FIELDS = {f.name for f in dataclasses.fields(SampleSpec)}
_missing = _ALL_FIELDS - STATIC_FIELDS - TRACED_FIELDS
if _missing:  # every field must be classified — the contract IS the doc
    raise AssertionError(f"unclassified SampleSpec fields: {_missing}")
