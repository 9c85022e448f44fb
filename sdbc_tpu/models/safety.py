"""Safety checker slot — interface parity with StableDiffusionPipeline.

The reference always disables the checker at inference
(``safety_checker=None``: inference.py:407,425; utils.py:190,225) but the
pipeline slot exists and checkpoints carry the component.  Here the slot is a
first-class optional callable on SDPipeline: ``checker(images) ->
(images, nsfw_flags)``.  A None slot is a no-op (the reference's operating
mode); ``BlocklistSafetyChecker`` is a lightweight stand-in that blacks out
images whose *prompt* matched a blocklist term — a CLIP-image-encoder-based
checker can later fill the same interface without pipeline changes.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class BlocklistSafetyChecker:
    """Prompt-term blocklist checker implementing the pipeline interface."""

    def __init__(self, blocked_terms: Sequence[str] = ()):
        self.blocked_terms = [t.lower() for t in blocked_terms]

    def __call__(self, images: np.ndarray,
                 prompts: Optional[Sequence[str]] = None
                 ) -> Tuple[np.ndarray, List[bool]]:
        if not prompts:
            return images, [False] * len(images)
        flags = [any(t in p.lower() for t in self.blocked_terms)
                 for p in prompts]
        out = images.copy()
        for i, bad in enumerate(flags):
            if bad:
                out[i] = 0.0  # black image, the upstream checker's behavior
        return out, flags


def apply_safety_checker(checker, images: np.ndarray,
                         prompts: Optional[Sequence[str]] = None):
    """None-compatible application (reference runs with checker disabled)."""
    if checker is None:
        return images, [False] * len(images)
    return checker(images, prompts)


# ---------------------------------------------------------------------------
# CLIP-vision safety checker — the full StableDiffusionSafetyChecker
# semantics (the reference always disables it; this completes E6 beyond the
# sanctioned stub).  ViT-L/14 image embedding → 768-d visual projection →
# cosine similarity against 17 learned concept embeddings (+3 special-care
# concepts that tighten the thresholds by 0.01), flagged images blacked out.
# Batched scoring follows the checker's own vectorized formulation.


def clip_preprocess(images: np.ndarray, image_size: int = 224) -> np.ndarray:
    """(B, H, W, 3) float in [0, 1] → CLIP-normalized (B, S, S, 3).

    Bicubic resize to the vision tower's square input then per-channel
    (x - mean)/std — the CLIPImageProcessor pipeline for the checker's
    feature extractor (square inputs, so resize+center-crop = resize).
    """
    import jax
    import jax.numpy as jnp

    from sdbc_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    x = jnp.asarray(images, jnp.float32)
    if x.ndim != 4 or x.shape[-1] != 3:
        raise ValueError(f"images must be (B, H, W, 3), got {x.shape}")
    if x.shape[1] != image_size or x.shape[2] != image_size:
        x = jax.image.resize(
            x, (x.shape[0], image_size, image_size, 3), method="bicubic")
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    return np.asarray((x - mean) / std, np.float32)


class ClipSafetyChecker:
    """StableDiffusionSafetyChecker on the JAX CLIP vision tower.

    params: {"vision": clip.vision_init tree, "visual_projection":
    bias-free linear, "concept_embeds" (K, proj), "concept_weights" (K,),
    "special_care_embeds" (S, proj), "special_care_weights" (S,)} —
    port from the diffusers checkpoint with
    ``models.port.port_safety_checker``.
    """

    def __init__(self, params, cfg=None):
        from sdbc_tpu.models.clip import CLIPVisionConfig

        self.params = params
        self.cfg = cfg or CLIPVisionConfig.sd_safety()

    def scores(self, images: np.ndarray):
        """→ (concept_scores (B, K), special_scores (B, S)); > 0 = match."""
        import jax.numpy as jnp

        from sdbc_tpu.models.clip import vision_apply

        x = clip_preprocess(images, self.cfg.image_size)
        _, pooled = vision_apply(self.params["vision"], jnp.asarray(x),
                                 self.cfg)
        from sdbc_tpu.ops import nn

        emb = nn.linear(self.params["visual_projection"], pooled)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

        def cos(table):
            t = table / jnp.linalg.norm(table, axis=-1, keepdims=True)
            return emb @ t.T

        special = cos(self.params["special_care_embeds"]) \
            - self.params["special_care_weights"][None]
        adjust = jnp.any(special > 0, axis=1).astype(jnp.float32) * 0.01
        concept = cos(self.params["concept_embeds"]) \
            - self.params["concept_weights"][None] + adjust[:, None]
        return np.asarray(concept), np.asarray(special)

    def __call__(self, images: np.ndarray,
                 prompts: Optional[Sequence[str]] = None
                 ) -> Tuple[np.ndarray, List[bool]]:
        concept, _ = self.scores(images)
        flags = [bool(f) for f in (concept > 0).any(axis=1)]
        out = np.array(images, copy=True)
        for i, bad in enumerate(flags):
            if bad:
                out[i] = 0.0  # black image, the upstream checker's behavior
        return out, flags
