"""CLIPScore — prompt ↔ cover alignment metric (beyond the reference).

The reference's only quantitative metric is FID (/root/reference/fid.py),
which measures realism against a real-image distribution but says nothing
about whether each generated cover matches ITS OWN prompt.  CLIPScore
(Hessel et al. 2021, arXiv:2104.08718) fills that gap:

    CLIPScore(img, txt) = w * max(cos(E_img, E_txt), 0),   w = 2.5

with E_* the projected CLIP embeddings.  This module reuses the
framework's own towers — models/clip.py text tower (+ text_projection,
the CLIPTextModelWithProjection path) and vision tower (+
visual_projection, the safety-checker path) — so a full transformers
CLIPModel checkpoint dir drops in via ``clip_model_from_dir``.

TPU notes: both towers run under one jit per batch bucket; images are
CLIP-preprocessed host-side (bicubic to the tower's square input +
per-channel normalization, models/safety.clip_preprocess).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from sdbc_tpu.models.safety import clip_preprocess
from sdbc_tpu.ops import nn

CLIPSCORE_W = 2.5


@functools.partial(jax.jit, static_argnames=("text_cfg", "vision_cfg",
                                             "compute_dtype"))
def _embed(params, ids, pixels, *, text_cfg: CLIPTextConfig,
           vision_cfg: CLIPVisionConfig, compute_dtype=jnp.float32):
    from sdbc_tpu.models import clip as clip_mod

    _, t_pool = clip_mod.apply_with_pooled(params["text"], ids, text_cfg,
                                           compute_dtype=compute_dtype)
    _, v_pool = clip_mod.vision_apply(params["vision"], pixels, vision_cfg,
                                      compute_dtype=compute_dtype)
    v_emb = nn.linear(params["visual_projection"], v_pool)
    t = t_pool / jnp.linalg.norm(t_pool.astype(jnp.float32), axis=-1,
                                 keepdims=True)
    v = v_emb / jnp.linalg.norm(v_emb.astype(jnp.float32), axis=-1,
                                keepdims=True)
    return jnp.sum(t * v, axis=-1)                       # per-pair cosine


class ClipScorer:
    """params: {"text" (with text_projection), "vision",
    "visual_projection"} — ``clip_model_from_dir`` builds this from a
    transformers CLIPModel save dir; random init works for plumbing tests
    (scores are then meaningless)."""

    def __init__(self, params, text_cfg: CLIPTextConfig,
                 vision_cfg: CLIPVisionConfig, tokenizer,
                 compute_dtype=jnp.float32):
        if "text_projection" not in params["text"]:
            raise ValueError(
                "ClipScorer needs a projected text tower "
                "(CLIPTextModelWithProjection layout) — the embedding "
                "spaces of the two towers only align through the "
                "projections")
        self.params = params
        self.text_cfg = text_cfg
        self.vision_cfg = vision_cfg
        self.tokenizer = tokenizer
        self.compute_dtype = compute_dtype

    def cosines(self, images: np.ndarray,
                prompts: Sequence[str]) -> np.ndarray:
        """images: (B, H, W, 3) float in [0, 1] (any H/W; CLIP-resized
        here) or uint8; → per-pair cosine similarities (B,)."""
        images = np.asarray(images)
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        if images.ndim != 4 or images.shape[0] != len(prompts):
            raise ValueError(f"{images.shape} images vs {len(prompts)} "
                             "prompts (need one prompt per image)")
        pix = clip_preprocess(images, self.vision_cfg.image_size)
        ids = jnp.asarray(np.asarray(
            self.tokenizer.batch_encode(list(prompts), self.text_cfg.ctx),
            np.int32))
        return np.asarray(_embed(self.params, ids, jnp.asarray(pix),
                                 text_cfg=self.text_cfg,
                                 vision_cfg=self.vision_cfg,
                                 compute_dtype=self.compute_dtype))

    def score(self, images, prompts, w: float = CLIPSCORE_W) -> np.ndarray:
        """CLIPScore per pair: w * max(cos, 0) (arXiv:2104.08718 eq. 1)."""
        return w * np.maximum(self.cosines(images, prompts), 0.0)
