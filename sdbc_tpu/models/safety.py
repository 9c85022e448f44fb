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
