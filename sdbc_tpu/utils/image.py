"""Image helpers: grid rendering, dtype/range conversion, bicubic resize.

Covers the reference's ``image_grid`` (finetune_sd.py:51-60, duplicated at
inference.py:68-77 — single source of truth here) and the dataset's bicubic
512x512 resize + [-1, 1] normalisation (utils.py:119-146).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def image_grid(imgs, rows: int, cols: int):
    """Paste PIL images into a rows x cols grid (reference finetune_sd.py:51-60)."""
    from PIL import Image

    assert len(imgs) == rows * cols, f"need {rows * cols} images, got {len(imgs)}"
    w, h = imgs[0].size
    grid = Image.new("RGB", size=(cols * w, rows * h))
    for i, img in enumerate(imgs):
        grid.paste(img, box=(i % cols * w, i // cols * h))
    return grid


def to_uint8(x: jax.Array) -> jax.Array:
    """[0,1] float image -> uint8, round-half-away like PIL expects."""
    return jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)


def normalize_to_pm1(x) -> jnp.ndarray:
    """uint8/float [0,255] image -> float32 in [-1, 1] (reference utils.py:143)."""
    return jnp.asarray(x, jnp.float32) / 127.5 - 1.0


def resize_bicubic(img, size_hw) -> jnp.ndarray:
    """Bicubic resize via jax.image (reference uses PIL BICUBIC, utils.py:131)."""
    h, w = size_hw
    if img.ndim == 3:
        return jax.image.resize(img, (h, w, img.shape[-1]), method="bicubic")
    return jax.image.resize(img, (img.shape[0], h, w, img.shape[-1]), method="bicubic")


def decode_and_prepare(path: str, size: int = 512) -> np.ndarray:
    """Host-side: JPEG open -> RGB -> bicubic resize -> [-1,1] float32 HWC.

    Mirrors CustomDataset.__getitem__ preprocessing (reference utils.py:119-146)
    but emits NHWC (TPU-native layout) instead of CHW.
    """
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BICUBIC)
        arr = np.asarray(im, dtype=np.float32)
    return arr / 127.5 - 1.0
