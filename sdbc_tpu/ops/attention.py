"""Multi-head attention with a Pallas flash kernel on TPU and an XLA fallback.

Replaces the diffusers/torch CUDA attention inside UNet2DConditionModel and the
CLIP text encoder (SURVEY.md §2.2 E1/E5).  Shapes are (B, H, S, D).

impl:
  "auto"  — Pallas flash kernel on TPU for self-attention-sized problems,
            XLA einsum otherwise (CPU tests, tiny shapes, masked CLIP attn)
  "xla"   — reference jnp implementation (also the custom-vjp recompute path)
  "flash" — force the Pallas kernel (pads head_dim/seq internally)
"""
from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - device query failure
        return False


def xla_attention(q, k, v, *, causal: bool = False, scale: Optional[float] = None):
    """Reference attention: softmax(q k^T / sqrt(d)) v, fp32 softmax."""
    *_, sq, d = q.shape
    sk = k.shape[-2]
    scale = scale if scale is not None else d ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        if sq == sk:
            mask = jnp.tril(jnp.ones((sq, sk), dtype=bool))
        else:
            # right-aligned: query i attends keys 0..i+(sk-sq) — the
            # standard convention; a plain tril would cut every query off
            # from the sk-sq oldest keys.  (The sq==sk branch is the same
            # mask expressed as tril, kept separate so the CLIP graph's
            # trace — and its TPU compile-cache key — stays byte-stable.)
            qi = jnp.arange(sq)[:, None]
            kj = jnp.arange(sk)[None, :]
            mask = kj <= qi + (sk - sq)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=q.dtype)


def attention(q, k, v, *, causal: bool = False, scale: Optional[float] = None,
              impl: str = "auto"):
    """Dispatching attention entry point used by all models.

    SDBC_ATTN_IMPL=xla|flash overrides "auto" (perf ablations / debugging).
    """
    import os

    if impl in ("auto", "inference"):
        # SDBC_ATTN_IMPL (debug/ablation override) wins over both the auto
        # heuristic and the pipeline's explicit inference dispatch, so
        # SDBC_ATTN_IMPL=xla really does force the reference XLA path
        impl = os.environ.get("SDBC_ATTN_IMPL", impl)
    if impl not in ("auto", "inference", "xla", "flash", "flash_tt"):
        # a typo'd ablation override silently benchmarking the XLA
        # fallback would produce false kernel measurements
        raise ValueError(f"unknown attention impl {impl!r}")
    if impl == "inference":
        # sampling-path dispatch (set by diffusion.pipeline): fixed-cap Pallas
        # kernel for the UNet's spatial self-attention, XLA for short-kv
        # cross attention / the 8² mid block (measured: r2_flash_fixedmax.py)
        if _on_tpu() and not causal and k.shape[-2] >= 256:
            from sdbc_tpu.ops.flash_attention import flash_attention_fixed
            return flash_attention_fixed(q, k, v, scale=scale)
        return xla_attention(q, k, v, causal=causal, scale=scale)
    if impl == "xla":
        return xla_attention(q, k, v, causal=causal, scale=scale)
    if impl == "flash" or (impl == "auto" and _flash_eligible(q, k)):
        # measured-best default (experiments/PERF_NOTES.md): v1 flash for
        # long-kv self-attention, XLA for short-kv cross (via _flash_eligible)
        from sdbc_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, causal=causal, scale=scale)
    if impl == "flash_tt":
        # transposed-layout kernel: head dim on sublanes (no 128-lane pad)
        from sdbc_tpu.ops.flash_attention_tt import flash_attention_tt
        return flash_attention_tt(q, k, v, causal=causal, scale=scale)
    return xla_attention(q, k, v, causal=causal, scale=scale)


def attention_bshd_inference(q4, k4, v4, *, scale: Optional[float] = None):
    """Inference attention over (B, S, H, D) projection-layout tensors.

    Round-4 head split/merge lever: on TPU with long kv the bshd flash
    kernel walks heads via the grid (strided DMAs instead of HBM
    relayouts); short-kv cross attention and CPU fall back to the regular
    head-major dispatch via explicit transposes (same math).
    """
    import os

    # honor the documented debug/ablation override (attention() docstring:
    # "SDBC_ATTN_IMPL=xla really does force the reference XLA path") — the
    # bshd fast path must not silently win over it
    if (_on_tpu() and k4.shape[1] >= 256
            and "SDBC_ATTN_IMPL" not in os.environ):
        from sdbc_tpu.ops.flash_attention import flash_attention_fixed_bshd
        return flash_attention_fixed_bshd(q4, k4, v4, scale=scale)
    tr = lambda t: t.transpose(0, 2, 1, 3)
    return tr(attention(tr(q4), tr(k4), tr(v4), scale=scale,
                        impl="inference"))


def _flash_eligible(q, k) -> bool:
    if not _on_tpu():
        return False
    sq, d = q.shape[-2], q.shape[-1]
    sk = k.shape[-2]
    # Flash pays off for the UNet's spatial self-attention (256..4096 kv
    # tokens).  Short-kv cross attention (77 CLIP tokens) and CLIP's causal
    # attention are MXU-hostile in a flash kernel (tiny K and N) — XLA's
    # fused path handles them better.  SDBC_ATTN_CROSS=flash forces flash.
    import os

    if sk < 256 and os.environ.get("SDBC_ATTN_CROSS", "xla") == "xla":
        return False
    # Batch-aware cutoff (round-1 measurement: whole-UNet fwd at 64² flash
    # wins at CFG batch 8 — 156 vs 188 ms — but LOSES at batch 16 — 268 vs
    # 241 ms).  The kernel's (batch·head, q-block) grid stops paying once
    # total query rows grow past ~3e5; above it XLA's fused attention is
    # faster, which is what training batches hit.  SDBC_FLASH_MAX_ROWS
    # overrides for re-calibration.
    rows = int(np.prod(q.shape[:-2])) * sq
    if rows > int(os.environ.get("SDBC_FLASH_MAX_ROWS", "300000")):
        return False
    return sq >= 128 and d <= 256
