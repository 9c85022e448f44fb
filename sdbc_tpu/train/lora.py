"""LoRA adapters — parameter-efficient fine-tuning (beyond the reference).

The reference fine-tunes full components (finetune_sd.py:374-399: UNet
and/or CLIP text encoder); LoRA (Hu et al. 2021, arXiv:2106.09685) trains
low-rank deltas ΔW = (α/r)·A·B on the attention projections instead —
~0.1-1% of the parameters and optimizer state, which on TPU means the
frozen bf16 base never leaves HBM-resident form and Adam moments become
negligible.

Design (TPU-first, functional):
  - an adapter is a FLAT dict keyed by the dotted path of the adapted
    linear ("unet.down.0.attns.0.attn1.q" → {"a": (..,in,r),
    "b": (..,r,out)}), mirroring stacked/scanned leaves by broadcasting —
    CLIP's (L,in,out) layer stack gets (L,in,r)/(L,r,out) adapters
  - training merges ΔW into the (frozen, bf16) base weights INSIDE the
    loss (``apply_lora``): mathematically identical to the per-activation
    formulation, one fused matmul-add per adapted layer (XLA fuses it into
    the surrounding graph), and autodiff reaches exactly {a, b}
  - serving merges once up front at full precision — zero inference cost;
    the sampling graph, Pallas kernels, DeepCache, TP specs are untouched
  - b is zero-initialised (ΔW = 0), so step-0 behavior is exactly the
    base model; a uses the PEFT-style fan-in uniform init

Adapters serialize to a single ``lora.npz`` (utils/checkpoint.py writes it
next to the per-component orbax trees and load_pipeline auto-merges it).
"""
from __future__ import annotations

import json
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# containers whose q/k/v/o projections are adapted by default: UNet
# self/cross attention ("attn1"/"attn2", models/unet.py:_init_transformer)
# and CLIP attention ("attn", models/clip.py:_init_layer) — the diffusers
# LoRA convention (attention processors only)
DEFAULT_CONTAINERS = ("attn1", "attn2", "attn")
DEFAULT_PROJECTIONS = ("q", "k", "v", "o")


def _is_linear(node) -> bool:
    return (isinstance(node, dict) and "w" in node
            and getattr(node["w"], "ndim", 0) >= 2)


def _iter_linears(tree, path=()) -> Iterator[Tuple[tuple, dict]]:
    """Yield (path, linear-dict) for every {"w": ...} leaf dict."""
    if _is_linear(tree):
        yield path, tree
        return
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _iter_linears(tree[k], path + (str(k),))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_linears(v, path + (str(i),))


def _targets(params, components, containers, projections):
    for path, lin in _iter_linears(params):
        if path[0] not in components:
            continue
        if path[-1] not in projections:
            continue
        if not any(c in path[:-1] for c in containers):
            continue
        yield path, lin


def init_lora(key, params: dict, rank: int,
              components: Tuple[str, ...],
              containers: Tuple[str, ...] = DEFAULT_CONTAINERS,
              projections: Tuple[str, ...] = DEFAULT_PROJECTIONS,
              ) -> Dict[str, dict]:
    """Create a zero-delta adapter for every targeted projection.

    a ~ U(±1/sqrt(fan_in)) (kaiming-uniform fan-in bound, the PEFT init),
    b = 0 — so the adapted model is exactly the base model at step 0.
    """
    if rank < 1:
        raise ValueError(f"LoRA rank must be >= 1, got {rank}")
    out: Dict[str, dict] = {}
    paths = list(_targets(params, components, containers, projections))
    if not paths:
        raise ValueError(
            f"no LoRA targets found for components={components} "
            f"containers={containers} projections={projections}")
    keys = jax.random.split(key, len(paths))
    for k, (path, lin) in zip(keys, paths):
        w = lin["w"]
        fan_in = w.shape[-2]
        bound = 1.0 / (fan_in ** 0.5)
        a = jax.random.uniform(k, w.shape[:-1] + (rank,), jnp.float32,
                               -bound, bound)
        b = jnp.zeros(w.shape[:-2] + (rank, w.shape[-1]), jnp.float32)
        out[".".join(path)] = {"a": a, "b": b}
    return out


def apply_lora(params: dict, lora: Dict[str, dict], scale: float) -> dict:
    """Return params with w ← w + scale·(a@b) at every adapter path.

    Pure tree rebuild (the input tree is untouched).  Deltas are computed
    in fp32 and cast back to the weight's dtype, so bf16 frozen bases stay
    bf16 in the merged tree.  Raises if any adapter path fails to match a
    linear in ``params`` — a silently dropped adapter would train nothing.
    """
    flat = {tuple(k.split(".")): v for k, v in lora.items()}
    used = set()

    def rebuild(tree, path=()):
        if _is_linear(tree) and path in flat:
            ab = flat[path]
            used.add(path)
            w = tree["w"]
            delta = (ab["a"].astype(jnp.float32)
                     @ ab["b"].astype(jnp.float32)) * scale
            out = dict(tree)
            out["w"] = (w.astype(jnp.float32) + delta).astype(w.dtype)
            return out
        if isinstance(tree, dict):
            return {k: rebuild(v, path + (str(k),)) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return [rebuild(v, path + (str(i),)) for i, v in enumerate(tree)]
        return tree

    merged = rebuild(params)
    missing = set(flat) - used
    if missing:
        raise ValueError(
            f"LoRA adapter paths not found in params: "
            f"{sorted('.'.join(p) for p in missing)[:5]} "
            f"(+{max(len(missing) - 5, 0)} more) — wrong component tree?")
    return merged


def lora_scale(rank: int, alpha: float) -> float:
    return alpha / rank


def count_params(lora: Dict[str, dict]) -> int:
    return sum(int(np.prod(v["a"].shape)) + int(np.prod(v["b"].shape))
               for v in lora.values())


# ---------------------------------------------------------------------------
# serialization: one portable .npz per adapter


def save_lora(path: str, lora: Dict[str, dict], rank: int,
              alpha: float) -> None:
    arrays = {}
    for k, v in lora.items():
        arrays[k + ".a"] = np.asarray(v["a"], np.float32)
        arrays[k + ".b"] = np.asarray(v["b"], np.float32)
    meta = json.dumps({"rank": rank, "alpha": alpha, "format": "sdbc_lora_v1"})
    np.savez(path, __meta__=np.frombuffer(meta.encode(), np.uint8), **arrays)


def load_lora(path: str) -> Tuple[Dict[str, dict], dict]:
    """→ (adapter dict, {"rank", "alpha", ...})."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        out: Dict[str, dict] = {}
        for k in z.files:
            if k == "__meta__":
                continue
            base, kind = k.rsplit(".", 1)
            out.setdefault(base, {})[kind] = jnp.asarray(z[k])
    bad = [k for k, v in out.items() if set(v) != {"a", "b"}]
    if bad:
        raise ValueError(f"malformed LoRA file {path}: incomplete pairs {bad}")
    return out, meta


def merge_file(params: dict, path: str,
               scale: Optional[float] = None) -> dict:
    """Load ``path`` and merge it into ``params`` (serving entry point)."""
    lora, meta = load_lora(path)
    if scale is None:
        scale = lora_scale(int(meta["rank"]), float(meta["alpha"]))
    return apply_lora(params, lora, scale)
