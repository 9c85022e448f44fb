"""Textual inversion — learn new token embeddings (beyond the reference).

The reference fine-tunes whole components (finetune_sd.py:374-399); textual
inversion (Gal et al. 2022, arXiv:2208.01618) instead learns ONLY a few new
rows of the CLIP token-embedding table for a placeholder token (e.g.
``<cover-style>``), leaving every pretrained weight untouched.  For the
book-cover task the natural use is a *style* token: train on covers with the
placeholder appended to the usual title/author prompts, then compose it into
arbitrary prompts at inference ("a cookbook cover in the style of
<cover-style>").

Design (mirrors train/lora.py):
  - the trainable tree is ``{"ti": {"rows": (n_vectors, hidden) fp32}}``;
    the frozen base (all three components, bf16) never changes
  - the merge happens INSIDE the jitted loss (``merge``): the trained rows
    are concatenated after the frozen embedding table, so placeholder ids
    (base_vocab + k, data/tokenizer.py add_placeholder) look up the trained
    rows and autodiff reaches exactly ``rows``
  - rows initialise from the mean embedding of a user-chosen initializer
    word ("art", "cover", ...) — the paper's coarse-description init — or
    the table mean when none is given
  - checkpoints store the UNTOUCHED base + ``ti.npz`` + the tokenizer's
    ``added_tokens.json``; utils/checkpoint.load_pipeline merges on load
    (enlarged table, clip vocab_size bumped) so any consumer serves the
    tuned model while the embedding stays separately shippable
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def init_rows(table, n_vectors: int, init_ids: Optional[List[int]] = None):
    """(n_vectors, hidden) fp32 rows seeded from the base table.

    ``init_ids``: token ids of the initializer word (every vector starts at
    their mean embedding — the paper's "coarse description" init); without
    it, the table mean (a neutral start close to the embedding manifold).
    """
    table = jnp.asarray(table, jnp.float32)
    if init_ids:
        seed = table[jnp.asarray(init_ids)].mean(axis=0)
    else:
        seed = table.mean(axis=0)
    return jnp.tile(seed[None, :], (n_vectors, 1))


def merge(params: dict, rows) -> dict:
    """Params with the text encoder's embedding table extended by ``rows``.

    Pure tree rebuild; rows cast to the table's dtype (bf16 frozen bases
    stay bf16 — same convention as lora.apply_lora) so the lookup dtype is
    uniform.  Placeholder ids index the appended rows.
    """
    te = dict(params["text_encoder"])
    emb = dict(te["token_embedding"])
    table = emb["table"]
    emb["table"] = jnp.concatenate(
        [table, jnp.asarray(rows).astype(table.dtype)], axis=0)
    te["token_embedding"] = emb
    out = dict(params)
    out["text_encoder"] = te
    return out


# ---------------------------------------------------------------------------
# serialization: one portable .npz per learned embedding


def save_ti(path: str, rows, token: str, ids: List[int]) -> None:
    meta = json.dumps({"token": token, "ids": list(map(int, ids)),
                       "format": "sdbc_ti_v1"})
    np.savez(path, rows=np.asarray(rows, np.float32),
             __meta__=np.frombuffer(meta.encode(), np.uint8))


def load_ti(path: str) -> Tuple[jnp.ndarray, dict]:
    """→ (rows fp32, {"token", "ids", ...})."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        rows = jnp.asarray(z["rows"], jnp.float32)
    if rows.ndim != 2 or len(meta.get("ids", ())) != rows.shape[0]:
        raise ValueError(f"malformed textual-inversion file {path}: "
                         f"rows {rows.shape} vs ids {meta.get('ids')}")
    return rows, meta


def merge_file(params: dict, path: str) -> Tuple[dict, dict]:
    """Load ``path`` and merge → (params, meta).  Serving entry point.

    Raises unless the placeholder ids are exactly the appended positions
    (base_vocab..base_vocab+n-1) — anything else means the embedding was
    trained against a different tokenizer registration order.
    """
    rows, meta = load_ti(path)
    base = params["text_encoder"]["token_embedding"]["table"].shape[0]
    want = list(range(base, base + rows.shape[0]))
    if list(meta["ids"]) != want:
        raise ValueError(
            f"textual-inversion ids {meta['ids']} do not continue this "
            f"model's embedding table (vocab {base}, expected {want}) — "
            "trained against a different base?")
    return merge(params, rows), meta


def added_tokens_entry(meta: dict) -> Dict[str, List[int]]:
    """added_tokens.json payload for a loaded ti meta dict."""
    return {meta["token"]: list(map(int, meta["ids"]))}
