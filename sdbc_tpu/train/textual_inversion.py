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


def _extend_table(component: dict, rows) -> dict:
    te = dict(component)
    emb = dict(te["token_embedding"])
    table = emb["table"]
    emb["table"] = jnp.concatenate(
        [table, jnp.asarray(rows).astype(table.dtype)], axis=0)
    te["token_embedding"] = emb
    return te


def merge(params: dict, rows, rows2=None) -> dict:
    """Params with the text encoder's embedding table extended by ``rows``.

    Pure tree rebuild; rows cast to the table's dtype (bf16 frozen bases
    stay bf16 — same convention as lora.apply_lora) so the lookup dtype is
    uniform.  Placeholder ids index the appended rows.

    ``rows2`` (SDXL): the second encoder's learned rows — both tokenizers
    register the placeholder at the same appended ids (identical 49408-BPE
    base vocabularies), so each table extends by its own rows.
    """
    out = dict(params)
    out["text_encoder"] = _extend_table(params["text_encoder"], rows)
    if rows2 is not None:
        if "text_encoder_2" not in params:
            raise ValueError("rows2 given but params carry no "
                             "text_encoder_2 — a dual-encoder embedding "
                             "cannot merge into a single-encoder model")
        out["text_encoder_2"] = _extend_table(params["text_encoder_2"],
                                              rows2)
    return out


# ---------------------------------------------------------------------------
# serialization: one portable .npz per learned embedding


def save_ti(path: str, rows, token: str, ids: List[int],
            rows2=None) -> None:
    """``rows2``: the second encoder's rows for a dual-encoder (SDXL)
    embedding — same (n_vectors, hidden2) row order as ``rows``."""
    meta = json.dumps({"token": token, "ids": list(map(int, ids)),
                       "dual": rows2 is not None,
                       "format": "sdbc_ti_v1"})
    arrays = {"rows": np.asarray(rows, np.float32),
              "__meta__": np.frombuffer(meta.encode(), np.uint8)}
    if rows2 is not None:
        arrays["rows2"] = np.asarray(rows2, np.float32)
    np.savez(path, **arrays)


def load_ti(path: str) -> Tuple[jnp.ndarray, dict]:
    """→ (rows fp32, {"token", "ids", ["rows2"], ...}).

    A dual-encoder (SDXL) embedding carries its second-table rows in
    ``meta["rows2"]`` (fp32 array) — key absent for single-encoder files.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        rows = jnp.asarray(z["rows"], jnp.float32)
        if "rows2" in z:
            meta["rows2"] = jnp.asarray(z["rows2"], jnp.float32)
    if rows.ndim != 2 or len(meta.get("ids", ())) != rows.shape[0]:
        raise ValueError(f"malformed textual-inversion file {path}: "
                         f"rows {rows.shape} vs ids {meta.get('ids')}")
    if "rows2" in meta and meta["rows2"].shape[0] != rows.shape[0]:
        raise ValueError(f"malformed textual-inversion file {path}: "
                         f"rows2 {meta['rows2'].shape} disagrees with "
                         f"rows {rows.shape} on the vector count")
    return rows, meta


def merge_file(params: dict, path: str) -> Tuple[dict, dict]:
    """Load ``path`` and merge → (params, meta).  Serving entry point.

    Raises unless the placeholder ids are exactly the appended positions
    (base_vocab..base_vocab+n-1) — anything else means the embedding was
    trained against a different tokenizer registration order.  Dual-encoder
    files require a dual-encoder model and vice versa (a silent half-merge
    would condition one encoder on untrained rows).
    """
    rows, meta = load_ti(path)
    base = params["text_encoder"]["token_embedding"]["table"].shape[0]
    want = list(range(base, base + rows.shape[0]))
    if list(meta["ids"]) != want:
        raise ValueError(
            f"textual-inversion ids {meta['ids']} do not continue this "
            f"model's embedding table (vocab {base}, expected {want}) — "
            "trained against a different base?")
    rows2 = meta.get("rows2")
    if rows2 is None and "text_encoder_2" in params:
        raise ValueError(
            "single-encoder textual-inversion file on a dual-encoder "
            "(SDXL) model — the second encoder would tokenize the "
            "placeholder into untrained rows; train with the SDXL family")
    if rows2 is not None and "text_encoder_2" in params:
        base2 = params["text_encoder_2"]["token_embedding"]["table"].shape[0]
        if base2 != base:
            raise ValueError(
                f"the two encoders' vocabularies differ ({base} vs "
                f"{base2}) — the shared placeholder ids cannot index both "
                "appended row blocks")
    return merge(params, rows, rows2=rows2), meta


def added_tokens_entry(meta: dict) -> Dict[str, List[int]]:
    """added_tokens.json payload for a loaded ti meta dict."""
    return {meta["token"]: list(map(int, meta["ids"]))}
