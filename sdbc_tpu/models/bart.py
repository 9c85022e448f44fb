"""BART-family seq2seq summarizer (DistilBART-CNN shapes) + beam search.

Replaces the reference's prompt summarizer ``sshleifer/distilbart-cnn-12-6``
(inference.py:293-318, finetune_sd.py:223-245, SURVEY.md E7): the book
description is summarized (beam search num_beams=3, min_length=2,
max_length≈15) and substituted into a summary placeholder template.

From-scratch functional JAX implementation of the BART architecture:
post-LN transformer encoder/decoder, learned positional embeddings with
BART's +2 offset, tied input/output embeddings, GELU FFNs.  Decoding runs a
jitted per-step decoder under a host loop with fixed-size beams.

Weights port from a local transformers checkpoint via ``port_bart``
(models/port.py conventions); without files a tiny random config still
exercises the full path (tests do cross-parity against transformers' BART).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.ops import nn
from sdbc_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class BartConfig:
    vocab_size: int = 50264
    d_model: int = 1024
    encoder_layers: int = 12
    decoder_layers: int = 6
    heads: int = 16
    ffn: int = 4096
    max_pos: int = 1024
    pos_offset: int = 2          # BART's learned-position offset
    pad_id: int = 1
    bos_id: int = 0
    eos_id: int = 2
    decoder_start_id: int = 2    # BART convention: decoder starts with </s>
    # HF generation forces <s> as the first GENERATED token
    # (forced_bos_token_id=0 in the distilbart-cnn config): every decoder
    # sequence is [</s>, <s>, ...] — the prefix the model was trained on
    forced_bos_id: int = 0
    # ...and </s> as the last token when max_length is reached
    # (forced_eos_token_id=2)
    forced_eos_id: int = 2

    @staticmethod
    def distilbart_cnn() -> "BartConfig":
        return BartConfig()

    @staticmethod
    def tiny() -> "BartConfig":
        return BartConfig(vocab_size=128, d_model=32, encoder_layers=2,
                          decoder_layers=2, heads=4, ffn=64, max_pos=64)


def _init_attn(key, cfg):
    d = cfg.d_model
    ks = jax.random.split(key, 4)
    return {"q": nn.init_linear(ks[0], d, d), "k": nn.init_linear(ks[1], d, d),
            "v": nn.init_linear(ks[2], d, d), "o": nn.init_linear(ks[3], d, d)}


def _init_layer(key, cfg, cross: bool):
    ks = jax.random.split(key, 4)
    p = {
        "self_attn": _init_attn(ks[0], cfg),
        "self_ln": nn.init_layer_norm(cfg.d_model),
        "fc1": nn.init_linear(ks[1], cfg.d_model, cfg.ffn),
        "fc2": nn.init_linear(ks[2], cfg.ffn, cfg.d_model),
        "final_ln": nn.init_layer_norm(cfg.d_model),
    }
    if cross:
        p["cross_attn"] = _init_attn(ks[3], cfg)
        p["cross_ln"] = nn.init_layer_norm(cfg.d_model)
    return p


def init(key, cfg: BartConfig):
    ks = iter(jax.random.split(key, cfg.encoder_layers + cfg.decoder_layers + 4))
    return {
        "shared_embedding": nn.init_embedding(next(ks), cfg.vocab_size,
                                              cfg.d_model),
        "enc_pos": nn.init_embedding(next(ks), cfg.max_pos + cfg.pos_offset,
                                     cfg.d_model),
        "dec_pos": nn.init_embedding(next(ks), cfg.max_pos + cfg.pos_offset,
                                     cfg.d_model),
        "enc_ln_emb": nn.init_layer_norm(cfg.d_model),
        "dec_ln_emb": nn.init_layer_norm(cfg.d_model),
        "encoder": [_init_layer(next(ks), cfg, cross=False)
                    for _ in range(cfg.encoder_layers)],
        "decoder": [_init_layer(next(ks), cfg, cross=True)
                    for _ in range(cfg.decoder_layers)],
    }


def _mha(p, x, kv, heads, mask=None, causal=False):
    b, s, d = x.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    # BART scales the query by d_head**-0.5 before the matmul
    q = split(nn.linear(p["q"], x)) * (hd ** -0.5)
    k = split(nn.linear(p["k"], kv))
    v = split(nn.linear(p["v"], kv))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    sq, sk = logits.shape[-2], logits.shape[-1]
    if causal:
        cm = jnp.tril(jnp.ones((sq, sk), bool))
        logits = jnp.where(cm, logits, -1e9)
    if mask is not None:  # (b, sk) True=keep
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                     preferred_element_type=x.dtype)
    return nn.linear(p["o"], out.transpose(0, 2, 1, 3).reshape(b, s, d))


def _ffn(p, x):
    return nn.linear(p["fc2"], jax.nn.gelu(nn.linear(p["fc1"], x),
                                           approximate=False))


def encode(params, ids, cfg: BartConfig, mask=None):
    """ids: (B, S) → encoder states (B, S, d).  mask True=real token."""
    if mask is None:
        mask = ids != cfg.pad_id
    x = nn.embedding(params["shared_embedding"], ids)
    pos = params["enc_pos"]["table"][cfg.pos_offset:
                                     cfg.pos_offset + ids.shape[1]]
    x = nn.layer_norm(params["enc_ln_emb"], x + pos[None])
    for lp in params["encoder"]:
        x = nn.layer_norm(lp["self_ln"],
                          x + _mha(lp["self_attn"], x, x, cfg.heads, mask=mask))
        x = nn.layer_norm(lp["final_ln"], x + _ffn(lp, x))
    return x


def decode_logits(params, dec_ids, enc_states, cfg: BartConfig,
                  enc_mask=None):
    """Full-prefix decoder forward → logits (B, T, vocab)."""
    x = nn.embedding(params["shared_embedding"], dec_ids)
    pos = params["dec_pos"]["table"][cfg.pos_offset:
                                     cfg.pos_offset + dec_ids.shape[1]]
    x = nn.layer_norm(params["dec_ln_emb"], x + pos[None])
    for lp in params["decoder"]:
        x = nn.layer_norm(lp["self_ln"],
                          x + _mha(lp["self_attn"], x, x, cfg.heads,
                                   causal=True))
        x = nn.layer_norm(lp["cross_ln"],
                          x + _mha(lp["cross_attn"], x, enc_states, cfg.heads,
                                   mask=enc_mask))
        x = nn.layer_norm(lp["final_ln"], x + _ffn(lp, x))
    return jnp.dot(x, params["shared_embedding"]["table"].T.astype(x.dtype))


# ---------------------------------------------------------------------------
# beam search (fixed shapes; ONE jitted step, host-controlled loop)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _beam_step(params, dec_ids, enc_states, enc_mask, cfg, step):
    # full fixed-width decode + dynamic row read: the causal mask makes
    # positions > step irrelevant to position step's logits, so this is
    # exact AND compiles once (a static per-step slice would compile
    # max_length separate decoder graphs)
    logits = decode_logits(params, dec_ids, enc_states, cfg, enc_mask)
    row = jax.lax.dynamic_index_in_dim(logits, step, axis=1, keepdims=False)
    return jax.nn.log_softmax(row.astype(jnp.float32), axis=-1)


def beam_search(params, input_ids: np.ndarray, cfg: BartConfig, *,
                num_beams: int = 3, max_length: int = 15,
                min_length: int = 2) -> np.ndarray:
    """Summarize one sequence → best token ids (reference beam settings,
    inference.py:313-318: num_beams=3, min_length=2, max_length≈15)."""
    input_ids = np.atleast_2d(input_ids)
    assert input_ids.shape[0] == 1, "one description at a time"
    enc_mask = jnp.asarray(input_ids != cfg.pad_id)
    enc = encode(params, jnp.asarray(input_ids), cfg, enc_mask)
    enc = jnp.repeat(enc, num_beams, axis=0)
    enc_mask_b = jnp.repeat(enc_mask, num_beams, axis=0)

    beams = np.full((num_beams, max_length + 1), cfg.pad_id, np.int32)
    beams[:, 0] = cfg.decoder_start_id
    scores = np.array([0.0] + [-1e9] * (num_beams - 1), np.float64)
    finished: list = []

    for step in range(max_length):
        logp = np.array(_beam_step(params, jnp.asarray(beams), enc,
                                   enc_mask_b, cfg,
                                   jnp.int32(step)))  # writable copy
        if step == 0 and cfg.forced_bos_id is not None:
            # HF's ForcedBOSTokenLogitsProcessor: only <s> is allowed as
            # the first generated token (keeps its own logprob)
            keep = logp[:, cfg.forced_bos_id].copy()
            logp[:, :] = -1e9
            logp[:, cfg.forced_bos_id] = keep
        if step == max_length - 1 and cfg.forced_eos_id is not None:
            # HF's ForcedEOSTokenLogitsProcessor: sequences reaching
            # max_length end with </s>
            keep = logp[:, cfg.forced_eos_id].copy()
            logp[:, :] = -1e9
            logp[:, cfg.forced_eos_id] = keep
        if step + 1 < min_length:
            logp[:, cfg.eos_id] = -1e9
        total = scores[:, None] + logp  # (beams, vocab)
        flat = total.reshape(-1)
        top = np.argpartition(-flat, 2 * num_beams)[: 2 * num_beams]
        top = top[np.argsort(-flat[top])]

        new_beams, new_scores = [], []
        for idx in top:
            b, tok = divmod(int(idx), logp.shape[1])
            cand = beams[b].copy()
            cand[step + 1] = tok
            if tok == cfg.eos_id:
                finished.append((flat[idx] / (step + 1), cand))
            else:
                new_beams.append(cand)
                new_scores.append(flat[idx])
            if len(new_beams) == num_beams:
                break
        while len(new_beams) < num_beams:  # all candidates ended
            new_beams.append(beams[0])
            new_scores.append(-1e9)
        beams = np.stack(new_beams)
        scores = np.array(new_scores)
        if len(finished) >= num_beams:
            break

    if not finished:
        finished = [(scores[i] / max_length, beams[i])
                    for i in range(num_beams)]
    finished.sort(key=lambda x: -x[0])
    return finished[0][1]


class Summarizer:
    """Callable summarizer: description text → short summary text."""

    def __init__(self, params, cfg: BartConfig, tokenizer,
                 num_beams: int = 3, input_max: int = 1024):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.num_beams = num_beams
        self.input_max = min(input_max, cfg.max_pos)

    def __call__(self, text: str, max_length: int = 15,
                 min_length: int = 2) -> str:
        ids = np.asarray(self.tok.encode(text, self.input_max),
                         np.int32)[None]
        out = beam_search(self.params, ids, self.cfg,
                          num_beams=self.num_beams, max_length=max_length,
                          min_length=min_length)
        return self.tok.decode(out.tolist())
