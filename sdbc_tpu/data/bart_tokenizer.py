"""BART (GPT-2-style byte-level BPE) tokenizer — from-scratch implementation.

Removes the framework's last runtime dependency on transformers (round-1
VERDICT item 6/weakness 9): the reference summarization path tokenizes with
``AutoTokenizer.from_pretrained("sshleifer/distilbart-cnn-12-6")``
(inference.py:293-318); this module reproduces the RoBERTa/BART tokenizer
from local ``vocab.json`` + ``merges.txt`` files.

Differences from the CLIP BPE in data/tokenizer.py (machinery shared where
the schemes agree): no lowercasing, no ``</w>`` end-of-word marker, leading
spaces are part of the token (the Ġ convention via the byte→unicode map),
and the special tokens are BART's ``<s>/<pad>/</s>/<unk>``.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

from sdbc_tpu.data.tokenizer import _bytes_to_unicode, _get_pairs, hash_bucket


@functools.lru_cache()
def _gpt2_pattern():
    # the exact GPT-2/RoBERTa pre-tokenization pattern needs \p{L}/\p{N}
    # classes (third-party `regex`); fall back to an ASCII approximation on
    # stdlib `re` so --summarize keeps working in minimal environments
    # (same convention as data/tokenizer.py's CLIP pattern)
    try:
        import regex

        return regex.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|"""
            r""" ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
    except ImportError:
        import re
        import warnings

        # non-ASCII text (accented author names, curly quotes — common in
        # book descriptions) tokenizes differently under this approximation,
        # silently degrading --summarize output vs the trained checkpoint
        warnings.warn(
            "third-party 'regex' not available: BART pre-tokenization falls "
            "back to an ASCII approximation of the GPT-2 pattern; summaries "
            "of non-ASCII text will diverge from the trained checkpoint",
            stacklevel=2)
        return re.compile(
            r"""'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+|"""
            r""" ?[^\sa-zA-Z0-9]+|\s+(?!\S)|\s+""")


class BartTokenizer:
    """Byte-level BPE with BART special-token conventions.

    encode(text, max_length) mirrors the reference's
    ``tokenizer(description, max_length=1024, truncation=True,
    padding="max_length").input_ids`` (inference.py:313-314):
    ``<s> tokens </s>`` truncated to max_length, padded with ``<pad>``.
    """

    BOS, PAD, EOS, UNK = "<s>", "<pad>", "</s>", "<unk>"

    def __init__(self, vocab: Optional[Dict[str, int]] = None,
                 merges: Optional[List[Tuple[str, str]]] = None,
                 vocab_size: int = 50264):
        self.byte_encoder = _bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        if vocab is not None:
            self.encoder = dict(vocab)
            self.bpe_ranks = {m: i for i, m in enumerate(merges or [])}
            self.hash_mode = False
            self.vocab_size = max(len(self.encoder), vocab_size)
        else:
            # deterministic zero-egress fallback (not BART-compatible)
            self.encoder = {self.BOS: 0, self.PAD: 1, self.EOS: 2, self.UNK: 3}
            self.bpe_ranks = {}
            self.hash_mode = True
            self.vocab_size = vocab_size
        for tok, default in ((self.BOS, 0), (self.PAD, 1), (self.EOS, 2),
                             (self.UNK, 3)):
            self.encoder.setdefault(tok, default)
        self.bos_id = self.encoder[self.BOS]
        self.pad_id = self.encoder[self.PAD]
        self.eos_id = self.encoder[self.EOS]
        self.unk_id = self.encoder[self.UNK]
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.cache: Dict[str, str] = {}

    # -- loading --------------------------------------------------------

    @classmethod
    def from_pretrained(cls, path: str) -> "BartTokenizer":
        with open(os.path.join(path, "vocab.json")) as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(os.path.join(path, "merges.txt")) as f:
            lines = f.read().split("\n")
        # INTENTIONAL divergence from HF, which drops the FIRST line of
        # merges.txt unconditionally ([1:-1]): we skip line 0 only when it is
        # the "#version: ..." header.  All published merges files carry the
        # header (identical behavior); only a hand-built headerless file
        # differs, where keeping line 0 as a real merge is the safer reading
        # ('#' can begin a legitimate rule like "# #").  See
        # tests/test_bart_tokenizer.py::test_headerless_merges_divergence.
        if lines and lines[0].startswith("#version"):
            lines = lines[1:]
        for line in lines:
            if not line.strip():
                continue
            a, _, b = line.partition(" ")
            merges.append((a, b.strip()))
        return cls(vocab=vocab, merges=merges)

    @classmethod
    def fallback(cls, vocab_size: int = 50264) -> "BartTokenizer":
        return cls(vocab=None, vocab_size=vocab_size)

    # -- BPE (no end-of-word marker, unlike CLIP) -------------------------

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        pairs = _get_pairs(word)
        if not pairs:
            return token
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def _token_ids(self, text: str) -> List[int]:
        ids: List[int] = []
        for tok in _gpt2_pattern().findall(text):
            tok_bytes = "".join(self.byte_encoder[b]
                                for b in tok.encode("utf-8"))
            for piece in self._bpe(tok_bytes).split(" "):
                if self.hash_mode:
                    ids.append(4 + hash_bucket(piece, self.vocab_size - 4))
                else:
                    ids.append(self.encoder.get(piece, self.unk_id))
        return ids

    # -- public API -------------------------------------------------------

    def encode(self, text: str, max_length: int = 1024) -> List[int]:
        ids = ([self.bos_id] + self._token_ids(text)[: max_length - 2]
               + [self.eos_id])
        ids += [self.pad_id] * (max_length - len(ids))
        return ids

    def batch_encode(self, texts: Sequence[str], max_length: int = 1024):
        return [self.encode(t, max_length) for t in texts]

    def decode(self, ids: Sequence[int],
               skip_special_tokens: bool = True) -> str:
        # HF's skip_special_tokens removes ALL special ids, including <unk>
        special = {self.bos_id, self.pad_id, self.eos_id, self.unk_id}
        if self.hash_mode:
            return ""  # hash buckets are not invertible
        text = "".join(
            self.decoder.get(int(i), "") for i in ids
            if not (skip_special_tokens and int(i) in special))
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").strip()
