"""BART byte-level BPE tokenizer: cross-parity vs transformers.BartTokenizer.

With identical local vocab.json/merges.txt files the in-repo tokenizer must
produce transformers' exact input_ids — with the real distilbart files it
therefore reproduces the reference's AutoTokenizer ids
(inference.py:293-318)."""
import json
import os

import numpy as np
import pytest

from sdbc_tpu.data.bart_tokenizer import BartTokenizer


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    """Miniature GPT-2/BART byte-level vocab: specials first, then chars."""
    d = tmp_path_factory.mktemp("bart_tok")
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab[c] = len(vocab)
    vocab["Ġ"] = len(vocab)  # the byte-level space marker
    merges = [("b", "o"), ("o", "k"), ("bo", "ok"), ("Ġ", "b"), ("Ġ", "o")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


def test_matches_transformers_bart_tokenizer(vocab_dir):
    hf_mod = pytest.importorskip("transformers")

    hf = hf_mod.BartTokenizer(os.path.join(vocab_dir, "vocab.json"),
                              os.path.join(vocab_dir, "merges.txt"))
    ours = BartTokenizer.from_pretrained(vocab_dir)
    texts = ["book", "ok book", "book ok book", "a b c ok",
             "Book ok",           # uppercase byte → <unk> on both
             "zzz ok  book"]      # double space exercises the \s+ branch
    for text in texts:
        h = hf(text, padding="max_length", truncation=True,
               max_length=12)["input_ids"]
        o = ours.encode(text, max_length=12)
        assert h == o, (text, h, o)


def test_decode_roundtrip(vocab_dir):
    ours = BartTokenizer.from_pretrained(vocab_dir)
    ids = ours.encode("ok book", max_length=16)
    assert ids[0] == ours.bos_id and ours.eos_id in ids
    assert ids[-1] == ours.pad_id
    assert ours.decode(ids) == "ok book"


def test_truncation_keeps_eos(vocab_dir):
    ours = BartTokenizer.from_pretrained(vocab_dir)
    long = ours.encode("book " * 50, max_length=8)
    assert len(long) == 8
    assert long[0] == ours.bos_id and long[-1] == ours.eos_id


def test_fallback_deterministic():
    tok = BartTokenizer.fallback(2000)
    a = tok.encode("Some long description of a plot.", 64)
    assert a == tok.encode("Some long description of a plot.", 64)
    assert len(a) == 64
    assert all(0 <= i < 2000 for i in a)


def test_summarizer_accepts_inrepo_tokenizer(vocab_dir):
    """models/bart.Summarizer drives the in-repo tokenizer end-to-end."""
    import jax

    from sdbc_tpu.models import bart

    cfg = bart.BartConfig.tiny()
    params = bart.init(jax.random.key(0), cfg)
    tok = BartTokenizer.from_pretrained(vocab_dir)
    s = bart.Summarizer(params, cfg, tok, num_beams=2, input_max=16)
    out = s("book ok book", max_length=5)
    assert isinstance(out, str)


def test_hash_initial_merge_rules_kept(tmp_path):
    """Only the '#version' HEADER is skipped — '#'-initial merge rules are
    legitimate (e.g. "# #" in real GPT-2/RoBERTa merges files) and must load.

    Verified against transformers.BartTokenizer when available: both must
    merge "##" into one token.
    """
    import json as _json

    d = tmp_path / "tok"
    d.mkdir()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "#": 4, "##": 5,
             "a": 6}
    with open(d / "vocab.json", "w") as f:
        _json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n# #\n")
    tok = BartTokenizer.from_pretrained(str(d))
    assert tok.bpe_ranks == {("#", "#"): 0}
    ids = tok.encode("##", 6)
    assert ids[:3] == [0, 5, 2]  # <s> "##" </s> — merged, not two '#'
    try:
        from transformers import BartTokenizer as HFTok
    except ImportError:
        return
    hf = HFTok(str(d / "vocab.json"), str(d / "merges.txt"))
    assert hf("##")["input_ids"] == [0, 5, 2]


def test_headerless_merges_divergence(tmp_path):
    """Documented intentional divergence from HF: for a HEADERLESS merges.txt
    (never produced by HF's save_pretrained) we keep line 0 as a real merge,
    while HF drops the first line unconditionally ([1:-1])."""
    import json as _json

    d = tmp_path / "tok"
    d.mkdir()
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "a": 4, "b": 5,
             "ab": 6}
    with open(d / "vocab.json", "w") as f:
        _json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("a b\n")  # no #version header
    tok = BartTokenizer.from_pretrained(str(d))
    assert tok.bpe_ranks == {("a", "b"): 0}  # kept (HF would drop it)
    assert tok.encode("ab", 6)[:3] == [0, 6, 2]
