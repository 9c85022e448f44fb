"""Prompt emphasis parsing + chunked long-prompt encoding + pipeline wiring."""
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.prompt_weights import (batch_encode_weighted,
                                          encode_weighted,
                                          parse_weighted_prompt)
from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.diffusion.pipeline import SDPipeline, sample
from sdbc_tpu.utils.prng import per_sample_fixed_latents


# ---------------------------------------------------------------- parser

def test_parse_plain():
    assert parse_weighted_prompt("a book cover") == [("a book cover", 1.0)]


def test_parse_emphasis_levels():
    out = parse_weighted_prompt("a (big) cat")
    assert out == [("a ", 1.0), ("big", pytest.approx(1.1)),
                   (" cat", 1.0)]
    out = parse_weighted_prompt("((very)) big")
    assert out[0] == ("very", pytest.approx(1.21))


def test_parse_deemphasis_and_explicit():
    out = parse_weighted_prompt("[dull] and (sharp:1.5)")
    assert out[0] == ("dull", pytest.approx(1.0 / 1.1))
    assert out[-1] == ("sharp", pytest.approx(1.5))


def test_parse_nested_explicit():
    # explicit weight multiplies into the surrounding emphasis level
    out = parse_weighted_prompt("((inner:2.0) outer)")
    assert ("inner", pytest.approx(2.2)) in out
    assert ("outer", pytest.approx(1.1)) in [(t.strip(), w) for t, w in out]


def test_parse_escapes_are_literal():
    out = parse_weighted_prompt(r"a \(literal\) bracket")
    assert out == [("a (literal) bracket", 1.0)]


def test_parse_unbalanced_degrades():
    # unmatched opener: applies to the rest; unmatched closer: literal
    assert parse_weighted_prompt("(rest of prompt") == \
        [("rest of prompt", pytest.approx(1.1))]
    assert parse_weighted_prompt("a ) b") == [("a ) b", 1.0)]


def test_parse_colon_without_number():
    out = parse_weighted_prompt("(title: subtitle)")
    assert out == [("title: subtitle", pytest.approx(1.1))]


def test_parse_adjacent_equal_weights_merge():
    out = parse_weighted_prompt("a (b:1.0) c")
    assert out == [("a b c", 1.0)]


# ------------------------------------------------------------- encoding

@pytest.fixture(scope="module")
def tok():
    return CLIPTokenizer.fallback(1000)


def test_encode_single_chunk_layout(tok):
    ids, w = encode_weighted(tok, "a (cat:1.5)", ctx=16)
    assert ids.shape == w.shape == (16,)
    assert ids[0] == tok.bot_id
    plain = tok.encode("a cat", max_length=16)
    np.testing.assert_array_equal(ids, plain)  # same ids, only weights differ
    assert w[0] == 1.0 and w[-1] == 1.0
    assert 1.5 in w


def test_encode_weights_align_with_tokens(tok):
    ids, w = encode_weighted(tok, "(alpha:2.0) beta", ctx=16)
    n_alpha = len(tok._token_ids("alpha"))
    np.testing.assert_allclose(w[1:1 + n_alpha], 2.0)
    assert w[1 + n_alpha] == 1.0  # beta's first token


def test_encode_long_prompt_chunks(tok):
    words = " ".join(f"word{i}" for i in range(30))
    ids, w = encode_weighted(tok, words, ctx=16, max_chunks=3)
    assert ids.shape[0] % 16 == 0 and ids.shape[0] > 16
    # every window framed with BOS
    for c in range(ids.shape[0] // 16):
        assert ids[c * 16] == tok.bot_id


def test_encode_truncates_at_max_chunks(tok):
    words = " ".join(f"w{i}" for i in range(200))
    ids, _ = encode_weighted(tok, words, ctx=16, max_chunks=2)
    assert ids.shape == (32,)


def test_batch_encode_pads_to_common_width(tok):
    long = " ".join(f"w{i}" for i in range(30))
    ids, w = batch_encode_weighted(tok, ["short", long], ctx=16, max_chunks=3)
    assert ids.shape == w.shape and ids.shape[0] == 2
    assert ids.shape[1] > 16 and ids.shape[1] % 16 == 0
    # the short row's padding windows are BOS+EOS+pad, weight 1
    assert ids[0, 16] == tok.bot_id and ids[0, 17] == tok.eot_id
    np.testing.assert_allclose(w[0, 16:], 1.0)


def test_batch_encode_min_chunks(tok):
    ids, _ = batch_encode_weighted(tok, ["a"], ctx=16, min_chunks=3)
    assert ids.shape == (1, 48)


# ------------------------------------------------------------- pipeline

@pytest.fixture(scope="module")
def pipe(tiny_cfg, tiny_params):
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    return SDPipeline(tiny_params, tiny_cfg, tok, compute_dtype=jnp.float32)


def test_weighting_noop_is_bit_identical(pipe):
    """A prompt with no emphasis markers: prompt_weighting=True must yield
    the exact same images (all-ones weights multiply by 1.0, the mean
    ratio is exactly 1.0)."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=3)
    a = pipe(["a book cover"], num_inference_steps=2, latents=lat)
    b = pipe(["a book cover"], num_inference_steps=2, latents=lat,
             prompt_weighting=True)
    np.testing.assert_array_equal(a, b)


def test_emphasis_changes_output(pipe):
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=4)
    a = pipe(["a (red:1.8) cover"], num_inference_steps=2, latents=lat,
             prompt_weighting=True)
    b = pipe(["a red cover"], num_inference_steps=2, latents=lat,
             prompt_weighting=True)
    assert np.isfinite(a).all()
    assert not np.allclose(a, b)


def test_long_prompt_runs_and_uses_tail(pipe):
    """A >1-chunk prompt samples fine, and the tail chunk's content reaches
    the conditioning (differs from the truncated single-chunk encode)."""
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=5)
    words = " ".join(f"word{i}" for i in range(40))
    a = pipe([words], num_inference_steps=2, latents=lat,
             prompt_weighting=True, max_prompt_chunks=3)
    b = pipe([words], num_inference_steps=2, latents=lat,
             prompt_weighting=True, max_prompt_chunks=1)
    assert a.shape == b.shape
    assert np.isfinite(a).all()
    assert not np.allclose(a, b)


def test_negative_prompt_weighting(pipe):
    lat = per_sample_fixed_latents(1, (4, 8, 8), seed=6)
    a = pipe(["a cover"], negative_prompt="(blurry:1.9)",
             num_inference_steps=2, latents=lat, prompt_weighting=True)
    b = pipe(["a cover"], negative_prompt="blurry",
             num_inference_steps=2, latents=lat, prompt_weighting=True)
    assert not np.allclose(a, b)


def test_cond_uncond_width_mismatch_rejected(pipe, tiny_cfg, tiny_params):
    ctx = tiny_cfg.clip.ctx
    cond = jnp.zeros((1, 2 * ctx), jnp.int32)
    uncond = jnp.zeros((1, ctx), jnp.int32)
    lat = jnp.zeros((1, 8, 8, 4), jnp.float32)
    with pytest.raises(ValueError, match="widths differ"):
        sample(tiny_params, cond, uncond, lat, __import__("jax").random.key(0),
               7.5, cfg=tiny_cfg, num_inference_steps=2,
               compute_dtype=jnp.float32)
