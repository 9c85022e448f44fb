"""BART summarizer tests: cross-parity vs transformers + beam search behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.models import bart


@pytest.fixture(scope="module")
def tiny_bart():
    cfg = bart.BartConfig.tiny()
    params = bart.init(jax.random.key(0), cfg)
    return params, cfg


def test_encoder_shapes(tiny_bart):
    params, cfg = tiny_bart
    ids = jnp.array([[0, 5, 6, 2, 1, 1]], jnp.int32)
    enc = bart.encode(params, ids, cfg)
    assert enc.shape == (1, 6, cfg.d_model)


def test_decoder_causality(tiny_bart):
    params, cfg = tiny_bart
    enc = bart.encode(params, jnp.array([[0, 5, 2]], jnp.int32), cfg)
    d1 = jnp.array([[2, 4, 7, 9]], jnp.int32)
    d2 = jnp.array([[2, 4, 8, 9]], jnp.int32)  # differs at position 2
    l1 = bart.decode_logits(params, d1, enc, cfg)
    l2 = bart.decode_logits(params, d2, enc, cfg)
    np.testing.assert_allclose(np.asarray(l1[:, :2]), np.asarray(l2[:, :2]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(l1[:, 2]), np.asarray(l2[:, 2]))


def test_parity_with_transformers_bart():
    torch = pytest.importorskip("torch")
    from transformers import BartConfig as HFBartConfig
    from transformers import BartForConditionalGeneration

    cfg = bart.BartConfig.tiny()
    hf = HFBartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.heads, decoder_attention_heads=cfg.heads,
        encoder_ffn_dim=cfg.ffn, decoder_ffn_dim=cfg.ffn,
        max_position_embeddings=cfg.max_pos, pad_token_id=cfg.pad_id,
        bos_token_id=cfg.bos_id, eos_token_id=cfg.eos_id,
        decoder_start_token_id=cfg.decoder_start_id, scale_embedding=False,
        activation_function="gelu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0)
    torch.manual_seed(0)
    model = BartForConditionalGeneration(hf).eval()
    from sdbc_tpu.models.port import port_bart

    params = port_bart({k: v.numpy() for k, v in model.state_dict().items()})

    ids = np.array([[0, 5, 9, 11, 2, 1, 1, 1]], np.int64)
    dec = np.array([[2, 0, 7, 9]], np.int64)
    with torch.no_grad():
        # explicit attention_mask: our encode always masks pad tokens
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy((ids != 1).astype(np.int64)),
                    decoder_input_ids=torch.from_numpy(dec)).logits.numpy()
    ours = np.asarray(bart.decode_logits(
        params, jnp.asarray(dec, jnp.int32),
        bart.encode(params, jnp.asarray(ids, jnp.int32), cfg),
        cfg, enc_mask=jnp.asarray(ids != cfg.pad_id)))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_beam_search_terminates_and_respects_min_length(tiny_bart):
    params, cfg = tiny_bart
    ids = np.array([[0, 5, 6, 7, 2]], np.int32)
    out = bart.beam_search(params, ids, cfg, num_beams=2, max_length=6,
                           min_length=2)
    assert out.shape == (7,)
    assert out[0] == cfg.decoder_start_id
    # no EOS before min_length tokens generated
    gen = list(out[1:])
    if cfg.eos_id in gen:
        assert gen.index(cfg.eos_id) >= 1


def test_generation_parity_with_transformers():
    """End-to-end beam-search parity vs HF generate() on the same ported
    tiny model — covers the forced-BOS first token (distilbart's
    forced_bos_token_id=0) that decode_logits parity alone can't see."""
    torch = pytest.importorskip("torch")
    from transformers import BartConfig as HFBartConfig
    from transformers import BartForConditionalGeneration

    cfg = bart.BartConfig.tiny()
    hf = HFBartConfig(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.heads, decoder_attention_heads=cfg.heads,
        encoder_ffn_dim=cfg.ffn, decoder_ffn_dim=cfg.ffn,
        max_position_embeddings=cfg.max_pos, pad_token_id=cfg.pad_id,
        bos_token_id=cfg.bos_id, eos_token_id=cfg.eos_id,
        decoder_start_token_id=cfg.decoder_start_id, scale_embedding=False,
        activation_function="gelu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, forced_bos_token_id=cfg.forced_bos_id)
    torch.manual_seed(1)
    model = BartForConditionalGeneration(hf).eval()
    from sdbc_tpu.models.port import port_bart

    params = port_bart({k: v.numpy() for k, v in model.state_dict().items()})

    ids = np.array([[0, 5, 9, 11, 17, 3, 2, 1]], np.int64)
    with torch.no_grad():
        ref = model.generate(
            torch.from_numpy(ids),
            attention_mask=torch.from_numpy((ids != 1).astype(np.int64)),
            num_beams=3, min_length=2, max_length=8,
            early_stopping=True).numpy()[0]
    ours = np.asarray(bart.beam_search(params, ids.astype(np.int32), cfg,
                                       num_beams=3, max_length=7,
                                       min_length=2))
    assert ours[0] == cfg.decoder_start_id
    assert ours[1] == cfg.forced_bos_id  # forced first generated token
    # full sequence parity with HF's beam search (same scoring rules)
    np.testing.assert_array_equal(ours[: len(ref)], ref)
