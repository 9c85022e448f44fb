"""Textual inversion: placeholder tokenization, row training, checkpointing.

Beyond the reference (full-component fine-tuning only, finetune_sd.py:374-399);
train/textual_inversion.py learns new embedding rows for a placeholder token
(Gal et al. 2022) — the trainable tree is {"ti": {"rows": ...}} merged into
the frozen table inside the jitted loss.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.data.tokenizer import CLIPTokenizer
from sdbc_tpu.train import textual_inversion as ti
from sdbc_tpu.train.trainer import (
    TrainConfig, init_train_state, make_train_step, merged_params)


def _batch(cfg, tok, prompt, micro=2):
    ids = np.asarray(tok.encode(prompt, cfg.clip.ctx), np.int32)
    return {
        "pixel_values": jax.random.normal(
            jax.random.key(11), (1, micro, 32, 32, 3)) * 0.5,
        "input_ids": jnp.tile(jnp.asarray(ids)[None, None], (1, micro, 1)),
    }


# -- tokenizer placeholder registration -------------------------------------


def test_add_placeholder_ids_and_encode():
    tok = CLIPTokenizer.fallback(1000)
    ids = tok.add_placeholder("<cover-style>", 2)
    assert ids == [1000, 1001]
    assert tok.total_vocab == 1002
    # hash mode splits words into many char pieces — give the prompt room
    enc = tok.encode("a cover in the style of <cover-style>", 32)
    # both vector ids appear, in order
    pos = [enc.index(i) for i in ids]
    assert pos[1] == pos[0] + 1
    # idempotent re-registration; vector-count mismatch rejected
    assert tok.add_placeholder("<cover-style>", 2) == ids
    with pytest.raises(ValueError, match="already registered"):
        tok.add_placeholder("<cover-style>", 3)


def test_placeholder_survives_lowercasing_and_neighbors():
    tok = CLIPTokenizer.fallback(500)
    (pid,) = tok.add_placeholder("<SKS>")  # registered lowercased
    enc = tok.encode("style:<SKS>, art", 16)
    assert pid in enc
    # surrounding text still tokenizes (not swallowed by the split):
    # pieces exist on BOTH sides of the placeholder inside bot..eot
    pos = enc.index(pid)
    assert 1 < pos < enc.index(tok.eot_id) - 1
    assert tok.encode("<sks>", 8)[1] == pid


def test_added_tokens_json_roundtrip(tmp_path):
    d = tmp_path / "tokdir"
    d.mkdir()
    # minimal real-format vocab: "a", "b" as whole words
    vocab = {"a</w>": 0, "b</w>": 1, "<|startoftext|>": 2, "<|endoftext|>": 3}
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    with open(d / "added_tokens.json", "w") as f:
        json.dump({"<s1>": [4, 5], "<s2>": 6}, f)  # ours + HF int form
    tok = CLIPTokenizer.from_pretrained(str(d))
    assert tok.added_tokens == {"<s1>": [4, 5], "<s2>": [6]}
    enc = tok.encode("a <s1> b <s2>", 10)
    assert enc[:7] == [2, 0, 4, 5, 1, 6, 3]
    assert "<s1>" in tok.decode(enc) and "<s2>" in tok.decode(enc)


# -- rows init + merge -------------------------------------------------------


def test_init_rows_and_merge(tiny_cfg, tiny_params):
    table = tiny_params["text_encoder"]["token_embedding"]["table"]
    rows = ti.init_rows(table, 2, init_ids=[7, 9])
    want = np.asarray(table)[[7, 9]].mean(0)
    np.testing.assert_allclose(np.asarray(rows[0]), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(rows[1]), want, rtol=1e-6)
    mean_rows = ti.init_rows(table, 1)
    np.testing.assert_allclose(np.asarray(mean_rows[0]),
                               np.asarray(table).mean(0), rtol=1e-5)

    merged = ti.merge(tiny_params, rows)
    mt = merged["text_encoder"]["token_embedding"]["table"]
    assert mt.shape[0] == table.shape[0] + 2
    np.testing.assert_allclose(np.asarray(mt[table.shape[0]]),
                               np.asarray(rows[0]), rtol=1e-6)
    # base table untouched
    np.testing.assert_array_equal(np.asarray(mt[: table.shape[0]]),
                                  np.asarray(table))


# -- training ----------------------------------------------------------------


def test_ti_training_moves_only_rows(tiny_cfg, tiny_params):
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    tok.add_placeholder("<cover-style>")
    tcfg = TrainConfig(train_unet=False, train_text_encoder=False,
                       grad_accum=1, learning_rate=1e-2, num_examples=100,
                       ti_token="<cover-style>", ti_vectors=1)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32,
                             ti_init_ids=[5])
    assert set(state.trainable) == {"ti"}
    assert state.trainable["ti"]["rows"].shape == (1, tiny_cfg.clip.hidden)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    # short prompt: tiny ctx=16 + hash-mode char pieces would truncate the
    # placeholder out of a long one (the CLI warns on exactly this)
    batch = _batch(tiny_cfg, tok, "a <cover-style> cover")
    assert 1000 in list(np.asarray(batch["input_ids"]).ravel())
    key = jax.random.key(42)
    losses = []
    r0 = np.asarray(state.trainable["ti"]["rows"]).copy()
    for _ in range(5):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.abs(np.asarray(state.trainable["ti"]["rows"]) - r0).max() > 0
    # frozen base untouched; merged tree has the enlarged table
    np.testing.assert_array_equal(
        np.asarray(state.frozen["text_encoder"]["token_embedding"]["table"]),
        np.asarray(tiny_params["text_encoder"]["token_embedding"]["table"]))
    mt = merged_params(state)["text_encoder"]["token_embedding"]["table"]
    assert mt.shape[0] == tiny_cfg.clip.vocab_size + 1


def test_ti_prompt_without_placeholder_has_no_gradient(tiny_cfg, tiny_params):
    """A batch whose prompts never reference the placeholder gives zero
    gradient to the rows — the inversion trains only through its token."""
    tok = CLIPTokenizer.fallback(tiny_cfg.clip.vocab_size)
    tok.add_placeholder("<cover-style>")
    tcfg = TrainConfig(train_unet=False, train_text_encoder=False,
                       grad_accum=1, learning_rate=1e-2, num_examples=100,
                       ti_token="<cover-style>", ti_vectors=1)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    r0 = np.asarray(state.trainable["ti"]["rows"]).copy()
    state, _ = step(state, _batch(tiny_cfg, tok, "a plain book cover"),
                    jax.random.key(0))
    # AdamW weight decay still shrinks the rows; isolate the data gradient
    # by comparing against pure-decay evolution: with zero grad, Adam's
    # update is 0/sqrt(0+eps) = 0 plus decay*lr*param
    moved = np.abs(np.asarray(state.trainable["ti"]["rows"]) - r0).max()
    decay_only = np.abs(r0).max() * 1e-2 * 1e-4 * 2  # lr*wd, generous bound
    assert moved <= decay_only + 1e-12, (moved, decay_only)


# -- checkpoint --------------------------------------------------------------


def test_ckpt_roundtrip_merges_ti(tiny_cfg, tiny_params, tmp_path):
    from sdbc_tpu.utils import checkpoint as ck

    rows = ti.init_rows(
        tiny_params["text_encoder"]["token_embedding"]["table"], 2,
        init_ids=[3])
    rows = rows + 0.5  # make them distinguishable
    base_vocab = tiny_cfg.clip.vocab_size
    ids = [base_vocab, base_vocab + 1]
    path = str(tmp_path / "ti_ck")
    ck.save_pipeline(path, tiny_params, tiny_cfg, metadata={"step": 1},
                     ti=(np.asarray(rows), "<cover-style>", ids))
    assert os.path.exists(os.path.join(path, "ti.npz"))
    with open(os.path.join(path, "added_tokens.json")) as f:
        assert json.load(f) == {"<cover-style>": ids}

    params, cfg = ck.load_pipeline(path)
    assert cfg.clip.vocab_size == base_vocab + 2
    mt = params["text_encoder"]["token_embedding"]["table"]
    assert mt.shape[0] == base_vocab + 2
    np.testing.assert_allclose(np.asarray(mt[base_vocab:]),
                               np.asarray(rows), rtol=1e-6)
    # raw load for resume
    params_raw, cfg_raw = ck.load_pipeline(path, merge_ti=False)
    assert cfg_raw.clip.vocab_size == base_vocab
    assert params_raw["text_encoder"]["token_embedding"]["table"].shape[0] \
        == base_vocab


def test_merge_file_rejects_mismatched_base(tiny_cfg, tiny_params, tmp_path):
    p = str(tmp_path / "ti.npz")
    rows = np.zeros((1, tiny_cfg.clip.hidden), np.float32)
    ti.save_ti(p, rows, "<x>", [12345])  # wrong id for this base
    with pytest.raises(ValueError, match="embedding table"):
        ti.merge_file(tiny_params, p)


# -- CLI ---------------------------------------------------------------------


def test_cli_ti_train_resume_and_serve(tmp_path):
    from tests.data_fixtures import build_fake_dataset

    import sdbc_tpu.cli.finetune as ft
    import sdbc_tpu.cli.inference as inf

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    build_fake_dataset(root, n_train=8, n_test=2, img_size=32)
    argv = ["--tiny", "--data_root", root, "--img_size", "32",
            "--batch_size", "1", "--grad_acc_steps", "1",
            "--num_examples", "8", "--learning_rate", "5e-3", "--no-bf16",
            "--output_dir", out, "--run_id", "ti",
            "--ti_token", "<cover-style>", "--ti_init_token", "cover"]
    ft.main(argv + ["--epochs", "1"])
    run_dir = os.path.join(out, "runs", "ti")
    latest = max((d for d in os.listdir(run_dir) if d.startswith("ckpt-")),
                 key=lambda d: int(d.split("-")[1]))
    cdir = os.path.join(run_dir, latest)
    assert os.path.exists(os.path.join(cdir, "ti.npz"))
    assert os.path.exists(os.path.join(cdir, "added_tokens.json"))

    ft.main(argv + ["--epochs", "2", "--resume"])
    latest2 = max((d for d in os.listdir(run_dir) if d.startswith("ckpt-")),
                  key=lambda d: int(d.split("-")[1]))
    assert int(latest2.split("-")[1]) > int(latest.split("-")[1])

    # serve: the placeholder composes into an arbitrary prompt
    inf.main(["--mode", "enter_prompt",
              "--prompt", "a cookbook, in the style of <cover-style>",
              "--tiny", "--ckpt", os.path.join(run_dir, latest2),
              "--img_size", "32", "--num_inference_steps", "2", "--no-bf16",
              "--save_dir", out + "/gen", "--run_id", "ti"])
    outdir = os.path.join(out, "gen", "ti inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))


def test_cli_ti_rejects_lora_and_ema(tmp_path):
    from sdbc_tpu.cli import finetune

    base = ["--tiny", "--data_root", str(tmp_path), "--ti_token", "<x>"]
    with pytest.raises(SystemExit, match="mutually exclusive"):
        finetune.main(base + ["--lora_rank", "2"])
    with pytest.raises(SystemExit, match="ema"):
        finetune.main(base + ["--ema_decay", "0.999"])


def test_cli_ti_path_serves_onto_fresh_base(tmp_path):
    """--ti_path merges a portable ti.npz onto ANY resolved base (the
    --lora_path symmetry): tokenizer registers the token, table grows."""
    from tests.data_fixtures import build_fake_dataset

    import sdbc_tpu.cli.finetune as ft
    import sdbc_tpu.cli.inference as inf

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    build_fake_dataset(root, n_train=8, n_test=2, img_size=32)
    ft.main(["--tiny", "--data_root", root, "--img_size", "32",
             "--batch_size", "1", "--grad_acc_steps", "1",
             "--num_examples", "8", "--learning_rate", "5e-3", "--no-bf16",
             "--output_dir", out, "--run_id", "tip", "--epochs", "1",
             "--ti_token", "<cover-style>"])
    run_dir = os.path.join(out, "runs", "tip")
    latest = max((d for d in os.listdir(run_dir) if d.startswith("ckpt-")),
                 key=lambda d: int(d.split("-")[1]))
    ti_npz = os.path.join(run_dir, latest, "ti.npz")

    inf.main(["--mode", "enter_prompt",
              "--prompt", "a fresh base, in the style of <cover-style>",
              "--tiny", "--ti_path", ti_npz, "--img_size", "32",
              "--num_inference_steps", "2", "--no-bf16",
              "--save_dir", out + "/gen", "--run_id", "tip"])
    outdir = os.path.join(out, "gen", "tip inference")
    assert any(f.endswith(".png") for f in os.listdir(outdir))


# -- dual-encoder (SDXL) -------------------------------------------------------


def test_dual_save_load_merge(tiny_cfg, tiny_params, tmp_path):
    """rows2 roundtrips through ti.npz; merge extends both tables; a
    dual file on a single-encoder model (and vice versa) is rejected."""
    import dataclasses

    import jax

    from sdbc_tpu.models import clip as clip_mod

    vocab = tiny_cfg.clip.vocab_size
    clip2_cfg = dataclasses.replace(tiny_cfg.clip, hidden=64, heads=4,
                                    mlp=128)
    xl_params = dict(tiny_params)
    xl_params["text_encoder_2"] = clip_mod.init(jax.random.key(7), clip2_cfg)

    rows = np.full((2, tiny_cfg.clip.hidden), 0.25, np.float32)
    rows2 = np.full((2, 64), -0.5, np.float32)
    p = str(tmp_path / "dual_ti.npz")
    ti.save_ti(p, rows, "<xl>", [vocab, vocab + 1], rows2=rows2)
    loaded, meta = ti.load_ti(p)
    assert meta["dual"] is True
    np.testing.assert_array_equal(np.asarray(meta["rows2"]), rows2)

    merged, meta2 = ti.merge_file(xl_params, p)
    t1 = merged["text_encoder"]["token_embedding"]["table"]
    t2 = merged["text_encoder_2"]["token_embedding"]["table"]
    assert t1.shape[0] == vocab + 2 and t2.shape[0] == vocab + 2
    np.testing.assert_allclose(np.asarray(t1[vocab:]), rows, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(t2[vocab:]), rows2, rtol=1e-6)

    # dual file on a single-encoder model
    with pytest.raises(ValueError, match="text_encoder_2"):
        ti.merge_file(tiny_params, p)
    # single file on a dual-encoder model
    p2 = str(tmp_path / "single_ti.npz")
    ti.save_ti(p2, rows, "<xl>", [vocab, vocab + 1])
    with pytest.raises(ValueError, match="dual-encoder"):
        ti.merge_file(xl_params, p2)


def test_dual_ckpt_roundtrip_bumps_both_vocabs(tmp_path):
    """An SDXL TI checkpoint (4-tuple) reloads with both tables extended,
    both vocab sizes bumped, and eot_id pinned to the true eos."""
    import jax

    from sdbc_tpu.diffusion.pipeline import PipelineConfig
    from sdbc_tpu.models import clip as clip_mod
    from sdbc_tpu.models import unet as unet_mod
    from sdbc_tpu.models import vae as vae_mod
    from sdbc_tpu.utils import checkpoint as ck

    cfg = PipelineConfig.tiny_xl()
    ks = jax.random.split(jax.random.key(3), 4)
    params = {"text_encoder": clip_mod.init(ks[0], cfg.clip),
              "text_encoder_2": clip_mod.init(ks[1], cfg.clip2),
              "unet": unet_mod.init(ks[2], cfg.unet),
              "vae": vae_mod.init(ks[3], cfg.vae)}
    vocab = cfg.clip.vocab_size
    rows = np.full((1, cfg.clip.hidden), 0.125, np.float32)
    rows2 = np.full((1, cfg.clip2.hidden), -0.125, np.float32)
    path = str(tmp_path / "xl_ti_ck")
    ck.save_pipeline(path, params, cfg, metadata={"step": 1},
                     ti=(rows, "<xl>", [vocab], rows2))
    loaded, lcfg = ck.load_pipeline(path)
    assert lcfg.clip.vocab_size == vocab + 1
    assert lcfg.clip2.vocab_size == cfg.clip2.vocab_size + 1
    assert lcfg.clip.eot_id == vocab - 1
    assert lcfg.clip2.eot_id == cfg.clip2.vocab_size - 1
    assert loaded["text_encoder"]["token_embedding"]["table"].shape[0] \
        == vocab + 1
    assert loaded["text_encoder_2"]["token_embedding"]["table"].shape[0] \
        == cfg.clip2.vocab_size + 1
