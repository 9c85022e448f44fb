"""EMA shadow weights: update math, checkpoint overlay, CLI wiring.

Beyond the reference (which serves the last raw checkpoint,
finetune_sd.py:511-545); EMA-of-trained-weights is the standard diffusion
practice the rebuild adds (TrainConfig.ema_decay, diffusers EMAModel
convention: decay ramped in as min(d, (1+t)/(10+t))).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.train.trainer import (
    TrainConfig, init_train_state, make_train_step, merged_params)


def _batch(cfg, accum=1, micro=2):
    return {
        "pixel_values": jax.random.normal(
            jax.random.key(11), (accum, micro, 32, 32, 3)) * 0.5,
        "input_ids": jnp.ones((accum, micro, cfg.clip.ctx), jnp.int32),
    }


def test_ema_matches_manual_recurrence(tiny_cfg, tiny_params):
    """state.ema == the hand-computed EMA of the master trajectory."""
    decay = 0.5
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True,
                       grad_accum=1, learning_rate=1e-3, num_examples=100,
                       ema_decay=decay)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    # shadow starts as a copy of the masters
    for e, p in zip(jax.tree.leaves(state.ema),
                    jax.tree.leaves(state.trainable)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _batch(tiny_cfg)
    expected = jax.tree.map(np.asarray, state.trainable)
    for t in range(1, 4):
        state, _ = step(state, batch, jax.random.key(t))
        d = min(decay, (1.0 + t) / (10.0 + t))
        expected = jax.tree.map(
            lambda e, p: e * d + np.asarray(p) * (1.0 - d),
            expected, state.trainable)
    for e, want in zip(jax.tree.leaves(state.ema),
                       jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(e), want, rtol=1e-6, atol=1e-7)
    # the shadow lags the masters (it is not just a copy)
    deltas = [float(np.max(np.abs(np.asarray(e) - np.asarray(p))))
              for e, p in zip(jax.tree.leaves(state.ema),
                              jax.tree.leaves(state.trainable))]
    assert max(deltas) > 0


def test_ema_off_keeps_none(tiny_cfg, tiny_params):
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True,
                       grad_accum=1, learning_rate=1e-3, num_examples=100)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    assert state.ema is None
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    state, _ = step(state, _batch(tiny_cfg), jax.random.key(0))
    assert state.ema is None
    with pytest.raises(ValueError, match="no EMA shadow"):
        merged_params(state, use_ema=True)


def test_merged_params_use_ema(tiny_cfg, tiny_params):
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True,
                       grad_accum=1, learning_rate=1e-2, num_examples=100,
                       ema_decay=0.9999)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    for t in range(2):
        state, _ = step(state, _batch(tiny_cfg), jax.random.key(t))
    raw = merged_params(state)
    ema = merged_params(state, use_ema=True)
    # frozen components identical; the trained component differs
    for leaf_r, leaf_e in zip(jax.tree.leaves(raw["vae"]),
                              jax.tree.leaves(ema["vae"])):
        np.testing.assert_array_equal(np.asarray(leaf_r), np.asarray(leaf_e))
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     raw["text_encoder"], ema["text_encoder"])
    assert max(jax.tree.leaves(d)) > 0


def test_checkpoint_roundtrip_overlays_ema(tiny_cfg, tiny_params, tmp_path):
    from sdbc_tpu.utils import checkpoint as ck

    tcfg = TrainConfig(train_unet=False, train_text_encoder=True,
                       grad_accum=1, learning_rate=1e-2, num_examples=100,
                       ema_decay=0.5)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    for t in range(2):
        state, _ = step(state, _batch(tiny_cfg), jax.random.key(t))

    path = str(tmp_path / "ck")
    ck.save_pipeline(path, merged_params(state), tiny_cfg,
                     metadata={"step": 2},
                     ema=jax.device_get(state.ema))
    # default load serves the EMA overlay
    served, _ = ck.load_pipeline(path)
    want = merged_params(state, use_ema=True)
    for a, b in zip(jax.tree.leaves(served["text_encoder"]),
                    jax.tree.leaves(want["text_encoder"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # use_ema=False returns the raw masters
    raw, _ = ck.load_pipeline(path, use_ema=False)
    wantr = merged_params(state)
    for a, b in zip(jax.tree.leaves(raw["text_encoder"]),
                    jax.tree.leaves(wantr["text_encoder"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # load_ema restores the shadow tree for resume
    shadow = ck.load_ema(path, template=jax.device_get(state.ema))
    for a, b in zip(jax.tree.leaves(shadow), jax.tree.leaves(state.ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert ck.load_ema(str(tmp_path / "nope")) is None


def test_ema_tree_rejects_non_component_keys(tiny_cfg, tiny_params, tmp_path):
    from sdbc_tpu.utils import checkpoint as ck

    with pytest.raises(ValueError, match="component subtrees"):
        ck.save_pipeline(str(tmp_path / "bad"), tiny_params, tiny_cfg,
                         ema={"lora": {"x": np.zeros(2)}})


def test_cli_ema_train_resume(tmp_path):
    """--ema_decay end-to-end: checkpoint gains ema/, resume restores it,
    and a second run continues the shadow rather than re-seeding."""
    from tests.data_fixtures import build_fake_dataset

    import sdbc_tpu.cli.finetune as ft
    from sdbc_tpu.utils import checkpoint as ck

    root = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    build_fake_dataset(root, n_train=8, n_test=2, img_size=32)
    argv = ["--tiny", "--data_root", root, "--img_size", "32",
            "--batch_size", "1", "--grad_acc_steps", "1",
            "--num_examples", "8", "--train_text_encoder",
            "--learning_rate", "1e-3", "--no-bf16",
            "--output_dir", out, "--run_id", "ema",
            "--ema_decay", "0.9"]
    ft.main(argv + ["--epochs", "1"])
    run_dir = os.path.join(out, "runs", "ema")
    latest = max((d for d in os.listdir(run_dir) if d.startswith("ckpt-")),
                 key=lambda d: int(d.split("-")[1]))
    cdir = os.path.join(run_dir, latest)
    assert os.path.isdir(os.path.join(cdir, "ema"))
    assert ck.load_metadata(cdir).get("ema_decay") == 0.9
    # raw != ema in the saved checkpoint
    served, _ = ck.load_pipeline(cdir)
    raw, _ = ck.load_pipeline(cdir, use_ema=False)
    diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(a - b))),
                         served["text_encoder"], raw["text_encoder"])
    assert max(jax.tree.leaves(diffs)) > 0
    ft.main(argv + ["--epochs", "2", "--resume"])
    latest2 = max((d for d in os.listdir(run_dir) if d.startswith("ckpt-")),
                  key=lambda d: int(d.split("-")[1]))
    assert int(latest2.split("-")[1]) > int(latest.split("-")[1])
    assert os.path.isdir(os.path.join(run_dir, latest2, "ema"))


def test_cli_ema_rejects_lora(tmp_path):
    from sdbc_tpu.cli import finetune

    with pytest.raises(SystemExit, match="ema_decay"):
        finetune.main(["--tiny", "--data_root", str(tmp_path),
                       "--lora_rank", "2", "--ema_decay", "0.999"])
