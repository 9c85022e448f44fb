"""Checkpoint save/load roundtrip + versioned-run resolution."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from sdbc_tpu.utils import checkpoint as ck


def test_pipeline_roundtrip(tmp_path, tiny_cfg, tiny_params):
    path = str(tmp_path / "ckpt")
    ck.save_pipeline(path, tiny_params, tiny_cfg,
                     metadata={"step": 7, "best_mean_loss": 0.5})
    params, cfg = ck.load_pipeline(path)
    assert cfg == tiny_cfg
    for comp in ("text_encoder", "unet", "vae"):
        a = jax.tree.leaves(tiny_params[comp])
        b = jax.tree.leaves(params[comp])
        assert len(a) == len(b)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    meta = ck.load_metadata(path)
    assert meta["step"] == 7


def test_opt_state_roundtrip(tmp_path, tiny_cfg, tiny_params):
    from sdbc_tpu.train.trainer import TrainConfig, init_train_state, merged_params

    tcfg = TrainConfig(train_text_encoder=True, train_unet=False)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    path = str(tmp_path / "ckpt2")
    ck.save_pipeline(path, merged_params(state), tiny_cfg,
                     opt_state=state.opt_state)
    _, _, opt_state = ck.load_pipeline(path, with_opt_state=True)
    assert opt_state is not None
    assert len(jax.tree.leaves(opt_state)) == len(
        jax.tree.leaves(state.opt_state))


def test_versioned_runs(tmp_path):
    out = str(tmp_path)
    assert ck.latest_checkpoint(out, "run1") is None
    for step in (3, 12, 7):
        os.makedirs(ck.new_checkpoint_path(out, "run1", step))
    latest = ck.latest_checkpoint(out, "run1")
    assert latest.endswith("ckpt-12")


def test_config_json_roundtrip(tiny_cfg):
    d = ck.config_to_json(tiny_cfg)
    back = ck.config_from_json(d)
    assert back == tiny_cfg
