"""Training-step tests: loss decreases, trainability masks, NaN guard."""
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


def test_loss_decreases_on_fixed_batch(tiny_cfg, tiny_params):
    tcfg = TrainConfig(train_unet=True, train_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=100, lr_scale_by_dp=False)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _batch(tiny_cfg)
    losses = []
    key = jax.random.key(42)
    for i in range(5):
        # same key each step → same noise/timesteps → loss must shrink
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_text_encoder_only_freezes_unet(tiny_cfg, tiny_params):
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=100)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    assert set(state.trainable) == {"text_encoder"}
    assert "unet" in state.frozen and "vae" in state.frozen
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    s1, _ = step(state, _batch(tiny_cfg), jax.random.key(0))
    # text encoder moved
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          tiny_params["text_encoder"],
                          s1.trainable["text_encoder"])
    assert max(jax.tree.leaves(deltas)) > 0
    # merged tree has all three components
    assert set(merged_params(s1)) == {"text_encoder", "unet", "vae"}


def test_grad_accum_averages(tiny_cfg, tiny_params):
    """accum=2 with identical micro-batches ≈ accum=1 with that micro-batch.

    (Keys differ per micro-step, so compare loss magnitude only loosely —
    the real check is shape/flow correctness.)
    """
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True, grad_accum=2,
                       learning_rate=0.0, num_examples=100,  # lr 0: no update
                       lr_scale_by_dp=False)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    _, m = step(state, _batch(tiny_cfg, accum=2), jax.random.key(3))
    assert np.isfinite(float(m["loss"]))


def test_nan_guard_skips_update(tiny_cfg, tiny_params):
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=100)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    bad = _batch(tiny_cfg)
    bad["pixel_values"] = bad["pixel_values"].at[0, 0, 0, 0, 0].set(jnp.nan)
    before = jax.tree.leaves(state.trainable)[0].copy()
    s1, m = step(state, bad, jax.random.key(0))
    assert not bool(m["finite"])
    assert int(m["notfinite_count"]) == 1  # skipped updates are counted
    after = jax.tree.leaves(s1.trainable)[0]
    np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    # the count is CUMULATIVE: a finite step in between must not reset it
    # (optax's notfinite_count field does; we report total_notfinite)
    s2, m2 = step(s1, _batch(tiny_cfg), jax.random.key(1))
    assert bool(m2["finite"]) and int(m2["notfinite_count"]) == 1
    _, m3 = step(s2, bad, jax.random.key(2))
    assert int(m3["notfinite_count"]) == 2


def test_empty_trainable_set_rejected(tiny_cfg, tiny_params):
    """train_unet=False + train_text_encoder=False must fail loudly (the
    reference's torch optimizer raises 'empty parameter list' here)."""
    tcfg = TrainConfig(train_unet=False, train_text_encoder=False,
                       num_examples=8)
    with pytest.raises(ValueError, match="nothing to train"):
        init_train_state(tiny_params, tcfg)


def test_8bit_adam_trains(tiny_cfg, tiny_params):
    """use_8bit_adam path: loss decreases with quantized moments."""
    from sdbc_tpu.train.trainer import TrainConfig, init_train_state, make_train_step

    tcfg = TrainConfig(train_unet=False, train_text_encoder=True, grad_accum=1,
                       learning_rate=1e-3, num_examples=100, use_8bit_adam=True,
                       lr_scale_by_dp=False)
    state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    batch = _batch(tiny_cfg)
    key = jax.random.key(7)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_min_snr_weighting(tiny_cfg, tiny_params):
    """gamma >= max SNR is exactly the unweighted loss (weight = 1);
    a tiny gamma shrinks it (down-weighting dominates)."""
    def loss_with(gamma):
        tcfg = TrainConfig(train_unet=False, train_text_encoder=True,
                           grad_accum=1, learning_rate=0.0, num_examples=10,
                           min_snr_gamma=gamma)
        state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
        step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
        _, m = step(state, _batch(tiny_cfg), jax.random.key(5))
        return float(m["loss"])

    plain = loss_with(0.0)
    # SNR_max = a/(1-a) at t=0 for the SD schedule ~= 1/0.00085 ~= 1176
    assert np.isclose(loss_with(1e6), plain, rtol=1e-6)
    assert loss_with(1e-3) < 0.1 * plain


def test_noise_offset_changes_objective(tiny_cfg, tiny_params):
    """Same key, lr=0: the offset-noise objective differs from plain."""
    def loss_with(off):
        tcfg = TrainConfig(train_unet=False, train_text_encoder=True,
                           grad_accum=1, learning_rate=0.0, num_examples=10,
                           noise_offset=off)
        state = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
        step = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
        _, m = step(state, _batch(tiny_cfg), jax.random.key(6))
        return float(m["loss"])

    a, b = loss_with(0.0), loss_with(0.5)
    assert np.isfinite(a) and np.isfinite(b) and a != b
