"""Blockwise int8 AdamW: kernel math, convergence vs fp32 optax, memory."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sdbc_tpu.train.adam8bit import (
    BLOCK, Quant8State, _adam8_update, adamw8bit)


def test_kernel_single_steps_match_adam():
    rows = 64
    g = jnp.ones((rows, BLOCK)) * 2.0
    p = jnp.zeros((rows, BLOCK))
    st = Quant8State(mq=jnp.zeros((rows, BLOCK), jnp.int8),
                     ms=jnp.zeros((rows, 128)),
                     vq=jnp.zeros((rows, BLOCK), jnp.int8),
                     vs=jnp.zeros((rows, 128)))
    p1, st1 = _adam8_update(g, p, st, 0.1, 1, 0.9, 0.999, 1e-8, 0.0)
    # first Adam step moves by exactly -lr (bias-corrected)
    np.testing.assert_allclose(np.asarray(p1), -0.1, atol=1e-4)
    # moments dequantize to the exact fp32 values (single-magnitude rows)
    m = np.sign(np.asarray(st1.mq)) * (np.abs(np.asarray(st1.mq)) / 127.0) ** 2
    np.testing.assert_allclose(m[0, 0] * np.asarray(st1.ms)[0, 0], 0.2,
                               rtol=2e-2)


def test_converges_like_fp32_adam():
    key = jax.random.key(0)
    p0 = {"w": jax.random.normal(key, (16, BLOCK)),  # 32768 ≥ min_8bit_size
          "b": jnp.zeros((32,))}                     # small → fp32 moments
    tgt = {"w": jnp.ones((16, BLOCK)), "b": jnp.ones((32,))}

    def loss(p):
        return sum(jnp.sum((a - b) ** 2)
                   for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(tgt)))

    finals = {}
    for name, opt in [("q8", adamw8bit(1e-1, weight_decay=0.0)),
                      ("fp32", optax.adamw(1e-1, weight_decay=0.0))]:
        p, st = p0, None
        st = opt.init(p)
        for _ in range(50):
            grads = jax.grad(loss)(p)
            upd, st = opt.update(grads, st, p)
            p = optax.apply_updates(p, upd)
        finals[name] = float(loss(p))
    assert finals["q8"] < finals["fp32"] * 3 + 10.0, finals


def test_state_memory_is_quantized():
    p = {"w": jnp.zeros((16, BLOCK))}
    opt = adamw8bit(1e-3)
    st = opt.init(p)
    leaf = st.per_leaf[0]
    assert isinstance(leaf, Quant8State)
    assert leaf.mq.dtype == jnp.int8 and leaf.vq.dtype == jnp.int8
    # int8 moments + scales ≈ 2.25 bytes/param vs 8 for fp32 Adam
    bytes_q8 = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(leaf))
    assert bytes_q8 < 0.4 * (2 * p["w"].size * 4)
