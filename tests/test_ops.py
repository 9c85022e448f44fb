"""Unit tests for NN primitives and the Pallas flash-attention kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdbc_tpu.ops import nn
from sdbc_tpu.ops.attention import xla_attention
from sdbc_tpu.ops.flash_attention import flash_attention


def test_group_norm_matches_manual():
    key = jax.random.key(1)
    x = jax.random.normal(key, (2, 4, 4, 8))
    p = nn.init_group_norm(8)
    y = nn.group_norm(p, x, num_groups=2)
    # manual: per (sample, group) statistics over spatial+channels-in-group
    xg = np.asarray(x).reshape(2, 16, 2, 4)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    ref = ((xg - mean) / np.sqrt(var + 1e-6)).reshape(2, 4, 4, 8)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)


def test_group_norm_fused_silu():
    x = jax.random.normal(jax.random.key(2), (1, 4, 4, 8))
    p = nn.init_group_norm(8)
    base = nn.group_norm(p, x, 2)
    fused = nn.group_norm(p, x, 2, act="silu")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(jax.nn.silu(base)),
                               atol=1e-6)


def test_layer_norm_zero_mean_unit_var():
    x = jax.random.normal(jax.random.key(3), (2, 5, 16)) * 3 + 1
    y = nn.layer_norm(nn.init_layer_norm(16), x)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.var(-1)), 1.0, atol=1e-4)


def test_conv2d_same_shape_and_stride():
    p = nn.init_conv(jax.random.key(4), 3, 8, 3)
    x = jnp.ones((1, 8, 8, 3))
    assert nn.conv2d(p, x).shape == (1, 8, 8, 8)
    assert nn.conv2d(p, x, stride=2, padding=1).shape == (1, 4, 4, 8)


def test_timestep_embedding_shape_and_range():
    emb = nn.timestep_embedding(jnp.array([0, 10, 999]), 32)
    assert emb.shape == (3, 32)
    assert np.all(np.abs(np.asarray(emb)) <= 1.0 + 1e-6)
    # t=0 → sin part 0, cos part 1 ([cos|sin] order for SD)
    np.testing.assert_allclose(np.asarray(emb[0, :16]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 16:]), 0.0, atol=1e-6)


def test_upsample_and_pool():
    x = jnp.arange(16.0).reshape(1, 2, 2, 4)
    up = nn.upsample_nearest_2x(x)
    assert up.shape == (1, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(x[0, 0, 0]))
    down = nn.avg_pool_2x(up)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-6)


def test_causal_mask_blocks_future():
    q = jax.random.normal(jax.random.key(5), (1, 2, 8, 16))
    k = jax.random.normal(jax.random.key(6), (1, 2, 8, 16))
    v = jax.random.normal(jax.random.key(7), (1, 2, 8, 16))
    out = xla_attention(q, k, v, causal=True)
    # perturb the last key/value: outputs at positions < 7 must not change
    k2 = k.at[:, :, -1].add(100.0)
    v2 = v.at[:, :, -1].add(100.0)
    out2 = xla_attention(q, k2, v2, causal=True)
    np.testing.assert_allclose(np.asarray(out[:, :, :7]),
                               np.asarray(out2[:, :, :7]), atol=1e-6)
    assert not np.allclose(np.asarray(out[:, :, 7]), np.asarray(out2[:, :, 7]))


def test_flash_attention_matches_xla_interpret():
    # small shapes; on CPU the kernel runs in interpreter mode
    q = jax.random.normal(jax.random.key(8), (1, 2, 128, 16), jnp.float32)
    k = jax.random.normal(jax.random.key(9), (1, 2, 77, 16), jnp.float32)
    v = jax.random.normal(jax.random.key(10), (1, 2, 77, 16), jnp.float32)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_attention_grads_match_xla():
    q = jax.random.normal(jax.random.key(11), (1, 1, 128, 8), jnp.float32)
    k = jax.random.normal(jax.random.key(12), (1, 1, 128, 8), jnp.float32)
    v = jax.random.normal(jax.random.key(13), (1, 1, 128, 8), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_bwd_odd_shapes_match_xla():
    """flash_bwd agrees with XLA autodiff on non-square/odd shapes: the
    block-divisible case, masked 77-token cross-attention kv, and a
    non-block-multiple q length with a tiny head dim."""
    for (sq, sk, d) in [(256, 256, 40), (256, 77, 40), (140, 256, 8)]:
        q = jax.random.normal(jax.random.key(21), (1, 2, sq, d), jnp.float32)
        k = jax.random.normal(jax.random.key(22), (1, 2, sk, d), jnp.float32)
        v = jax.random.normal(jax.random.key(23), (1, 2, sk, d), jnp.float32)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(xla_attention(q, k, v) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


def test_flash_tt_matches_xla():
    from sdbc_tpu.ops.flash_attention_tt import flash_attention_tt

    q = jax.random.normal(jax.random.key(20), (1, 2, 128, 24), jnp.float32)
    k = jax.random.normal(jax.random.key(21), (1, 2, 77, 24), jnp.float32)
    v = jax.random.normal(jax.random.key(22), (1, 2, 77, 24), jnp.float32)
    np.testing.assert_allclose(np.asarray(flash_attention_tt(q, k, v)),
                               np.asarray(xla_attention(q, k, v)), atol=2e-5)

    def loss_tt(q, k, v):
        return jnp.sum(flash_attention_tt(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_tt, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_groupnorm_kernel_matches_ref():
    from sdbc_tpu.ops import pallas_groupnorm as pgn

    x = jax.random.normal(jax.random.key(30), (2, 8, 8, 32)) * 2 + 0.5
    p = {"scale": jnp.ones((32,)) * 1.3 + 0.1, "bias": jnp.zeros((32,)) + 0.2}
    for act in (None, "silu"):
        a = nn.group_norm_ref(p, x, 8, act=act)
        b = pgn.fused_group_norm(p, x, 8, act=act)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def loss(x):
        return jnp.sum(pgn.fused_group_norm(p, x, 8, act="silu") ** 2)

    def loss_ref(x):
        return jnp.sum(nn.group_norm_ref(p, x, 8, act="silu") ** 2)

    ga = jax.grad(loss)(x)
    gb = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-4)


def test_flash_attention_fixed_matches_xla():
    """Fixed-cap inference kernel == exact softmax for realistic logits.

    Covers: remainder kv blocks (padded rows masked), multiple head dims,
    scale handling, and logit magnitudes up to ~26 (sigma_logit = mag² for
    N(0,mag²) q/k) — 2.5× anything a trained SD model produces, still below
    the CAP=60/log2e ≈ 41.6 exactness bound.
    """
    from sdbc_tpu.ops.flash_attention import flash_attention_fixed

    # covers both the raw (divisible shapes) and padded fallback paths
    for (b, h, sq, d, sk, mag) in [(1, 2, 256, 40, 256, 1.0),
                                   (2, 1, 128, 80, 300, 1.0),
                                   (1, 1, 128, 16, 130, 2.5),
                                   (1, 2, 140, 40, 256, 1.0),
                                   (1, 2, 512, 40, 512, 1.0),
                                   (2, 2, 256, 80, 1024, 1.0),
                                   (1, 2, 256, 160, 256, 1.0)]:
        q = jax.random.normal(jax.random.key(1), (b, h, sq, d), jnp.float32) * mag
        k = jax.random.normal(jax.random.key(2), (b, h, sk, d), jnp.float32) * mag
        v = jax.random.normal(jax.random.key(3), (b, h, sk, d), jnp.float32)
        ref = xla_attention(q, k, v)
        out = flash_attention_fixed(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5, rtol=1e-4)


def test_flash_attention_fixed_dispatch():
    """impl='inference' falls back to XLA off-TPU / short kv / causal."""
    from sdbc_tpu.ops.attention import attention

    q = jax.random.normal(jax.random.key(4), (1, 2, 300, 40), jnp.float32)
    k = jax.random.normal(jax.random.key(5), (1, 2, 77, 40), jnp.float32)
    v = jax.random.normal(jax.random.key(6), (1, 2, 77, 40), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(attention(q, k, v, impl="inference")),
        np.asarray(xla_attention(q, k, v)), atol=2e-5)
    # causal long-kv also routes to XLA (kernel is non-causal)
    qq = jax.random.normal(jax.random.key(7), (1, 1, 300, 40), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(attention(qq, qq, qq, causal=True, impl="inference")),
        np.asarray(xla_attention(qq, qq, qq, causal=True)), atol=2e-5)


def test_geglu_ff_kernel_matches_reference():
    """Fused FF kernel == LN → GEGLU → down-proj → residual (XLA path)."""
    from sdbc_tpu.ops import nn
    from sdbc_tpu.ops.geglu_ff import geglu_ff

    for (b, s, c) in [(1, 512, 320), (2, 256, 640)]:
        key = jax.random.key(c)
        ks = jax.random.split(key, 3)
        y = jax.random.normal(ks[0], (b, s, c), jnp.float32)
        ln = nn.init_layer_norm(c)
        gg = nn.init_linear(ks[1], c, 8 * c)
        fo = nn.init_linear(ks[2], 4 * c, c)

        z = nn.linear(gg, nn.layer_norm(ln, y))
        val, gate = jnp.split(z, 2, axis=-1)
        ref = y + nn.linear(fo, val * jax.nn.gelu(gate, approximate=False))

        out = geglu_ff(y, ln, gg, fo)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=1e-4)


def test_flash_attention_int8_close_to_exact():
    """Opt-in int8 QKᵀ kernel (SDBC_ATTN_INT8): near-lossless vs exact.

    Per-row symmetric scales bound the quantization error to ~1-2% of the
    output range — the SageAttention operating point; the exact fixed-cap
    kernel remains the default.
    """
    from sdbc_tpu.ops.flash_attention import _flash_fixed_fwd_int8

    for (b, h, sq, d, sk) in [(1, 2, 512, 40, 512), (2, 2, 256, 80, 1024)]:
        q = jax.random.normal(jax.random.key(1), (b, h, sq, d), jnp.float32)
        k = jax.random.normal(jax.random.key(2), (b, h, sk, d), jnp.float32)
        v = jax.random.normal(jax.random.key(3), (b, h, sk, d), jnp.float32)
        ref = xla_attention(q, k, v)
        out = _flash_fixed_fwd_int8(q, k, v, d ** -0.5, 256, 256)
        rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.04, rel


def test_causal_mask_right_aligned_for_rectangular():
    """causal with sq != sk uses the standard right-aligned convention:
    query i attends keys 0..i+(sk-sq). A left-aligned tril would cut every
    query off from the sk-sq oldest keys."""
    from sdbc_tpu.ops.attention import xla_attention

    key = jax.random.key(0)
    q = jax.random.normal(key, (1, 1, 2, 8))
    k = jax.random.normal(jax.random.key(1), (1, 1, 4, 8))
    v = jax.random.normal(jax.random.key(2), (1, 1, 4, 8))
    out = xla_attention(q, k, v, causal=True)
    # query 0 attends keys 0..2, query 1 attends all 4: equal to explicit
    # softmax over those slices
    import numpy as np

    def ref_row(qi, nkeys):
        s = (q[0, 0, qi] @ k[0, 0, :nkeys].T) * (8 ** -0.5)
        w = np.exp(s - s.max()); w /= w.sum()
        return w @ v[0, 0, :nkeys]

    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), ref_row(0, 3),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out[0, 0, 1]), ref_row(1, 4),
                               rtol=2e-5)


def test_flash_fixed_bshd_matches_xla():
    """BSHD projection-layout kernel (round-4 head split/merge lever):
    exact vs the XLA reference, and the fallback path for non-dividing
    shapes."""
    from sdbc_tpu.ops.attention import xla_attention
    from sdbc_tpu.ops.flash_attention import flash_attention_fixed_bshd

    b, h, s, d = 2, 4, 256, 40
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    q4 = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k4 = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v4 = jax.random.normal(kv, (b, s, h, d), jnp.float32)

    out = flash_attention_fixed_bshd(q4, k4, v4)
    tr = lambda t: t.transpose(0, 2, 1, 3)
    ref = tr(xla_attention(tr(q4), tr(k4), tr(v4)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # non-dividing sq (not a multiple of 128): transpose fallback
    q5, k5, v5 = q4[:, :200], k4[:, :200], v4[:, :200]
    out5 = flash_attention_fixed_bshd(q5, k5, v5)
    ref5 = tr(xla_attention(tr(q5), tr(k5), tr(v5)))
    np.testing.assert_allclose(np.asarray(out5), np.asarray(ref5),
                               atol=2e-5, rtol=2e-5)
