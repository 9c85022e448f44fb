"""Multi-device tests on the 8-way virtual CPU mesh (fake TPU pod)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sdbc_tpu.parallel.mesh import (
    MeshConfig, make_mesh, shard_batch, replicate_tree, data_sharding,
    host_local_batch_slice)
from sdbc_tpu.train.trainer import TrainConfig, init_train_state, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_axes():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    assert mesh.shape == {"data": 8, "model": 1}
    assert host_local_batch_slice(16, mesh) == slice(0, 16)


def test_shard_batch_layout():
    mesh = make_mesh(MeshConfig(data=8))
    x = {"a": np.zeros((16, 4))}
    sharded = shard_batch(x, mesh)
    assert sharded["a"].sharding.spec == P("data", None)


def test_dp_step_matches_single_device(tiny_cfg, tiny_params):
    """DP-8 must produce the same loss as single-device on the same batch."""
    tcfg = TrainConfig(train_unet=False, train_text_encoder=True, grad_accum=1,
                       learning_rate=1e-4, num_examples=100, lr_scale_by_dp=False)
    batch = {
        "pixel_values": jax.random.normal(jax.random.key(0), (1, 8, 32, 32, 3)),
        "input_ids": jnp.ones((1, 8, tiny_cfg.clip.ctx), jnp.int32),
    }
    key = jax.random.key(5)

    s_single = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    step_single = make_train_step(tiny_cfg, tcfg, compute_dtype=jnp.float32)
    _, m_single = step_single(s_single, batch, key)

    mesh = make_mesh(MeshConfig(data=8))
    s_dp = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    s_dp = replicate_tree(s_dp, mesh)
    step_dp = make_train_step(tiny_cfg, tcfg, mesh=mesh, dp_size=8,
                              compute_dtype=jnp.float32)
    _, m_dp = step_dp(s_dp, batch, key)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)


def test_dp_sampling_over_mesh(tiny_cfg, tiny_params):
    """Sampling is mesh-ready: a batch sharded over `data` runs through the
    same jitted graph and matches the unsharded result."""
    import jax.numpy as jnp

    from sdbc_tpu.diffusion.pipeline import sample
    from sdbc_tpu.parallel.mesh import data_sharding

    mesh = make_mesh(MeshConfig(data=8))
    b = 8
    cond = jnp.ones((b, tiny_cfg.clip.ctx), jnp.int32)
    uncond = jnp.zeros((b, tiny_cfg.clip.ctx), jnp.int32)
    lat = jax.random.normal(jax.random.key(0), (b, 8, 8, 4), jnp.float32)

    ref = sample(tiny_params, cond, uncond, lat, jax.random.key(0), 7.5,
                 cfg=tiny_cfg, num_inference_steps=2,
                 compute_dtype=jnp.float32)

    shard = lambda x, nd: jax.device_put(x, data_sharding(mesh, nd))
    out = sample(tiny_params, shard(cond, 2), shard(uncond, 2),
                 shard(lat, 4), jax.random.key(0), 7.5, cfg=tiny_cfg,
                 num_inference_steps=2, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
