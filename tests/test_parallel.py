"""Multi-device tests on the 8-way virtual CPU mesh (fake TPU pod)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sdbc_tpu.parallel.mesh import (
    MeshConfig, make_mesh, shard_batch, replicate_tree, data_sharding,
    host_local_batch_slice, host_local_batch_indices, _local_data_coords,
    make_global_batch)
from sdbc_tpu.train.trainer import TrainConfig, init_train_state, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_axes():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    assert mesh.shape == {"data": 8, "model": 1}
    assert host_local_batch_slice(16, mesh) == slice(0, 16)
    np.testing.assert_array_equal(host_local_batch_indices(16, mesh),
                                  np.arange(16))


def test_local_data_coords_non_contiguous():
    """Non-contiguous per-host device coordinates (hybrid/DCN meshes) must
    yield the exact coordinate set, not a min..max span (round-1 weakness 3)."""
    # 4 data coords x 2 model; process 0 owns coords {0, 2}, process 1 {1, 3}
    pmap = np.array([[0, 0], [1, 1], [0, 0], [1, 1]])
    assert _local_data_coords(pmap, 0) == [0, 2]
    assert _local_data_coords(pmap, 1) == [1, 3]
    # a model-split row belongs to every process owning any of its devices
    pmap2 = np.array([[0, 1], [1, 1]])
    assert _local_data_coords(pmap2, 0) == [0]
    assert _local_data_coords(pmap2, 1) == [0, 1]


def test_dataloader_with_mesh_matches_unsharded(tmp_path):
    """make_dataloader(mesh=...) yields globally-identical, data-sharded
    batches (single-host case: local rows == all rows)."""
    from tests.data_fixtures import build_fake_dataset
    from sdbc_tpu.data.dataset import DatasetConfig, GoodreadsDataset, \
        make_dataloader
    from sdbc_tpu.data.tokenizer import CLIPTokenizer

    root = build_fake_dataset(str(tmp_path), n_train=16, n_test=2, img_size=32)
    cfg = DatasetConfig(data_root=root, img_size=32, max_length=16)
    tok = CLIPTokenizer.fallback(512)
    mesh = make_mesh(MeshConfig(data=8))

    # two dataset instances: prompt templating draws from a per-dataset rng,
    # so each loader must consume an identically-seeded stream
    plain = list(make_dataloader(GoodreadsDataset(cfg, tok), micro_batch=8,
                                 grad_accum=2, shuffle=False, seed=0))
    sharded = list(make_dataloader(GoodreadsDataset(cfg, tok), micro_batch=8,
                                   grad_accum=2, shuffle=False, seed=0,
                                   mesh=mesh))
    assert len(plain) == len(sharded) == 1
    for k in ("pixel_values", "input_ids"):
        spec = sharded[0][k].sharding.spec
        assert spec[1] == "data" and all(s is None for i, s in enumerate(spec)
                                         if i != 1), spec
        np.testing.assert_array_equal(np.asarray(sharded[0][k]), plain[0][k])


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
    s1_single, m_single = step_single(s_single, batch, key)

    mesh = make_mesh(MeshConfig(data=8))
    s_dp = init_train_state(tiny_params, tcfg, compute_dtype=jnp.float32)
    s_dp = replicate_tree(s_dp, mesh)
    step_dp = make_train_step(tiny_cfg, tcfg, mesh=mesh, dp_size=8,
                              compute_dtype=jnp.float32)
    s1_dp, m_dp = step_dp(s_dp, batch, key)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    # the thing that must match is the POST-UPDATE trainable tree: the psum'd
    # gradient average must drive the identical Adam update on every device
    flat_s, _ = jax.tree_util.tree_flatten_with_path(s1_single.trainable)
    flat_d = jax.tree.leaves(s1_dp.trainable)
    assert len(flat_s) == len(flat_d)
    # tolerance: psum reduction order differs from the single-device scan
    # order, so the Adam direction wobbles ~1e-6 absolute on fp32
    for (path, a), b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=str(path))


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
