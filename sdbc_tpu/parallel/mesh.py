"""Named-axis device mesh over ICI/DCN — the communication layer.

Replaces the reference's accelerate/NCCL data parallelism
(finetune_sd.py:360-364,590-593; SURVEY.md §2.3): instead of DDP wrappers and
explicit allreduce, we lay a ``jax.sharding.Mesh`` over the chips, shard the
batch dim over the ``data`` axis, keep params replicated (DP) or sharded over
``model`` (future TP), and let XLA compile psum/all-gather collectives into
the step function — the gradient allreduce rides ICI automatically.

The reference only has DP, but axes are named and general (SURVEY.md §2.3
"TPU-native equivalents"): DP is PartitionSpec("data"), not a hard-coded path.
Multi-slice scale-out adds an outer ``dcn`` axis via
``jax.experimental.mesh_utils.create_hybrid_device_mesh``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1   # tensor-parallel axis (1 for SD-1.x parity workloads)
    # number of DCN-connected slices (multi-pod scale-out).  >1 builds a
    # hybrid mesh where the OUTER part of the data axis crosses DCN and the
    # inner part stays on ICI, so the gradient psum runs hierarchically
    # (reduce inside each slice over ICI, then across slices over DCN).
    num_slices: int = 1

    def resolve(self, n_devices: int) -> tuple:
        model = self.model
        data = self.data if self.data > 0 else n_devices // model
        # real errors, not asserts: python -O would strip them and degrade
        # user mesh-geometry mistakes to opaque reshape failures
        if data * model != n_devices:
            raise ValueError(f"mesh {data}x{model} != {n_devices} devices")
        if data % self.num_slices:
            raise ValueError(f"data axis {data} not divisible by "
                             f"{self.num_slices} slices")
        return data, model


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = cfg.resolve(len(devices))
    if cfg.num_slices > 1 and hasattr(devices[0], "slice_index"):
        from jax.experimental import mesh_utils

        # slice-major device order: contiguous data-axis blocks live inside
        # one slice, so only the outer data reduction rides DCN
        arr = mesh_utils.create_hybrid_device_mesh(
            (data // cfg.num_slices, model), (cfg.num_slices, 1),
            devices=devices)
        arr = arr.reshape(data, model)
    else:
        arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis; replicate the rest.

    Rank-0 leaves (scalars in a batch pytree) are replicated — there is no
    batch dim to shard.
    """
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard NHWC image ROWS (dim 1) over the data axis; batch replicated.

    The sequence-parallel serving layout (SDPipeline(spatial=True)): GSPMD
    runs the unmodified UNet/VAE with conv halo exchanges, cross-shard
    GroupNorm stats and attention gathers inserted automatically.
    """
    return NamedSharding(mesh, P(None, "data", None, None))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with batch-dim sharding over `data`."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)


def replicate_tree(tree, mesh: Mesh):
    sh = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree_global(tree, mesh: Mesh):
    """Multi-process-safe replication over a mesh spanning several hosts.

    ``replicate_tree``'s device_put only addresses local devices; under
    ``jax.distributed`` every process instead holds the same host value
    (deterministic init) and this builds fully-replicated GLOBAL arrays
    via make_array_from_callback — the parameter-side counterpart of
    make_global_batch.  On a single process it is equivalent to
    replicate_tree.
    """
    sh = replicate(mesh)

    def rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    return jax.tree.map(rep, tree)


def _local_data_coords(process_map: np.ndarray, process_index: int):
    """Data-axis coordinates owned by a process (pure core, unit-testable).

    process_map: (data, model) int array of device process indices.  A
    data-coordinate is local iff ANY of its devices belong to the process.
    Coordinates need not be contiguous (e.g. hybrid DCN meshes interleave
    hosts) — callers get the exact sorted list, not a min..max span.
    """
    return sorted({int(c) for c in
                   np.argwhere(process_map == process_index)[:, 0]})


def host_local_data_coords(mesh: Mesh):
    pmap = np.vectorize(lambda d: d.process_index)(np.array(mesh.devices))
    return _local_data_coords(pmap.reshape(pmap.shape[0], -1),
                              jax.process_index())


def host_local_batch_indices(global_batch: int, mesh: Mesh) -> np.ndarray:
    """Row indices of the global batch this host must load.

    Replaces torch DataLoader worker sharding / accelerate's per-process
    dataloader sharding (SURVEY.md E11, reference finetune_sd.py:363-364):
    each host loads only the examples that land on its local devices.  Rows
    are returned per data-coordinate, handling non-contiguous coordinate
    sets correctly (round-1 VERDICT weakness 3).
    """
    n_data = mesh.shape["data"]
    if global_batch % n_data:
        # a silent floor here would drop rows from every assembled batch
        raise ValueError(
            f"global batch {global_batch} must divide evenly over the "
            f"mesh's data axis ({n_data} shards)")
    per_shard = global_batch // n_data
    coords = host_local_data_coords(mesh)
    if not coords:
        # a process with no devices in this mesh loads nothing (e.g. the
        # mesh was built over a device subset) — an empty index list, not
        # an opaque np.concatenate error
        return np.empty((0,), np.int64)
    return np.concatenate([
        np.arange(c * per_shard, (c + 1) * per_shard) for c in coords])


def host_local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """Contiguous convenience form; raises if this host's rows are not
    contiguous (use host_local_batch_indices then)."""
    idx = host_local_batch_indices(global_batch, mesh)
    if len(idx) == 0:
        return slice(0, 0)
    if not np.array_equal(idx, np.arange(idx[0], idx[-1] + 1)):
        raise ValueError("host rows are non-contiguous on this mesh; "
                         "use host_local_batch_indices")
    return slice(int(idx[0]), int(idx[-1]) + 1)


def make_global_batch(local_batch, mesh: Mesh, batch_dim: int = 1):
    """Assemble per-host local batch shards into global sharded jax.Arrays.

    local_batch: pytree of host-local numpy arrays whose ``batch_dim`` holds
    only this host's rows (in host_local_batch_indices order).  Returns a
    pytree of global jax.Arrays sharded over the mesh's ``data`` axis —
    the input-side counterpart of the psum gradient allreduce.
    """
    def to_global(x):
        spec = [None] * x.ndim
        spec[batch_dim] = "data"
        sh = NamedSharding(mesh, P(*spec))
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(to_global, local_batch)
