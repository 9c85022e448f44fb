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

    def resolve(self, n_devices: int) -> tuple:
        model = self.model
        data = self.data if self.data > 0 else n_devices // model
        assert data * model == n_devices, (
            f"mesh {data}x{model} != {n_devices} devices")
        return data, model


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = cfg.resolve(len(devices))
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with batch-dim sharding over `data`."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)


def replicate_tree(tree, mesh: Mesh):
    sh = replicate(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def host_local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """This host's slice of the global batch (multi-host input sharding).

    Replaces torch DataLoader worker sharding (SURVEY.md E11): each host loads
    only the examples that land on its local devices.
    """
    n_data = mesh.shape["data"]
    per_shard = global_batch // n_data
    # local data-axis coordinates of this process's addressable devices
    local = set()
    dev_array = np.array(mesh.devices)
    for idx, d in np.ndenumerate(dev_array):
        if d.process_index == jax.process_index():
            local.add(idx[0])
    lo, hi = min(local), max(local) + 1
    return slice(lo * per_shard, hi * per_shard)
