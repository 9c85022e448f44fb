from sdbc_tpu.parallel.mesh import (
    MeshConfig, make_mesh, data_sharding, replicate, host_local_batch_slice,
)
from sdbc_tpu.parallel.specs import (
    tp_specs, fsdp_specs, shard_tree, validate_tp,
)

__all__ = ["MeshConfig", "make_mesh", "data_sharding", "replicate",
           "host_local_batch_slice", "tp_specs", "fsdp_specs", "shard_tree",
           "validate_tp"]
