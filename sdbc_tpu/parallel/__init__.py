from sdbc_tpu.parallel.mesh import (
    MeshConfig, make_mesh, data_sharding, replicate, host_local_batch_slice,
)

__all__ = ["MeshConfig", "make_mesh", "data_sharding", "replicate",
           "host_local_batch_slice"]
