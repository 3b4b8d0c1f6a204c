from toycrystals_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    constrain_batch,
)
from toycrystals_tpu.parallel.spatial import (
    make_mesh_2d,
    image_sharding,
    check_spatial_divisibility,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_sharding",
    "constrain_batch",
    "make_mesh_2d",
    "image_sharding",
    "check_spatial_divisibility",
]
