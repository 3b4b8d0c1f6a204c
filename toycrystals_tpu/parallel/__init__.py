from toycrystals_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    constrain_batch,
)

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding", "constrain_batch"]
