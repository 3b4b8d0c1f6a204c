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
from toycrystals_tpu.parallel.tensor import (
    make_mesh_tp,
    make_mesh_3d,
    tp_sharding,
    shard_params,
    tp_coverage,
)
from toycrystals_tpu.parallel.expert import (
    make_mesh_ep,
    expert_sharding,
    place_expert_state,
    ep_coverage,
)
from toycrystals_tpu.parallel.fsdp import (
    fsdp_sharding,
    shard_params_fsdp,
    fsdp_coverage,
)
from toycrystals_tpu.parallel.multihost import (
    maybe_initialize,
    is_primary,
    global_batch,
)
from toycrystals_tpu.parallel.pipeline import (
    make_mesh_pp,
    stack_pipeline_params,
    unstack_pipeline_params,
    place_pipeline_state,
    pipeline_apply,
    make_pipeline_apply,
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
    "make_mesh_tp",
    "make_mesh_3d",
    "tp_sharding",
    "shard_params",
    "tp_coverage",
    "make_mesh_ep",
    "expert_sharding",
    "place_expert_state",
    "ep_coverage",
    "fsdp_sharding",
    "shard_params_fsdp",
    "fsdp_coverage",
    "maybe_initialize",
    "is_primary",
    "global_batch",
    "make_mesh_pp",
    "stack_pipeline_params",
    "unstack_pipeline_params",
    "place_pipeline_state",
    "pipeline_apply",
    "make_pipeline_apply",
]
