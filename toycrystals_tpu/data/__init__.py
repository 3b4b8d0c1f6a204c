from toycrystals_tpu.data.lattice import (
    LatticeConfig,
    PointBudget,
    static_point_budget,
    sample_params,
    make_points,
    generate_item,
)
from toycrystals_tpu.data.rasterize import (
    rasterize_reference,
    rasterize_separable,
    rasterize_pallas,
    rasterize_batch,
)
from toycrystals_tpu.data.datasets import (
    ToyCrystalsDataset,
    ToyCrystalsDiskDataset,
    generate_batch,
    batch_iterator,
)
from toycrystals_tpu.data.stream import (
    StreamingDiskDataset,
    prefetch_to_device,
    to_f01,
)

__all__ = [
    "LatticeConfig",
    "PointBudget",
    "static_point_budget",
    "sample_params",
    "make_points",
    "generate_item",
    "rasterize_reference",
    "rasterize_separable",
    "rasterize_pallas",
    "rasterize_batch",
    "ToyCrystalsDataset",
    "ToyCrystalsDiskDataset",
    "generate_batch",
    "batch_iterator",
    "StreamingDiskDataset",
    "prefetch_to_device",
    "to_f01",
]
