from toycrystals_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    load_score_payload,
    save_checkpoint,
)
from toycrystals_tpu.utils.fidelity import (
    extract_grid_tiles,
    score_grid_png,
    score_lattice_fidelity,
)
from toycrystals_tpu.utils.metrics import append_jsonl, ensure_file, truncate_jsonl
from toycrystals_tpu.utils.orbax_io import (
    ShardedCheckpointManager,
    is_orbax_checkpoint,
    load_orbax_meta,
    load_orbax_payload,
)
from toycrystals_tpu.utils.preempt import GracefulShutdown
from toycrystals_tpu.utils.profiling import dispatch_latency, scan_timer

__all__ = [
    "AsyncCheckpointer",
    "save_checkpoint",
    "load_checkpoint",
    "load_score_payload",
    "ShardedCheckpointManager",
    "is_orbax_checkpoint",
    "load_orbax_meta",
    "load_orbax_payload",
    "GracefulShutdown",
    "extract_grid_tiles",
    "score_grid_png",
    "score_lattice_fidelity",
    "append_jsonl",
    "ensure_file",
    "truncate_jsonl",
    "dispatch_latency",
    "scan_timer",
]
