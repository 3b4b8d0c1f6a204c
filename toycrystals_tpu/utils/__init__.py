from toycrystals_tpu.utils.checkpoint import (
    AsyncCheckpointer,
    load_checkpoint,
    save_checkpoint,
)
from toycrystals_tpu.utils.fidelity import (
    extract_grid_tiles,
    score_grid_png,
    score_lattice_fidelity,
)
from toycrystals_tpu.utils.metrics import append_jsonl, ensure_file, truncate_jsonl
from toycrystals_tpu.utils.preempt import GracefulShutdown
from toycrystals_tpu.utils.profiling import dispatch_latency, scan_timer

__all__ = [
    "AsyncCheckpointer",
    "save_checkpoint",
    "load_checkpoint",
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
