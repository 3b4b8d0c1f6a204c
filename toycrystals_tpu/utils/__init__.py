from toycrystals_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from toycrystals_tpu.utils.metrics import append_jsonl, ensure_file
from toycrystals_tpu.utils.profiling import dispatch_latency, scan_timer

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "append_jsonl",
    "ensure_file",
    "dispatch_latency",
    "scan_timer",
]
