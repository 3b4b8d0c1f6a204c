"""Multi-host (multi-process) support: jax.distributed + SPMD conventions.

The reference is strictly single-process (SURVEY.md §2 "parallelism audit":
no torch.distributed anywhere); every mesh in this tree was likewise built
from one process's `jax.devices()`. This module is the scale-out past one
host — the JAX multi-controller model:

- every process runs the SAME program (SPMD) and calls
  `jax.distributed.initialize` before touching any device;
- `jax.devices()` then returns the GLOBAL device list, so `make_mesh*`
  work unchanged and jitted programs compile with collectives that span
  hosts (ICI within a slice, DCN across);
- process-local host data becomes a global sharded array via
  `jax.make_array_from_callback` (each process materialises only its
  addressable shards);
- exactly one process (index 0) writes host-side artefacts — msgpack
  checkpoints, figures, metrics.jsonl (Orbax per-shard checkpoints
  already write cooperatively from every process, utils/orbax_io.py).

Initialization is explicit (CLI `--coordinator/--num-processes/
--process-id`, scripts/_common.py add_dist_flags) or, with
`--coordinator auto`, discovered from the runtime environment on TPU
pods / SLURM (`jax.distributed.initialize()` with no args). The flagship data path — on-device procedural datagen
inside the fused-epoch program — needs NO per-process partitioning: the
datagen is itself sharded by GSPMD, so each host's chips render exactly
their batch shard. Disk archives ride `global_batch` below.

Proven without hardware on a 2-process CPU cluster with 4 virtual devices
each (tests/test_multihost.py), the same trick as the 8-device virtual
mesh.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np

_initialized = False


def maybe_initialize(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids: Sequence[int] | None = None) -> bool:
    """Join (or form) a multi-process JAX cluster.

    - explicit flags (`--coordinator localhost:1234 --num-processes 2
      --process-id 0`): CPU/GPU clusters and tests;
    - `coordinator="auto"` on a TPU pod (or SLURM/GKE):
      `jax.distributed.initialize()` with no arguments auto-detects the
      coordinator from the runtime environment;
    - no flags: no-op (single-process, the default everywhere — an
      unconditional auto-init would raise on plain single-host boxes).

    Must run before the first device query (jax.devices() pins backends).
    Returns True when running multi-process.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    if coordinator is None and num_processes is None and process_id is None:
        return False
    if coordinator == "auto" and (num_processes is not None
                                  or process_id is not None):
        # auto detects num_processes/process_id from the cluster
        # environment; explicit values would be silently ignored (or, for
        # --num-processes 1, silently disable distribution) — refuse instead
        raise SystemExit(
            "--coordinator auto detects num_processes/process_id from "
            "the cluster environment; do not also pass "
            "--num-processes/--process-id")
    if num_processes is not None and num_processes <= 1:
        return False
    if coordinator == "auto":
        # cluster-environment auto-detection (TPU pod / SLURM / GKE):
        # jax fills coordinator/num_processes/process_id itself
        jax.distributed.initialize()
        _initialized = True
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the one process that writes host-side artefacts."""
    return jax.process_index() == 0


def global_batch(mesh, batch: Any, axis: str = "data") -> Any:
    """Turn a host batch (full GLOBAL content, present on every process)
    into global sharded arrays on a multi-process mesh.

    Each process materialises only its addressable shards
    (`jax.make_array_from_callback` hands us the index of every local
    shard); the archive-gather path stays unchanged — every host gathers
    the full batch cheaply from its resident copy and the callback slices
    out the local part. Scalars pass through. Single-process meshes fall
    back to `shard_batch`'s device_put path.
    """
    from toycrystals_tpu.parallel.mesh import data_sharding, shard_batch

    if mesh is None or jax.process_count() == 1:
        return shard_batch(mesh, batch, axis)

    def place(x):
        if np.ndim(x) == 0:
            return x
        x = np.asarray(x)
        sh = data_sharding(mesh, x.ndim, axis)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(place, batch)
