"""Single-file msgpack checkpoints.

The reference writes raw `torch.save` .pt files (state_dicts or rich dicts
with model/opt/ema/config/loss_hist — `train_sde_score_model.py:35-54`). The
equivalent here is one msgpack file holding a nested dict of numpy arrays and
python scalars via flax.serialization — self-describing (config embedded),
framework-portable, no pickle.

`load_checkpoint(path)` returns the raw nested dict; pass `target=` (a pytree
template, e.g. a TrainState) to re-ingest typed structures with
`flax.serialization.from_state_dict`.
"""

from __future__ import annotations

import os
import threading
from pathlib import Path
from typing import Any

import flax.serialization as ser
import jax
import numpy as np


def _to_plain(tree: Any) -> Any:
    """Device arrays -> numpy; leave scalars/strings/lists alone.

    Transfers are started async across all leaves first, so the blocking
    `device_get` drains them in parallel instead of leaf-by-leaf (on the
    tunneled chip a serial pull of a train state costs seconds).
    """
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_deleted():
            try:
                leaf.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass  # non-PJRT arrays (e.g. tracers in tests) fall through
    return jax.tree.map(
        lambda x: np.asarray(jax.device_get(x)) if hasattr(x, "dtype") else x, tree
    )


def _atomic_write(path: Path, payload: bytes) -> None:
    """Write-to-temp + rename: a crash mid-write leaves any existing
    checkpoint at `path` intact (resume-safety contract, tested by
    injected-failure in tests/test_checkpoint.py)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(payload)
    os.replace(tmp, path)


def save_checkpoint(path: str | Path, tree: Any) -> None:
    """Atomically write `tree` (any pytree / nested dict) as msgpack."""
    payload = ser.msgpack_serialize(ser.to_state_dict(_to_plain(tree)))
    _atomic_write(Path(path), payload)


class AsyncCheckpointer:
    """Overlap checkpoint serialization + disk IO with training.

    The reference blocks its epoch loop on every `torch.save`
    (`/root/reference/scripts/train_sde_score_model.py:249-258`); the sync
    `save_checkpoint` above blocks the same way. This class splits the save
    into the part that MUST be synchronous and the part that needn't be:

    - **device→host pull (synchronous).** Every `make_*_train_step/epoch`
      DONATES its state, so the next epoch invalidates the device buffers a
      background thread would still be reading. The pull is parallelised
      across leaves (`_to_plain` starts all D2H copies before draining) but
      completes before `save()` returns — same contract as Orbax's async
      checkpointing.
    - **msgpack serialize + atomic file write (background thread).** This is
      pure host work and runs concurrently with the next training epoch.

    At most one write is in flight: a second `save()` first joins the
    previous one (ordered files, bounded memory). A failed background write
    re-raises from the next `save()`/`wait()` — callers never silently lose
    checkpoints. Use as a context manager (or call `wait()`) so the process
    cannot exit between "checkpoint saved" and the bytes hitting disk.
    """

    def __init__(self) -> None:
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    def save(self, path: str | Path, tree: Any) -> None:
        """Pull `tree` to host, then write it to `path` in the background."""
        self.wait()
        plain = _to_plain(tree)

        def _write() -> None:
            try:
                payload = ser.msgpack_serialize(ser.to_state_dict(plain))
                _atomic_write(Path(path), payload)
            except BaseException as e:  # noqa: BLE001 — re-raised at wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name="async-checkpoint", daemon=False)
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight write (if any) is durable; re-raise
        its failure."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def __enter__(self) -> "AsyncCheckpointer":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc is not None:
            # unwinding on an in-body exception (divergence SystemExit, ^C):
            # still join the writer, but don't let a failed background write
            # REPLACE the original exception — report it and let the body's
            # exception propagate
            try:
                self.wait()
            except BaseException as werr:  # noqa: BLE001
                import sys

                print(f"warning: async checkpoint write failed during "
                      f"shutdown: {werr!r}", file=sys.stderr)
            return
        self.wait()


def load_checkpoint(path: str | Path, target: Any = None) -> Any:
    """Read a checkpoint; restore onto `target`'s structure when given."""
    raw = ser.msgpack_restore(Path(path).read_bytes())
    if target is None:
        return raw
    return ser.from_state_dict(target, raw)


def load_score_payload(path: str | Path) -> dict:
    """Read a SCORE-MODEL checkpoint in ANY supported format, payload-shaped
    like `load_checkpoint(msgpack)` (``{"state": {...}, "config": {...},
    "epoch_next": N, ...}``):

    - ``*.pt``            — reference torch checkpoint (utils/torch_interop.py);
    - directory           — `--ckpt-format orbax` step-managed checkpoint
                            (utils/orbax_io.py), restored onto the default
                            device regardless of the saving run's mesh;
    - anything else       — our single-file msgpack.

    The one loader behind every score-model consumer CLI: sampler, inpaint,
    distill teacher, eval, serving.
    """
    p = str(path)
    if p.endswith(".pt"):
        from toycrystals_tpu.utils.torch_interop import load_torch_score_checkpoint

        return load_torch_score_checkpoint(p)
    if os.path.isdir(p):
        from toycrystals_tpu.utils.orbax_io import is_orbax_checkpoint, load_orbax_payload

        if not is_orbax_checkpoint(p):
            raise FileNotFoundError(
                f"{p} is a directory but not a step-managed orbax checkpoint "
                "(expected <path>/<step>/ subdirectories from --ckpt-format orbax)")
        return load_orbax_payload(p)
    return load_checkpoint(p)
