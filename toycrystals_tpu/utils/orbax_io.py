"""Distributed (sharded) checkpointing via Orbax — the multi-chip format.

The default single-file msgpack checkpoint (`utils/checkpoint.py`) pulls the
FULL train state to one host: under `--fsdp` / `--shard-model` that silently
all-gathers every shard through the tunnel on each save, and restore re-uploads
the whole state before `place_state` re-shards it — fine at toy scale, wrong
at the scale ZeRO-3 exists for. `--ckpt-format orbax` is the TPU-native
alternative (the SURVEY §5 plan this framework originally deviated from):

- **per-shard IO**: each device's shard is written/read directly (OCDBT);
  no gather on save, no replicate-then-reshard on restore;
- **resharding restore**: the restore target carries the *desired* shardings
  (whatever mesh/fsdp/tp layout the resuming run uses), so a checkpoint saved
  on an 8-way FSDP mesh restores onto 4-way TP, a single chip, or the CPU
  test mesh (`restore_onto`);
- **step-managed layout + retention**: one step directory per epoch with
  atomic commit semantics and `max_to_keep` garbage collection — a crash
  mid-save never corrupts the previous epoch (the msgpack path's
  write-to-tmp + rename contract, upgraded to directories);
- **async**: array commits overlap the next epoch (Orbax's own async
  machinery), with `wait()` as the durability barrier — the same contract as
  `utils.AsyncCheckpointer`.

Layout on disk: ``<path>/<step>/{state,meta}`` where `state` is the Orbax
array tree (the flax state-dict of the TrainState — msgpack-compatible
nesting) and `meta` is the JSON sidecar (`epoch_next`, `loss_hist`,
`config` — the same self-describing payload the msgpack format embeds).

`load_orbax_payload` reads any such directory WITHOUT a target (sampler /
serving / eval path): array metadata reconstructs the abstract tree and
every leaf lands on the default device, so a checkpoint trained on an
8-device mesh serves from one chip.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import flax.serialization as ser
import jax


def is_orbax_checkpoint(path: str | Path) -> bool:
    """True for a step-managed Orbax checkpoint directory (vs msgpack file)."""
    p = Path(path)
    if not p.is_dir():
        return False
    return any(c.is_dir() and c.name.isdigit() for c in p.iterdir())


class ShardedCheckpointManager:
    """Step-per-epoch Orbax manager holding the newest `max_to_keep` epochs.

    `save(step, state, meta)` starts an async per-shard commit (arrays stay
    wherever GSPMD placed them); `wait()` is the durability barrier —
    call it (or close()) before declaring the run done. `restore_onto`
    re-materialises the newest (or a given) step directly INTO the shardings
    of a placed template state.
    """

    def __init__(self, path: str | Path, max_to_keep: int = 1):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.path = Path(path).absolute()
        self._mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any, meta: dict) -> None:
        """Async-commit `state` (a TrainState or any pytree of jax.Arrays,
        sharded or not) + the JSON-able `meta` sidecar as epoch `step`."""
        ocp = self._ocp
        self._mgr.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(ser.to_state_dict(state)),
                meta=ocp.args.JsonSave(meta),
            ),
        )

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore_onto(self, state_like: Any, step: int | None = None):
        """(state, meta) with every array restored INTO `state_like`'s
        shardings — the resharding path. `state_like` is the *placed*
        template (post `place_state`): its leaf shardings define the target
        layout, whatever mesh the saving run used."""
        ocp = self._ocp
        step = self._mgr.latest_step() if step is None else int(step)
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {self.path}")
        template = ser.to_state_dict(state_like)
        abstract = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
            template,
        )
        r = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return ser.from_state_dict(state_like, r.state), dict(r.meta)

    def wait(self) -> None:
        """Durability barrier: block until the in-flight commit is final."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

    def __enter__(self) -> "ShardedCheckpointManager":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        # mirror AsyncCheckpointer: always join the writer; on an in-body
        # exception report a failed commit instead of masking the original
        try:
            self.close()
        except BaseException as werr:  # noqa: BLE001
            if exc is None:
                raise
            import sys

            print(f"warning: sharded checkpoint commit failed during "
                  f"shutdown: {werr!r}", file=sys.stderr)


def load_orbax_meta(path: str | Path, step: int | None = None) -> dict:
    """Read ONLY the JSON sidecar (epoch_next / loss_hist / config) — the
    cheap pre-build peek the trainer's --resume path does before it knows
    the model shape (no array IO)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else int(step)
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {path}")
        r = mgr.restore(step, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
    return dict(r.meta)


def load_orbax_payload(path: str | Path, step: int | None = None) -> dict:
    """Read an Orbax checkpoint dir as a plain payload dict — the
    target-free path for the sampler / serving / eval CLIs, payload-shaped
    exactly like `load_checkpoint(msgpack)`: ``{"state": {...}, **meta}``.

    Every leaf restores onto the default device (explicit single-device
    sharding in the abstract tree), so topology does not need to match the
    saving run.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else int(step)
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {path}")
        dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=dev),
            mgr.item_metadata(step).state,
        )
        r = mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
    return {"state": r.state, **dict(r.meta)}
