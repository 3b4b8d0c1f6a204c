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
from pathlib import Path
from typing import Any

import flax.serialization as ser
import jax
import numpy as np


def _to_plain(tree: Any) -> Any:
    """Device arrays -> numpy; leave scalars/strings/lists alone."""
    return jax.tree.map(
        lambda x: np.asarray(jax.device_get(x)) if hasattr(x, "dtype") else x, tree
    )


def save_checkpoint(path: str | Path, tree: Any) -> None:
    """Atomically write `tree` (any pytree / nested dict) as msgpack."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = ser.msgpack_serialize(ser.to_state_dict(_to_plain(tree)))
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str | Path, target: Any = None) -> Any:
    """Read a checkpoint; restore onto `target`'s structure when given."""
    raw = ser.msgpack_restore(Path(path).read_bytes())
    if target is None:
        return raw
    return ser.from_state_dict(target, raw)
