"""Device mesh + sharding helpers for multi-chip scale-out.

The reference is strictly single-process/single-device (SURVEY.md §2
"parallelism audit": no torch.distributed / NCCL anywhere). The TPU-native
equivalent is GSPMD over a 1-D `jax.sharding.Mesh` on the ICI ring:

- training: batch sharded over the 'data' axis, params replicated; jitting
  the train step under these shardings makes XLA insert the gradient
  all-reduce (psum over ICI) automatically;
- sampling: the big sample batch is sharded the same way, so a 4096-image
  grid on a v5e-8 runs 512 images/chip with zero cross-chip traffic until
  the host gather.

Validated on an 8-device virtual CPU mesh in tests and via
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"asked for {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim, replicate the rest.

    On a 2-D ('data','space') mesh (parallel/spatial.py), 4-D leaves are NHWC
    images and additionally shard their height over 'space' — so passing the
    2-D mesh through any existing `mesh=` path (train step, fused epoch,
    chunked sampling) turns on spatial partitioning with no other changes."""
    if "space" in mesh.axis_names and ndim == 4:
        return NamedSharding(mesh, P(axis, "space", None, None))
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(mesh: Mesh | None, batch: Any, axis: str = "data") -> Any:
    """device_put every leaf with its leading dim sharded over the mesh
    (scalars pass through). mesh=None is a passthrough, so single-device
    call sites need no conditional. On a multi-process mesh the leaves
    route through parallel/multihost.py global_batch (each process
    materialises only its addressable shards)."""
    if mesh is None:
        return batch
    if jax.process_count() > 1:
        from toycrystals_tpu.parallel.multihost import global_batch

        return global_batch(mesh, batch, axis)
    return jax.tree.map(
        lambda x: x if np.ndim(x) == 0
        else jax.device_put(x, data_sharding(mesh, np.ndim(x), axis)),
        batch,
    )


def replicate(mesh: Mesh | None, tree: Any) -> Any:
    """Fully replicate a pytree (params / train state) over the mesh.
    mesh=None is a passthrough."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def constrain_batch(mesh: Mesh | None, batch: Any, axis: str = "data") -> Any:
    """Annotate a pytree of in-program values as batch-sharded (leading dim
    over `axis`, rest replicated). Use INSIDE a jitted program — this is the
    GSPMD hook that makes the fused-epoch scan distribute its on-device
    datagen/gather and every train step across the mesh (scalars pass
    through unconstrained). mesh=None is a passthrough."""
    if mesh is None:
        return batch
    return jax.tree.map(
        lambda x: x if np.ndim(x) == 0
        else jax.lax.with_sharding_constraint(x, data_sharding(mesh, np.ndim(x), axis)),
        batch,
    )
