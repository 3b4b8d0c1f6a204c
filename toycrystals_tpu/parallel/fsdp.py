"""Fully-sharded data parallelism (ZeRO-3 placement over the 'data' axis).

The reference is single-device, so its memory ceiling is one GPU's: params,
Adam moments and EMA all live whole on the chip (SURVEY.md §2 parallelism
audit). Plain data parallelism (mesh.py) replicates that whole set per chip
— N chips buy batch throughput but zero memory headroom. The TPU-native way
to buy BOTH is FSDP: keep the batch sharded over 'data' AND shard every
weight over the same axis, so each chip holds 1/N of the params, 1/N of the
Adam moments and 1/N of the EMA:

- placement only, no model changes: `fsdp_sharding` picks each leaf's
  largest evenly-divisible dim and lays it over 'data' (indivisible leaves
  and scalars replicate — graceful, not fatal);
- XLA's SPMD partitioner then materialises each weight just-in-time: an
  all-gather over ICI right before the layer uses it, and a reduce-scatter
  of its gradient right after — the classic ZeRO-3 schedule, inferred from
  the shardings instead of hand-written;
- the optimizer update stays fully local (grads arrive in the same 1/N
  layout the moments live in), and EMA/donation work unchanged because the
  whole TrainState shards leaf-for-leaf.

Composes with tensor parallelism: on a ('data','model') mesh the trailing
channel dim is already owned by 'model' (parallel/tensor.py), so the FSDP
rule shards the largest REMAINING dim over 'data' — 2-D weight sharding,
ZeRO on top of TP.

At this model's scale (1.6M params) FSDP is not a necessity — it is the
capability that keeps `--shard N` viable when base_ch grows the model past
one chip's HBM without changing throughput semantics. Numerics parity vs
single-device is tested on the virtual 8-CPU mesh (tests/test_fsdp.py) and
the driver dryrun compiles an fsdp leg (__graft_entry__.py).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_sharding(mesh: Mesh, shape: tuple[int, ...],
                  axis: str = "data") -> NamedSharding:
    """Largest-divisible-dim rule: shard one dim of the leaf over `axis`.

    Picks the largest dim evenly divisible by the axis size (ties -> the
    later dim, which for conv HWIO / dense (in, out) kernels prefers the
    output-channel dim — the same dim ZeRO implementations flatten along).
    If the mesh also has a 'model' axis, the trailing dim belongs to tensor
    parallelism (parallel/tensor.py `tp_sharding`) and is excluded here, so
    the two compose into a 2-D weight layout. Leaves with no divisible dim
    (and scalars) replicate over `axis`.
    """
    n = dict(mesh.shape)[axis]
    spec: list[Any] = [None] * len(shape)
    has_tp = "model" in mesh.axis_names
    if has_tp and len(shape) and shape[-1] % dict(mesh.shape)["model"] == 0 \
            and shape[-1] >= dict(mesh.shape)["model"]:
        spec[-1] = "model"
    candidates = [i for i, d in enumerate(shape)
                  if d % n == 0 and d >= n and spec[i] is None]
    if candidates:
        best = max(candidates, key=lambda i: (shape[i], i))
        spec[best] = axis
    return NamedSharding(mesh, P(*spec))


def shard_params_fsdp(mesh: Mesh | None, tree: Any) -> Any:
    """ZeRO-3 placement: device_put every leaf of a params / TrainState
    pytree with `fsdp_sharding`. Adam moments and EMA mirror param shapes
    leaf-for-leaf, so each chip holds 1/N of all three. mesh=None is a
    passthrough."""
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda x: jax.device_put(x, fsdp_sharding(mesh, np.shape(x))), tree
    )


def fsdp_coverage(mesh: Mesh, params: Any) -> float:
    """Fraction of parameter ELEMENTS the rule actually shards over 'data'
    — print when enabling --fsdp so indivisible configs are visible."""
    tot = sh = 0
    for leaf in jax.tree.leaves(params):
        size = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        tot += size
        if "data" in tuple(fsdp_sharding(mesh, np.shape(leaf)).spec):
            sh += size
    return sh / max(tot, 1)
