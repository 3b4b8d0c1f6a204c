"""Expert parallelism: shard the MoE prior's stacked experts over 'expert'.

Completes the framework's parallelism taxonomy (data / spatial / tensor /
pipeline / expert — mesh.py, spatial.py, tensor.py, pipeline.py, this).
The reference is single-device and dense (SURVEY.md §2 parallelism audit);
the MoE prior (models/moe_prior.py) is new TPU scope, and its weights carry
their parallelism handle in their shape: every expert leaf is stacked
[n_experts, ...], so placement is one rule —

- leaves whose leading dim == n_experts (the w1/b1/w2/b2 stacks) shard that
  dim over 'expert': each chip owns E/N experts and their Adam moments;
- everything else (stem, router, LayerNorms, head) replicates.

No manual collectives: with the batch sharded over 'data' and experts over
'expert', GSPMD runs the dense-dispatch einsums locally per expert shard and
turns the combine einsum's contraction over E into one psum over ICI
(the same schedule a capacity-bucketed sparse MoE needs an all_to_all pair
for). Numerics parity vs single-device is tested on the virtual 8-CPU mesh
(tests/test_expert_parallel.py) and the driver dryrun compiles an ep leg.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_ep(n_data: int, n_expert: int,
                 axes: tuple[str, str] = ("data", "expert")) -> Mesh:
    """2-D ('data', 'expert') mesh over the first n_data*n_expert devices.
    'expert' fastest-varying: the per-block combine psum rides adjacent ICI
    links, the per-step gradient all-reduce over 'data' is once a step."""
    need = n_data * n_expert
    devices = jax.devices()
    if need > len(devices):
        raise ValueError(f"asked for {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_expert), axes)


def expert_sharding(mesh: Mesh, shape: tuple[int, ...],
                    n_experts: int) -> NamedSharding:
    """Leading-dim rule: shard dim 0 over 'expert' when it IS the expert
    stack (== n_experts and divisible by the axis size); else replicate."""
    n = dict(mesh.shape)["expert"]
    if len(shape) and shape[0] == n_experts and n_experts % n == 0:
        return NamedSharding(mesh, P("expert", *([None] * (len(shape) - 1))))
    return NamedSharding(mesh, P())


def place_expert_state(mesh: Mesh | None, tree: Any, n_experts: int) -> Any:
    """device_put a params / TrainState pytree: expert stacks 1/N per chip
    over 'expert' (Adam moments mirror param shapes leaf-for-leaf, so each
    chip also holds only its local experts' optimizer state), the rest
    replicated. mesh=None is a passthrough."""
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda x: jax.device_put(x, expert_sharding(mesh, np.shape(x), n_experts)),
        tree,
    )


def ep_coverage(mesh: Mesh, params: Any, n_experts: int) -> float:
    """Fraction of parameter ELEMENTS living on the 'expert' axis — print
    when enabling --shard-expert so a config where the experts don't divide
    the axis is visible instead of a silent no-op."""
    tot = sh = 0
    for leaf in jax.tree.leaves(params):
        size = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        tot += size
        if not expert_sharding(mesh, np.shape(leaf), n_experts).is_fully_replicated:
            sh += size
    return sh / max(tot, 1)
