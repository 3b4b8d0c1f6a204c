"""Tensor (model) parallelism: shard the weights' channel dimension.

The reference is single-device, so its model size is capped by one GPU
(SURVEY.md §2 parallelism audit: no torch.distributed anywhere). The
TPU-native way to scale the *model* — as opposed to the batch (mesh.py) or
the activations' spatial extent (spatial.py) — is GSPMD tensor parallelism:
lay a ('data', 'model') mesh and shard every weight's trailing
channel/feature dimension over 'model':

- conv kernels  (HWIO)      -> output channels sharded; the conv's NHWC
  output comes out channel-sharded for free, and the next conv's
  contraction over its input channels becomes a psum over 'model';
- dense kernels ((in, out)) -> column-parallel, same pattern;
- biases / GN scale+bias    -> sharded with the channels they modulate
  (GroupNorm stays local when the group count divides the axis — the
  U-Net's 8 groups split evenly over 2/4/8-way 'model'; when it doesn't,
  GSPMD still inserts the exact group-stat collectives, it's just chattier);
- indivisible leaves (the 1-channel output conv, scalars) replicate.

No model code changes and no manual collectives: `shard_params` places the
parameter / train-state pytree by shape rule and XLA's SPMD partitioner
propagates the layout through the whole U-Net, inserting the all-gathers /
reduce-scatters on ICI. Adam moments mirror the param layout (the optimizer
update stays fully local), so each chip also holds only 1/N of the
optimizer state — the same memory win as a 1-D ZeRO shard.

At this model's scale (1.6M params vs ~50x that in activations at 256x256)
tensor parallelism is not the perf lever — spatial.py is — but it is the
capability that lets the same training code scale base_ch past one chip's
HBM. Validated for numerics parity vs single-device on the virtual 8-CPU
mesh (tests/test_tensor_parallel.py) and compile-checked by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_tp(n_data: int, n_model: int,
                 axes: tuple[str, str] = ("data", "model")) -> Mesh:
    """2-D ('data', 'model') mesh over the first n_data*n_model devices.

    'model' is the fastest-varying axis, so the weight shards that talk every
    layer (all-gather / reduce-scatter of channel blocks) sit on ICI-adjacent
    devices; the gradient all-reduce over 'data' is once per step."""
    need = n_data * n_model
    devices = jax.devices()
    if need > len(devices):
        raise ValueError(f"asked for {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_model), axes)


def make_mesh_3d(n_data: int, n_space: int, n_model: int,
                 axes: tuple[str, str, str] = ("data", "space", "model")) -> Mesh:
    """3-D ('data', 'space', 'model') mesh: dp x sp x tp composed.

    One mesh, all three parallelism kinds at once — batch over 'data',
    activation height over 'space' (parallel/spatial.py) and weight channels
    over 'model': GSPMD cross-products the layouts, so a conv sees H-sharded
    inputs AND out-channel-sharded kernels and emits both the halo exchange
    and the channel collectives. Axis order = collective frequency: 'model'
    innermost (channel all-gathers every layer ride adjacent ICI links),
    'space' next (halo exchanges), 'data' outermost (one gradient
    all-reduce per step)."""
    need = n_data * n_space * n_model
    devices = jax.devices()
    if need > len(devices):
        raise ValueError(f"asked for {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_space, n_model), axes)


def tp_sharding(mesh: Mesh, shape: tuple[int, ...],
                axis: str = "model") -> NamedSharding:
    """Trailing-dimension rule: shard a weight's last dim over `axis` when it
    divides evenly, else replicate.

    The last dim is the channel/feature dim for every leaf kind in this
    framework: conv kernels are HWIO, dense kernels (in, out), embeddings
    (vocab, feat), biases / GN scale+bias (ch,). Scalars and indivisible
    leaves (e.g. the 1-channel output conv) replicate — graceful, not fatal.
    """
    n = dict(mesh.shape)[axis]
    if len(shape) and shape[-1] % n == 0 and shape[-1] >= n:
        return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh | None, tree: Any) -> Any:
    """Place a params / train-state pytree for `mesh`.

    Dispatches on the mesh axes — the same pattern that makes `data_sharding`
    spatial-aware, so every existing `mesh=` path (train step, fused epoch,
    `sample_chunked`) becomes tensor-parallel just by being handed a
    ('data','model') mesh:

    - no mesh            -> passthrough;
    - no 'model' axis    -> full replication (data / spatial parallelism);
    - 'model' axis       -> trailing-dim channel sharding via `tp_sharding`.

    Works on raw params and on whole TrainStates: Adam moments mirror param
    shapes leaf-for-leaf so they shard identically; step counters and other
    scalars replicate."""
    if mesh is None:
        return tree
    if "model" not in mesh.axis_names:
        sharding = NamedSharding(mesh, P())
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.device_put(x, tp_sharding(mesh, np.shape(x))), tree
    )


def tp_coverage(mesh: Mesh, params: Any) -> float:
    """Fraction of parameter ELEMENTS the trailing-dim rule actually shards —
    print this when enabling --shard-model so a config whose channel counts
    don't divide the axis (coverage ~0, pure replication overhead) is visible
    instead of a silent no-op."""
    tot = sh = 0
    for leaf in jax.tree.leaves(params):
        size = int(np.prod(np.shape(leaf))) if np.ndim(leaf) else 1
        tot += size
        if not tp_sharding(mesh, np.shape(leaf)).is_fully_replicated:
            sh += size
    return sh / max(tot, 1)
