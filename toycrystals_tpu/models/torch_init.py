"""Reference-compatible (torch-default) parameter initialisation.

The reference's layers use torch's defaults: Conv/Linear kernels
kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) (std 0.577/sqrt(fan_in)),
biases U(+-1/sqrt(fan_in)), Embedding N(0, 1). Flax defaults differ (kernels
lecun_normal std 1/sqrt(fan_in), biases zero, Embed ~N(0, 1/sqrt(fan))), which
shifts early-training trajectories even with identical architecture and data.

`torch_like_init` re-draws a flax param tree with torch's statistics so
reproduction runs can be compared against the reference's committed loss
curves apples-to-apples. Opt-in (`--init torch` on the SDE trainer); the flax
defaults remain the framework default.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _fan_in(path: tuple, w: jax.Array) -> int:
    if w.ndim >= 2:
        # conv kernels [kh, kw, cin, cout] / dense [in, out]: all but last dim
        n = 1
        for d in w.shape[:-1]:
            n *= d
        return n
    return max(w.shape[0], 1)


def torch_like_init(key: jax.Array, params: Any) -> Any:
    """Re-draw every leaf of a flax param tree with torch-default statistics.

    kernels -> U(+-1/sqrt(fan_in)); biases -> U(+-1/sqrt(fan_in)) of their
    layer's kernel; embeddings -> N(0, 1); norm scales/biases (1-D named
    scale/bias) keep their 1/0 init.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    # map each bias to its sibling kernel's fan_in
    kernel_fan: dict[tuple, int] = {}
    for path, leaf in flat:
        names = tuple(getattr(p, "key", str(p)) for p in path)
        if names and names[-1] in ("kernel", "embedding"):
            kernel_fan[names[:-1]] = _fan_in(names, leaf)

    new_leaves = []
    for i, (path, leaf) in enumerate(flat):
        names = tuple(getattr(p, "key", str(p)) for p in path)
        k = jax.random.fold_in(key, i)
        last = names[-1] if names else ""
        if last == "kernel":
            bound = 1.0 / jnp.sqrt(_fan_in(names, leaf))
            new = jax.random.uniform(k, leaf.shape, leaf.dtype, -bound, bound)
        elif last == "embedding":
            new = jax.random.normal(k, leaf.shape, leaf.dtype)
        elif last == "bias" and names[:-1] in kernel_fan:
            bound = 1.0 / jnp.sqrt(kernel_fan[names[:-1]])
            new = jax.random.uniform(k, leaf.shape, leaf.dtype, -bound, bound)
        else:  # norm scale/bias etc. keep framework init
            new = leaf
        new_leaves.append(new)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
