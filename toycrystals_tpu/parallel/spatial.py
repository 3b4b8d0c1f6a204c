"""Spatial (sequence) parallelism: shard the activation H-dimension.

The reference is single-device, so hi-res sampling is capped by one chip's
memory and FLOPs. The TPU-native scale-out for CNN/attention workloads whose
*activations* (not params) dominate — exactly this model at 256x256, where a
CFG-doubled batch of 12 carries ~50x the activation bytes of the whole
parameter tree — is GSPMD spatial partitioning: lay a 2-D ('data', 'space')
mesh, shard NHWC images over batch AND height, and let XLA's SPMD partitioner
insert the boundary communication:

- 3x3/4x4 circular convs  -> collective-permute halo exchange of 1-2 rows
  between H-neighbour shards (and wrap rows between the first/last shard,
  since the circular pad is a concat of H-slices);
- GroupNorm              -> psum of the group statistics over 'space';
- mid-block attention    -> sequence-parallel SDPA (Q stays H-sharded,
  K/V all-gathered over 'space' — 256 tokens at 64x64, small);
- bilinear upsample      -> neighbour-row exchange.

Everything rides ICI; no model code changes — the samplers pin their scan
carry to the image sharding (`sharding=` static arg) and GSPMD propagates it
through the whole U-Net. Validated for numerics parity vs single-device on
the 8-device virtual CPU mesh (tests/test_spatial.py) and compile-checked by
`__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_space: int,
                 axes: tuple[str, str] = ("data", "space")) -> Mesh:
    """2-D mesh over the first n_data*n_space devices.

    The 'space' axis is the fastest-varying one, so H-neighbour shards sit on
    ICI-adjacent devices and halo exchange stays one hop."""
    need = n_data * n_space
    devices = jax.devices()
    if need > len(devices):
        raise ValueError(f"asked for {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_space), axes)


def image_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """NHWC images sharded over batch ('data') and height ('space').

    Works on the 2-D mesh from `make_mesh_2d`; on a 1-D 'data' mesh it
    degrades to plain batch sharding (no 'space' axis to use)."""
    if "space" in mesh.axis_names:
        assert ndim >= 2
        return NamedSharding(mesh, P("data", "space", *([None] * (ndim - 2))))
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def check_spatial_divisibility(img_size: int, n_space: int) -> None:
    """H must split evenly across 'space' at every U-Net resolution (H, H/2,
    H/4): GSPMD can pad, but unequal shards silently serialise the halo
    pattern — reject early with an actionable message instead."""
    if (img_size // 4) % n_space:
        raise ValueError(
            f"img_size {img_size} not spatially shardable over {n_space} "
            f"devices: H/4 = {img_size // 4} must divide by the 'space' axis"
        )
