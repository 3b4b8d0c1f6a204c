"""Padding primitives for periodic (circular) convolutions.

The reference uses `padding_mode="circular"` on its convs
(`/root/reference/src/toycrystals/models/sde_score_model.py:102-105,208-225`)
because lattices are periodic. XLA has no circular conv mode; the TPU-native
composition is an explicit wrap-pad (a cheap on-device gather XLA fuses into
the conv's input) followed by a VALID conv — numerically identical.
"""

from __future__ import annotations

import jax.numpy as jnp


def circular_pad(x: jnp.ndarray, pad: int | tuple[int, int]) -> jnp.ndarray:
    """Wrap-pad the spatial dims of an NHWC tensor.

    pad: int p (symmetric) or (lo, hi) applied to both H and W. Matches
    torch's circular padding semantics for k3/p1 and k4/s2/p1 convs.
    """
    if isinstance(pad, int):
        lo = hi = pad
    else:
        lo, hi = pad
    return jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)), mode="wrap")
