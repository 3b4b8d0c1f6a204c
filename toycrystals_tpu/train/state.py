"""Functional train state: (step, params, opt_state, ema_params) in one pytree.

The reference mutates nn.Modules in place and keeps EMA as a second frozen
model copy updated by a Python loop over parameters
(`/root/reference/scripts/train_sde_score_model.py:160-175,236-240`).
TPU-first, everything lives in ONE donated pytree so the per-step EMA lerp is
a fused `jax.tree.map` inside the compiled step — effectively free.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled

    @property
    def sample_params(self) -> Any:
        """Parameters to sample with: EMA when enabled, else the live params
        (the `--sample-from-ema` convention, `train_sde_score_model.py:266-268`)."""
        return self.params if self.ema_params is None else self.ema_params


def create_train_state(
    params: Any, tx: optax.GradientTransformation, ema: bool = False
) -> TrainState:
    ema_params = jax.tree.map(jnp.copy, params) if ema else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=ema_params,
    )


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """p_ema <- d * p_ema + (1 - d) * p (`train_sde_score_model.py:236-240`)."""
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)
