"""Latent diffusion prior: FiLM epsilon-MLP + DDPM schedule + compiled DDIM.

Capability parity with `/root/reference/src/toycrystals/models/diffusion_prior.py`:

- `timestep_embedding_discrete` — sinusoidal embedding for integer t with the
  reference's exact frequency law (exp(-linspace(0, ln 1e4, half)), sin-first;
  `diffusion_prior.py:11-25`; note this deliberately differs from the
  continuous embedding in `sde_score_model.py`, which is cos-first).
- `FiLMResBlock` / `DiffusionPriorFiLM` — the trained prior
  (`diffusion_prior.py:39-127`); trainer hardcodes n_blocks=8,
  y_cat_emb_dim=64 (`train_diffusion_prior.py:196-204`).
- `DiffusionPrior` — the plain-MLP variant kept for API parity
  (`diffusion_prior.py:130-164`).
- `DiffusionSchedule` — precomputed linear-beta DDPM constants
  (`diffusion_prior.py:167-198`) with `q_sample` and `ddim_sample`.

TPU-first: the DDIM loop compiles as ONE `jax.lax.scan` program over a
statically deduplicated timestep subset (the reference runs an eager Python
loop of sequential net evals, `diffusion_prior.py:225-251`). eta != 0 is
rejected exactly like the reference (`diffusion_prior.py:247-248`).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def timestep_embedding_discrete(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding for integer timesteps, [sin, cos] ordering
    (`diffusion_prior.py:11-25`)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.linspace(0.0, math.log(10_000.0), half))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def y_vec(y_cat: jax.Array, y_cont: jax.Array, n_types: int) -> jax.Array:
    """one_hot ++ y_cont (`diffusion_prior.py:28-36`)."""
    y_oh = jax.nn.one_hot(y_cat, n_types, dtype=jnp.float32)
    return jnp.concatenate([y_oh, y_cont.astype(jnp.float32)], axis=1)


class FiLMResBlock(nn.Module):
    """LayerNorm -> FiLM(gamma, beta from cond) -> MLP(4x) -> residual
    (`diffusion_prior.py:39-54`)."""

    width: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        h = nn.LayerNorm(dtype=self.dtype)(x)
        gamma, beta = jnp.split(
            nn.Dense(2 * self.width, dtype=self.dtype, name="cond")(cond), 2, axis=-1
        )
        h = h * (1.0 + gamma) + beta
        h = nn.Dense(self.mult * self.width, dtype=self.dtype, name="fc1")(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="fc2")(nn.silu(h))
        return x + h


class DiffusionPriorFiLM(nn.Module):
    """eps-prediction residual MLP with FiLM conditioning from (t, y)
    (`diffusion_prior.py:57-127`)."""

    z_dim: int
    n_types: int
    y_cont_dim: int
    t_emb_dim: int = 64
    width: int = 256
    n_blocks: int = 6
    y_cat_emb_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_t, t, y_cat, y_cont):
        te = timestep_embedding_discrete(t, self.t_emb_dim).astype(self.dtype)
        t_feat = nn.Dense(self.width, dtype=self.dtype)(te)
        t_feat = nn.Dense(self.width, dtype=self.dtype)(nn.silu(t_feat))

        y_cat_feat = nn.Embed(self.n_types, self.y_cat_emb_dim, dtype=self.dtype)(y_cat)
        yc = y_cont.astype(self.dtype)
        y_cont_feat = nn.Dense(self.y_cat_emb_dim, dtype=self.dtype)(yc)
        y_cont_feat = nn.Dense(self.y_cat_emb_dim, dtype=self.dtype)(nn.silu(y_cont_feat))
        y_feat = jnp.concatenate([y_cat_feat, y_cont_feat], axis=-1)
        y_feat = nn.Dense(self.width, dtype=self.dtype)(y_feat)
        y_feat = nn.Dense(self.width, dtype=self.dtype)(nn.silu(y_feat))

        cond = jnp.concatenate([t_feat, y_feat], axis=-1)  # [B, 2*width]

        h = nn.Dense(self.width, dtype=self.dtype, name="in_proj")(z_t.astype(self.dtype))
        for i in range(self.n_blocks):
            h = FiLMResBlock(self.width, dtype=self.dtype, name=f"block_{i}")(h, cond)
        h = nn.LayerNorm(dtype=self.dtype, name="out_norm")(h)
        return nn.Dense(self.z_dim, dtype=self.dtype, name="out_proj")(h).astype(jnp.float32)


class DiffusionPrior(nn.Module):
    """Plain 4-layer ReLU MLP variant (`diffusion_prior.py:130-164`)."""

    z_dim: int
    n_types: int
    y_cont_dim: int
    t_emb_dim: int = 64
    width: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_t, t, y_cat, y_cont):
        te = timestep_embedding_discrete(t, self.t_emb_dim)
        y = y_vec(y_cat, y_cont, self.n_types)
        h = jnp.concatenate([z_t, y, te], axis=1).astype(self.dtype)
        for _ in range(3):
            h = nn.relu(nn.Dense(self.width, dtype=self.dtype)(h))
        return nn.Dense(self.z_dim, dtype=self.dtype)(h).astype(jnp.float32)


@flax.struct.dataclass
class DiffusionSchedule:
    """Precomputed DDPM constants for a linear beta schedule
    (`diffusion_prior.py:167-189`). A pytree: safe to close over in jit."""

    betas: jax.Array
    alphas: jax.Array
    alpha_bars: jax.Array
    sqrt_alpha_bars: jax.Array
    sqrt_one_minus_alpha_bars: jax.Array

    @staticmethod
    def linear(T: int, beta_start: float, beta_end: float) -> "DiffusionSchedule":
        betas = jnp.linspace(beta_start, beta_end, T, dtype=jnp.float32)
        alphas = 1.0 - betas
        alpha_bars = jnp.cumprod(alphas)
        return DiffusionSchedule(
            betas=betas,
            alphas=alphas,
            alpha_bars=alpha_bars,
            sqrt_alpha_bars=jnp.sqrt(alpha_bars),
            sqrt_one_minus_alpha_bars=jnp.sqrt(1.0 - alpha_bars),
        )

    @property
    def T(self) -> int:
        return self.betas.shape[0]

    def q_sample(self, z0: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
        """z_t = sqrt(abar_t) z0 + sqrt(1-abar_t) eps (`diffusion_prior.py:191-198`)."""
        a = self.sqrt_alpha_bars[t][:, None]
        b = self.sqrt_one_minus_alpha_bars[t][:, None]
        return a * z0 + b * eps


def ddim_timesteps(T: int, n_steps: int) -> np.ndarray:
    """Descending timestep subset: round(linspace(T-1, 0, n)) deduplicated
    (`diffusion_prior.py:219-222`). Static (host-side) so the sampling loop
    has a fixed trip count for lax.scan."""
    ts = np.round(np.linspace(T - 1, 0, n_steps)).astype(np.int64)
    keep = np.ones(len(ts), bool)
    keep[1:] = ts[1:] != ts[:-1]
    return ts[keep]


@partial(jax.jit, static_argnums=(0, 5, 6, 8))
def ddim_sample(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sched: DiffusionSchedule,
    y_cat: jax.Array,
    y_cont: jax.Array,
    n_steps: int,
    z_dim: int,
    key: jax.Array,
    eta: float = 0.0,
) -> jax.Array:
    """Deterministic DDIM (eta=0) compiled as one lax.scan
    (`diffusion_prior.py:200-252`).

    apply_fn(params, z_t, t, y_cat, y_cont) -> eps_pred. Returns z0 [B, z_dim].
    """
    if eta != 0.0:
        raise NotImplementedError("eta != 0 not implemented (parity with reference)")

    b = y_cat.shape[0]
    ts = ddim_timesteps(sched.T, n_steps)
    n = len(ts)
    t_cur = jnp.asarray(ts, jnp.int32)
    t_prev = jnp.asarray(np.concatenate([ts[1:], ts[-1:]]), jnp.int32)
    is_last = jnp.asarray(np.arange(n) == n - 1)

    z = jax.random.normal(key, (b, z_dim), jnp.float32)

    def body(z, step):
        t, tp, last = step
        tb = jnp.full((b,), t, jnp.int32)
        eps_pred = apply_fn(params, z, tb, y_cat, y_cont)

        abar_t = sched.alpha_bars[t]
        z0_pred = (z - jnp.sqrt(1.0 - abar_t) * eps_pred) / (jnp.sqrt(abar_t) + 1e-8)

        abar_prev = sched.alpha_bars[tp]
        z_next = jnp.sqrt(abar_prev) * z0_pred + jnp.sqrt(1.0 - abar_prev) * eps_pred
        return jnp.where(last, z0_pred, z_next), None

    z, _ = jax.lax.scan(body, z, (t_cur, t_prev, is_last))
    return z
