"""Mixture-of-experts latent diffusion prior (new TPU scope, no reference
counterpart).

The reference's FiLM prior is a dense residual MLP
(`/root/reference/src/toycrystals/models/diffusion_prior.py:57-127`); its
capacity scales only by width. The TPU-native way to scale capacity WITHOUT
scaling per-token FLOPs is sparse expert routing (Switch/GShard), and the
TPU-native way to hold the extra weights is expert parallelism: experts
stacked on a leading [E, ...] axis and sharded over an 'expert' mesh axis
(parallel/expert.py), so each chip owns E/N experts and the combine is one
psum over ICI.

Routing here is switch-style top-1 on the FiLM conditioning vector (t, y) —
the natural routing signal for a diffusion model, where the useful
specialisation axis is the noise level / class, and it makes routing
*uniform across the batch dimension of each (t, y)*, so expert choice is
deterministic per condition (good for sampling reproducibility).

Dispatch is DENSE (every expert computes every token, the top-1 mask selects
at combine time). At this scale that is the right TPU call: B*d*f einsums
keep the MXU busy, while capacity-bucketed sparse dispatch (ragged
all_to_all) only pays off when experts no longer fit compute — the
parallelism story (weights sharded over 'expert', psum combine) is identical
either way, which is what this module exists to demonstrate. The classic
load-balancing auxiliary loss (E * sum_e f_e p_e, Switch Transformer eq. 4)
is sown into the 'losses' collection; the trainer adds it with
--moe-aux-weight (a no-op during sampling, where the collection is
immutable).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from toycrystals_tpu.models.diffusion_prior import timestep_embedding_discrete


class MoEFiLMResBlock(nn.Module):
    """FiLMResBlock (models/diffusion_prior.py:54-71) with the MLP replaced
    by n_experts switch-routed expert MLPs; routing on the FiLM cond."""

    width: int
    n_experts: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array) -> jax.Array:
        d, f, e = self.width, self.mult * self.width, self.n_experts
        h = nn.LayerNorm(dtype=self.dtype)(x)
        gamma, beta = jnp.split(
            nn.Dense(2 * d, dtype=self.dtype, name="cond")(cond), 2, axis=-1
        )
        h = h * (1.0 + gamma) + beta

        # switch top-1 router on the conditioning vector
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            cond.astype(jnp.float32))                        # [B, E]
        probs = jax.nn.softmax(logits, axis=-1)
        top = jnp.argmax(probs, axis=-1)                     # [B]
        onehot = jax.nn.one_hot(top, e, dtype=probs.dtype)   # [B, E]
        # scale by the router prob: the straight-through path that gives the
        # router its gradient (Switch Transformer §2.2)
        combine = onehot * jnp.sum(probs * onehot, axis=-1, keepdims=True)

        # load-balancing aux (Switch eq. 4): E * sum_e f_e * p_e, minimised
        # (=1) at uniform routing; sown, added by the trainer when mutable
        f_e = jnp.mean(onehot, axis=0)
        p_e = jnp.mean(probs, axis=0)
        self.sow("losses", "moe_aux", e * jnp.sum(f_e * p_e))
        # routing fractions per expert, for utilisation diagnostics
        # (scripts/eval: apply with mutable=["intermediates"]); free unless
        # the collection is requested
        self.sow("intermediates", "route_fraction", f_e)

        # stacked expert weights: leading E axis is the expert-parallel
        # sharding handle (parallel/expert.py shards it over 'expert')
        init = nn.initializers.lecun_normal()
        w1 = self.param("w1", init, (e, d, f), self.dtype)
        b1 = self.param("b1", nn.initializers.zeros, (e, f), self.dtype)
        w2 = self.param("w2", init, (e, f, d), self.dtype)
        b2 = self.param("b2", nn.initializers.zeros, (e, d), self.dtype)

        # dense dispatch: every expert, every token (see module docstring);
        # with w*/b* sharded over 'expert' each chip computes only its local
        # experts and the combine einsum contracts E -> GSPMD psum over ICI
        he = jnp.einsum("bd,edf->ebf", h, w1) + b1[:, None, :]   # [E, B, f]
        he = jnp.einsum("ebf,efd->ebd", nn.silu(he), w2) + b2[:, None, :]
        out = jnp.einsum("ebd,be->bd", he, combine.astype(self.dtype))
        return x + out


class DiffusionPriorMoE(nn.Module):
    """DiffusionPriorFiLM (models/diffusion_prior.py:74-107) with MoE FiLM
    blocks — same stem (t/y embeddings -> cond), same head, same eps-MLP
    contract, so it drops into the existing trainer/sampler/checkpoint
    plumbing; `n_experts` is recorded in the checkpoint config."""

    z_dim: int
    n_types: int
    y_cont_dim: int
    n_experts: int = 4
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
            h = MoEFiLMResBlock(self.width, self.n_experts, dtype=self.dtype,
                                name=f"block_{i}")(h, cond)
        h = nn.LayerNorm(dtype=self.dtype, name="out_norm")(h)
        return nn.Dense(self.z_dim, dtype=self.dtype, name="out_proj")(h).astype(jnp.float32)
