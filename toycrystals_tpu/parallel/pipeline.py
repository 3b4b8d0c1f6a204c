"""Pipeline parallelism for the FiLM diffusion prior (GPipe over 'pipe').

The reference is single-device; its deepest stack of identical layers is the
FiLM prior's residual trunk (8 blocks at the trained config,
`/root/reference/scripts/train_diffusion_prior.py:196-204`). The TPU-native
way to scale *depth* past one chip — the axis tensor parallelism
(parallel/tensor.py) does not touch — is pipelining: place consecutive blocks
on consecutive devices of a ('data', 'pipe') mesh and stream microbatches
through the stages, handing activations to the next stage over ICI with
`jax.lax.ppermute`.

Unlike the GSPMD modules (mesh/spatial/tensor.py) where XLA infers the
collectives, pipelining is explicitly scheduled — the idiomatic JAX shape is
`shard_map` + one `lax.scan` over the (M + S - 1) pipeline ticks:

- the trunk's S stages each hold n_blocks/S blocks, stacked along a leading
  axis that is sharded 1/S per device over 'pipe' (so is its Adam state);
- the tiny stem (t/y embeddings -> cond, in_proj) and head (out_norm,
  out_proj) are replicated: every stage recomputes the stem for its own
  microbatch (cheaper than shipping cond between stages), the last stage
  applies the head;
- each tick, every stage applies its blocks to its current microbatch and
  ppermutes the result one hop right; stage 0 ingests microbatch k at tick
  k, stage S-1 emits microbatch k at tick k + S - 1. Bubble fraction is the
  classic (S-1)/(M+S-1): more microbatches, fuller pipe.

Numerics are exactly the single-device model's — same math in the same
order, only placed — verified leaf-for-leaf in tests/test_pipeline.py,
including gradients through the ppermute chain.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from toycrystals_tpu.models.diffusion_prior import timestep_embedding_discrete


def make_mesh_pp(n_data: int, n_pipe: int,
                 axes: tuple[str, str] = ("data", "pipe")) -> Mesh:
    """2-D ('data', 'pipe') mesh: each of n_data replicas runs an
    n_pipe-stage pipeline. 'pipe' is fastest-varying so stage neighbours are
    ICI-adjacent and the per-tick activation handoff is one hop."""
    need = n_data * n_pipe
    devices = jax.devices()
    if need > len(devices):
        raise ValueError(f"asked for {need} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_pipe), axes)


def stack_pipeline_params(params: Any, n_stages: int) -> dict:
    """Regroup a DiffusionPriorFiLM param tree for the pipeline.

    {block_0..block_{L-1}, <stem>, <head>} -> {'stem', 'blocks', 'head'}
    where 'blocks' leaves are the L per-block leaves stacked on a new leading
    axis and reshaped to [S, L/S, ...] — stage-major, so leading-axis
    sharding over 'pipe' gives stage s exactly its L/S consecutive blocks.
    The inverse is `unstack_pipeline_params` (checkpoints keep the flax
    layout; the pipeline layout exists only while training/sampling).
    """
    blocks = sorted((k for k in params if k.startswith("block_")),
                    key=lambda k: int(k.split("_")[1]))
    n = len(blocks)
    if n == 0 or n % n_stages:
        raise ValueError(f"{n} blocks not divisible into {n_stages} stages")
    head_keys = ("out_norm", "out_proj")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *(params[k] for k in blocks))
    stacked = jax.tree.map(
        lambda x: x.reshape((n_stages, n // n_stages) + x.shape[1:]), stacked)
    return {
        "stem": {k: params[k] for k in params
                 if not k.startswith("block_") and k not in head_keys},
        "blocks": stacked,
        "head": {k: params[k] for k in head_keys},
    }


def unstack_pipeline_params(stacked: dict) -> dict:
    """Inverse of `stack_pipeline_params`: back to the flax/checkpoint tree."""
    flat = jax.tree.map(
        lambda x: x.reshape((-1,) + x.shape[2:]), stacked["blocks"])
    n = jax.tree.leaves(flat)[0].shape[0]
    out = dict(stacked["stem"]) | dict(stacked["head"])
    for i in range(n):
        out[f"block_{i}"] = jax.tree.map(lambda x: x[i], flat)
    return out


def pp_sharding(mesh: Mesh, path_is_blocks: bool, ndim: int) -> NamedSharding:
    """'blocks' leaves: leading (stage) axis over 'pipe'; everything else
    replicated (the stem/head and any scalars)."""
    if path_is_blocks:
        return NamedSharding(mesh, P("pipe", *([None] * (ndim - 1))))
    return NamedSharding(mesh, P())


def place_pipeline_state(mesh: Mesh | None, tree: Any) -> Any:
    """device_put a stacked-params pytree (or a whole TrainState over it):
    every leaf under a 'blocks' key is stage-sharded over 'pipe', the rest
    replicate. Adam moments mirror the param layout, so each stage also
    holds only its own blocks' optimizer state."""
    if mesh is None:
        return tree
    def place(path, x):
        is_blocks = any(getattr(p, "key", None) == "blocks" for p in path)
        return jax.device_put(x, pp_sharding(mesh, is_blocks, np.ndim(x)))
    return jax.tree_util.tree_map_with_path(place, tree)


def _dense(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["kernel"] + p["bias"]


def _layernorm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # flax.linen.LayerNorm's exact formula: var = mean(x^2) - mean(x)^2,
    # clamped at 0 (flax _compute_stats), then scale & bias.
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _stem(p: dict, z_t, t, y_cat, y_cont, t_emb_dim: int):
    """The model's embedding stem as pure functions of the param leaves —
    flax auto-names from DiffusionPriorFiLM.__call__'s call order
    (models/diffusion_prior.py:87-103). Returns (h0, cond)."""
    te = timestep_embedding_discrete(t, t_emb_dim)
    t_feat = _dense(p["Dense_1"], jax.nn.silu(_dense(p["Dense_0"], te)))
    y_cat_feat = p["Embed_0"]["embedding"][y_cat]
    y_cont_feat = _dense(p["Dense_3"], jax.nn.silu(_dense(p["Dense_2"], y_cont)))
    y_feat = jnp.concatenate([y_cat_feat, y_cont_feat], axis=-1)
    y_feat = _dense(p["Dense_5"], jax.nn.silu(_dense(p["Dense_4"], y_feat)))
    cond = jnp.concatenate([t_feat, y_feat], axis=-1)
    return _dense(p["in_proj"], z_t), cond


def _film_block(p: dict, h: jax.Array, cond: jax.Array) -> jax.Array:
    """FiLMResBlock as a pure function (models/diffusion_prior.py:54-71)."""
    x = _layernorm(p["LayerNorm_0"], h)
    gamma, beta = jnp.split(_dense(p["cond"], cond), 2, axis=-1)
    x = x * (1.0 + gamma) + beta
    x = _dense(p["fc2"], jax.nn.silu(_dense(p["fc1"], x)))
    return h + x


def _head(p: dict, h: jax.Array) -> jax.Array:
    return _dense(p["out_proj"], _layernorm(p["out_norm"], h))


def pipeline_apply(mesh: Mesh, stacked: dict, z_t, t, y_cat, y_cont,
                   n_micro: int, t_emb_dim: int = 64) -> jax.Array:
    """Pipelined DiffusionPriorFiLM forward: eps_pred [B, z_dim].

    Drop-in for `model.apply` wherever an apply_fn(params, z_t, t, y_cat,
    y_cont) is taken (the train step's loss, `ddim_sample`) — the batch is
    sharded over 'data', split into n_micro microbatches per replica, and
    streamed through the 'pipe' stages inside one shard_map + lax.scan.
    Differentiable (grads ride the reverse ppermute chain), so the same
    function trains and samples."""
    n_pipe = dict(mesh.shape)["pipe"]
    n_data = dict(mesh.shape).get("data", 1)
    b = z_t.shape[0]
    if b % (n_data * n_micro):
        raise ValueError(f"batch {b} must divide by data axis {n_data} "
                         f"x n_micro {n_micro}")

    def staged(stem, blocks, head, z_t, t, y_cat, y_cont):
        # per-device: blocks [1, L, ...] (its stage shard) -> [L, ...]
        blocks_l = jax.tree.map(lambda x: x[0], blocks)
        stage = jax.lax.axis_index("pipe")
        m = n_micro
        mb = z_t.shape[0] // m

        def split(a):
            return a.reshape((m, mb) + a.shape[1:])

        # replicated stem, computed once for all local microbatches (flat —
        # the embedding helpers assume a 1-D batch — then split)
        h0_all, cond_all = map(split, _stem(stem, z_t, t, y_cat, y_cont, t_emb_dim))

        def tick(carry, k):
            recv, out = carry
            mi = jnp.clip(k - stage, 0, m - 1)
            x_in = jnp.where(stage == 0, h0_all[mi], recv)
            cond = cond_all[mi]
            h = x_in
            for l in range(jax.tree.leaves(blocks_l)[0].shape[0]):
                h = _film_block(jax.tree.map(lambda x: x[l], blocks_l), h, cond)
            # last stage: commit microbatch k - (S-1) when it's real
            valid = (k - stage >= 0) & (k - stage <= m - 1)
            y = jnp.where(valid & (stage == n_pipe - 1), _head(head, h), out[mi])
            out = jax.lax.dynamic_update_index_in_dim(out, y, mi, 0)
            recv = jax.lax.ppermute(h, "pipe",
                                    [(i, i + 1) for i in range(n_pipe - 1)])
            return (recv, out), None

        z_dim = stem["in_proj"]["kernel"].shape[0]
        # the carry is device-varying over the mesh (each stage holds its own
        # activation / output buffer) — mark the zero inits as such; the
        # activation zeros already vary over 'data' (built from h0_all)
        out0 = jax.lax.pcast(jnp.zeros((m, mb, z_dim), z_t.dtype),
                             mesh.axis_names, to="varying")
        recv0 = jax.lax.pcast(jnp.zeros_like(h0_all[0]), ("pipe",), to="varying")
        (_, out), _ = jax.lax.scan(
            tick, (recv0, out0), jnp.arange(m + n_pipe - 1))
        # only the last stage wrote real outputs; psum makes the result
        # provably replicated over 'pipe' for the out_spec
        out = jax.lax.psum(
            jnp.where(stage == n_pipe - 1, out, jnp.zeros_like(out)), "pipe")
        return out.reshape((m * mb,) + out.shape[2:])

    from jax import shard_map

    d = ("data",) if "data" in mesh.axis_names else ()
    dspec = P(*d) if d else P()
    return shard_map(
        staged, mesh=mesh,
        in_specs=(P(), P("pipe"), P(), dspec, dspec, dspec, dspec),
        out_specs=dspec,
    )(stacked["stem"], stacked["blocks"], stacked["head"],
      z_t, t, y_cat, y_cont)


def make_pipeline_apply(mesh: Mesh, n_micro: int, t_emb_dim: int = 64):
    """apply_fn(stacked_params, z_t, t, y_cat, y_cont) closure for the train
    step / ddim_sample."""
    def apply_fn(params, z_t, t, y_cat, y_cont):
        return pipeline_apply(mesh, params, z_t, t, y_cat, y_cont,
                              n_micro=n_micro, t_emb_dim=t_emb_dim)
    return apply_fn
