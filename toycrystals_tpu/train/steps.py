"""Jitted train steps for the three pipelines.

Each factory closes over the static pieces (model, optimiser, loss
hyper-parameters) and returns ONE compiled function with the train state
donated — params, optimiser state and EMA update all in-place in HBM. Under a
`jax.sharding.Mesh` with the batch sharded over the 'data' axis, GSPMD inserts
the gradient all-reduce automatically (SURVEY.md §5 "distributed comms").

Loss semantics mirror the reference trainers:
- VAE: MSE recon + beta_eff * free-bits KL, beta warm-up factor supplied by
  the caller per epoch (`/root/reference/scripts/train_vae.py:292-321`).
- prior: t = clamp((u^2 T), 0, T-1) small-t bias, q_sample, eps-MSE, with
  4-bucket-over-t diagnostic losses (`train_diffusion_prior.py:240-277`).
- SDE: `diffusion_loss_eps` with CFG dropout + in-step EMA
  (`train_sde_score_model.py:212-243`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from toycrystals_tpu.models.sde_score_model import VPSDE, diffusion_loss_eps
from toycrystals_tpu.models.vae import kl_stats
from toycrystals_tpu.train.state import TrainState, ema_update


def _apply_updates(state: TrainState, grads: Any, tx: optax.GradientTransformation):
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return new_params, new_opt


def make_vae_train_step(
    model, tx: optax.GradientTransformation, free_bits: float, uncond: bool = False
) -> Callable:
    """Returns step(state, x, y_cat, y_cont, beta_eff, key) -> (state, metrics).

    beta_eff is the warmed-up KL weight beta * min(1, (epoch+1)/5)
    (`train_vae.py:311`), passed as a traced scalar so epochs don't recompile.
    """

    def loss_fn(params, x, y_cat, y_cont, beta_eff, key):
        k_rep, k_drop = jax.random.split(key)
        rngs = {"reparam": k_rep, "cond_drop": k_drop}
        if uncond:
            x_hat, mu, logvar = model.apply({"params": params}, x, train=True, rngs=rngs)
        else:
            x_hat, mu, logvar = model.apply(
                {"params": params}, x, y_cat, y_cont, train=True, rngs=rngs
            )
        recon = jnp.mean((x_hat - x) ** 2)
        kl_used, kl_raw = kl_stats(mu, logvar, free_bits)
        loss = recon + beta_eff * kl_used
        return loss, {"loss": loss, "recon": recon, "kl": kl_used, "kl_raw": kl_raw}

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, x, y_cat, y_cont, beta_eff, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, x, y_cat, y_cont, beta_eff, key)
        new_params, new_opt = _apply_updates(state, grads, tx)
        return (
            state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    return step


def make_prior_train_step(model, tx: optax.GradientTransformation, T: int,
                          apply_fn: Callable | None = None,
                          aux_weight: float = 0.0) -> Callable:
    """Returns step(state, z0n, y_cat, y_cont, key) -> (state, metrics).

    metrics include per-t-bucket sums/counts for the reference's 4-bucket
    diagnostic (`train_diffusion_prior.py:242-270`); the caller accumulates
    them across batches and divides once per epoch.

    `apply_fn(params, z_t, t, y_cat, y_cont)` overrides `model.apply` — the
    hook that trains the prior through the pipeline-parallel forward
    (parallel/pipeline.py), whose params are the stacked stage layout.

    `aux_weight > 0` (MoE prior, models/moe_prior.py): apply with the
    'losses' collection mutable, sum the sown per-block load-balancing aux
    terms, and add `aux_weight * mean(aux)` to the loss (reported in
    metrics as 'aux'). Incompatible with a custom apply_fn.
    """
    from toycrystals_tpu.models.diffusion_prior import DiffusionSchedule

    if aux_weight and apply_fn is not None:
        raise ValueError("aux_weight requires the default model.apply path")
    if apply_fn is None:
        apply_fn = lambda p, z_t, t, yc, yv: model.apply({"params": p}, z_t, t, yc, yv)

    def loss_fn(params, sched: DiffusionSchedule, z0n, y_cat, y_cont, key):
        b = z0n.shape[0]
        k_t, k_eps = jax.random.split(key)
        u = jax.random.uniform(k_t, (b,))
        t = jnp.clip((u**2 * T).astype(jnp.int32), 0, T - 1)  # small-t bias (`:254-256`)
        eps = jax.random.normal(k_eps, z0n.shape, z0n.dtype)
        z_t = sched.q_sample(z0n, t, eps)
        aux = 0.0
        if aux_weight:
            eps_pred, mut = model.apply({"params": params}, z_t, t, y_cat, y_cont,
                                        mutable=["losses"])
            terms = jax.tree.leaves(mut.get("losses", {}))
            if terms:
                aux = sum(jnp.mean(v) for v in terms) / len(terms)
        else:
            eps_pred = apply_fn(params, z_t, t, y_cat, y_cont)
        per = jnp.mean((eps_pred - eps) ** 2, axis=1)  # [B]
        loss = jnp.mean(per) + aux_weight * aux
        q = jnp.clip((t.astype(jnp.float32) / T * 4).astype(jnp.int32), 0, 3)
        bucket_sum = jnp.zeros(4).at[q].add(per)
        bucket_n = jnp.zeros(4).at[q].add(1.0)
        return loss, {"loss": loss, "bucket_sum": bucket_sum, "bucket_n": bucket_n,
                      "aux": jnp.asarray(aux, jnp.float32)}

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, sched, z0n, y_cat, y_cont, key):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, sched, z0n, y_cat, y_cont, key)
        new_params, new_opt = _apply_updates(state, grads, tx)
        return (
            state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
            metrics,
        )

    return step


def make_sde_train_step(
    model,
    tx: optax.GradientTransformation,
    sde: VPSDE,
    n_types: int,
    p_uncond: float,
    t_power: float,
    ema_decay: float,
    parameterization: str = "eps",
    grad_accum: int = 1,
    t_shift: float = 1.0,
    min_snr_gamma: float = 0.0,
) -> Callable:
    """Returns step(state, x0, y_cat, y_cont, key) -> (state, loss).

    EMA lerp happens inside the compiled step on the donated state
    (vs the reference's eager per-parameter Python loop,
    `train_sde_score_model.py:236-240`). parameterization: eps (reference)
    or v (see `diffusion_loss_eps`).

    grad_accum k > 1 splits the batch into k sequential chunks inside the
    compiled step (one `lax.scan`): forward/backward runs at batch/k
    activation footprint, gradients average, ONE optimizer/EMA update.
    The per-sample randomness is drawn once for the FULL batch
    (`draw_diffusion_loss_noise`), so the result is numerically the unsplit
    step (same draws, mean-of-chunk-means == batch mean), not merely
    distributionally equal. The memory lever for hi-res training: peak
    activation HBM scales 1/k while the update semantics stay those of the
    large batch.
    """
    apply_fn = lambda params, x_t, t, y_cat, y_cont: model.apply(
        {"params": params}, x_t, t, y_cat, y_cont
    )

    from toycrystals_tpu.models.sde_score_model import (
        diffusion_loss_eps_given,
        draw_diffusion_loss_noise,
    )

    def loss_fn(params, x0, y_cat, y_cont, key):
        return diffusion_loss_eps(
            apply_fn, params, sde, x0, y_cat, y_cont, key, n_types, p_uncond,
            t_power, parameterization, t_shift, min_snr_gamma,
        )

    def grads_of(params, x0, y_cat, y_cont, key):
        if grad_accum <= 1:
            return jax.value_and_grad(loss_fn)(params, x0, y_cat, y_cont, key)
        k = grad_accum
        b = x0.shape[0]
        if b % k:
            raise ValueError(f"batch {b} not divisible by grad_accum {k}")
        t, eps, y_cat, y_cont = draw_diffusion_loss_noise(
            x0, y_cat, y_cont, key, n_types, p_uncond, t_power, t_shift)

        def chunk(a):
            return a.reshape((k, b // k) + a.shape[1:])

        def core(params, x0c, cc, vc, tc, ec):
            return diffusion_loss_eps_given(
                apply_fn, params, sde, x0c, cc, vc, tc, ec, parameterization,
                min_snr_gamma)

        def body(carry, inp):
            g_sum, l_sum = carry
            loss_c, g = jax.value_and_grad(core)(params, *inp)
            return (jax.tree.map(jnp.add, g_sum, g), l_sum + loss_c), None

        init = (jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.float32))
        (g_sum, l_sum), _ = jax.lax.scan(
            body, init, tuple(map(chunk, (x0, y_cat, y_cont, t, eps))))
        return l_sum / k, jax.tree.map(lambda g: g / k, g_sum)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, x0, y_cat, y_cont, key):
        loss, grads = grads_of(state.params, x0, y_cat, y_cont, key)
        new_params, new_opt = _apply_updates(state, grads, tx)
        new_ema = (
            ema_update(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                opt_state=new_opt,
                ema_params=new_ema,
            ),
            loss,
        )

    return step


def _batch_source(lattice_cfg, dataset_seed: int, resident: tuple | None, mesh=None):
    """Resolve a fused-epoch data source to get_batch(idx) -> (x, y_cat, y_cont).

    Exactly one of:
      lattice_cfg — procedural: batches rendered on device per step from
        fold_in(dataset_seed, idx), identical items to the indexable dataset;
      resident — (x_u8 [N,H,W,1] u8, y_cat [N] i32, y_cont [N,4] f32) device
        arrays: the disk archive, gathered (and u8 -> f32/255 decoded) on
        device per step (same decode as ResidentDiskDataset.gather).

    With a `mesh`, every batch is sharding-constrained over the 'data' axis
    inside the compiled program, so GSPMD distributes the per-step
    datagen/gather AND the train step (grad all-reduce over ICI) across the
    mesh — numerics identical to single-device.
    """
    if (lattice_cfg is None) == (resident is None):
        raise ValueError("pass exactly one of lattice_cfg / resident")
    if lattice_cfg is not None:
        from toycrystals_tpu.data.datasets import generate_batch

        src = lambda idx: generate_batch(lattice_cfg, dataset_seed, idx)
    else:
        x_u8, y_cat, y_cont = resident
        src = lambda idx: (x_u8[idx].astype(jnp.float32) / 255.0, y_cat[idx], y_cont[idx])
    if mesh is None:
        return src
    from toycrystals_tpu.parallel import constrain_batch

    return lambda idx: constrain_batch(mesh, src(idx))


def _make_epoch(run_batch: Callable, n_items: int, batch_size: int, aggregate: Callable):
    """Common fused-epoch scaffolding: ONE jitted program per epoch containing
    the on-device index shuffle (`jax.random.permutation`, drop-last — same
    semantics as `batch_iterator`) and a `lax.scan` over all steps. Zero host
    round-trips per epoch — on a tunneled TPU this removes ~steps_per_epoch
    dispatch latencies vs the reference's one-eager-step-per-batch loops.

    run_batch(state, idx, key, *extra) -> (state, metrics) does one step;
    aggregate(ms) reduces the scanned metrics. Returns the jitted
    epoch(state, key, *extra) with the state donated.
    """
    n_steps = n_items // batch_size
    if n_steps == 0:
        raise ValueError(f"n_items {n_items} < batch_size {batch_size}")

    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, key, *extra):
        k_shuffle, k_steps = jax.random.split(key)
        order = jax.random.permutation(k_shuffle, n_items)[: n_steps * batch_size]
        order = order.reshape(n_steps, batch_size)

        def body(state, inp):
            idx, i = inp
            return run_batch(state, idx, jax.random.fold_in(k_steps, i), *extra)

        state, ms = jax.lax.scan(body, state, (order, jnp.arange(n_steps)))
        return state, aggregate(ms)

    return epoch_fn


def make_vae_train_epoch(
    model,
    tx: optax.GradientTransformation,
    free_bits: float,
    batch_size: int,
    n_items: int,
    uncond: bool = False,
    lattice_cfg=None,
    dataset_seed: int = 0,
    resident: tuple | None = None,
    mesh=None,
) -> Callable:
    """A whole VAE training epoch as one compiled program (the reference
    dispatches per batch, `train_vae.py:292-321`). Data-source contract:
    see `_batch_source` (incl. `mesh` for data-parallel sharding). beta_eff
    is a traced scalar so the per-epoch KL warm-up (`train_vae.py:311`) does
    not recompile.

    Returns epoch_fn(state, beta_eff, key) -> (state, mean metrics dict).
    """
    step_fn = make_vae_train_step(model, tx, free_bits, uncond=uncond)
    get_batch = _batch_source(lattice_cfg, dataset_seed, resident, mesh=mesh)

    def run_batch(state, idx, key, beta_eff):
        x, y_cat, y_cont = get_batch(idx)
        return step_fn(state, x, y_cat, y_cont, beta_eff, key)

    epoch = _make_epoch(run_batch, n_items, batch_size,
                        lambda ms: jax.tree.map(jnp.mean, ms))
    return lambda state, beta_eff, key: epoch(state, key, beta_eff)


def make_prior_train_epoch(
    model,
    tx: optax.GradientTransformation,
    T: int,
    batch_size: int,
    latents: tuple,
    mesh=None,
    apply_fn: Callable | None = None,
    aux_weight: float = 0.0,
) -> Callable:
    """A whole latent-prior training epoch as one compiled program (the
    reference dispatches per batch, `train_diffusion_prior.py:240-277`).

    latents = (z0_norm [N,z] f32, y_cat [N] i32, y_cont [N,4] f32) device
    arrays (the standardised latent cache). The 4-bucket diagnostics are
    aggregated across the epoch on device. With a `mesh`, the per-step
    gathered batch is sharding-constrained over 'data' (see `_batch_source`).

    Returns epoch_fn(state, sched, key) -> (state, {loss, bucket_sum, bucket_n}).
    """
    z0n, y_cat_all, y_cont_all = latents
    step_fn = make_prior_train_step(model, tx, T, apply_fn=apply_fn,
                                    aux_weight=aux_weight)

    def run_batch(state, idx, key, sched):
        batch = (z0n[idx], y_cat_all[idx], y_cont_all[idx])
        if mesh is not None:
            from toycrystals_tpu.parallel import constrain_batch

            batch = constrain_batch(mesh, batch)
        return step_fn(state, sched, *batch, key)

    epoch = _make_epoch(
        run_batch, int(z0n.shape[0]), batch_size,
        lambda ms: {
            "loss": jnp.mean(ms["loss"]),
            "bucket_sum": jnp.sum(ms["bucket_sum"], axis=0),
            "bucket_n": jnp.sum(ms["bucket_n"], axis=0),
        },
    )
    return lambda state, sched, key: epoch(state, key, sched)


def make_sde_train_epoch(
    model,
    tx: optax.GradientTransformation,
    sde: VPSDE,
    n_types: int,
    p_uncond: float,
    t_power: float,
    ema_decay: float,
    batch_size: int,
    n_items: int,
    lattice_cfg=None,
    dataset_seed: int = 0,
    resident: tuple | None = None,
    mesh=None,
    parameterization: str = "eps",
    grad_accum: int = 1,
    nan_safe_metrics: bool = False,
    t_shift: float = 1.0,
    min_snr_gamma: float = 0.0,
    fresh_data: bool = False,
) -> Callable:
    """A whole SDE training epoch as one compiled program (new TPU-native
    scope — the reference runs one eager step per batch from a Python loop,
    `/root/reference/scripts/train_sde_score_model.py:212-243`): shuffle,
    per-step batch materialisation, loss/grad/update/EMA, all in one scan.
    Data-source contract: see `_batch_source` (incl. `mesh` for
    data-parallel sharding).

    `nan_safe_metrics` reports the epoch loss as the nanmean over steps —
    pair it with an `optax.apply_if_finite`-wrapped `tx` (`--skip-nonfinite`)
    so one skipped overflow step doesn't poison the epoch metric and trip
    the trainer's divergence guard while the params stayed finite.

    `fresh_data` (procedural source only) makes the epoch program take an
    index OFFSET: epoch e trains on deterministic items [e*n, (e+1)*n)
    instead of re-shuffling the same n — an unlimited-unique-data regime no
    disk pipeline can offer, at zero extra cost because items render on
    device per batch anyway. Offset 0 reproduces the fixed-dataset epoch
    exactly (same shuffle, same items).

    Returns epoch_fn(state, key[, offset]) -> (state, mean_loss). `key`
    drives both the shuffle and the per-step loss randomness; the state is
    donated.
    """
    step_fn = make_sde_train_step(model, tx, sde, n_types, p_uncond, t_power,
                                  ema_decay, parameterization, grad_accum,
                                  t_shift, min_snr_gamma)
    get_batch = _batch_source(lattice_cfg, dataset_seed, resident, mesh=mesh)
    agg = jnp.nanmean if nan_safe_metrics else jnp.mean

    if fresh_data:
        if lattice_cfg is None:
            raise ValueError("fresh_data needs the procedural (lattice_cfg) "
                             "source — a resident archive has only n items")

        def run_batch_off(state, idx, key, offset):
            x0, y_cat, y_cont = get_batch(idx + offset)
            return step_fn(state, x0, y_cat, y_cont, key)

        return _make_epoch(run_batch_off, n_items, batch_size, agg)

    def run_batch(state, idx, key):
        x0, y_cat, y_cont = get_batch(idx)
        return step_fn(state, x0, y_cat, y_cont, key)

    return _make_epoch(run_batch, n_items, batch_size, agg)
