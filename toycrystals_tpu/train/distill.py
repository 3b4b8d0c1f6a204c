"""Progressive distillation of the SDE score model into a few-step sampler.

NEW TPU scope — no reference counterpart (the reference samples with
300-step eager loops, `/root/reference/src/toycrystals/models/sde_score_model.py:452-569`).
Implements Salimans & Ho 2022 ("Progressive Distillation for Fast Sampling
of Diffusion Models") with the guided-model twist of Meng et al. 2023: the
teacher is evaluated WITH classifier-free guidance, so the guidance weight
is baked into the student and sampling the student is a single conditional
pass per step — no CFG batch doubling.

One distillation phase halves the sampler's step count: the student (init =
teacher weights) learns, at every grid step t_i -> t_{i+1} of its own N-step
quadratic grid, to reproduce in ONE deterministic DDIM step what the teacher
produces in TWO steps on the nested 2N grid (quadratic grids nest exactly:
grid(2N)[2i] == grid(N)[i]). Iterating phases N0 -> N0/2 -> ... -> 1 turns
the 300-step/602-eval reference sampler into a 1-8 eval one
(`scripts/distill_sde_score_model.py`; sampling via
`models.sde_score_model.sample_ddim`).

Students train in v-parameterization (x0 = alpha*x - sigma*v is exact and
well-conditioned at every t, unlike the eps form which divides by
alpha ~ 5e-4 near t=1); teachers may be eps (the reference's trained
parameterization, phase 0) or v (every later phase).

Everything is TPU-shaped like train/steps.py: one jitted donated train step
(teacher params captured as frozen constants), per-sample grid indices drawn
on device, and a fused whole-epoch `lax.scan` program with on-device
procedural datagen; under a Mesh the batch shards over 'data' and GSPMD
inserts the gradient all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from toycrystals_tpu.models.sde_score_model import (
    VPSDE,
    _quadratic_grid,
    predict_eps_cfg,
)
from toycrystals_tpu.train.state import TrainState, ema_update
from toycrystals_tpu.train.steps import _apply_updates, _batch_source, _make_epoch


def ddim_step_from_raw(
    sde: VPSDE, x_t, t, t_next, raw, prediction: str
) -> jax.Array:
    """One deterministic DDIM step t -> t_next from the net's raw output.

    x_s = alpha_s * x0_hat + sigma_s * eps_hat, written so nothing divides
    by alpha: v reads (x0, eps) off the exact identities; eps uses the
    alpha-ratio form. t, t_next: [B]; x_t, raw: [B, H, W, 1]."""
    b = x_t.shape[0]
    shp = (b, 1, 1, 1)
    a_t = sde.alpha(t).reshape(shp)
    s_t = sde.sigma(t).reshape(shp)
    a_n = sde.alpha(t_next).reshape(shp)
    s_n = sde.sigma(t_next).reshape(shp)
    if prediction == "v":
        x0 = a_t * x_t - s_t * raw
        eps = s_t * x_t + a_t * raw
        return a_n * x0 + s_n * eps
    return (a_n / jnp.clip(a_t, min=1e-6)) * (x_t - s_t * raw) + s_n * raw


def pd_target_x0(sde: VPSDE, x_t, t, t_next, x_next) -> jax.Array:
    """Invert the one-step DDIM map for the x0 the student must predict.

    Solve x_next = alpha_n*x0 + (sigma_n/sigma_t)*(x_t - alpha_t*x0) for x0
    (Salimans & Ho 2022, algorithm 2). The denominator
    alpha_n - alpha_t*sigma_n/sigma_t = sigma_n*(SNR_n^0.5 - SNR_t^0.5) is
    strictly positive whenever t_next < t (SNR increases as t falls)."""
    b = x_t.shape[0]
    shp = (b, 1, 1, 1)
    a_t = sde.alpha(t).reshape(shp)
    s_t = sde.sigma(t).reshape(shp)
    a_n = sde.alpha(t_next).reshape(shp)
    s_n = sde.sigma(t_next).reshape(shp)
    ratio = s_n / s_t
    denom = jnp.clip(a_n - ratio * a_t, min=1e-8)
    return (x_next - ratio * x_t) / denom


def make_distill_train_step(
    student_model,
    teacher_apply: Callable[..., jax.Array],
    teacher_params: Any,
    tx: optax.GradientTransformation,
    sde: VPSDE,
    n_student_steps: int,
    *,
    n_types: int,
    guidance_scale: float,
    teacher_prediction: str = "eps",
    t_end: float = 1e-3,
    ema_decay: float = 0.0,
) -> Callable:
    """Returns step(state, x0, y_cat, y_cont, key) -> (state, loss).

    Per sample: draw a grid index i ~ U{0..N-1}, form x_t = alpha*x0 + sigma*eps
    at t = grid_N[i], run the teacher two DDIM half-steps on the nested 2N
    grid (each teacher eval CFG-combined at `guidance_scale` — the guidance
    is what gets distilled), invert the one-step map for the x0-target, and
    regress the student's v-output on the equivalent v-target (v-space MSE ==
    the truncated-SNR weighting Salimans & Ho recommend for distillation).
    The state is donated; teacher params ride along as frozen constants."""
    if teacher_prediction not in ("eps", "v"):
        raise ValueError(f"teacher_prediction must be eps|v, got {teacher_prediction}")
    n = int(n_student_steps)
    gs = float(guidance_scale)
    ts_s = _quadratic_grid(n, t_end)  # N+1 points, student grid
    ts_t = _quadratic_grid(2 * n, t_end)  # nested teacher grid: ts_t[2i] == ts_s[i]

    def teacher_raw(x, t, y_cat, y_cont):
        return predict_eps_cfg(
            teacher_apply, teacher_params, x, t, y_cat, y_cont, gs, n_types
        )

    def loss_fn(params, x0, y_cat, y_cont, key):
        b = x0.shape[0]
        k_i, k_eps = jax.random.split(key)
        i = jax.random.randint(k_i, (b,), 0, n)
        t = ts_s[i]
        t_mid = ts_t[2 * i + 1]
        t_next = ts_s[i + 1]

        x0 = x0 * 2.0 - 1.0
        eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
        shp = (b, 1, 1, 1)
        a_t = sde.alpha(t).reshape(shp)
        s_t = sde.sigma(t).reshape(shp)
        x_t = a_t * x0 + s_t * eps

        # teacher: two guided DDIM half-steps (frozen — no gradient flows in)
        r1 = teacher_raw(x_t, t, y_cat, y_cont)
        x_mid = ddim_step_from_raw(sde, x_t, t, t_mid, r1, teacher_prediction)
        r2 = teacher_raw(x_mid, t_mid, y_cat, y_cont)
        x_next = ddim_step_from_raw(sde, x_mid, t_mid, t_next, r2, teacher_prediction)
        x_next = jax.lax.stop_gradient(x_next)

        x0_tgt = pd_target_x0(sde, x_t, t, t_next, x_next)
        # v_tgt = alpha*eps_tgt - sigma*x0_tgt with eps_tgt = (x_t - alpha*x0_tgt)/sigma
        v_tgt = (a_t / s_t) * x_t - ((a_t * a_t + s_t * s_t) / s_t) * x0_tgt

        v_pred = student_model.apply({"params": params}, x_t, t, y_cat, y_cont)
        return jnp.mean((v_pred - v_tgt) ** 2)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, x0, y_cat, y_cont, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x0, y_cat, y_cont, key)
        new_params, new_opt = _apply_updates(state, grads, tx)
        new_ema = (
            ema_update(state.ema_params, new_params, ema_decay)
            if state.ema_params is not None
            else None
        )
        return (
            state.replace(step=state.step + 1, params=new_params,
                          opt_state=new_opt, ema_params=new_ema),
            loss,
        )

    return step


def make_distill_train_epoch(
    student_model,
    teacher_apply: Callable[..., jax.Array],
    teacher_params: Any,
    tx: optax.GradientTransformation,
    sde: VPSDE,
    n_student_steps: int,
    *,
    n_types: int,
    guidance_scale: float,
    batch_size: int,
    n_items: int,
    teacher_prediction: str = "eps",
    t_end: float = 1e-3,
    ema_decay: float = 0.0,
    lattice_cfg=None,
    dataset_seed: int = 0,
    resident: tuple | None = None,
    mesh=None,
) -> Callable:
    """A whole distillation epoch as ONE compiled program (shuffle + on-device
    datagen/gather + every step's two teacher evals and student update in one
    `lax.scan`) — same fused-epoch scaffolding as the trainers
    (train/steps.py `_make_epoch`). Returns epoch(state, key) -> (state, mean_loss)
    with the student state donated."""
    step_fn = make_distill_train_step(
        student_model, teacher_apply, teacher_params, tx, sde, n_student_steps,
        n_types=n_types, guidance_scale=guidance_scale,
        teacher_prediction=teacher_prediction, t_end=t_end, ema_decay=ema_decay,
    )
    get_batch = _batch_source(lattice_cfg, dataset_seed, resident, mesh=mesh)

    def run_batch(state, idx, key):
        x0, y_cat, y_cont = get_batch(idx)
        return step_fn(state, x0, y_cat, y_cont, key)

    return _make_epoch(run_batch, n_items, batch_size, jnp.mean)
