"""Flow-matching (rectified flow) tests — `--param fm` + `--sampler rf`.

Validates models/flow_matching.py and the "fm" branch of
`diffusion_loss_eps_given`: exact-zero loss against the analytic target, an
oracle velocity field whose Euler integration is EXACT (recovers x0 to float
precision), CFG combination semantics, grad-accum numerical parity, and the
chunked-dispatch path. CLI end-to-end lives in test_cli.py::test_12.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from toycrystals_tpu.models import CondUNetTiny, VPSDE, sample_chunked, sample_rectified_flow
from toycrystals_tpu.models.sde_score_model import (
    diffusion_loss_eps,
    diffusion_loss_eps_given,
)
from toycrystals_tpu.train import create_train_state, make_sde_train_step

K = jax.random.key(0)
SDE = VPSDE(0.1, 30.0)


def _batch(b=4, hw=16):
    x0 = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    y_cat = jnp.arange(b, dtype=jnp.int32) % 4
    y_cont = jnp.zeros((b, 4))
    return x0, y_cat, y_cont


def test_fm_loss_zero_for_analytic_target():
    """An apply_fn that returns the exact conditional velocity eps - x0
    drives the fm loss to 0 — pins the interpolation x_t=(1-t)x0+t*eps and
    the target in one identity."""
    x0, y_cat, y_cont = _batch()
    b = x0.shape[0]
    t = jnp.array([0.1, 0.4, 0.7, 0.95])
    eps = jax.random.normal(jax.random.key(2), x0.shape)
    x0m = x0 * 2.0 - 1.0  # the loss maps [0,1] -> [-1,1] internally

    def oracle(params, x_t, tb, yc, yv):
        # recover eps from the straight-line path and return the true target
        tb4 = tb.reshape(b, 1, 1, 1)
        eps_rec = (x_t - (1.0 - tb4) * x0m) / tb4
        return eps_rec - x0m

    loss = diffusion_loss_eps_given(
        oracle, {}, SDE, x0, y_cat, y_cont, t, eps, parameterization="fm")
    assert float(loss) < 1e-10


def test_fm_loss_rejects_unknown_param():
    x0, y_cat, y_cont = _batch()
    with pytest.raises(ValueError, match="eps|v|fm"):
        diffusion_loss_eps_given(
            lambda *a: a[1], {}, SDE, x0, y_cat, y_cont,
            jnp.full((4,), 0.5), jnp.zeros_like(x0), parameterization="nope")


def test_rf_oracle_recovers_x0():
    """For a single data point x0*, the exact velocity field is
    u(x,t) = (x - x0*)/t, constant along every trajectory — Euler is EXACT,
    so the sampler must return x0* to float precision at any step count."""
    b, hw = 3, 8
    x0_star = jnp.tanh(jax.random.normal(jax.random.key(3), (1, hw, hw, 1)))

    def oracle(params, x, t, yc, yv):
        return (x - x0_star) / t.reshape(-1, 1, 1, 1)

    y_cat = jnp.zeros((b,), jnp.int32)
    y_cont = jnp.zeros((b, 4))
    for n_steps in (2, 7):
        out = sample_rectified_flow(
            oracle, {}, SDE, y_cat, y_cont, (b, hw, hw, 1),
            jax.random.key(4), n_steps=n_steps, guidance_scale=0.0)
        want = jnp.clip((x0_star + 1.0) * 0.5, 0.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(np.asarray(want), out.shape),
            atol=1e-5)


def test_rf_heun_matches_euler_on_linear_field():
    """On the oracle's linear field both solvers are exact, so they agree."""
    b, hw = 2, 8
    x0_star = 0.3 * jnp.ones((1, hw, hw, 1))

    def oracle(params, x, t, yc, yv):
        return (x - x0_star) / t.reshape(-1, 1, 1, 1)

    y_cat = jnp.zeros((b,), jnp.int32)
    y_cont = jnp.zeros((b, 4))
    kw = dict(n_steps=5, guidance_scale=0.0)
    e = sample_rectified_flow(oracle, {}, SDE, y_cat, y_cont,
                              (b, hw, hw, 1), jax.random.key(5), **kw)
    h = sample_rectified_flow(oracle, {}, SDE, y_cat, y_cont,
                              (b, hw, hw, 1), jax.random.key(5),
                              solver="heun", **kw)
    np.testing.assert_allclose(np.asarray(e), np.asarray(h), atol=1e-5)


def test_rf_cfg_noop_for_condition_blind_model():
    """guidance combines u_u + s(u_c - u_u); a model that ignores the
    conditioning must sample identically at any guidance scale."""
    b, hw = 2, 8

    def blind(params, x, t, yc, yv):
        return 0.1 * x - 0.2

    y_cat = jnp.ones((b,), jnp.int32)
    y_cont = jnp.ones((b, 4))
    a = sample_rectified_flow(blind, {}, SDE, y_cat, y_cont, (b, hw, hw, 1),
                              jax.random.key(6), n_steps=4, guidance_scale=0.0)
    g = sample_rectified_flow(blind, {}, SDE, y_cat, y_cont, (b, hw, hw, 1),
                              jax.random.key(6), n_steps=4, guidance_scale=2.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(g), atol=1e-5)


def test_rf_rejects_bad_solver():
    with pytest.raises(ValueError, match="euler|heun"):
        sample_rectified_flow(
            lambda *a: a[1], {}, SDE, jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, 4)), (2, 8, 8, 1), K, n_steps=2, solver="rk4")


def _model_state(b=8, hw=16, param="fm"):
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jnp.zeros((b, hw, hw, 1))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, x, jnp.zeros((b,)), ycat, ycont)["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, ema=True)
    step = make_sde_train_step(model, tx, SDE, 4, p_uncond=0.1, t_power=1.0,
                               ema_decay=0.999, parameterization=param)
    return model, tx, state, step


def test_fm_train_step_decreases_loss():
    _, _, state, step = _model_state()
    x0, y_cat, y_cont = _batch(b=8)
    losses = []
    for i in range(8):
        state, loss = step(state, x0, y_cat, y_cont, jax.random.key(100 + i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fm_grad_accum_matches_unsplit():
    """--grad-accum k with --param fm is numerically the unsplit step (the
    same draw-once randomness contract the eps/v objectives have)."""
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    b = 8
    x0, y_cat, y_cont = _batch(b=b)
    params = model.init(K, x0, jnp.zeros((b,)), y_cat, y_cont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads: update-equality is exact-ish
    outs = []
    for k in (1, 4):
        state = create_train_state(jax.tree.map(jnp.copy, params), tx)
        step = make_sde_train_step(model, tx, SDE, 4, p_uncond=0.1,
                                   t_power=1.0, ema_decay=0.0,
                                   parameterization="fm", grad_accum=k)
        state, loss = step(state, x0, y_cat, y_cont, jax.random.key(7))
        outs.append((float(loss), jax.tree.leaves(state.params)[0]))
    assert abs(outs[0][0] - outs[1][0]) < 1e-6
    np.testing.assert_allclose(np.asarray(outs[0][1]), np.asarray(outs[1][1]),
                               rtol=1e-4, atol=1e-6)


def test_rf_sample_chunked():
    """The rf sampler plugs into the shared pad-and-trim chunker (odd n)."""
    model, _, state, _ = _model_state()
    apply_fn = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    n = 5
    y_cat = jnp.arange(n, dtype=jnp.int32) % 4
    y_cont = jnp.zeros((n, 4))
    x = sample_chunked(
        sample_rectified_flow, apply_fn, state.params, SDE, y_cat, y_cont,
        (n, 16, 16, 1), jax.random.key(8), chunk=2, n_steps=2,
        guidance_scale=1.5, t_end=1e-3, n_types=4)
    assert x.shape == (n, 16, 16, 1)
    assert np.isfinite(x).all()
    assert (x >= 0).all() and (x <= 1).all()


def test_shift_t_identity_and_logsnr():
    """shift_t: s=1 is the exact identity; endpoints fixed; monotone; and on
    the straight path logSNR(t') = logSNR(t) − 2·ln s (the property that makes
    s=4 the fm analogue of the VP logsnr_shift −2.77 at 256×256)."""
    from toycrystals_tpu.models import shift_t

    t = jnp.linspace(0.0, 1.0, 11)
    np.testing.assert_array_equal(np.asarray(shift_t(t, 1.0)), np.asarray(t))
    for s in (2.0, 4.0):
        ts = shift_t(t, s)
        assert float(ts[0]) == 0.0 and abs(float(ts[-1]) - 1.0) < 1e-7
        assert (np.diff(np.asarray(ts)) > 0).all()
        mid = t[1:-1]
        logsnr = lambda x: 2.0 * jnp.log((1.0 - x) / x)
        np.testing.assert_allclose(
            np.asarray(logsnr(shift_t(mid, s))),
            np.asarray(logsnr(mid)) - 2.0 * np.log(s), rtol=1e-5, atol=1e-5)


def test_t_shift_biases_draw_towards_noise():
    """draw_diffusion_loss_noise(t_shift=s>1) pushes the t draw towards 1
    and is the exact shift_t image of the unshifted draw (same key)."""
    from toycrystals_tpu.models import shift_t
    from toycrystals_tpu.models.sde_score_model import draw_diffusion_loss_noise

    x0, y_cat, y_cont = _batch(b=512, hw=4)
    t0, eps0, _, _ = draw_diffusion_loss_noise(
        x0, y_cat, y_cont, jax.random.key(30), 4, p_uncond=0.0)
    t4, eps4, _, _ = draw_diffusion_loss_noise(
        x0, y_cat, y_cont, jax.random.key(30), 4, p_uncond=0.0, t_shift=4.0)
    np.testing.assert_allclose(np.asarray(t4), np.asarray(shift_t(t0, 4.0)),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(eps0), np.asarray(eps4))
    assert float(t4.mean()) > float(t0.mean()) + 0.2


def test_rf_shifted_grid_oracle_exact():
    """The oracle velocity field is constant along trajectories, so Euler on
    ANY monotone grid — including the shifted one — recovers x0 exactly."""
    b, hw = 2, 8
    x0_star = 0.4 * jnp.ones((1, hw, hw, 1))

    def oracle(params, x, t, yc, yv):
        return (x - x0_star) / t.reshape(-1, 1, 1, 1)

    out = sample_rectified_flow(
        oracle, {}, SDE, jnp.zeros((b,), jnp.int32), jnp.zeros((b, 4)),
        (b, hw, hw, 1), jax.random.key(31), n_steps=3, guidance_scale=0.0,
        t_shift=4.0)
    want = (x0_star + 1.0) * 0.5
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(np.asarray(want), out.shape),
        atol=1e-5)


def test_fm_sharded_step_matches_single_device():
    """--param fm --shard 8: the data-parallel fm train step is numerically
    the single-device step (same contract as the eps objective,
    test_sharding.py)."""
    from toycrystals_tpu.parallel import make_mesh, replicate, shard_batch

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    b, hw = 16, 16
    x0 = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    y_cat = jnp.arange(b, dtype=jnp.int32) % 4
    y_cont = jnp.zeros((b, 4))
    params = model.init(K, x0, jnp.zeros((b,)), y_cat, y_cont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads (see test_sharding.py rationale)
    step = make_sde_train_step(model, tx, SDE, 4, p_uncond=0.0, t_power=1.0,
                               ema_decay=0.0, parameterization="fm")

    mesh = make_mesh()
    s2 = replicate(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = step(s1, x0, y_cat, y_cont, K)
    s2, loss2 = step(s2, *shard_batch(mesh, (x0, y_cat, y_cont)), K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(s1.params)[0]),
        np.asarray(jax.tree.leaves(s2.params)[0]), rtol=1e-4, atol=1e-6)


def test_rf_sharded_sampling():
    """--sampler rf --shard 8: batch sharded over 'data', scan carry pinned
    to the mesh via sharding=."""
    from toycrystals_tpu.parallel import data_sharding, make_mesh

    model, _, state, _ = _model_state()
    apply_fn = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    mesh = make_mesh()
    b = 16
    y_cat = jax.device_put(jnp.arange(b, dtype=jnp.int32) % 4,
                           data_sharding(mesh, 1))
    y_cont = jax.device_put(jnp.zeros((b, 4)), data_sharding(mesh, 2))
    x = sample_rectified_flow(
        apply_fn, state.params, SDE, y_cat, y_cont, (b, 16, 16, 1),
        jax.random.key(20), n_steps=2, guidance_scale=1.5,
        sharding=data_sharding(mesh, 4))
    assert x.shape == (b, 16, 16, 1)
    assert np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_fm_full_loss_path():
    """diffusion_loss_eps end-to-end with the fm parameterization (random
    half + deterministic half together) is finite and differentiable."""
    model, _, state, _ = _model_state()
    apply_fn = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    x0, y_cat, y_cont = _batch(b=8)

    def loss_fn(p):
        return diffusion_loss_eps(apply_fn, p, SDE, x0, y_cat, y_cont,
                                  jax.random.key(9), 4, p_uncond=0.1,
                                  t_power=1.0, parameterization="fm")

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))
