"""DPM-Solver++(2M) fast sampler (new TPU scope, no reference counterpart).

Correctness strategy: for Gaussian data x0 ~ N(mu, s0^2 I) the optimal
eps-predictor is analytic,

    eps*(x_t, t) = sigma (x_t - alpha mu) / (alpha^2 s0^2 + sigma^2),

so every probability-flow-ODE solver must transport the SAME initial noise to
the SAME endpoint. A 20-step DPM-Solver++(2M) run is checked against an
800-step Heun reference solution of the identical ODE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models import CondUNetTiny, VPSDE
from toycrystals_tpu.models.sde_score_model import (
    sample_dpmpp_2m,
    sample_grid_conditions,
    sample_probability_flow_ode,
)


def _gaussian_eps_apply(mu: float, s0: float, sde: VPSDE):
    def apply_fn(params, x, t, y_cat, y_cont):
        b = x.shape[0]
        a = sde.alpha(t).reshape(b, 1, 1, 1)
        s = sde.sigma(t).reshape(b, 1, 1, 1)
        return s * (x - a * mu) / (a * a * s0 * s0 + s * s)

    return apply_fn


@pytest.mark.parametrize("shift", [0.0, -1.5])
def test_dpm_matches_dense_ode_on_analytic_gaussian(shift):
    sde = VPSDE(0.1, 20.0, logsnr_shift=shift)
    apply_fn = _gaussian_eps_apply(mu=0.3, s0=0.5, sde=sde)
    y_cat, y_cont = sample_grid_conditions(8, 4, 4)
    shape = (8, 8, 8, 1)
    key = jax.random.key(0)

    x_ref = sample_probability_flow_ode(
        apply_fn, None, sde, y_cat, y_cont, shape, key, n_steps=800, t_end=1e-3
    )
    x20 = sample_dpmpp_2m(
        apply_fn, None, sde, y_cat, y_cont, shape, key, n_steps=20, t_end=1e-3
    )
    x40 = sample_dpmpp_2m(
        apply_fn, None, sde, y_cat, y_cont, shape, key, n_steps=40, t_end=1e-3
    )
    # 20 steps already lands within ~1e-2 of the dense solution of the SAME ODE
    np.testing.assert_allclose(np.asarray(x20), np.asarray(x_ref), atol=1.5e-2)
    np.testing.assert_allclose(np.asarray(x40), np.asarray(x_ref), atol=4e-3)
    # second-order convergence: halving h cuts the error by ~4 (allow >2.5)
    err20 = float(jnp.max(jnp.abs(x20 - x_ref)))
    err40 = float(jnp.max(jnp.abs(x40 - x_ref)))
    assert err20 / max(err40, 1e-9) > 2.5


def test_dpm_on_unet_shapes_range_determinism():
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x0 = jnp.zeros((2, 16, 16, 1))
    params = model.init(
        jax.random.key(0), x0, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 4)),
    )["params"]
    apply_fn = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    sde = VPSDE(0.1, 20.0)
    y_cat, y_cont = sample_grid_conditions(2, 4, 4)
    out = sample_dpmpp_2m(
        apply_fn, params, sde, y_cat, y_cont, (2, 16, 16, 1), jax.random.key(1),
        n_steps=6, guidance_scale=1.5,
    )
    out2 = sample_dpmpp_2m(
        apply_fn, params, sde, y_cat, y_cont, (2, 16, 16, 1), jax.random.key(1),
        n_steps=6, guidance_scale=1.5,
    )
    assert out.shape == (2, 16, 16, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
