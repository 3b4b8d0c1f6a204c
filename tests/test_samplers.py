"""Compiled sampler + CFG + loss tests (sde_score_model.py:358-569 contracts)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models import (
    CondUNetTiny,
    DiffusionPriorFiLM,
    DiffusionSchedule,
    VPSDE,
    diffusion_loss_eps,
    predict_eps_cfg,
    sample_probability_flow_ode,
    sample_reverse_sde_euler_maruyama,
)
from toycrystals_tpu.models.diffusion_prior import ddim_sample
from toycrystals_tpu.models.sde_score_model import sample_grid_conditions

K = jax.random.key(0)


def _tiny_unet():
    u = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jnp.zeros((2, 16, 16, 1))
    v = u.init(K, x, jnp.zeros((2,)), jnp.array([0, 1]), jnp.zeros((2, 4)))
    apply_fn = lambda p, xt, t, yc, yv: u.apply(p, xt, t, yc, yv)
    return apply_fn, v


def test_cfg_zero_is_single_conditional_pass():
    """cfg <= 0 returns the conditional eps, NOT unconditional
    (sde_score_model.py:415-416)."""
    apply_fn, v = _tiny_unet()
    x = jax.random.normal(K, (2, 16, 16, 1))
    t = jnp.full((2,), 0.5)
    ycat = jnp.array([0, 1])
    ycont = jnp.ones((2, 4))
    out0 = predict_eps_cfg(apply_fn, v, x, t, ycat, ycont, 0.0, 4)
    direct = apply_fn(v, x, t, ycat, ycont)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(direct), atol=1e-6)


def test_cfg_combine_formula():
    """eps = eps_u + s (eps_c - eps_u) with fused doubled-batch forward
    (sde_score_model.py:418-423)."""
    apply_fn, v = _tiny_unet()
    x = jax.random.normal(K, (2, 16, 16, 1))
    t = jnp.full((2,), 0.5)
    ycat = jnp.array([0, 1])
    ycont = jnp.ones((2, 4))
    s = 1.5
    got = predict_eps_cfg(apply_fn, v, x, t, ycat, ycont, s, 4)
    eps_c = apply_fn(v, x, t, ycat, ycont)
    eps_u = apply_fn(v, x, t, jnp.full((2,), 4), jnp.zeros((2, 4)))
    want = eps_u + s * (eps_c - eps_u)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_cfg_one_equals_conditional():
    """s=1 collapses to the conditional prediction."""
    apply_fn, v = _tiny_unet()
    x = jax.random.normal(K, (2, 16, 16, 1))
    t = jnp.full((2,), 0.3)
    ycat = jnp.array([2, 3])
    ycont = jnp.zeros((2, 4))
    got = predict_eps_cfg(apply_fn, v, x, t, ycat, ycont, 1.0, 4)
    want = apply_fn(v, x, t, ycat, ycont)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_loss_finite_and_tpower():
    apply_fn, v = _tiny_unet()
    sde = VPSDE(0.1, 30.0)
    x0 = jax.random.uniform(K, (4, 16, 16, 1))
    ycat = jnp.array([0, 1, 2, 3])
    ycont = jnp.zeros((4, 4))
    for tp in (1.0, 2.0):
        l = diffusion_loss_eps(apply_fn, v, sde, x0, ycat, ycont, K, 4, 0.1, tp)
        assert np.isfinite(float(l))


@pytest.mark.parametrize("sampler", ["sde", "ode"])
def test_samplers_shape_range_determinism(sampler):
    apply_fn, v = _tiny_unet()
    sde = VPSDE(0.1, 30.0)
    ycat, ycont = sample_grid_conditions(4, 4, 4)
    fn = (
        sample_reverse_sde_euler_maruyama if sampler == "sde" else sample_probability_flow_ode
    )
    out = fn(apply_fn, v, sde, ycat, ycont, (4, 16, 16, 1), K, n_steps=5, guidance_scale=1.5)
    arr = np.asarray(out)
    assert arr.shape == (4, 16, 16, 1)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    out2 = fn(apply_fn, v, sde, ycat, ycont, (4, 16, 16, 1), K, n_steps=5, guidance_scale=1.5)
    np.testing.assert_array_equal(arr, np.asarray(out2))  # same key -> same samples
    out3 = fn(
        apply_fn, v, sde, ycat, ycont, (4, 16, 16, 1), jax.random.key(7), n_steps=5,
        guidance_scale=1.5,
    )
    assert not np.allclose(arr, np.asarray(out3))


@pytest.mark.parametrize(
    "sampler",
    [sample_probability_flow_ode, sample_reverse_sde_euler_maruyama],
)
def test_clip_x0_bounds_divergent_model(sampler):
    """With an adversarial eps_hat = 0, the implied x0 = x/alpha explodes
    (1/alpha ~ 1e3 near t=1) and the unclipped trajectory saturates; with
    clip_x0=True every step's implied x0 is clipped to [-1,1], so the final
    (already [0,1]-mapped) image comes from a bounded trajectory. This is the
    256x256 failure mode in miniature (benchmarks/NOTES.md)."""
    from toycrystals_tpu.models import sample_dpmpp_2m

    zero_eps = lambda p, xt, t, yc, yv: jnp.zeros_like(xt)
    sde = VPSDE(0.1, 30.0)
    ycat, ycont = sample_grid_conditions(2, 4, 4)
    x = sampler(zero_eps, {}, sde, ycat, ycont, (2, 16, 16, 1), K,
                n_steps=8, guidance_scale=0.0, clip_x0=True)
    assert np.isfinite(np.asarray(x)).all()
    # the dpm solver clips its x0 form directly
    x = sample_dpmpp_2m(zero_eps, {}, sde, ycat, ycont, (2, 16, 16, 1), K,
                        n_steps=8, guidance_scale=0.0, clip_x0=True)
    assert np.isfinite(np.asarray(x)).all()


def test_clip_x0_noop_on_well_behaved_model():
    """When the model's implied x0 stays inside [-1,1], thresholding must not
    change the trajectory: analytic score of x0 = 0 data gives
    eps_hat = x_t / sqrt(sigma^2 + alpha^2 * 0) -> implied x0 = 0 exactly."""
    sde = VPSDE(0.1, 30.0)

    def exact_eps(p, xt, t, yc, yv):
        # data distribution: delta at x0=0 -> x_t = sigma * eps, eps = x_t/sigma
        s = sde.sigma(t).reshape(-1, 1, 1, 1)
        return xt / s

    ycat, ycont = sample_grid_conditions(2, 4, 4)
    a = sample_reverse_sde_euler_maruyama(
        exact_eps, {}, sde, ycat, ycont, (2, 16, 16, 1), K, n_steps=12,
        clip_x0=False)
    b = sample_reverse_sde_euler_maruyama(
        exact_eps, {}, sde, ycat, ycont, (2, 16, 16, 1), K, n_steps=12,
        clip_x0=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_v_parameterization_identities():
    """v-prediction plumbing: for the delta-at-0 data distribution the exact
    v-model is v = alpha*x_t/sigma (since eps = x_t/sigma, x0 = 0); wrapping
    it with eps_apply_from_v must reproduce the exact eps-model —
    eps = (sigma + alpha^2/sigma) x_t = x_t/sigma — and the samplers must
    produce identical outputs through either route."""
    from toycrystals_tpu.models import eps_apply_from_v

    sde = VPSDE(0.1, 30.0)

    def exact_eps(p, xt, t, yc, yv):
        return xt / sde.sigma(t).reshape(-1, 1, 1, 1)

    def exact_v(p, xt, t, yc, yv):
        a = sde.alpha(t).reshape(-1, 1, 1, 1)
        s = sde.sigma(t).reshape(-1, 1, 1, 1)
        return a * xt / s

    wrapped = eps_apply_from_v(sde, exact_v)
    x = jax.random.normal(K, (2, 16, 16, 1))
    t = jnp.full((2,), 0.37)
    np.testing.assert_allclose(
        np.asarray(wrapped({}, x, t, None, None)),
        np.asarray(exact_eps({}, x, t, None, None)), rtol=1e-6)

    ycat, ycont = sample_grid_conditions(2, 4, 4)
    a = sample_reverse_sde_euler_maruyama(
        exact_eps, {}, sde, ycat, ycont, (2, 16, 16, 1), K, n_steps=10)
    b = sample_reverse_sde_euler_maruyama(
        wrapped, {}, sde, ycat, ycont, (2, 16, 16, 1), K, n_steps=10)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_v_loss_runs_and_differs_from_eps():
    apply_fn, v = _tiny_unet()
    sde = VPSDE(0.1, 30.0)
    x0 = jax.random.uniform(K, (4, 16, 16, 1))
    ycat = jnp.arange(4, dtype=jnp.int32) % 4
    ycont = jnp.zeros((4, 4))
    le = diffusion_loss_eps(apply_fn, v, sde, x0, ycat, ycont, K, 4,
                            parameterization="eps")
    lv = diffusion_loss_eps(apply_fn, v, sde, x0, ycat, ycont, K, 4,
                            parameterization="v")
    assert np.isfinite(float(le)) and np.isfinite(float(lv))
    assert abs(float(le) - float(lv)) > 1e-6  # different targets
    with pytest.raises(ValueError):
        diffusion_loss_eps(apply_fn, v, sde, x0, ycat, ycont, K, 4,
                           parameterization="x0")


def test_sampler_rejects_bad_t_end():
    apply_fn, v = _tiny_unet()
    sde = VPSDE()
    ycat, ycont = sample_grid_conditions(2, 4, 4)
    with pytest.raises(ValueError):
        sample_probability_flow_ode(
            apply_fn, v, sde, ycat, ycont, (2, 16, 16, 1), K, n_steps=2, t_end=0.0
        )


def test_ddim_deterministic_and_converges_shape():
    pr = DiffusionPriorFiLM(z_dim=8, n_types=4, y_cont_dim=4, width=32, n_blocks=1)
    z = jnp.zeros((3, 8))
    ycat = jnp.array([0, 1, 2])
    ycont = jnp.zeros((3, 4))
    v = pr.init(K, z, jnp.array([0, 0, 0]), ycat, ycont)
    apply_fn = lambda p, zt, t, yc, yv: pr.apply(p, zt, t, yc, yv)
    sched = DiffusionSchedule.linear(50, 1e-4, 0.05)
    z1 = ddim_sample(apply_fn, v, sched, ycat, ycont, 10, 8, K)
    z2 = ddim_sample(apply_fn, v, sched, ycat, ycont, 10, 8, K)
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    assert z1.shape == (3, 8)
    with pytest.raises(NotImplementedError):
        ddim_sample(apply_fn, v, sched, ycat, ycont, 10, 8, K, 0.5)


def test_auto_chunk_calibration():
    """auto_chunk keeps the measured-safe 12-image dispatch at 256x256/300
    sde and scales with evals*pixels (benchmarks/NOTES.md)."""
    from toycrystals_tpu.models import auto_chunk

    assert auto_chunk(256, 300, "sde") == 12
    assert auto_chunk(64, 300, "sde") == 192
    assert auto_chunk(64, 300, "ode") == 96  # Heun: 2 evals/step
    assert auto_chunk(256, 600, "ode") >= 1  # never zero


def test_sample_chunked_shape_padding_determinism():
    """sample_chunked: odd n over small chunks -> same shape, finite, and
    deterministic (every dispatch uses fold_in(key, chunk_start))."""
    from toycrystals_tpu.models import sample_chunked

    apply_fn, v = _tiny_unet()
    params = v["params"]
    af = lambda p, xt, t, yc, yv: apply_fn({"params": p}, xt, t, yc, yv)
    sde = VPSDE(0.1, 30.0)
    n = 10
    y_cat, y_cont = sample_grid_conditions(n, 4, 4)
    kw = dict(n_steps=3, guidance_scale=1.5, t_end=1e-3, n_types=4)
    x1 = sample_chunked(
        sample_reverse_sde_euler_maruyama, af, params, sde, y_cat, y_cont,
        (n, 16, 16, 1), K, chunk=4, **kw,
    )
    assert x1.shape == (n, 16, 16, 1)
    assert np.isfinite(x1).all() and x1.min() >= 0.0 and x1.max() <= 1.0
    x2 = sample_chunked(
        sample_reverse_sde_euler_maruyama, af, params, sde, y_cat, y_cont,
        (n, 16, 16, 1), K, chunk=4, **kw,
    )
    np.testing.assert_array_equal(x1, x2)
    # the first chunk of a chunked run IS the full run at chunk >= n
    x_full = sample_chunked(
        sample_reverse_sde_euler_maruyama, af, params, sde, y_cat, y_cont,
        (n, 16, 16, 1), K, chunk=64, **kw,
    )
    assert x_full.shape == (n, 16, 16, 1)


def test_grid_conditions_convention():
    """6x6 grids cycle types and sweep theta (train_vae.py:92-98 et al.)."""
    ycat, ycont = sample_grid_conditions(36, 4, 4)
    assert np.array_equal(np.asarray(ycat[:8]), np.array([0, 1, 2, 3, 0, 1, 2, 3]))
    th = np.asarray(ycont[:, 1])
    assert th[0] == 0.0 and abs(th[-1] - np.pi / 3) < 1e-6
    assert np.all(np.diff(th) > 0)
    assert np.all(np.asarray(ycont[:, [0, 2, 3]]) == 0)


class TestInpainting:
    """sample_inpaint_reverse_sde: mask-conditioned generation (new TPU
    scope — no reference counterpart; replacement method + RePaint
    harmonisation)."""

    def _setup(self):
        apply_fn, v = _tiny_unet()
        sde = VPSDE(0.1, 30.0)
        b, hw = 4, 16
        yc = jnp.arange(b, dtype=jnp.int32) % 4
        yv = jnp.zeros((b, 4))
        xk = jnp.clip(jax.random.uniform(jax.random.key(1), (b, hw, hw, 1)), 0, 1)
        mask = jnp.zeros((b, hw, hw, 1)).at[:, :, :8, :].set(1.0)
        return apply_fn, v, sde, yc, yv, xk, mask, (b, hw, hw, 1)

    def test_known_region_preserved_and_deterministic(self):
        from toycrystals_tpu.models import sample_inpaint_reverse_sde

        af, v, sde, yc, yv, xk, mask, shape = self._setup()
        out = sample_inpaint_reverse_sde(
            af, v, sde, yc, yv, shape, jax.random.key(2), n_steps=4,
            guidance_scale=1.5, x_known=xk, mask=mask)
        out2 = sample_inpaint_reverse_sde(
            af, v, sde, yc, yv, shape, jax.random.key(2), n_steps=4,
            guidance_scale=1.5, x_known=xk, mask=mask)
        assert out.shape == shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
        # masked-in pixels are EXACTLY the known image; everything in [0,1]
        np.testing.assert_array_equal(np.asarray(out)[:, :, :8],
                                      np.asarray(xk)[:, :, :8])
        o = np.asarray(out)
        assert np.all((o >= 0.0) & (o <= 1.0))
        # the generated half actually differs from the (random) source
        assert not np.allclose(o[:, :, 8:], np.asarray(xk)[:, :, 8:])

    def test_all_known_mask_is_identity(self):
        from toycrystals_tpu.models import sample_inpaint_reverse_sde

        af, v, sde, yc, yv, xk, _, shape = self._setup()
        out = sample_inpaint_reverse_sde(
            af, v, sde, yc, yv, shape, jax.random.key(3), n_steps=2,
            x_known=xk, mask=jnp.ones_like(xk))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(xk))

    def test_resample_changes_result_and_stays_finite(self):
        from toycrystals_tpu.models import sample_inpaint_reverse_sde

        af, v, sde, yc, yv, xk, mask, shape = self._setup()
        base = sample_inpaint_reverse_sde(
            af, v, sde, yc, yv, shape, jax.random.key(2), n_steps=4,
            x_known=xk, mask=mask)
        r3 = sample_inpaint_reverse_sde(
            af, v, sde, yc, yv, shape, jax.random.key(2), n_steps=4,
            resample=3, x_known=xk, mask=mask)
        assert np.isfinite(np.asarray(r3)).all()
        assert not np.allclose(np.asarray(r3), np.asarray(base))
        np.testing.assert_array_equal(np.asarray(r3)[:, :, :8],
                                      np.asarray(xk)[:, :, :8])
        with pytest.raises(ValueError, match="resample"):
            sample_inpaint_reverse_sde(
                af, v, sde, yc, yv, shape, jax.random.key(2), n_steps=2,
                resample=0, x_known=xk, mask=mask)

    def test_chunked_dispatch_with_batch_kw(self):
        from toycrystals_tpu.models import sample_chunked, sample_inpaint_reverse_sde

        af, v, sde, yc, yv, xk, mask, shape = self._setup()
        out = sample_chunked(
            sample_inpaint_reverse_sde, af, v, sde, yc, yv, shape,
            jax.random.key(4), chunk=3, n_steps=2,
            batch_kw={"x_known": xk, "mask": mask})
        assert out.shape == shape
        np.testing.assert_array_equal(out[:, :, :8], np.asarray(xk)[:, :, :8])

    def test_cli_end_to_end(self, tmp_path, monkeypatch):
        """Tiny checkpoint -> inpaint CLI -> figure + JSON metrics line."""
        import runpy
        import sys
        from pathlib import Path

        import flax.serialization

        from toycrystals_tpu.utils.checkpoint import save_checkpoint

        u = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
        x = jnp.zeros((2, 16, 16, 1))
        v = u.init(K, x, jnp.zeros((2,)), jnp.array([0, 1]), jnp.zeros((2, 4)))
        ckpt = tmp_path / "checkpoints" / "sde_score_model_last.msgpack"
        save_checkpoint(ckpt, {
            "state": {"params": v["params"], "ema_params": None},
            "config": {"img_ch": 1, "n_types": 4, "y_cont_dim": 4,
                       "base_ch": 8, "emb_dim": 16, "cond_ch": 8,
                       "time_ch": 8, "beta_min": 0.1, "beta_max": 30.0,
                       "param": "eps", "img_size": 16},
        })
        script = Path(__file__).resolve().parent.parent / "scripts" / "inpaint_sde_score_model.py"
        monkeypatch.setattr(sys, "argv", [
            str(script), "--out-dir", str(tmp_path), "--device", "cpu",
            "--n", "2", "--steps", "2", "--mask", "left", "--mask-frac", "0.5"])
        monkeypatch.syspath_prepend(str(script.parent))
        with pytest.raises(SystemExit) as e:
            runpy.run_path(str(script), run_name="__main__")
        assert e.value.code == 0
        outs = list((tmp_path / "results").glob("inpaint_*.png"))
        assert len(outs) == 1
