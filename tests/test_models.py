"""Model unit tests mirroring the reference contracts (SURVEY.md §4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models import (
    VAE,
    CondUNetTiny,
    CondVAE,
    ConditionEmbedding,
    DiffusionPriorFiLM,
    DiffusionSchedule,
    VPSDE,
    kl_stats,
    timestep_embedding_continuous,
    timestep_embedding_discrete,
)
from toycrystals_tpu.models.diffusion_prior import ddim_timesteps

K = jax.random.key(0)


def test_condvae_shapes():
    m = CondVAE(z_dim=32)
    x = jnp.zeros((2, 64, 64, 1))
    ycat = jnp.array([0, 3])
    ycont = jnp.zeros((2, 4))
    v = m.init({"params": K, "reparam": K}, x, ycat, ycont)
    xh, mu, lv = m.apply(v, x, ycat, ycont, rngs={"reparam": K})
    assert xh.shape == (2, 64, 64, 1)
    assert mu.shape == (2, 32) and lv.shape == (2, 32)
    assert float(xh.min()) >= 0.0 and float(xh.max()) <= 1.0  # sigmoid output


def test_vae_uncond_shapes():
    m = VAE(z_dim=16)
    x = jnp.zeros((2, 64, 64, 1))
    v = m.init({"params": K, "reparam": K}, x)
    xh, mu, lv = m.apply(v, x, rngs={"reparam": K})
    assert xh.shape == (2, 64, 64, 1) and mu.shape == (2, 16)


def test_cond_drop_train_only():
    """cond_drop masks the cond vec in decode only during training (vae.py:65-67)."""
    m = CondVAE(z_dim=8, cond_drop=1.0)  # always drop when training
    z = jnp.ones((4, 8))
    ycat = jnp.array([0, 1, 2, 3])
    ycont = jnp.ones((4, 4))
    v = m.init({"params": K, "reparam": K}, jnp.zeros((4, 64, 64, 1)), ycat, ycont)
    dec = lambda train, yc: m.apply(
        v, z, yc, ycont, train, method="decode", rngs={"cond_drop": K}
    )
    # train=True with drop=1.0: output is independent of the condition
    np.testing.assert_allclose(
        np.asarray(dec(True, ycat)), np.asarray(dec(True, jnp.array([3, 2, 1, 0]))), atol=1e-6
    )
    # eval: condition matters
    assert not np.allclose(np.asarray(dec(False, ycat)), np.asarray(dec(False, jnp.array([3, 2, 1, 0]))))


def test_kl_stats_free_bits():
    """Free-bits floors per-dim KL (train_vae.py:17-36)."""
    mu = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))  # KL per dim = 0
    used, raw = kl_stats(mu, logvar, free_bits=0.05)
    assert float(raw) == pytest.approx(0.0)
    assert float(used) == pytest.approx(0.05 * 8)
    used2, raw2 = kl_stats(mu, logvar, free_bits=0.0)
    assert float(used2) == pytest.approx(float(raw2))


def test_vpsde_identities():
    """alpha^2 + sigma^2 ~= 1 and endpoints (sde_score_model.py:287-298)."""
    sde = VPSDE(0.1, 30.0)
    t = jnp.linspace(0.0, 1.0, 101)
    a, s = sde.alpha(t), sde.sigma(t)
    np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, atol=1e-5)
    assert float(sde.alpha(jnp.array(0.0))) == pytest.approx(1.0)
    assert float(sde.beta(jnp.array(0.0))) == pytest.approx(0.1)
    assert float(sde.beta(jnp.array(1.0))) == pytest.approx(30.0)
    assert float(sde.sigma(jnp.array(1.0))) == pytest.approx(1.0, abs=1e-3)


def test_vpsde_logsnr_shift():
    """Shifted schedule: shift=0 is the base schedule exactly; shift=c moves
    the log-SNR by c nats while keeping all VP-SDE identities."""
    t = jnp.linspace(1e-4, 1.0, 101)
    base = VPSDE(0.1, 30.0)
    zero = VPSDE(0.1, 30.0, logsnr_shift=0.0)
    np.testing.assert_allclose(np.asarray(zero.alpha(t)), np.asarray(base.alpha(t)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(zero.beta(t)), np.asarray(base.beta(t)), rtol=1e-5)

    c = -2.0 * np.log(4.0)  # the 256x256 stretch shift
    sh = VPSDE(0.1, 30.0, logsnr_shift=c)
    a, s = sh.alpha(t), sh.sigma(t)
    # still a valid VP schedule
    np.testing.assert_allclose(np.asarray(a**2 + s**2), 1.0, atol=1e-5)
    assert float(sh.alpha(jnp.array(0.0))) == pytest.approx(1.0)
    assert float(sh.sigma(jnp.array(1.0))) == pytest.approx(1.0, abs=1e-3)
    # log-SNR shifted by exactly c
    lam = lambda m: np.log(np.asarray(m.alpha(t)) ** 2 / np.asarray(m.sigma(t)) ** 2)
    np.testing.assert_allclose(lam(sh) - lam(base), c, atol=1e-3)
    # beta is consistent with the marginal: beta = -d/dt log alpha^2
    tf = np.linspace(0.05, 0.95, 91)
    h = 1e-3
    la = lambda tt: np.log(np.asarray(sh.alpha(jnp.asarray(tt))) ** 2)
    beta_fd = -(la(tf + h) - la(tf - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(sh.beta(jnp.asarray(tf))), beta_fd, rtol=1e-3)


def test_schedule_constants():
    """Linear DDPM schedule laws (diffusion_prior.py:178-189)."""
    sched = DiffusionSchedule.linear(100, 1e-4, 0.05)
    b = np.asarray(sched.betas)
    assert b[0] == pytest.approx(1e-4) and b[-1] == pytest.approx(0.05)
    np.testing.assert_allclose(
        np.asarray(sched.alpha_bars), np.cumprod(1.0 - b), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_alpha_bars) ** 2, np.asarray(sched.alpha_bars), rtol=1e-6
    )


def test_q_sample_endpoints():
    sched = DiffusionSchedule.linear(1000, 1e-4, 0.02)
    z0 = jnp.ones((2, 4))
    eps = jnp.full((2, 4), 2.0)
    zt0 = sched.q_sample(z0, jnp.array([0, 0]), eps)
    # at t=0, abar ~ 1: z_t ~ z0
    np.testing.assert_allclose(np.asarray(zt0), 1.0 + 2.0 * math.sqrt(1e-4), atol=1e-3)
    ztT = sched.q_sample(z0, jnp.array([999, 999]), eps)
    # at t=T-1 mostly noise
    assert abs(float(ztT[0, 0]) - 2.0 * float(sched.sqrt_one_minus_alpha_bars[999])) < 0.3


def test_ddim_timesteps_dedup():
    """round(linspace(T-1,0,n)) with consecutive dedup (diffusion_prior.py:219-222)."""
    ts = ddim_timesteps(10, 50)  # more steps than T -> heavy dedup
    assert len(ts) == 10
    assert ts[0] == 9 and ts[-1] == 0
    assert np.all(np.diff(ts) < 0)
    ts2 = ddim_timesteps(1000, 50)
    assert len(ts2) == 50 and ts2[0] == 999 and ts2[-1] == 0


def test_timestep_embedding_orderings():
    """Discrete is sin-first (diffusion_prior.py:22); continuous is cos-first
    (sde_score_model.py:29)."""
    td = timestep_embedding_discrete(jnp.array([0]), 8)
    np.testing.assert_allclose(np.asarray(td[0, :4]), 0.0, atol=1e-7)  # sin(0)=0 first
    np.testing.assert_allclose(np.asarray(td[0, 4:]), 1.0, atol=1e-7)  # cos(0)=1 second
    tc = timestep_embedding_continuous(jnp.array([0.0]), 8)
    np.testing.assert_allclose(np.asarray(tc[0, :4]), 1.0, atol=1e-7)  # cos first
    np.testing.assert_allclose(np.asarray(tc[0, 4:]), 0.0, atol=1e-7)
    # odd dims zero-padded
    assert timestep_embedding_discrete(jnp.array([3]), 9).shape == (1, 9)
    assert float(timestep_embedding_discrete(jnp.array([3]), 9)[0, -1]) == 0.0


def test_condition_embedding_theta_sincos():
    """theta at y_cont[1] -> (sin, cos) at indices 1,2 (sde_score_model.py:73-78)."""
    ce = ConditionEmbedding(n_types=4, y_cont_dim=4, emb_dim=16)
    theta = 0.7
    yc = jnp.array([1])
    base = jnp.array([[0.0, theta, 0.0, 0.0]])
    v = ce.init(K, yc, base)
    out1 = ce.apply(v, yc, base)
    # feeding sin/cos directly at (1,2) must give identical output IF the module
    # didn't rewrite -- instead it must differ, proving the rewrite uses raw theta
    pre = jnp.array([[0.0, math.sin(theta), math.cos(theta), 0.0]])
    out2 = ce.apply(v, yc, pre)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # y_cont_dim < 3 rejected (sde_score_model.py:55-56)
    with pytest.raises(ValueError):
        ConditionEmbedding(n_types=4, y_cont_dim=2, emb_dim=16).init(
            K, yc, jnp.zeros((1, 2))
        )


def test_unet_shapes_multi_size():
    u = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=16)
    for hw in (32, 64):
        x = jnp.zeros((2, hw, hw, 1))
        v = u.init(K, x, jnp.zeros((2,)), jnp.array([0, 1]), jnp.zeros((2, 4)))
        out = u.apply(v, x, jnp.full((2,), 0.3), jnp.array([0, 1]), jnp.zeros((2, 4)))
        assert out.shape == (2, hw, hw, 1)


def test_unet_accepts_null_token():
    """y_cat = n_types is the CFG null token (sde_score_model.py:46-47,58)."""
    u = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=16)
    x = jnp.zeros((1, 32, 32, 1))
    v = u.init(K, x, jnp.zeros((1,)), jnp.array([4]), jnp.zeros((1, 4)))
    out = u.apply(v, x, jnp.zeros((1,)), jnp.array([4]), jnp.zeros((1, 4)))
    assert np.isfinite(np.asarray(out)).all()


def test_prior_film_shapes():
    pr = DiffusionPriorFiLM(z_dim=32, n_types=4, y_cont_dim=4, width=64, n_blocks=2)
    z = jnp.zeros((3, 32))
    v = pr.init(K, z, jnp.array([0, 1, 2]), jnp.array([0, 1, 2]), jnp.zeros((3, 4)))
    out = pr.apply(v, z, jnp.array([5, 1, 199]), jnp.array([0, 1, 2]), jnp.zeros((3, 4)))
    assert out.shape == (3, 32)
