"""Train-step tests: losses go down, EMA tracks, bucket diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from toycrystals_tpu.models import (
    CondUNetTiny,
    CondVAE,
    DiffusionPriorFiLM,
    DiffusionSchedule,
    VPSDE,
)
from toycrystals_tpu.train import (
    create_train_state,
    make_prior_train_step,
    make_sde_train_step,
    make_vae_train_step,
)

K = jax.random.key(0)


def _fake_batch(b=8, hw=16):
    x = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    y_cat = jnp.arange(b, dtype=jnp.int32) % 4
    y_cont = jnp.zeros((b, 4))
    return x, y_cat, y_cont


def test_vae_step_decreases_loss():
    model = CondVAE(z_dim=8)
    x, ycat, ycont = _fake_batch(b=4, hw=64)  # VAE is a fixed 64->4->64 stack (vae.py:18-43)
    params = model.init({"params": K, "reparam": K}, x, ycat, ycont)["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    step = make_vae_train_step(model, tx, free_bits=0.05)
    losses = []
    for i in range(30):
        state, m = step(state, x, ycat, ycont, jnp.float32(3e-4), jax.random.fold_in(K, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30
    # free bits floor: kl_used >= free_bits * z_dim
    assert float(m["kl"]) >= 0.05 * 8 - 1e-5
    assert float(m["kl"]) >= float(m["kl_raw"]) - 1e-5


def test_sde_step_ema_tracks():
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x, ycat, ycont = _fake_batch()
    params = model.init(K, x, jnp.zeros((8,)), ycat, ycont)["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, ema=True)
    sde = VPSDE(0.1, 30.0)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.1, t_power=1.0, ema_decay=0.5)
    p0 = jax.tree.leaves(state.params)[0].copy()
    for i in range(5):
        state, loss = step(state, x, ycat, ycont, jax.random.fold_in(K, i))
    assert np.isfinite(float(loss))
    # EMA lags params: ema != params but closer to params than init after steps
    leaf_p = np.asarray(jax.tree.leaves(state.params)[0])
    leaf_e = np.asarray(jax.tree.leaves(state.ema_params)[0])
    assert not np.allclose(leaf_p, leaf_e)
    d_pe = np.abs(leaf_p - leaf_e).mean()
    d_p0 = np.abs(leaf_p - np.asarray(p0)).mean()
    assert d_pe < d_p0 + 1e-6


def test_sde_step_no_ema():
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x, ycat, ycont = _fake_batch()
    params = model.init(K, x, jnp.zeros((8,)), ycat, ycont)["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx, ema=False)
    assert state.ema_params is None
    assert state.sample_params is state.params
    sde = VPSDE()
    step = make_sde_train_step(model, tx, sde, 4, 0.1, 1.0, 0.0)
    state, loss = step(state, x, ycat, ycont, K)
    assert state.ema_params is None


def test_prior_step_buckets():
    model = DiffusionPriorFiLM(z_dim=8, n_types=4, y_cont_dim=4, width=32, n_blocks=1)
    z = jax.random.normal(K, (64, 8))
    ycat = jnp.arange(64, dtype=jnp.int32) % 4
    ycont = jnp.zeros((64, 4))
    params = model.init(K, z, jnp.zeros((64,), jnp.int32), ycat, ycont)["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    sched = DiffusionSchedule.linear(200, 1e-4, 1.0)
    step = make_prior_train_step(model, tx, T=200)
    state, m = step(state, sched, z, ycat, ycont, K)
    bs, bn = np.asarray(m["bucket_sum"]), np.asarray(m["bucket_n"])
    assert bn.sum() == 64  # every sample lands in exactly one bucket
    assert np.isfinite(bs).all()
    # u^2 bias: low-t buckets get more samples on average — weak check over keys
    tot_low = 0.0
    for i in range(5):
        # state is donated — always thread the returned state back in
        state, m = step(state, sched, z, ycat, ycont, jax.random.fold_in(K, i))
        tot_low += float(np.asarray(m["bucket_n"])[0])
    assert tot_low / 5 > 64 / 4  # bucket 0 over-represented vs uniform


def test_sde_fused_epoch_procedural():
    """One compiled epoch (shuffle + on-device datagen + all steps + EMA)
    advances state by n_steps and reduces loss across epochs."""
    from toycrystals_tpu.data import LatticeConfig
    from toycrystals_tpu.train import make_sde_train_epoch

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    cfg = LatticeConfig(img_size=16, rot_only=True)
    x, ycat, ycont = _fake_batch(b=2, hw=16)
    params = model.init(K, x, jnp.zeros((2,)), ycat[:2], ycont[:2])["params"]
    tx = optax.adam(2e-3)
    sde = VPSDE(0.1, 30.0)
    state = create_train_state(params, tx, ema=True)
    epoch_fn = make_sde_train_epoch(
        model, tx, sde, 4, 0.1, 1.0, 0.9, batch_size=8, n_items=35,
        lattice_cfg=cfg, dataset_seed=0,
    )

    losses = []
    for e in range(4):
        state, loss = epoch_fn(state, jax.random.fold_in(K, e))
        losses.append(float(loss))
    assert int(state.step) == 4 * (35 // 8)  # drop-last semantics
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sde_fused_epoch_resident_matches_shapes():
    from toycrystals_tpu.train import make_sde_train_epoch

    n, hw = 20, 16
    x_u8 = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (n, hw, hw, 1), dtype=np.uint8)
    )
    ycat = jnp.arange(n, dtype=jnp.int32) % 4
    ycont = jnp.zeros((n, 4), jnp.float32)

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    params = model.init(K, jnp.zeros((2, hw, hw, 1)), jnp.zeros((2,)),
                        ycat[:2], ycont[:2])["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    epoch_fn = make_sde_train_epoch(
        model, tx, VPSDE(0.1, 30.0), 4, 0.1, 1.0, 0.0, batch_size=8, n_items=n,
        resident=(x_u8, ycat, ycont),
    )
    state, loss = epoch_fn(state, K)
    assert int(state.step) == n // 8
    assert np.isfinite(float(loss))


def test_sde_fused_epoch_requires_one_source():
    import pytest

    from toycrystals_tpu.data import LatticeConfig
    from toycrystals_tpu.train import make_sde_train_epoch

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    with pytest.raises(ValueError):
        make_sde_train_epoch(model, optax.adam(1e-3), VPSDE(0.1, 30.0),
                             4, 0.1, 1.0, 0.0, 8, 16)


def test_vae_fused_epoch_procedural():
    from toycrystals_tpu.data import LatticeConfig
    from toycrystals_tpu.train import make_vae_train_epoch

    model = CondVAE(z_dim=4, n_types=4, y_cont_dim=4)
    cfg = LatticeConfig(img_size=64, rot_only=True)
    x = jnp.zeros((2, 64, 64, 1))
    ycat = jnp.zeros((2,), jnp.int32)
    ycont = jnp.zeros((2, 4))
    params = model.init({"params": K, "reparam": K}, x, ycat, ycont)["params"]
    tx = optax.adam(2e-3)
    state = create_train_state(params, tx)
    epoch_fn = make_vae_train_epoch(model, tx, 0.05, batch_size=8, n_items=17,
                                    lattice_cfg=cfg)
    m0 = None
    for e in range(3):
        state, m = epoch_fn(state, jnp.float32(3e-4), jax.random.fold_in(K, e))
        m0 = m0 or {k: float(v) for k, v in m.items()}
    assert int(state.step) == 3 * 2  # 17 // 8 = 2 steps per epoch, drop-last
    assert set(m.keys()) == {"loss", "recon", "kl", "kl_raw"}
    assert float(m["loss"]) < m0["loss"]


def test_prior_fused_epoch_buckets_aggregate():
    from toycrystals_tpu.train import make_prior_train_epoch

    n, z_dim = 40, 8
    z0 = jax.random.normal(K, (n, z_dim))
    ycat = jnp.arange(n, dtype=jnp.int32) % 4
    ycont = jnp.zeros((n, 4))
    model = DiffusionPriorFiLM(z_dim=z_dim, n_types=4, y_cont_dim=4, width=32,
                               n_blocks=2, y_cat_emb_dim=8)
    params = model.init(K, z0[:2], jnp.zeros((2,), jnp.int32), ycat[:2], ycont[:2])["params"]
    tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    sched = DiffusionSchedule.linear(100, 1e-4, 0.05)
    epoch_fn = make_prior_train_epoch(model, tx, 100, batch_size=8, latents=(z0, ycat, ycont))
    state, m = epoch_fn(state, sched, K)
    assert int(state.step) == 5
    # every training sample lands in exactly one bucket, summed over the epoch
    assert float(jnp.sum(m["bucket_n"])) == 5 * 8
    assert np.isfinite(float(m["loss"]))


def test_sde_grad_accum_matches_unsplit():
    """--grad-accum k is numerically the unsplit step: the randomness is
    drawn once for the full batch (draw_diffusion_loss_noise) and chunk
    grads average exactly to the batch grad (equal chunk sizes)."""
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x, ycat, ycont = _fake_batch(b=8)
    params = model.init(K, x, jnp.zeros((8,)), ycat, ycont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads: update-equality is exact-ish
    sde = VPSDE(0.1, 30.0)

    step1 = make_sde_train_step(model, tx, sde, 4, p_uncond=0.1, t_power=1.0,
                                ema_decay=0.5)
    step4 = make_sde_train_step(model, tx, sde, 4, p_uncond=0.1, t_power=1.0,
                                ema_decay=0.5, grad_accum=4)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx, ema=True)
    s4 = create_train_state(jax.tree.map(jnp.copy, params), tx, ema=True)
    for i in range(2):
        k = jax.random.fold_in(K, i)
        s1, l1 = step1(s1, x, ycat, ycont, k)
        s4, l4 = step4(s4, x, ycat, ycont, k)
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.ema_params), jax.tree.leaves(s4.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sde_grad_accum_sharded_matches():
    """grad-accum composes with the data-parallel mesh: each scanned chunk
    stays batch-sharded over 'data' and numerics still match."""
    from toycrystals_tpu.parallel import data_sharding, make_mesh, replicate

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x, ycat, ycont = _fake_batch(b=16)
    params = model.init(K, x, jnp.zeros((16,)), ycat, ycont)["params"]
    tx = optax.sgd(1e-2)
    sde = VPSDE(0.1, 30.0)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.0, t_power=1.0,
                               ema_decay=0.0, grad_accum=2)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, l1 = step(s1, x, ycat, ycont, K)

    mesh = make_mesh(8)
    s2 = replicate(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    s2, l2 = step(s2,
                  jax.device_put(x, data_sharding(mesh, 4)),
                  jax.device_put(ycat, data_sharding(mesh, 1)),
                  jax.device_put(ycont, data_sharding(mesh, 2)), K)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_skip_nonfinite_guard():
    """optax.apply_if_finite wiring (`--skip-nonfinite`): a batch whose
    gradients go non-finite leaves params/opt/EMA untouched and increments
    the skip counter; a following finite batch trains normally; past K
    consecutive bad steps the NaNs propagate (divergence-guard handoff)."""
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x, ycat, ycont = _fake_batch()
    params = model.init(K, x, jnp.zeros((x.shape[0],)), ycat, ycont)["params"]
    tx = optax.apply_if_finite(optax.adam(1e-3), max_consecutive_errors=2)
    sde = VPSDE(0.1, 30.0)
    state = create_train_state(params, tx, ema=True)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.1, t_power=1.0,
                               ema_decay=0.999)

    x_bad = x.at[0, 0, 0, 0].set(jnp.nan)  # NaN input -> NaN loss/grads
    p0 = jax.tree.map(np.asarray, state.params)
    state, loss = step(state, x_bad, ycat, ycont, jax.random.fold_in(K, 0))
    assert not np.isfinite(float(loss))
    assert int(state.opt_state.total_notfinite) == 1
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))  # update skipped

    state, loss = step(state, x, ycat, ycont, jax.random.fold_in(K, 1))
    assert np.isfinite(float(loss))
    changed = any(
        np.abs(np.asarray(b) - a).max() > 0
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)))
    assert changed  # finite batch trains
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(state.params))
    assert int(state.opt_state.total_notfinite) == 1

    # exceed max_consecutive_errors: the 3rd straight bad step applies the
    # non-finite update so the failure surfaces instead of looping silently
    for i in range(3):
        state, _ = step(state, x_bad, ycat, ycont, jax.random.fold_in(K, 10 + i))
    finite = all(np.isfinite(np.asarray(v)).all()
                 for v in jax.tree.leaves(state.params))
    assert not finite


def test_min_snr_weighting_math():
    """min-SNR-γ (`--min-snr-gamma`): exact per-sample weights against a
    numpy oracle on a constant predictor; γ→∞ reduces to the unweighted eps
    loss bitwise; fm + weighting raises."""
    import pytest

    from toycrystals_tpu.models.sde_score_model import diffusion_loss_eps_given

    sde = VPSDE(0.1, 30.0)
    b, hw = 16, 8
    x0 = jax.random.uniform(jax.random.key(2), (b, hw, hw, 1))
    ycat = jnp.zeros((b,), jnp.int32)
    ycont = jnp.zeros((b, 4))
    t = jnp.linspace(0.02, 0.98, b)
    eps = jax.random.normal(jax.random.key(3), x0.shape)
    zero_pred = lambda p, x_t, tt, yc, yv: jnp.zeros_like(x_t)

    base = diffusion_loss_eps_given(zero_pred, {}, sde, x0, ycat, ycont, t, eps)
    huge = diffusion_loss_eps_given(zero_pred, {}, sde, x0, ycat, ycont, t,
                                    eps, "eps", min_snr_gamma=1e12)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(huge))

    a = np.asarray(sde.alpha(t))
    s = np.asarray(sde.sigma(t))
    snr = (a / s) ** 2
    se = np.asarray(eps) ** 2  # pred = 0, target = eps
    for gamma in (1.0, 5.0):
        got = diffusion_loss_eps_given(zero_pred, {}, sde, x0, ycat, ycont,
                                       t, eps, "eps", min_snr_gamma=gamma)
        w = np.minimum(snr, gamma) / snr
        want = np.mean(w[:, None, None, None] * se)
        np.testing.assert_allclose(float(got), want, rtol=1e-6)

    # v-prediction: target = a*eps - s*x0, weight min(snr,γ)/(snr+1)
    x0m = np.asarray(x0) * 2.0 - 1.0
    se_v = (a[:, None, None, None] * np.asarray(eps)
            - s[:, None, None, None] * x0m) ** 2
    got_v = diffusion_loss_eps_given(zero_pred, {}, sde, x0, ycat, ycont,
                                     t, eps, "v", min_snr_gamma=5.0)
    w_v = np.minimum(snr, 5.0) / (snr + 1.0)
    np.testing.assert_allclose(
        float(got_v), np.mean(w_v[:, None, None, None] * se_v), rtol=1e-6)

    with pytest.raises(ValueError, match="min-SNR"):
        diffusion_loss_eps_given(zero_pred, {}, sde, x0, ycat, ycont, t, eps,
                                 "fm", min_snr_gamma=5.0)


def test_min_snr_grad_accum_matches_unsplit():
    """`--min-snr-gamma` composes with `--grad-accum`: the chunked step is
    numerically the unsplit weighted step (same contract as the unweighted
    objective, test_sde_grad_accum_matches_unsplit)."""
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x, ycat, ycont = _fake_batch(b=8)
    params = model.init(K, x, jnp.zeros((8,)), ycat, ycont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads: update-equality is exact-ish
    sde = VPSDE(0.1, 30.0)
    outs = []
    for accum in (1, 4):
        state = create_train_state(jax.tree.map(jnp.copy, params), tx)
        step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.1,
                                   t_power=1.0, ema_decay=0.0,
                                   grad_accum=accum, min_snr_gamma=5.0)
        for i in range(3):
            state, loss = step(state, x, ycat, ycont, jax.random.fold_in(K, i))
        outs.append((float(loss), jax.tree.map(np.asarray, state.params)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(outs[0][1]), jax.tree.leaves(outs[1][1])):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_clip_grad_norm_chain_bounds_update():
    """`--clip-grad-norm` wiring: with plain SGD behind the clip, the
    post-clip update's global norm is exactly min(G, ||g||); an enormous
    loss scale therefore produces a bounded parameter move."""
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x, ycat, ycont = _fake_batch()
    params = model.init(K, x, jnp.zeros((8,)), ycat, ycont)["params"]
    clip = 0.5
    tx = optax.chain(optax.clip_by_global_norm(clip), optax.sgd(1.0))
    sde = VPSDE(0.1, 30.0)
    state = create_train_state(params, tx)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.1, t_power=1.0,
                               ema_decay=0.0)
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, x, ycat, ycont, jax.random.fold_in(K, 0))
    deltas = [np.asarray(b) - a for a, b in
              zip(jax.tree.leaves(p0), jax.tree.leaves(state.params))]
    gnorm = float(np.sqrt(sum((d ** 2).sum() for d in deltas)))
    assert gnorm <= clip + 1e-5


def test_sde_fused_epoch_fresh_data():
    """--fresh-data contract (train/steps.py:make_sde_train_epoch): offset 0
    reproduces the fixed-dataset epoch EXACTLY (same shuffle, same items);
    later offsets train on disjoint deterministic slices (different data ->
    different updated params); resident sources reject the mode."""
    import pytest

    from toycrystals_tpu.data import LatticeConfig
    from toycrystals_tpu.train import make_sde_train_epoch

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    cfg = LatticeConfig(img_size=16, rot_only=True)
    x, ycat, ycont = _fake_batch(b=2, hw=16)
    params = model.init(K, x, jnp.zeros((2,)), ycat[:2], ycont[:2])["params"]
    tx = optax.adam(1e-3)
    sde = VPSDE(0.1, 30.0)
    kw = dict(batch_size=8, n_items=16, lattice_cfg=cfg, dataset_seed=0)

    fixed = make_sde_train_epoch(model, tx, sde, 4, 0.1, 1.0, 0.0, **kw)
    fresh = make_sde_train_epoch(model, tx, sde, 4, 0.1, 1.0, 0.0,
                                 fresh_data=True, **kw)

    copy = lambda: jax.tree.map(jnp.array, params)  # donation-safe copies
    s_fixed = create_train_state(copy(), tx)
    s_fixed, loss_fixed = fixed(s_fixed, K)
    s0 = create_train_state(copy(), tx)
    s0, loss0 = fresh(s0, K, jnp.int32(0))
    assert float(loss0) == float(loss_fixed)
    jax.tree.map(np.testing.assert_array_equal, s0.params, s_fixed.params)

    s1 = create_train_state(copy(), tx)
    s1, loss1 = fresh(s1, K, jnp.int32(16))  # epoch-1 slice: disjoint items
    assert float(loss1) != float(loss0)
    diffs = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s0.params, s1.params))
    assert max(diffs) > 0.0

    with pytest.raises(ValueError, match="fresh_data"):
        make_sde_train_epoch(
            model, tx, sde, 4, 0.1, 1.0, 0.0, batch_size=8, n_items=16,
            resident=(jnp.zeros((16, 16, 16, 1), jnp.uint8),
                      jnp.zeros((16,), jnp.int32), jnp.zeros((16, 4))),
            fresh_data=True)
