"""Tensor (model) parallelism tests on the 8-device virtual CPU mesh.

Validates the GSPMD channel-sharding story from parallel/tensor.py: weights
sharded over a ('data','model') mesh run the SAME numerics as single-device —
XLA inserts the channel all-gathers / contraction psums, and semantics are
preserved end-to-end through the forward pass, the train step, and the
compiled sampling scans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models import (
    CondUNetTiny,
    VPSDE,
    sample_chunked,
    sample_reverse_sde_euler_maruyama,
)
from toycrystals_tpu.parallel import (
    data_sharding,
    make_mesh_3d,
    make_mesh_tp,
    shard_params,
    tp_coverage,
    tp_sharding,
)

K = jax.random.key(0)


def _tiny(b=8, hw=16):
    # base_ch=8 / emb_dim=16: every channel count (8, 16) divides the 4-way
    # 'model' axis used below, so the trailing-dim rule shards everything
    # except the 1-channel output conv.
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, jnp.zeros((b, hw, hw, 1)), jnp.zeros((b,)), ycat, ycont)["params"]
    af = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    return af, params, ycat, ycont


def test_mesh_tp_axes():
    mesh = make_mesh_tp(2, 4)
    assert mesh.axis_names == ("data", "model")
    assert dict(mesh.shape) == {"data": 2, "model": 4}


def test_tp_sharding_rule():
    mesh = make_mesh_tp(2, 4)
    P = jax.sharding.PartitionSpec
    # conv kernel HWIO -> output channels sharded
    assert tp_sharding(mesh, (3, 3, 8, 16)).spec == P(None, None, None, "model")
    # dense kernel -> column-parallel
    assert tp_sharding(mesh, (16, 8)).spec == P(None, "model")
    # bias / GN scale -> sharded with its channels
    assert tp_sharding(mesh, (16,)).spec == P("model")
    # 1-channel output conv and scalars -> replicated, not fatal
    assert tp_sharding(mesh, (3, 3, 8, 1)).is_fully_replicated
    assert tp_sharding(mesh, ()).is_fully_replicated
    # indivisible channel count -> replicated
    assert tp_sharding(mesh, (3, 3, 8, 6)).is_fully_replicated


def test_tp_coverage():
    _, params, _, _ = _tiny()
    mesh = make_mesh_tp(2, 4)
    cov = tp_coverage(mesh, params)
    assert 0.9 < cov <= 1.0  # only the out-conv kernel+bias replicate
    # a mesh the channels don't divide -> low coverage, visible not silent
    mesh5 = make_mesh_tp(1, 5)
    assert tp_coverage(mesh5, params) < 0.5


def test_tp_forward_matches_single_device():
    """One jitted forward with channel-sharded weights matches the replicated
    result — GSPMD only changes the partitioning."""
    af, params, ycat, ycont = _tiny()
    x = jax.random.uniform(jax.random.key(1), (8, 16, 16, 1))
    t = jnp.full((8,), 0.3)

    ref = jax.jit(af)(params, x, t, ycat, ycont)

    mesh = make_mesh_tp(2, 4)
    pt = shard_params(mesh, params)
    assert not pt["down1"]["conv0"]["kernel"].sharding.is_fully_replicated
    xs = jax.device_put(x, data_sharding(mesh, 4))
    out = jax.jit(af)(pt, xs, jax.device_put(t, data_sharding(mesh, 1)),
                      jax.device_put(ycat, data_sharding(mesh, 1)),
                      jax.device_put(ycont, data_sharding(mesh, 2)))
    # partitioned GN/contraction reductions reorder floats; [-1,1]-scale output
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-5)


def test_tp_sharded_sampler_matches_single_device():
    """The whole compiled sampling scan with tensor-parallel weights matches
    single-device: same keys, same math."""
    af, params, ycat, ycont = _tiny()
    sde = VPSDE(0.1, 30.0)
    shape = (8, 16, 16, 1)

    x1 = sample_reverse_sde_euler_maruyama(af, params, sde, ycat, ycont, shape, K,
                                           n_steps=3, guidance_scale=1.5)

    mesh = make_mesh_tp(2, 4)
    x2 = sample_reverse_sde_euler_maruyama(
        af, shard_params(mesh, params), sde,
        jax.device_put(ycat, data_sharding(mesh, 1)),
        jax.device_put(ycont, data_sharding(mesh, 2)),
        shape, K, n_steps=3, guidance_scale=1.5,
        sharding=data_sharding(mesh, 4),
    )
    assert np.isfinite(np.asarray(x2)).all()
    # same tolerance rationale as tests/test_spatial.py: reduction reorder
    # amplified over 3 sampler steps, [0,1] dynamic range
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-2, atol=1e-3)


def test_tp_sample_chunked_places_params():
    """sample_chunked hands a ('data','model') mesh to shard_params: the tp
    path needs no special-casing at the call site."""
    af, params, ycat, ycont = _tiny()
    mesh = make_mesh_tp(2, 4)
    x = sample_chunked(
        sample_reverse_sde_euler_maruyama, af, params, VPSDE(0.1, 30.0),
        ycat, ycont, (8, 16, 16, 1), K, chunk=4, mesh=mesh,
        n_steps=2, guidance_scale=1.5,
    )
    assert x.shape == (8, 16, 16, 1)
    assert np.isfinite(x).all()


def test_tp_train_step_matches_single_device():
    """make_sde_train_step with channel-sharded params + Adam-moment shards:
    loss and updated params match single-device. Each chip holds 1/N of the
    optimizer state (the moments shard exactly like their params)."""
    import optax

    from toycrystals_tpu.train import create_train_state, make_sde_train_step

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    b, hw = 16, 16
    x = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, x, jnp.zeros((b,)), ycat, ycont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads, see test_sharding.py
    sde = VPSDE(0.1, 30.0)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.0, t_power=1.0,
                               ema_decay=0.0)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = step(s1, x, ycat, ycont, K)

    mesh = make_mesh_tp(2, 4)
    s2 = shard_params(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    # weights really are distributed: a conv kernel leaf is channel-sharded
    k = s2.params["down1"]["conv0"]["kernel"]
    assert not k.sharding.is_fully_replicated
    xb = jax.device_put(x, data_sharding(mesh, 4))
    cb = jax.device_put(ycat, data_sharding(mesh, 1))
    vb = jax.device_put(ycont, data_sharding(mesh, 2))
    s2, loss2 = step(s2, xb, cb, vb, K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)


def test_tp_prior_train_step_matches_single_device():
    """The FiLM prior (dense MLP — textbook column-parallel) trains with
    channel-sharded weights to the same numerics as single-device; covers the
    dense-kernel and embedding-table leaf kinds of the trailing-dim rule."""
    import optax

    from toycrystals_tpu.models import DiffusionPriorFiLM
    from toycrystals_tpu.models.diffusion_prior import DiffusionSchedule
    from toycrystals_tpu.train import create_train_state, make_prior_train_step

    model = DiffusionPriorFiLM(z_dim=8, n_types=4, y_cont_dim=4, width=32,
                               n_blocks=1)
    z = jax.random.normal(K, (16, 8))
    ycat = jnp.arange(16, dtype=jnp.int32) % 4
    ycont = jnp.zeros((16, 4))
    params = model.init(K, z, jnp.zeros((16,), jnp.int32), ycat, ycont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads, see test_sharding.py
    sched = DiffusionSchedule.linear(8, 1e-4, 1.0)
    step = make_prior_train_step(model, tx, T=8)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, m1 = step(s1, sched, z, ycat, ycont, K)

    mesh = make_mesh_tp(2, 4)
    assert tp_coverage(mesh, params) > 0.5  # the MLP really is sharded
    s2 = shard_params(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    s2, m2 = step(s2, sched,
                  jax.device_put(z, data_sharding(mesh, 2)),
                  jax.device_put(ycat, data_sharding(mesh, 1)),
                  jax.device_put(ycont, data_sharding(mesh, 2)), K)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_cli_shard_model(tmp_path, monkeypatch):
    """--shard 2 --shard-model 4 end-to-end on the virtual mesh (runpy
    in-process; subprocesses can't force a multi-device CPU backend)."""
    import runpy
    import sys
    from pathlib import Path

    monkeypatch.chdir(tmp_path)
    scripts = str(Path(__file__).resolve().parent.parent / "scripts")
    monkeypatch.syspath_prepend(scripts)

    def run(script, *flags):
        monkeypatch.setattr(sys, "argv", [script, "--device", "cpu", *map(str, flags)])
        try:
            runpy.run_path(f"{scripts}/{script}", run_name="__main__")
        except SystemExit as e:
            assert (e.code or 0) == 0, f"{script} exited {e.code}"

    run("train_sde_score_model.py", "--procedural", "--n-samples", 32,
        "--img-size", 16, "--epochs", 1, "--batch-size", 16, "--base-ch", 8,
        "--emb-dim", 16, "--sample-steps", 2, "--sample-every", 99,
        "--shard", 2, "--shard-model", 4, "--out-dir", "runs/tp")
    run("sample_sde_score_model.py", "--out-dir", "runs/tp", "--ckpt", "last",
        "--steps", 2, "--cfg", "1.5", "--sampler", "sde", "--n", 8,
        "--shard", 2, "--shard-model", 4)
    assert list((tmp_path / "runs/tp/results").glob("samples_ckpt-*"))

    # VAE (conv channels sharded) then FiLM prior (dense columns sharded) on
    # top of its checkpoint — the full latent-diffusion stack trains tp.
    run("train_vae.py", "--procedural", "--n-samples", 32, "--epochs", 1,
        "--batch-size", 16, "--z-dim", 8, "--shard", 2, "--shard-model", 4)
    assert (tmp_path / "checkpoints/vae_last.msgpack").exists()
    run("train_diffusion_prior.py", "--procedural", "--max-items", 32,
        "--epochs", 1, "--width", 32, "--z-dim", 8, "--T", 8,
        "--latent-cache", "data/latents.npz", "--ddim-steps", 2,
        "--batch-size", 16, "--shard", 2, "--shard-model", 4)
    assert (tmp_path / "checkpoints/diffusion_prior_last.msgpack").exists()


def test_mesh_3d_axes():
    mesh = make_mesh_3d(2, 2, 2)
    assert mesh.axis_names == ("data", "space", "model")
    assert dict(mesh.shape) == {"data": 2, "space": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh_3d(2, 2, 4)  # 16 > 8 virtual devices


def test_3d_sampler_matches_single_device():
    """dp x sp x tp composed on one 2x2x2 mesh: batch sharded over 'data',
    activation height over 'space', weight channels over 'model' — the full
    compiled sampling scan still matches single-device numerics."""
    from toycrystals_tpu.parallel import image_sharding

    af, params, ycat, ycont = _tiny()
    sde = VPSDE(0.1, 30.0)
    shape = (8, 16, 16, 1)

    x1 = sample_reverse_sde_euler_maruyama(af, params, sde, ycat, ycont, shape, K,
                                           n_steps=3, guidance_scale=1.5)

    mesh = make_mesh_3d(2, 2, 2)
    pt = shard_params(mesh, params)
    assert not pt["down1"]["conv0"]["kernel"].sharding.is_fully_replicated
    sh = image_sharding(mesh)  # P('data','space',None,None)
    assert sh.spec == jax.sharding.PartitionSpec("data", "space", None, None)
    x2 = sample_reverse_sde_euler_maruyama(
        af, pt, sde,
        jax.device_put(ycat, data_sharding(mesh, 1)),
        jax.device_put(ycont, data_sharding(mesh, 2)),
        shape, K, n_steps=3, guidance_scale=1.5,
        sharding=data_sharding(mesh, 4),
    )
    assert np.isfinite(np.asarray(x2)).all()
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-2, atol=1e-3)


def test_3d_train_step_matches_single_device():
    """One SDE train step on the 2x2x2 mesh: gradient all-reduce over 'data',
    halo exchange over 'space', channel collectives over 'model' — loss and
    updated params match single-device."""
    import optax

    from toycrystals_tpu.train import create_train_state, make_sde_train_step

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    b, hw = 8, 16
    x = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, x, jnp.zeros((b,)), ycat, ycont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads, see test_sharding.py
    sde = VPSDE(0.1, 30.0)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.0, t_power=1.0,
                               ema_decay=0.0)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = step(s1, x, ycat, ycont, K)

    mesh = make_mesh_3d(2, 2, 2)
    s2 = shard_params(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    s2, loss2 = step(s2,
                     jax.device_put(x, data_sharding(mesh, 4)),
                     jax.device_put(ycat, data_sharding(mesh, 1)),
                     jax.device_put(ycont, data_sharding(mesh, 2)), K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)


def test_cli_shard_3d(tmp_path, monkeypatch):
    """--shard 2 --shard-space 2 --shard-model 2 end-to-end: the SDE trainer
    and sampler run on the full 3-D mesh (setup_mesh composition path)."""
    import runpy
    import sys
    from pathlib import Path

    monkeypatch.chdir(tmp_path)
    scripts = str(Path(__file__).resolve().parent.parent / "scripts")
    monkeypatch.syspath_prepend(scripts)

    def run(script, *flags):
        monkeypatch.setattr(sys, "argv", [script, "--device", "cpu", *map(str, flags)])
        try:
            runpy.run_path(f"{scripts}/{script}", run_name="__main__")
        except SystemExit as e:
            assert (e.code or 0) == 0, f"{script} exited {e.code}"

    run("train_sde_score_model.py", "--procedural", "--n-samples", 32,
        "--img-size", 16, "--epochs", 1, "--batch-size", 16, "--base-ch", 8,
        "--emb-dim", 16, "--sample-steps", 2, "--sample-every", 99,
        "--shard", 2, "--shard-space", 2, "--shard-model", 2,
        "--out-dir", "runs/p3d")
    run("sample_sde_score_model.py", "--out-dir", "runs/p3d", "--ckpt", "last",
        "--steps", 2, "--cfg", "1.5", "--sampler", "sde", "--n", 8,
        "--shard", 2, "--shard-space", 2, "--shard-model", 2)
    assert list((tmp_path / "runs/p3d/results").glob("samples_ckpt-*"))
