"""Pipeline-parallelism tests on the 8-device virtual CPU mesh.

Validates parallel/pipeline.py: the FiLM prior's blocks placed on the
stages of a ('data','pipe') mesh and streamed microbatch-by-microbatch with
shard_map + ppermute run the SAME numerics as the single-device model —
forward, gradients (through the reverse ppermute chain), the compiled DDIM
scan, and a full train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models import DiffusionPriorFiLM
from toycrystals_tpu.models.diffusion_prior import DiffusionSchedule, ddim_sample
from toycrystals_tpu.parallel import (
    make_mesh_pp,
    make_pipeline_apply,
    pipeline_apply,
    place_pipeline_state,
    stack_pipeline_params,
    unstack_pipeline_params,
)

K = jax.random.key(0)


def _prior(b=16, z_dim=8, width=32, n_blocks=8):
    model = DiffusionPriorFiLM(z_dim=z_dim, n_types=4, y_cont_dim=4,
                               width=width, n_blocks=n_blocks)
    z = jax.random.normal(K, (b, z_dim))
    t = jnp.arange(b, dtype=jnp.int32) % 10
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jax.random.normal(jax.random.key(2), (b, 4))
    params = model.init(K, z, t, ycat, ycont)["params"]
    return model, params, (z, t, ycat, ycont)


def test_stack_roundtrip():
    _, params, _ = _prior()
    st = stack_pipeline_params(params, 4)
    assert jax.tree.leaves(st["blocks"])[0].shape[:2] == (4, 2)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 params, unstack_pipeline_params(st))
    with pytest.raises(ValueError):
        stack_pipeline_params(params, 3)  # 8 blocks don't split 3 ways


@pytest.mark.slow
def test_pipeline_forward_matches_model():
    model, params, (z, t, ycat, ycont) = _prior()
    ref = model.apply({"params": params}, z, t, ycat, ycont)
    mesh = make_mesh_pp(2, 4)
    stp = place_pipeline_state(mesh, stack_pipeline_params(params, 4))
    assert not jax.tree.leaves(stp["blocks"])[0].sharding.is_fully_replicated
    for n_micro in (1, 2, 8):
        out = pipeline_apply(mesh, stp, z, t, ycat, ycont, n_micro=n_micro)
        # f32 reassociation only (shard_map fuses differently); values O(1-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pipeline_grads_match_model():
    """Gradients flow back through the ppermute chain: d(loss)/d(params) of
    the pipelined forward == the single-device model's, leaf for leaf."""
    model, params, (z, t, ycat, ycont) = _prior()
    mesh = make_mesh_pp(2, 4)
    stp = place_pipeline_state(mesh, stack_pipeline_params(params, 4))

    g_ref = jax.grad(
        lambda p: jnp.sum(model.apply({"params": p}, z, t, ycat, ycont) ** 2)
    )(params)
    g_pp = unstack_pipeline_params(jax.grad(
        lambda s: jnp.sum(pipeline_apply(mesh, s, z, t, ycat, ycont, n_micro=4) ** 2)
    )(stp))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        g_ref, g_pp)


def test_pipeline_ddim_matches_single_device():
    """The whole compiled DDIM scan with the pipelined forward matches the
    single-device sampler — same keys, same math."""
    model, params, (z, t, ycat, ycont) = _prior()
    sched = DiffusionSchedule.linear(8, 1e-4, 1.0)
    apply1 = lambda p, zt, tt, yc, yv: model.apply({"params": p}, zt, tt, yc, yv)
    z1 = ddim_sample(apply1, params, sched, ycat, ycont, 4, 8, K)

    mesh = make_mesh_pp(2, 4)
    stp = place_pipeline_state(mesh, stack_pipeline_params(params, 4))
    z2 = ddim_sample(make_pipeline_apply(mesh, 2), stp, sched, ycat, ycont, 4, 8, K)
    assert np.isfinite(np.asarray(z2)).all()
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-3, atol=1e-4)


def test_pipeline_train_step_matches_single_device():
    """make_prior_train_step(apply_fn=pipelined): loss and updated params
    match single-device; each stage holds only its blocks' Adam state."""
    import optax

    from toycrystals_tpu.train import create_train_state, make_prior_train_step

    model, params, (z, t, ycat, ycont) = _prior()
    tx = optax.sgd(1e-2)  # linear in grads, see test_sharding.py
    sched = DiffusionSchedule.linear(8, 1e-4, 1.0)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    step1 = make_prior_train_step(model, tx, T=8)
    s1, m1 = step1(s1, sched, z, ycat, ycont, K)

    mesh = make_mesh_pp(2, 4)
    s2 = place_pipeline_state(
        mesh, create_train_state(stack_pipeline_params(
            jax.tree.map(jnp.copy, params), 4), tx))
    assert not jax.tree.leaves(s2.params["blocks"])[0].sharding.is_fully_replicated
    step2 = make_prior_train_step(model, tx, T=8,
                                  apply_fn=make_pipeline_apply(mesh, 4))
    s2, m2 = step2(s2, sched, z, ycat, ycont, K)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    p2 = unstack_pipeline_params(s2.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s1.params, p2)


@pytest.mark.slow
def test_cli_shard_pipe(tmp_path, monkeypatch):
    """--shard 2 --shard-pipe 4 end-to-end on the virtual mesh: trains,
    checkpoints in the flax layout, resumes, and samples — the checkpoint
    stays loadable without any pipeline flags."""
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

    run("train_vae.py", "--procedural", "--n-samples", 32, "--epochs", 1,
        "--batch-size", 16, "--z-dim", 8)
    run("train_diffusion_prior.py", "--procedural", "--max-items", 32,
        "--epochs", 1, "--width", 32, "--z-dim", 8, "--T", 8,
        "--latent-cache", "data/latents.npz", "--ddim-steps", 2,
        "--batch-size", 16, "--shard", 2, "--shard-pipe", 4, "--pipe-micro", 2)
    assert (tmp_path / "checkpoints/diffusion_prior_last.msgpack").exists()
    assert (tmp_path / "results/diffusion_samples.png").exists()
    # the checkpoint is layout-agnostic: sample-only without pipeline flags
    run("train_diffusion_prior.py", "--procedural", "--max-items", 32,
        "--width", 32, "--z-dim", 8, "--T", 8,
        "--latent-cache", "data/latents.npz", "--ddim-steps", 2,
        "--sample-only")
