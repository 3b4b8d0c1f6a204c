"""Multi-device sharding tests on the 8-device virtual CPU mesh (conftest).

Validates the GSPMD data-parallel story from SURVEY.md §5: batch sharded over
'data', params replicated, gradients all-reduced by XLA — same numerics as
single-device."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from toycrystals_tpu.data import LatticeConfig, generate_batch
from toycrystals_tpu.models import CondUNetTiny, VPSDE, sample_reverse_sde_euler_maruyama
from toycrystals_tpu.parallel import data_sharding, make_mesh, replicate, shard_batch
from toycrystals_tpu.train import create_train_state, make_sde_train_step

K = jax.random.key(0)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_train_step_matches_single_device():
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    b, hw = 16, 16
    x = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, x, jnp.zeros((b,)), ycat, ycont)["params"]
    # SGD so the parameter delta is linear in the gradient: Adam's first-step
    # normalisation g/(|g|+eps) amplifies fp reduction-order noise on near-zero
    # gradients into O(lr) differences, which is not a sharding bug.
    tx = optax.sgd(1e-2)
    sde = VPSDE(0.1, 30.0)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.0, t_power=1.0, ema_decay=0.0)

    # The train step donates its state, and device_put may alias the source
    # buffer for the shard living on the source device — so the two states
    # must NOT share leaves with each other or with `params`.
    mesh = make_mesh()
    s2 = replicate(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))

    # single device
    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = step(s1, x, ycat, ycont, K)

    # 8-way data parallel
    xb, cb, vb = shard_batch(mesh, (x, ycat, ycont))
    assert xb.sharding.spec[0] == "data"
    s2, loss2 = step(s2, xb, cb, vb, K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)


def test_sharded_sampling_batch():
    """shard_map-style sharded sampling: batch split over chips, result gathers."""
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    b, hw = 16, 16
    x = jnp.zeros((b, hw, hw, 1))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, x, jnp.zeros((b,)), ycat, ycont)["params"]
    apply_fn = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    sde = VPSDE(0.1, 30.0)

    mesh = make_mesh()
    pr = replicate(mesh, params)
    ycat_s = jax.device_put(ycat, data_sharding(mesh, 1))
    ycont_s = jax.device_put(ycont, data_sharding(mesh, 2))
    out = sample_reverse_sde_euler_maruyama(
        apply_fn, pr, sde, ycat_s, ycont_s, (b, hw, hw, 1), K, n_steps=3, guidance_scale=1.5
    )
    assert out.shape == (b, hw, hw, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_epoch_sharded_matches_unsharded():
    """make_sde_train_epoch(mesh=...) — the whole-epoch program (on-device
    shuffle + datagen + every step) distributes over the mesh with numerics
    identical to single-device (GSPMD is semantics-preserving)."""
    from toycrystals_tpu.train import make_sde_train_epoch

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    cfg = LatticeConfig(img_size=16, rot_only=True)
    x0, ycat, ycont = generate_batch(cfg, seed=0, idx=jnp.arange(2))
    params = model.init(K, x0, jnp.zeros((2,)), ycat, ycont)["params"]
    tx = optax.sgd(1e-2)  # linear in grads; see note in the step test above
    sde = VPSDE(0.1, 30.0)
    common = dict(n_types=4, p_uncond=0.0, t_power=1.0, ema_decay=0.0,
                  batch_size=16, n_items=32, lattice_cfg=cfg, dataset_seed=0)

    e1 = make_sde_train_epoch(model, tx, sde, **common)
    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = e1(s1, K)

    mesh = make_mesh()
    e2 = make_sde_train_epoch(model, tx, sde, **common, mesh=mesh)
    s2 = replicate(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    s2, loss2 = e2(s2, K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)


def test_fused_epoch_resident_sharded_matches_unsharded():
    """Same parity contract for the resident-archive branch of _batch_source:
    u8 arrays replicated over the mesh, per-step gather + decode sharded."""
    from toycrystals_tpu.train import make_sde_train_epoch

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    kx, kc = jax.random.split(K)
    x_u8 = jax.random.randint(kx, (32, 16, 16, 1), 0, 256, dtype=jnp.uint8)
    ycat = jnp.arange(32, dtype=jnp.int32) % 4
    ycont = jax.random.uniform(kc, (32, 4))
    x0 = x_u8[:2].astype(jnp.float32) / 255.0
    params = model.init(K, x0, jnp.zeros((2,)), ycat[:2], ycont[:2])["params"]
    tx = optax.sgd(1e-2)
    sde = VPSDE(0.1, 30.0)
    common = dict(n_types=4, p_uncond=0.0, t_power=1.0, ema_decay=0.0,
                  batch_size=16, n_items=32)

    e1 = make_sde_train_epoch(model, tx, sde, **common,
                              resident=(x_u8, ycat, ycont))
    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = e1(s1, K)

    mesh = make_mesh()
    e2 = make_sde_train_epoch(model, tx, sde, **common,
                              resident=replicate(mesh, (x_u8, ycat, ycont)),
                              mesh=mesh)
    s2 = replicate(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    s2, loss2 = e2(s2, K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


@pytest.mark.slow
def test_cli_shard_flag(tmp_path, monkeypatch):
    """--shard 4 on the SDE trainer + sampler runs end-to-end on the virtual
    mesh (runpy in-process: subprocesses can't force a multi-device CPU
    backend because the platform plugin eats XLA_FLAGS)."""
    import runpy
    import sys
    from pathlib import Path

    monkeypatch.chdir(tmp_path)
    scripts = str(Path(__file__).resolve().parent.parent / "scripts")
    monkeypatch.syspath_prepend(scripts)  # scripts import `_common` as a sibling

    def run(script, *flags):
        monkeypatch.setattr(
            sys, "argv", [script, "--device", "cpu", *map(str, flags)]
        )
        try:
            runpy.run_path(f"{scripts}/{script}", run_name="__main__")
        except SystemExit as e:
            assert (e.code or 0) == 0, f"{script} exited {e.code}"

    run("train_sde_score_model.py", "--procedural", "--n-samples", 32,
        "--img-size", 16, "--epochs", 1, "--batch-size", 16, "--base-ch", 8,
        "--emb-dim", 16, "--sample-steps", 2, "--sample-every", 99,
        "--shard", 4, "--out-dir", "runs/s")
    assert (tmp_path / "runs/s/checkpoints/sde_score_model_last.msgpack").exists()
    run("sample_sde_score_model.py", "--out-dir", "runs/s", "--ckpt", "last",
        "--steps", 2, "--cfg", "1.5", "--sampler", "sde", "--n", 8, "--shard", 4)
    assert list((tmp_path / "runs/s/results").glob("samples_ckpt-*"))

    # VAE trainer sharded (the conv VAE is architecturally 64x64), then the
    # prior trainer sharded on top of its checkpoint — covers the latent-cache
    # replication + mesh-constrained prior epoch.
    run("train_vae.py", "--procedural", "--n-samples", 32, "--epochs", 1,
        "--batch-size", 16, "--z-dim", 8, "--shard", 4)
    assert (tmp_path / "checkpoints/vae_last.msgpack").exists()
    run("train_diffusion_prior.py", "--procedural", "--max-items", 32,
        "--epochs", 1, "--width", 32, "--z-dim", 8, "--T", 8,
        "--latent-cache", "data/latents.npz", "--ddim-steps", 2,
        "--batch-size", 16, "--shard", 4)
    assert (tmp_path / "checkpoints/diffusion_prior_last.msgpack").exists()


def test_sample_chunked_pads_canonical_grid_over_mesh():
    """The reference's canonical n=36 grid shards over 8 devices: the chunk
    rounds up to a mesh multiple (36 -> 40), the pad rows are trimmed after
    the gather (VERDICT r1 weak #4)."""
    from toycrystals_tpu.models import sample_chunked
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    n, hw = 36, 16
    y_cat, y_cont = sample_grid_conditions(n, 4, 4)
    params = model.init(K, jnp.zeros((2, hw, hw, 1)), jnp.zeros((2,)),
                        y_cat[:2], y_cont[:2])["params"]
    af = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    x = sample_chunked(
        sample_reverse_sde_euler_maruyama, af, params, VPSDE(0.1, 30.0),
        y_cat, y_cont, (n, hw, hw, 1), K, chunk=n, mesh=make_mesh(),
        n_steps=2, guidance_scale=1.5,
    )
    assert x.shape == (n, hw, hw, 1)
    assert np.isfinite(x).all()


@pytest.mark.slow
def test_graft_dryrun_self_provisions():
    """__graft_entry__.dryrun_multichip provisions its own virtual CPU mesh in
    a fresh process with no XLA_FLAGS — the exact driver invocation that
    failed in round 1 (MULTICHIP_r01.json rc=1: 'asked for 8 devices, have
    1'). n=2 keeps the stretch-batch sampling leg (512*n images) quick."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    # 1200 s: the dryrun now ends in a real 2-process jax.distributed leg
    # (two more jax imports + a cluster barrier) — ~6 min alone on this
    # 1-vCPU box, and up to 2x that when the rest of the slow tier has the
    # core saturated (observed: 600 s trips under full-suite load)
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        cwd=root, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]


def test_sharded_datagen():
    """On-device procedural generation shards over the batch axis."""
    cfg = LatticeConfig(rot_only=True)
    mesh = make_mesh()
    idx = jax.device_put(jnp.arange(16), data_sharding(mesh, 1))
    x, y_cat, y_cont = generate_batch(cfg, seed=0, idx=idx)
    assert x.shape == (16, 64, 64, 1)
    # must equal unsharded generation
    x2, _, _ = generate_batch(cfg, seed=0, idx=jnp.arange(16))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-6)
