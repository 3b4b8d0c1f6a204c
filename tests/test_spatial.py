"""Spatial (height) sharding tests on the 8-device virtual CPU mesh.

Validates the GSPMD spatial-partitioning story from parallel/spatial.py: NHWC
activations sharded over a 2-D ('data','space') mesh run the SAME numerics as
single-device — XLA inserts the conv halo exchange / GN-stat reductions /
sequence-parallel attention, and semantics are preserved."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models import (
    CondUNetTiny,
    VPSDE,
    sample_dpmpp_2m,
    sample_probability_flow_ode,
    sample_reverse_sde_euler_maruyama,
)
from toycrystals_tpu.parallel import (
    check_spatial_divisibility,
    data_sharding,
    image_sharding,
    make_mesh_2d,
    replicate,
)

K = jax.random.key(0)


def _tiny(b=8, hw=16):
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, jnp.zeros((b, hw, hw, 1)), jnp.zeros((b,)), ycat, ycont)["params"]
    af = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    return af, params, ycat, ycont


def test_mesh_2d_axes():
    mesh = make_mesh_2d(2, 4)
    assert mesh.axis_names == ("data", "space")
    assert dict(mesh.shape) == {"data": 2, "space": 4}
    assert image_sharding(mesh).spec == jax.sharding.PartitionSpec("data", "space", None, None)


def test_spatial_divisibility_guard():
    check_spatial_divisibility(64, 8)  # 16 rows at H/4 over 8 -> ok
    with pytest.raises(ValueError):
        check_spatial_divisibility(16, 8)  # H/4 = 4 rows over 8 -> reject


@pytest.mark.parametrize("sampler_fn", [
    sample_reverse_sde_euler_maruyama,
    sample_probability_flow_ode,
    sample_dpmpp_2m,
])
def test_spatially_sharded_sampler_matches_single_device(sampler_fn):
    """The whole compiled sampling scan under batch+height sharding matches
    the single-device result: same keys, same math, GSPMD only changes the
    partitioning (halo exchanges for the circular convs, psum for GN stats,
    gathered-KV attention at the mid block)."""
    af, params, ycat, ycont = _tiny()
    sde = VPSDE(0.1, 30.0)
    shape = (8, 16, 16, 1)

    x1 = sampler_fn(af, params, sde, ycat, ycont, shape, K,
                    n_steps=3, guidance_scale=1.5)

    mesh = make_mesh_2d(2, 4)  # H=16 -> 4 rows/shard; H/4=4 -> 1 row/shard
    pr = replicate(mesh, params)
    ycat_s = jax.device_put(ycat, data_sharding(mesh, 1))
    ycont_s = jax.device_put(ycont, data_sharding(mesh, 2))
    x2 = sampler_fn(af, pr, sde, ycat_s, ycont_s, shape, K,
                    n_steps=3, guidance_scale=1.5,
                    sharding=image_sharding(mesh))

    assert np.isfinite(np.asarray(x2)).all()
    # tolerance: partitioned GN statistics reduce in a different order and a
    # few steps of the sampler recursion amplify it — measured max |delta|
    # ~6e-4 on single elements over 3 steps on the CPU mesh ([0,1] images, so
    # atol 1e-3 is 0.1% of dynamic range)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-2, atol=1e-3)


def test_spatial_only_mesh():
    """Pure spatial sharding (data axis = 1): one image split over 4 devices
    by height — the hi-res single-image case the feature exists for."""
    af, params, ycat, ycont = _tiny(b=2)
    sde = VPSDE(0.1, 30.0)
    mesh = make_mesh_2d(1, 4)
    out = sample_reverse_sde_euler_maruyama(
        af, replicate(mesh, params), sde,
        jax.device_put(ycat, data_sharding(mesh, 1)),
        jax.device_put(ycont, data_sharding(mesh, 2)),
        (2, 16, 16, 1), K, n_steps=2, guidance_scale=1.5,
        sharding=image_sharding(mesh),
    )
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_spatially_sharded_train_step_matches_single_device():
    """make_sde_train_step under a 2-D (data,space) mesh: images enter
    batch+height sharded (data_sharding is spatial-aware for 4-D leaves) and
    the step's numerics match single-device — the grad all-reduce now spans
    both mesh axes."""
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

    mesh = make_mesh_2d(2, 4)
    from toycrystals_tpu.parallel import shard_batch

    s2 = replicate(mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    xb, cb, vb = shard_batch(mesh, (x, ycat, ycont))
    assert xb.sharding.spec[:2] == ("data", "space")
    s2, loss2 = step(s2, xb, cb, vb, K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)


def test_spatially_sharded_fused_epoch():
    """The whole-epoch program (shuffle + on-device datagen + steps) runs
    under the 2-D mesh with finite loss — constrain_batch pins each rendered
    batch to (data, space) inside the compiled scan."""
    import optax

    from toycrystals_tpu.data import LatticeConfig
    from toycrystals_tpu.train import create_train_state, make_sde_train_epoch

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    cfg = LatticeConfig(img_size=16, rot_only=True)
    x0 = jnp.zeros((2, 16, 16, 1))
    params = model.init(K, x0, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 4)))["params"]
    tx = optax.sgd(1e-2)
    mesh = make_mesh_2d(2, 4)
    epoch = make_sde_train_epoch(
        model, tx, VPSDE(0.1, 30.0), n_types=4, p_uncond=0.0, t_power=1.0,
        ema_decay=0.0, batch_size=16, n_items=32, lattice_cfg=cfg,
        dataset_seed=0, mesh=mesh,
    )
    state = replicate(mesh, create_train_state(params, tx))
    state, loss = epoch(state, K)
    assert np.isfinite(float(loss))


def test_cli_shard_space(tmp_path, monkeypatch):
    """--shard 2 --shard-space 4 end-to-end on the virtual mesh (runpy
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
        "--shard", 2, "--shard-space", 4, "--out-dir", "runs/sp")
    run("sample_sde_score_model.py", "--out-dir", "runs/sp", "--ckpt", "last",
        "--steps", 2, "--cfg", "1.5", "--sampler", "sde", "--n", 8,
        "--shard", 2, "--shard-space", 4)
    assert list((tmp_path / "runs/sp/results").glob("samples_ckpt-*"))
