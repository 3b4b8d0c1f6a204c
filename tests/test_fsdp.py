"""FSDP (ZeRO-3 placement) tests on the 8-device virtual CPU mesh.

Validates parallel/fsdp.py: params + Adam moments + EMA sharded 1/N over the
'data' axis run the SAME numerics as single-device — XLA inserts the
just-in-time weight all-gathers and gradient reduce-scatters, placement never
changes semantics. Covers the largest-divisible-dim rule, the tp composition
(2-D weight sharding on a ('data','model') mesh), the train step, and the
trainer CLIs end-to-end.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from toycrystals_tpu.models import CondUNetTiny, VPSDE
from toycrystals_tpu.parallel import (
    data_sharding,
    fsdp_coverage,
    fsdp_sharding,
    make_mesh,
    make_mesh_tp,
    shard_params_fsdp,
)

K = jax.random.key(0)


def _tiny(b=8, hw=16):
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, jnp.zeros((b, hw, hw, 1)), jnp.zeros((b,)), ycat, ycont)["params"]
    af = lambda p, xt, t, yc, yv: model.apply({"params": p}, xt, t, yc, yv)
    return model, af, params, ycat, ycont


def test_fsdp_sharding_rule():
    mesh = make_mesh(8)
    P = jax.sharding.PartitionSpec
    # conv kernel HWIO -> the largest divisible dim (output channels; tie
    # between I=16,O=16 resolved to the later dim)
    assert fsdp_sharding(mesh, (3, 3, 16, 16)).spec == P(None, None, None, "data")
    # dense kernel -> largest dim wins
    assert fsdp_sharding(mesh, (16, 64)).spec == P(None, "data")
    assert fsdp_sharding(mesh, (64, 16)).spec == P("data", None)
    # bias
    assert fsdp_sharding(mesh, (16,)).spec == P("data")
    # nothing divisible -> replicate, not fatal
    assert fsdp_sharding(mesh, (3, 3, 6, 1)).is_fully_replicated
    assert fsdp_sharding(mesh, ()).is_fully_replicated


def test_fsdp_composes_with_tp():
    """On a ('data','model') mesh the trailing dim belongs to 'model'
    (tensor parallelism) and fsdp shards the largest REMAINING dim."""
    mesh = make_mesh_tp(2, 4)
    P = jax.sharding.PartitionSpec
    assert fsdp_sharding(mesh, (3, 3, 16, 32)).spec == P(None, None, "data", "model")
    assert fsdp_sharding(mesh, (16, 32)).spec == P("data", "model")
    # trailing dim indivisible by 'model' -> it is free for 'data' again
    assert fsdp_sharding(mesh, (16, 6)).spec == P("data", None)


def test_fsdp_coverage():
    _, _, params, _, _ = _tiny()
    mesh = make_mesh(8)
    cov = fsdp_coverage(mesh, params)
    assert cov > 0.9  # nearly every element lives 1/8 per chip


def test_fsdp_state_is_sharded_and_memory_scales():
    """Every shardable leaf of params AND Adam moments really lives 1/N per
    device — the ZeRO memory win, checked via addressable shard sizes."""
    import optax

    from toycrystals_tpu.train import create_train_state

    _, _, params, _, _ = _tiny()
    mesh = make_mesh(8)
    state = shard_params_fsdp(mesh, create_train_state(params, optax.adam(1e-3), ema=True))
    k = state.params["down1"]["conv0"]["kernel"]
    assert not k.sharding.is_fully_replicated
    # the local shard is 1/8 of the logical leaf
    local = k.addressable_shards[0].data.size
    assert local == k.size // 8
    # Adam moments mirror the layout
    mu = jax.tree.leaves(state.opt_state)[0]
    assert any(not leaf.sharding.is_fully_replicated
               for leaf in jax.tree.leaves(state.opt_state)
               if getattr(leaf, "ndim", 0) > 0)
    del mu


def test_fsdp_train_step_matches_single_device():
    """make_sde_train_step with ZeRO-3-placed state: loss and updated params
    match single-device — the all-gather/reduce-scatter schedule XLA infers
    is numerics-preserving (linear optimizer, see test_sharding.py)."""
    import optax

    from toycrystals_tpu.train import create_train_state, make_sde_train_step

    model, _, params, _, _ = _tiny()
    b, hw = 16, 16
    x = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    tx = optax.sgd(1e-2)
    sde = VPSDE(0.1, 30.0)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.0, t_power=1.0,
                               ema_decay=0.0)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = step(s1, x, ycat, ycont, K)

    mesh = make_mesh(8)
    s2 = shard_params_fsdp(
        mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    s2, loss2 = step(s2,
                     jax.device_put(x, data_sharding(mesh, 4)),
                     jax.device_put(ycat, data_sharding(mesh, 1)),
                     jax.device_put(ycont, data_sharding(mesh, 2)), K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)
    # the updated state kept its ZeRO layout (donation preserves shardings)
    assert not s2.params["down1"]["conv0"]["kernel"].sharding.is_fully_replicated


def test_fsdp_tp_train_step_matches_single_device():
    """ZeRO on top of tensor parallelism: 2-D weight sharding on a
    ('data','model') mesh still matches single-device numerics."""
    import optax

    from toycrystals_tpu.train import create_train_state, make_sde_train_step

    model, _, params, _, _ = _tiny()
    b, hw = 16, 16
    x = jax.random.uniform(jax.random.key(1), (b, hw, hw, 1))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    tx = optax.sgd(1e-2)
    sde = VPSDE(0.1, 30.0)
    step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.0, t_power=1.0,
                               ema_decay=0.0)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, loss1 = step(s1, x, ycat, ycont, K)

    mesh = make_mesh_tp(2, 4)
    s2 = shard_params_fsdp(
        mesh, create_train_state(jax.tree.map(jnp.copy, params), tx))
    # some kernel is sharded on BOTH axes: e.g. in-ch over 'data', out-ch
    # over 'model' (the stem conv's 17 input channels correctly stay
    # replicated over 'data' — indivisible dims are skipped per leaf)
    assert any(
        "data" in tuple(leaf.sharding.spec) and "model" in tuple(leaf.sharding.spec)
        for leaf in jax.tree.leaves(s2.params) if leaf.ndim >= 2
    )
    s2, loss2 = step(s2,
                     jax.device_put(x, data_sharding(mesh, 4)),
                     jax.device_put(ycat, data_sharding(mesh, 1)),
                     jax.device_put(ycont, data_sharding(mesh, 2)), K)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_cli_fsdp(tmp_path, monkeypatch):
    """--shard 8 --fsdp end-to-end on the virtual mesh: the SDE and VAE
    trainers run, checkpoint, and the saved checkpoint is layout-free
    (loadable single-device)."""
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
        "--shard", 8, "--fsdp", "--out-dir", "runs/fsdp")
    run("sample_sde_score_model.py", "--out-dir", "runs/fsdp", "--ckpt", "last",
        "--steps", 2, "--cfg", "1.5", "--sampler", "sde", "--n", 8)
    assert list((tmp_path / "runs/fsdp/results").glob("samples_ckpt-*"))

    run("train_vae.py", "--procedural", "--n-samples", 32, "--epochs", 1,
        "--batch-size", 16, "--z-dim", 8, "--shard", 8, "--fsdp")
    assert (tmp_path / "checkpoints/vae_last.msgpack").exists()
