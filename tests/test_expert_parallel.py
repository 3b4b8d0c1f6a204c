"""MoE prior + expert parallelism tests on the 8-device virtual CPU mesh.

Validates models/moe_prior.py (switch-routed expert MLPs, load-balancing aux
sown into 'losses') and parallel/expert.py (stacked experts sharded over an
'expert' mesh axis; GSPMD turns the combine contraction into one psum):
sharded numerics match single-device through the train step and the compiled
DDIM scan, and the trainer CLI runs end-to-end.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from toycrystals_tpu.models import DiffusionPriorMoE
from toycrystals_tpu.models.diffusion_prior import DiffusionSchedule, ddim_sample
from toycrystals_tpu.parallel import (
    data_sharding,
    ep_coverage,
    expert_sharding,
    make_mesh_ep,
    place_expert_state,
)
from toycrystals_tpu.train import create_train_state, make_prior_train_step

K = jax.random.key(0)
E = 4


def _tiny(b=16):
    model = DiffusionPriorMoE(z_dim=8, n_types=4, y_cont_dim=4, width=32,
                              n_blocks=2, n_experts=E)
    z = jax.random.normal(K, (b, 8))
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.zeros((b, 4))
    params = model.init(K, z, jnp.zeros((b,), jnp.int32), ycat, ycont)["params"]
    return model, params, z, ycat, ycont


def test_mesh_ep_axes():
    mesh = make_mesh_ep(2, 4)
    assert mesh.axis_names == ("data", "expert")
    assert dict(mesh.shape) == {"data": 2, "expert": 4}


def test_expert_sharding_rule():
    mesh = make_mesh_ep(2, 4)
    P = jax.sharding.PartitionSpec
    # expert stacks -> leading dim over 'expert'
    assert expert_sharding(mesh, (E, 32, 128), E).spec == P("expert", None, None)
    assert expert_sharding(mesh, (E, 128), E).spec == P("expert", None)
    # non-expert leaves (stem dense, router, scalars) replicate
    assert expert_sharding(mesh, (32, 64), E).is_fully_replicated
    assert expert_sharding(mesh, (), E).is_fully_replicated
    # an expert count the axis doesn't divide -> replicate, not fatal
    assert expert_sharding(mesh, (6, 32, 128), 6).is_fully_replicated


def test_moe_forward_and_aux():
    """The MoE forward is finite, per-condition deterministic, and sows one
    load-balancing aux term per block (a no-op without mutable='losses')."""
    model, params, z, ycat, ycont = _tiny()
    t = jnp.zeros((16,), jnp.int32)
    out = jax.jit(lambda p, *a: model.apply({"params": p}, *a))(params, z, t, ycat, ycont)
    assert out.shape == (16, 8) and bool(jnp.isfinite(out).all())
    out2, mut = model.apply({"params": params}, z, t, ycat, ycont,
                            mutable=["losses"])
    # jitted vs eager-mutable apply differ only by fusion reordering
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-5, atol=1e-6)
    terms = jax.tree.leaves(mut["losses"])
    assert len(terms) == 2  # one per block
    # Switch aux is >= 1 and = 1 only at perfectly uniform routing
    assert all(float(jnp.mean(v)) >= 1.0 - 1e-6 for v in terms)


def test_ep_coverage():
    _, params, _, _, _ = _tiny()
    mesh = make_mesh_ep(2, 4)
    # the expert stacks dominate the param count at mult=4
    assert ep_coverage(mesh, params, E) > 0.7


def test_ep_train_step_matches_single_device():
    """Expert-parallel train step (with the aux loss on): loss and updated
    params match single-device — the psum combine and reduce-scattered
    expert grads preserve numerics (linear optimizer, see test_sharding.py)."""
    model, params, z, ycat, ycont = _tiny()
    tx = optax.sgd(1e-2)
    sched = DiffusionSchedule.linear(8, 1e-4, 1.0)
    step = make_prior_train_step(model, tx, T=8, aux_weight=0.01)

    s1 = create_train_state(jax.tree.map(jnp.copy, params), tx)
    s1, m1 = step(s1, sched, z, ycat, ycont, K)

    mesh = make_mesh_ep(2, 4)
    s2 = place_expert_state(
        mesh, create_train_state(jax.tree.map(jnp.copy, params), tx), E)
    # the experts (and, leaf-for-leaf, their Adam moments) really live 1/4
    w1 = s2.params["block_0"]["w1"]
    assert not w1.sharding.is_fully_replicated
    assert w1.addressable_shards[0].data.shape[0] == E // 4
    s2, m2 = step(s2, sched,
                  jax.device_put(z, data_sharding(mesh, 2)),
                  jax.device_put(ycat, data_sharding(mesh, 1)),
                  jax.device_put(ycont, data_sharding(mesh, 2)), K)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["aux"]), float(m2["aux"]), rtol=1e-5)
    for l1, l2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-4, atol=1e-6)


def test_ep_ddim_matches_single_device():
    """The compiled DDIM scan with expert-parallel weights matches
    single-device sampling."""
    model, params, z, ycat, ycont = _tiny()
    sched = DiffusionSchedule.linear(8, 1e-4, 1.0)
    af = lambda p, z_, t_, a, b: model.apply({"params": p}, z_, t_, a, b)

    z1 = ddim_sample(af, params, sched, ycat, ycont, 4, 8, K)

    mesh = make_mesh_ep(2, 4)
    z2 = ddim_sample(af, place_expert_state(mesh, params, E), sched,
                     jax.device_put(ycat, data_sharding(mesh, 1)),
                     jax.device_put(ycont, data_sharding(mesh, 2)), 4, 8, K)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_cli_moe_expert_parallel(tmp_path, monkeypatch):
    """--moe-experts 4 --shard 2 --shard-expert 4 end-to-end: trains,
    checkpoints (config records n_experts), resumes sample-only."""
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
        "--batch-size", 16, "--moe-experts", 4, "--shard", 2,
        "--shard-expert", 4)
    assert (tmp_path / "checkpoints/diffusion_prior_last.msgpack").exists()
    assert (tmp_path / "results/diffusion_samples.png").exists()
    from toycrystals_tpu.utils import load_checkpoint

    cfg = load_checkpoint(str(tmp_path / "checkpoints/diffusion_prior_last.msgpack"))["config"]
    assert int(cfg["n_experts"]) == 4
    # the checkpoint reloads without any sharding flags (single-device)
    run("train_diffusion_prior.py", "--procedural", "--max-items", 32,
        "--width", 32, "--z-dim", 8, "--T", 8, "--moe-experts", 4,
        "--latent-cache", "data/latents.npz", "--ddim-steps", 2,
        "--sample-only")


def test_route_stats_cli(tmp_path, monkeypatch):
    """moe_route_stats.py reports per-block routing fractions from a trained
    MoE checkpoint (the utilisation evidence for the dense-vs-MoE ablation in
    benchmarks/NOTES.md); fractions must sum to 1 per block and entropy is
    normalised to [0, 1]."""
    import json
    import runpy
    import sys
    from pathlib import Path

    import jax.numpy as jnp

    from toycrystals_tpu.models import DiffusionPriorMoE
    from toycrystals_tpu.utils import save_checkpoint

    prior = DiffusionPriorMoE(z_dim=8, n_types=4, y_cont_dim=4, n_experts=4,
                              t_emb_dim=16, width=32, n_blocks=2)
    params = prior.init(jax.random.key(0), jnp.zeros((2, 8)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2, 4)))["params"]
    ckpt = tmp_path / "moe.msgpack"
    save_checkpoint(ckpt, {"params": params, "config": {
        "z_dim": 8, "n_types": 4, "y_cont_dim": 4, "t_emb_dim": 16,
        "width": 32, "n_blocks": 2, "y_cat_emb_dim": 64, "T": 50,
        "beta_start": 1e-4, "beta_end": 0.05, "n_experts": 4}})

    scripts = str(Path(__file__).resolve().parent.parent / "scripts")
    out = tmp_path / "routes.json"
    monkeypatch.setattr(sys, "argv", [
        "moe_route_stats.py", "--ckpt", str(ckpt), "--device", "cpu",
        "--t-points", "8", "--json-out", str(out)])
    try:
        runpy.run_path(f"{scripts}/moe_route_stats.py", run_name="__main__")
    except SystemExit as e:
        assert (e.code or 0) == 0
    r = json.loads(out.read_text())
    assert r["n_experts"] == 4 and len(r["blocks"]) == 2
    for b in r["blocks"].values():
        assert abs(sum(b["fractions"]) - 1.0) < 1e-3
        assert 0.0 <= b["entropy_norm"] <= 1.0
        assert max(b["fractions"]) == b["max_share"]
