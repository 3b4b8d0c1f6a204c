"""Sharded (Orbax) checkpoint tests — the `--ckpt-format orbax` path.

Validates utils/orbax_io.py on the 8-device virtual CPU mesh: per-shard
save of a GSPMD-placed train state, RESHARDING restore (save on one layout,
restore onto another — FSDP -> single device and back), the target-free
payload read the sampler/serving CLIs use, the meta-only pre-build peek,
and step retention. The msgpack format's tests live in test_checkpoint.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from toycrystals_tpu.models import CondUNetTiny
from toycrystals_tpu.parallel import make_mesh, shard_params_fsdp
from toycrystals_tpu.train import create_train_state
from toycrystals_tpu.utils import (
    ShardedCheckpointManager,
    is_orbax_checkpoint,
    load_orbax_meta,
    load_orbax_payload,
)

K = jax.random.key(0)
META = {"epoch_next": 3, "loss_hist": [1.0, 0.5], "config": {"base_ch": 8}}


def _state(seed=0):
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jnp.zeros((2, 16, 16, 1))
    params = model.init(jax.random.key(seed), x, jnp.zeros((2,)),
                        jnp.array([0, 1]), jnp.zeros((2, 4)))["params"]
    return create_train_state(params, optax.adam(1e-4), ema=True)


def _assert_states_equal(a, b):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b), strict=True):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_roundtrip_restore_onto(tmp_path):
    state = _state(seed=1)
    p = tmp_path / "ckpt.orbax"
    with ShardedCheckpointManager(p) as mgr:
        mgr.save(3, state, META)
    assert is_orbax_checkpoint(p)

    with ShardedCheckpointManager(p) as mgr:
        restored, meta = mgr.restore_onto(_state(seed=2))
    _assert_states_equal(state, restored)
    assert meta["epoch_next"] == 3
    assert meta["config"]["base_ch"] == 8


def test_reshard_fsdp_to_single_device(tmp_path):
    """Save a ZeRO-3-placed state; restore onto an UNSHARDED template.

    This is the layout-independence contract: the saving run's mesh is
    irrelevant, the restore target's shardings decide placement."""
    mesh = make_mesh(8)
    state = _state(seed=1)
    sharded = state.replace(
        params=shard_params_fsdp(mesh, state.params),
        ema_params=shard_params_fsdp(mesh, state.ema_params),
    )
    p = tmp_path / "ckpt.orbax"
    with ShardedCheckpointManager(p) as mgr:
        mgr.save(1, sharded, META)

    with ShardedCheckpointManager(p) as mgr:
        restored, _ = mgr.restore_onto(_state(seed=2))
    _assert_states_equal(state, restored)
    leaf = jax.tree.leaves(restored.params)[0]
    assert leaf.sharding.is_fully_replicated or len(leaf.sharding.device_set) == 1


def test_reshard_single_device_to_fsdp(tmp_path):
    """The reverse direction: unsharded save restores STRAIGHT INTO an
    FSDP-placed template (each device reads only its shard)."""
    state = _state(seed=1)
    p = tmp_path / "ckpt.orbax"
    with ShardedCheckpointManager(p) as mgr:
        mgr.save(1, state, META)

    mesh = make_mesh(8)
    template = _state(seed=2)
    template = template.replace(
        params=shard_params_fsdp(mesh, template.params),
        ema_params=shard_params_fsdp(mesh, template.ema_params),
    )
    with ShardedCheckpointManager(p) as mgr:
        restored, _ = mgr.restore_onto(template)
    _assert_states_equal(state, restored)
    # placement followed the template, not the (single-device) save
    shardings = {str(l.sharding.spec) for l in jax.tree.leaves(restored.params)
                 if hasattr(l.sharding, "spec")}
    assert any("data" in s for s in shardings)


def test_load_payload_targetless(tmp_path):
    """Sampler/serving read: no template, leaves land on the default device,
    payload shaped exactly like load_checkpoint(msgpack)."""
    state = _state(seed=1)
    p = tmp_path / "ckpt.orbax"
    with ShardedCheckpointManager(p) as mgr:
        mgr.save(2, state, META)

    payload = load_orbax_payload(p)
    assert payload["epoch_next"] == 3
    assert payload["config"] == {"base_ch": 8}
    import flax.serialization as ser

    _assert_states_equal(ser.to_state_dict(state), payload["state"])


def test_load_meta_only(tmp_path):
    p = tmp_path / "ckpt.orbax"
    with ShardedCheckpointManager(p) as mgr:
        mgr.save(5, _state(), META)
    meta = load_orbax_meta(p)
    assert meta == {"epoch_next": 3, "loss_hist": [1.0, 0.5],
                    "config": {"base_ch": 8}}


def test_retention_max_to_keep(tmp_path):
    """Step-managed GC: only the newest max_to_keep epochs survive, and
    restore_onto with no step argument picks the latest."""
    p = tmp_path / "ckpt.orbax"
    with ShardedCheckpointManager(p, max_to_keep=2) as mgr:
        for step in (1, 2, 3):
            mgr.save(step, {"w": jnp.full((4,), float(step))},
                     {"epoch_next": step})
        mgr.wait()
        assert mgr.latest_step() == 3

    with ShardedCheckpointManager(p, max_to_keep=2) as mgr:
        restored, meta = mgr.restore_onto({"w": jnp.zeros((4,))})
        np.testing.assert_array_equal(np.asarray(restored["w"]),
                                      np.full((4,), 3.0))
        assert meta["epoch_next"] == 3
        # step 1 was garbage-collected
        with pytest.raises(Exception):
            mgr.restore_onto({"w": jnp.zeros((4,))}, step=1)


def test_empty_dir_raises(tmp_path):
    p = tmp_path / "empty.orbax"
    p.mkdir()
    assert not is_orbax_checkpoint(p)
    with ShardedCheckpointManager(p) as mgr:
        with pytest.raises(FileNotFoundError):
            mgr.restore_onto({"w": jnp.zeros((2,))})
    with pytest.raises(FileNotFoundError):
        load_orbax_payload(p)


def test_is_orbax_checkpoint_negatives(tmp_path):
    f = tmp_path / "ckpt.msgpack"
    f.write_bytes(b"not a dir")
    assert not is_orbax_checkpoint(f)
    assert not is_orbax_checkpoint(tmp_path / "missing")


def test_load_score_payload_dispatch(tmp_path):
    """The universal loader picks the right backend per path kind and gives
    a clear error for a directory that is not an orbax checkpoint."""
    from toycrystals_tpu.utils import load_score_payload, save_checkpoint

    # msgpack file
    mp = tmp_path / "ckpt.msgpack"
    save_checkpoint(mp, {"state": {"w": jnp.ones((2,))}, "config": {"a": 1}})
    assert load_score_payload(mp)["config"]["a"] == 1

    # orbax directory
    ob = tmp_path / "ckpt.orbax"
    with ShardedCheckpointManager(ob) as mgr:
        mgr.save(1, {"w": jnp.ones((2,))}, {"config": {"a": 2}})
    assert load_score_payload(ob)["config"]["a"] == 2

    # a directory that is NOT a checkpoint
    junk = tmp_path / "junk"
    junk.mkdir()
    with pytest.raises(FileNotFoundError, match="not a step-managed"):
        load_score_payload(junk)
