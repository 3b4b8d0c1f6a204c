"""Checkpoint round-trip tests (msgpack single-file format)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from toycrystals_tpu.models import CondUNetTiny
from toycrystals_tpu.train import create_train_state
from toycrystals_tpu.utils import load_checkpoint, save_checkpoint

K = jax.random.key(0)


def _state():
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jnp.zeros((2, 16, 16, 1))
    params = model.init(K, x, jnp.zeros((2,)), jnp.array([0, 1]), jnp.zeros((2, 4)))["params"]
    return create_train_state(params, optax.adam(1e-4), ema=True)


def test_roundtrip_train_state(tmp_path):
    state = _state()
    ckpt = {
        "epoch_next": 3,
        "state": state,
        "loss_hist": [1.0, 0.5, 0.25],
        "config": {"base_ch": 8, "beta_max": 30.0, "n_types": 4},
    }
    p = tmp_path / "ckpt.msgpack"
    save_checkpoint(p, ckpt)

    raw = load_checkpoint(p)
    assert raw["epoch_next"] == 3
    assert raw["config"]["base_ch"] == 8
    assert list(raw["loss_hist"].values() if isinstance(raw["loss_hist"], dict) else raw["loss_hist"])

    restored = load_checkpoint(p, target=ckpt)
    l0 = jax.tree.leaves(state.params)[0]
    r0 = jax.tree.leaves(restored["state"].params)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(r0))
    e0 = jax.tree.leaves(state.ema_params)[0]
    re0 = jax.tree.leaves(restored["state"].ema_params)[0]
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(re0))
    assert int(restored["state"].step) == int(state.step)


def test_missing_file_raises(tmp_path):
    try:
        load_checkpoint(tmp_path / "nope.msgpack")
        assert False, "expected FileNotFoundError"
    except FileNotFoundError:
        pass
