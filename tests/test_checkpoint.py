"""Checkpoint round-trip tests (msgpack single-file format + async writer)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from toycrystals_tpu.models import CondUNetTiny
from toycrystals_tpu.train import create_train_state
from toycrystals_tpu.utils import AsyncCheckpointer, load_checkpoint, save_checkpoint

K = jax.random.key(0)


def _state():
    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jnp.zeros((2, 16, 16, 1))
    params = model.init(K, x, jnp.zeros((2,)), jnp.array([0, 1]), jnp.zeros((2, 4)))["params"]
    return create_train_state(params, optax.adam(1e-4), ema=True)


@pytest.mark.slow
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


def test_crash_mid_write_keeps_previous_checkpoint(tmp_path, monkeypatch):
    """A failure between tmp-write and rename must leave the existing file
    intact and loadable (the resume-safety contract of _atomic_write)."""
    p = tmp_path / "ckpt.msgpack"
    save_checkpoint(p, {"epoch_next": 1, "w": jnp.ones((4,))})

    import toycrystals_tpu.utils.checkpoint as ckpt_mod

    def boom(src, dst):
        raise OSError("injected crash before rename")

    monkeypatch.setattr(ckpt_mod.os, "replace", boom)
    with pytest.raises(OSError, match="injected"):
        save_checkpoint(p, {"epoch_next": 2, "w": jnp.zeros((4,))})
    monkeypatch.undo()

    raw = load_checkpoint(p)
    assert raw["epoch_next"] == 1
    np.testing.assert_array_equal(raw["w"], np.ones((4,)))


def test_async_roundtrip_and_ordering(tmp_path):
    """Async saves land in submission order; the final file is the last tree."""
    p = tmp_path / "ckpt.msgpack"
    with AsyncCheckpointer() as ck:
        for i in range(3):
            ck.save(p, {"epoch_next": i, "w": jnp.full((8,), float(i))})
    raw = load_checkpoint(p)
    assert raw["epoch_next"] == 2
    np.testing.assert_array_equal(raw["w"], np.full((8,), 2.0))


def test_async_save_is_donation_safe(tmp_path):
    """save() must complete the device->host pull before returning: a
    donating step that immediately invalidates the buffers (exactly what
    every make_*_train_step does between epochs) must not corrupt the
    in-flight write."""
    p = tmp_path / "ckpt.msgpack"
    tree = {"w": jnp.arange(16.0), "b": jnp.ones((4,))}
    step = jax.jit(lambda t: jax.tree.map(lambda a: a * 2, t), donate_argnums=0)
    with AsyncCheckpointer() as ck:
        ck.save(p, tree)
        tree = step(tree)  # donates (invalidates) the saved tree's buffers
        jax.block_until_ready(tree)
    raw = load_checkpoint(p)
    np.testing.assert_array_equal(raw["w"], np.arange(16.0))
    np.testing.assert_array_equal(raw["b"], np.ones((4,)))


def test_async_write_failure_raises_at_wait(tmp_path):
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where a directory is needed")
    ck = AsyncCheckpointer()
    ck.save(blocker / "sub" / "ckpt.msgpack", {"w": jnp.ones((2,))})
    with pytest.raises(OSError):
        ck.wait()
    ck.wait()  # error is consumed; a second wait is a clean no-op


def test_exit_does_not_mask_body_exception(tmp_path, capsys):
    # unwinding on an in-body exception (divergence SystemExit, ^C): a failed
    # background write must be REPORTED, not replace the original exception
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where a directory is needed")
    with pytest.raises(SystemExit, match="diverged"):
        with AsyncCheckpointer() as ck:
            ck.save(blocker / "sub" / "ckpt.msgpack", {"w": jnp.ones((2,))})
            raise SystemExit("training diverged")
    assert "async checkpoint write failed" in capsys.readouterr().err
