"""AOT export tests (toycrystals_tpu/export.py + scripts/export_sde_score_model.py).

New TPU scope — the reference ships ".pt + source tree"; we package the
compiled sampler as a self-contained jax.export/StableHLO artifact.
Contracts verified:
- round-trip: serialize -> file -> deserialize reproduces the live service's
  sampler output at the same (seed, batch) — same program, same draws; only
  constant-folding over the baked weights may re-fuse float ops (measured
  bitwise-equal on TPU, <=5e-5 on the CPU runner);
- the artifact is weight-complete (runs with no checkpoint/model code in
  scope) and meta describes the frozen settings;
- settings resolution matches serving (distilled students freeze their
  trained few-step config);
- container validation fails loudly on non-artifacts;
- CLI end-to-end incl. --selftest.
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from toycrystals_tpu.export import (
    export_checkpoint,
    export_meta,
    export_service,
    load_exported,
    save_exported,
)
from toycrystals_tpu.models import CondUNetTiny
from toycrystals_tpu.serve import ScoreModelService
from toycrystals_tpu.train import create_train_state
from toycrystals_tpu.utils import save_checkpoint

K = jax.random.key(0)

CFG = {
    "img_ch": 1, "img_size": 16, "n_types": 4, "y_cont_dim": 4,
    "base_ch": 8, "emb_dim": 16, "cond_ch": 8, "time_ch": 8,
    "beta_min": 0.1, "beta_max": 30.0, "logsnr_shift": 0.0,
    "t_power": 1.0, "p_uncond": 0.1, "dtype": "float32", "param": "eps",
}


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("export_ckpts")
    u = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    params = u.init(K, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,)),
                    jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
    state = create_train_state(params, optax.adam(1e-3), ema=True)
    path = d / "m.msgpack"
    save_checkpoint(path, {"epoch_next": 1, "state": state,
                           "loss_hist": [0.1], "config": CFG})
    return str(path)


def _conditions(b):
    yc = (np.arange(b) % 4).astype(np.int32)
    yv = np.zeros((b, 4), np.float32)
    yv[:, 1] = np.linspace(0.0, 1.0, b)
    return yc, yv


def test_export_round_trip_matches_service(ckpt, tmp_path):
    """file round-trip == the live service's jitted sampler (tight float
    tolerance: baking weights as constants lets XLA re-fuse elementwise
    chains — bitwise on TPU, ~1e-5 max on CPU)."""
    svc = ScoreModelService(ckpt, steps=3, buckets=(4,))
    b = 4
    exported = export_service(svc, b)
    meta = export_meta(svc, b, exported)
    out = tmp_path / "m.tcx"
    save_exported(out, exported, meta)

    exp, meta2 = load_exported(out)
    assert meta2 == meta
    yc, yv = _conditions(b)
    got = np.asarray(exp.call(yc, yv, np.int32(7)))
    want = np.asarray(
        jax.jit(svc.sampler_callable(b))(svc.params, yc, yv, np.int32(7)))
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.shape == (b, 16, 16, 1)
    assert (got >= 0).all() and (got <= 1).all()
    # seeds matter
    other = np.asarray(exp.call(yc, yv, np.int32(8)))
    assert np.abs(other - got).max() > 0


def test_exported_is_self_contained(ckpt, tmp_path):
    """The artifact runs from raw bytes with only jax in scope — weights are
    baked in, no checkpoint or model class needed."""
    meta = export_checkpoint(ckpt, tmp_path / "m.tcx", batch=2, steps=2,
                             buckets=(2,))
    assert meta["steps"] == 2 and meta["batch"] == 2
    raw = (tmp_path / "m.tcx").read_bytes()

    # consume in a scope that touches nothing but jax.export + the container
    import struct

    from toycrystals_tpu.export import MAGIC
    off = len(MAGIC)
    (hlen,) = struct.unpack(">Q", raw[off:off + 8])
    exp = jax.export.deserialize(raw[off + 8 + hlen:])
    yc, yv = _conditions(2)
    x = np.asarray(exp.call(yc, yv, np.int32(0)))
    assert x.shape == (2, 16, 16, 1) and np.isfinite(x).all()


def test_distilled_settings_freeze(ckpt, tmp_path):
    """Settings resolve exactly like serving: a distilled student exports its
    trained sampler/steps/guidance."""
    from toycrystals_tpu.utils import load_checkpoint

    payload = load_checkpoint(ckpt)
    payload["config"] = dict(CFG, param="v", distilled=True, distill_steps=2,
                             distill_t_end=0.005, distill_cfg=1.5)
    dist = tmp_path / "dist.msgpack"
    save_checkpoint(dist, payload)
    meta = export_checkpoint(str(dist), tmp_path / "d.tcx", batch=2,
                             buckets=(2,))
    assert (meta["sampler"], meta["steps"], meta["guidance_scale"]) == ("ddim", 2, 0.0)
    assert meta["distilled"] is True
    exp, _ = load_exported(tmp_path / "d.tcx")
    yc, yv = _conditions(2)
    assert np.isfinite(np.asarray(exp.call(yc, yv, np.int32(1)))).all()


def test_bad_container_rejected(tmp_path):
    p = tmp_path / "junk.tcx"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        load_exported(p)


def test_multi_platform_export(ckpt, tmp_path):
    """platforms=['cpu'] lowers a module tagged for that backend."""
    svc = ScoreModelService(ckpt, steps=2, buckets=(2,))
    exported = export_service(svc, 2, platforms=["cpu"])
    assert tuple(exported.platforms) == ("cpu",)
    yc, yv = _conditions(2)
    x = np.asarray(exported.call(yc, yv, np.int32(0)))
    assert np.isfinite(x).all()


def test_cli_export_selftest(ckpt, tmp_path):
    """CLI end-to-end: artifact written, JSON line sane, --selftest passes."""
    scripts = Path(__file__).resolve().parent.parent / "scripts"
    out = tmp_path / "cli.tcx"
    r = subprocess.run(
        [sys.executable, str(scripts / "export_sde_score_model.py"),
         "--device", "cpu", "--ckpt", ckpt, "--out", str(out),
         "--batch", "2", "--steps", "2", "--selftest"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "selftest: artifact == live service" in r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["batch"] == 2 and rec["steps"] == 2
    assert out.exists() and out.stat().st_size > 1000
