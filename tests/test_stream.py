"""Streaming input pipeline tests (toycrystals_tpu/data/stream.py).

NEW TPU scope — the reference's DataLoader prefetching
(`/root/reference/scripts/train_vae.py:262-269`) maps to a host-resident
archive + async device_put double-buffering. Contracts:
- prefetch preserves order/count at any depth;
- streamed batches are bitwise-identical to the HBM-resident gather path;
- under a mesh, batches land sharded over 'data';
- the trainer's --stream run reproduces the resident run's losses exactly.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from toycrystals_tpu.data import StreamingDiskDataset, prefetch_to_device, to_f01

REPO = Path(__file__).resolve().parent.parent


def test_prefetch_order_and_count():
    for size in (1, 2, 3, 7):
        out = list(prefetch_to_device(iter(range(5)), size=size,
                                      place=lambda x: x * 10))
        assert out == [0, 10, 20, 30, 40], (size, out)
    assert list(prefetch_to_device(iter([]), size=2)) == []


def test_prefetch_bad_size():
    with pytest.raises(ValueError, match="size"):
        list(prefetch_to_device(iter([1]), size=0))


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("stream") / "tiny.npz"
    np.savez(
        path,
        x_u8=rng.integers(0, 256, (24, 8, 8, 1), dtype=np.uint8),
        y_cat=rng.integers(0, 4, (24,), dtype=np.int64),
        y_cont=rng.normal(size=(24, 4)).astype(np.float32),
    )
    return path


def test_streamed_batches_match_resident_gather(archive):
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        from _common import ResidentDiskDataset
    finally:
        sys.path.pop(0)

    sds = StreamingDiskDataset(archive)
    rds = ResidentDiskDataset(archive)
    idx = np.array([3, 0, 17, 9])
    xs, cs, vs = (jax.device_put(a) for a in sds.host_batch(idx))
    xr, cr, vr = rds.gather(idx)
    np.testing.assert_array_equal(np.asarray(to_f01(xs)), np.asarray(xr))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(cr))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(vr))


def test_prefetch_places_sharded_under_mesh(archive):
    from toycrystals_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(4)
    sds = StreamingDiskDataset(archive)
    batches = (sds.host_batch(np.arange(i * 8, (i + 1) * 8)) for i in range(3))
    out = list(prefetch_to_device(batches, size=2,
                                  place=lambda b: shard_batch(mesh, b)))
    assert len(out) == 3
    x, y_cat, y_cont = out[0]
    assert len(x.sharding.device_set) == 4
    # leading dim split over 'data': each device holds 8/4 = 2 rows
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert shard_shapes == {(2, 8, 8, 1)}


@pytest.mark.slow
def test_cli_stream_matches_resident(archive, tmp_path):
    """--stream reproduces the resident path's losses bitwise (same seed,
    same shuffle order, same arithmetic — only the residency differs)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    common = [
        sys.executable, str(REPO / "scripts" / "train_sde_score_model.py"),
        "--device", "cpu", "--data-path", str(archive),
        "--epochs", "2", "--batch-size", "8", "--base-ch", "8",
        "--emb-dim", "16", "--sample-every", "0",
    ]

    def run(extra, out):
        r = subprocess.run(common + extra + ["--out-dir", str(tmp_path / out)],
                           capture_output=True, text=True, timeout=900, env=env)
        assert r.returncode == 0, r.stdout + r.stderr
        lines = (tmp_path / out / "metrics.jsonl").read_text().splitlines()
        return [json.loads(ln)["loss"] for ln in lines]

    resident = run(["--fused-epoch", "0"], "resident")
    streamed = run(["--stream", "2"], "streamed")
    assert resident == streamed and len(resident) == 2
