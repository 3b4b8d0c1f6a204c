"""Dataset unit tests (reference contracts: data.py:153-221)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.data import (
    LatticeConfig,
    ToyCrystalsDataset,
    generate_batch,
    static_point_budget,
)
from toycrystals_tpu.data.lattice import generate_item, item_key, sample_params


def test_budget_static_and_lane_aligned():
    for cfg in [
        LatticeConfig(),
        LatticeConfig(rot_only=True),
        LatticeConfig(simple=True),
        LatticeConfig(img_size=32),
    ]:
        b = static_point_budget(cfg)
        assert b.p % 128 == 0
        assert b.p >= (2 * b.n1s + 1) * (2 * b.n2s + 1) * b.k_max


def test_determinism_per_seed_idx():
    cfg = LatticeConfig(rot_only=True)
    x1, c1, v1 = generate_batch(cfg, seed=0, idx=jnp.arange(4))
    x2, c2, v2 = generate_batch(cfg, seed=0, idx=jnp.arange(4))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    x3, _, _ = generate_batch(cfg, seed=1, idx=jnp.arange(4))
    assert not np.allclose(np.asarray(x1), np.asarray(x3))


def test_item_shapes_and_range():
    ds = ToyCrystalsDataset(n_samples=10, img_size=64, seed=0, rot_only=True)
    x, y_cat, y_cont = ds[3]
    assert x.shape == (64, 64, 1)
    assert 0 <= int(y_cat) < 4
    assert y_cont.shape == (4,)
    xf = np.asarray(x)
    assert xf.min() >= 0.0 and xf.max() <= 1.0
    # normalised by own max: at least one pixel ~1 (data.py:209)
    assert xf.max() > 0.99


def test_rot_only_label_contract():
    """rot_only: y_cont = [0, theta, 0, 0] with theta in [0, pi/3] (data.py:217)."""
    cfg = LatticeConfig(rot_only=True)
    _, _, y_cont = generate_batch(cfg, seed=0, idx=jnp.arange(64))
    v = np.asarray(y_cont)
    assert np.all(v[:, 0] == 0) and np.all(v[:, 2] == 0) and np.all(v[:, 3] == 0)
    assert np.all(v[:, 1] >= 0) and np.all(v[:, 1] <= math.pi / 3 + 1e-6)
    assert v[:, 1].std() > 0.1  # theta actually varies


def test_simple_label_contract():
    cfg = LatticeConfig(simple=True)
    _, _, y_cont = generate_batch(cfg, seed=0, idx=jnp.arange(16))
    assert np.all(np.asarray(y_cont) == 0)


def test_full_mode_label_ranges():
    cfg = LatticeConfig()
    _, y_cat, y_cont = generate_batch(cfg, seed=0, idx=jnp.arange(128))
    v = np.asarray(y_cont)
    assert np.all((v[:, 0] >= 6.0) & (v[:, 0] <= 14.0))      # a
    assert np.all((v[:, 1] >= 0.0) & (v[:, 1] <= math.pi / 3 + 1e-6))
    assert np.all((v[:, 2] >= 0.0) & (v[:, 2] <= 0.25))       # vacancy
    assert np.all((v[:, 3] >= 0.0) & (v[:, 3] <= 0.6))        # jitter
    cats = np.asarray(y_cat)
    assert set(np.unique(cats)).issubset({0, 1, 2, 3})
    assert len(np.unique(cats)) == 4  # all types show up in 128 draws


def test_type_distribution_uniform():
    cfg = LatticeConfig(rot_only=True)
    _, y_cat, _ = generate_batch(cfg, seed=0, idx=jnp.arange(2048))
    counts = np.bincount(np.asarray(y_cat), minlength=4)
    assert counts.min() > 2048 / 4 * 0.8  # roughly uniform


def test_honeycomb_denser_than_square():
    """Honeycomb has a 2-atom basis -> more active atoms than square at same a."""
    cfg = LatticeConfig(rot_only=True)
    budget = static_point_budget(cfg)
    counts = {0: [], 3: []}
    for i in range(256):
        k = item_key(0, jnp.int32(i))
        params = sample_params(cfg, jax.random.split(k)[0])
        t = int(params["lattice_type"])
        if t in counts and len(counts[t]) < 10:
            _, w, _, _, _, _ = generate_item(cfg, budget, k)
            counts[t].append(float(jnp.sum(w)))
        if all(len(vv) >= 10 for vv in counts.values()):
            break
    assert np.mean(counts[3]) > 1.5 * np.mean(counts[0])


def test_vacancy_reduces_atom_count():
    cfg = LatticeConfig()  # full mode: vacancy free
    budget = static_point_budget(cfg)
    k = item_key(0, jnp.int32(0))
    points, w, sigma, _, y_cont, _ = generate_item(cfg, budget, k)
    n_active = float(jnp.sum(w))
    assert n_active > 0
    # sigma respects the floor max(0.6, 0.12 a) (data.py:205)
    a = float(y_cont[0])
    assert abs(float(sigma) - max(0.6, 0.12 * a)) < 1e-6


@pytest.mark.parametrize("img_size", [32, 64])
def test_periodicity_visible(img_size):
    """A simple square lattice at a=10, theta=0 has strong 10px periodicity."""
    cfg = LatticeConfig(img_size=img_size, simple=True)
    # find a square item
    for i in range(64):
        x, y_cat, _ = generate_batch(cfg, seed=0, idx=jnp.asarray([i]))
        if int(y_cat[0]) == 0:
            img = np.asarray(x[0, :, :, 0])
            break
    else:
        pytest.skip("no square item found")
    row = img.sum(axis=0)
    # autocorrelation at lag 10 should be high relative to lag 5
    r = row - row.mean()
    ac = np.correlate(r, r, mode="full")[len(r) - 1 :]
    assert ac[10] > ac[5]


def test_pt_archive_interop(tmp_path):
    """The reference materialises datasets as `.pt` torch dicts
    (`/root/reference/scripts/build_dataset.py:28-41`: x_u8 [N,1,H,W] u8
    NCHW, y_cat i64, y_cont [N,4] f32). A migrating user's prebuilt archive
    must load through every disk loader unmodified, identical to the .npz
    path."""
    import sys

    import torch

    from toycrystals_tpu.data import StreamingDiskDataset, ToyCrystalsDiskDataset
    from toycrystals_tpu.data.datasets import load_archive

    rng = np.random.default_rng(3)
    x_nhwc = rng.integers(0, 256, size=(12, 16, 16, 1), dtype=np.uint8)
    y_cat = rng.integers(0, 4, size=(12,))
    y_cont = rng.normal(size=(12, 4)).astype(np.float32)

    pt = tmp_path / "crystals.pt"
    torch.save(
        {
            "x_u8": torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))),
            "y_cat": torch.from_numpy(y_cat.astype(np.int64)),
            "y_cont": torch.from_numpy(y_cont),
        },
        pt,
    )
    npz = tmp_path / "crystals.npz"
    np.savez(npz, x_u8=x_nhwc, y_cat=y_cat.astype(np.int32), y_cont=y_cont)

    for path in (pt, npz):
        xa, ca, va = load_archive(path)
        np.testing.assert_array_equal(xa, x_nhwc)
        np.testing.assert_array_equal(ca, y_cat.astype(np.int32))
        np.testing.assert_array_equal(va, y_cont)
        assert xa.dtype == np.uint8 and ca.dtype == np.int32 and va.dtype == np.float32

    ds = ToyCrystalsDiskDataset(pt)
    x0, c0, v0 = ds[5]
    np.testing.assert_allclose(
        np.asarray(x0), x_nhwc[5].astype(np.float32) / 255.0, atol=1e-6
    )
    assert int(c0) == int(y_cat[5])

    sds = StreamingDiskDataset(pt)
    bx, bc, bv = sds.host_batch(np.asarray([1, 3]))
    np.testing.assert_array_equal(bx, x_nhwc[[1, 3]])

    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    try:
        from _common import ResidentDiskDataset
    finally:
        sys.path.pop(0)
    rds = ResidentDiskDataset(pt)
    gx, gc, gv = rds.gather(jnp.asarray([0, 7]))
    np.testing.assert_allclose(
        np.asarray(gx), x_nhwc[[0, 7]].astype(np.float32) / 255.0, atol=1e-6
    )

    with pytest.raises(ValueError, match="not a dataset archive"):
        bad = tmp_path / "bad.pt"
        torch.save({"weights": torch.zeros(3)}, bad)
        load_archive(bad)
