"""Statistical parity against the reference implementation as an oracle.

Bit-exact parity across frameworks is impossible (different RNG bit streams —
SURVEY.md §7 "Hard parts"), so the dataset contract is checked
*distributionally*: the same (mode, img_size) configuration must produce
images and labels whose summary statistics match the reference's
`ToyCrystalsDataset` (`/root/reference/src/toycrystals/data.py:153-221`)
within sampling tolerance.

These tests import the reference package read-only as a test oracle and are
skipped wherever the reference checkout is absent (CI without the mount).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REFERENCE_SRC.exists(), reason="reference checkout not mounted"
)


@pytest.fixture(scope="module")
def reference_dataset_cls():
    torch = pytest.importorskip("torch")  # noqa: F841 — oracle needs torch CPU
    sys.path.insert(0, str(REFERENCE_SRC))
    try:
        from toycrystals.data import ToyCrystalsDataset
    finally:
        sys.path.remove(str(REFERENCE_SRC))
    return ToyCrystalsDataset


def _reference_stats(ds, n):
    xs, cats, thetas = [], [], []
    for i in range(n):
        x, y_cat, y_cont = ds[i]
        xs.append(np.asarray(x)[0])  # [1,H,W] -> [H,W]
        cats.append(int(y_cat))
        thetas.append(float(np.asarray(y_cont)[1]))
    xs = np.stack(xs)
    return xs, np.asarray(cats), np.asarray(thetas)


def _ours_stats(cfg, n):
    import jax.numpy as jnp  # noqa: F401

    from toycrystals_tpu.data import generate_batch

    x, y_cat, y_cont = generate_batch(cfg, seed=0, idx=np.arange(n))
    return np.asarray(x)[..., 0], np.asarray(y_cat), np.asarray(y_cont)[:, 1]


@pytest.mark.parametrize("mode", ["rot_only", "full"])
def test_image_statistics_match_reference(reference_dataset_cls, mode):
    """Per-type mean intensity and bright-pixel fraction match the oracle.

    Images are per-image max-normalised (`data.py:209-210`), so mean intensity
    is a shape/density statistic independent of absolute amplitude.
    """
    from toycrystals_tpu.data import LatticeConfig

    n = 192
    rot_only = mode == "rot_only"
    ref = reference_dataset_cls(
        n_samples=n, img_size=64, seed=0, n_types=4, simple=False, rot_only=rot_only
    )
    rx, rcat, _ = _reference_stats(ref, n)
    ox, ocat, _ = _ours_stats(LatticeConfig(rot_only=rot_only), n)

    assert rx.shape == ox.shape
    # Global statistics.
    assert np.mean(ox) == pytest.approx(np.mean(rx), rel=0.08)
    assert np.mean(ox > 0.5) == pytest.approx(np.mean(rx > 0.5), rel=0.12)
    # Per-lattice-type mean intensity (honeycomb is denser than square etc.).
    for t in range(4):
        r_m = rx[rcat == t].mean()
        o_m = ox[ocat == t].mean()
        assert o_m == pytest.approx(r_m, rel=0.10), f"type {t}: {o_m} vs {r_m}"


def test_label_distributions_match_reference(reference_dataset_cls):
    """y_cat is uniform over 4 types; theta ~ U(0, pi/3) in rot_only mode."""
    from toycrystals_tpu.data import LatticeConfig

    n = 512
    ref = reference_dataset_cls(
        n_samples=n, img_size=64, seed=0, n_types=4, simple=False, rot_only=True
    )
    _, rcat, rtheta = _reference_stats(ref, n)
    _, ocat, otheta = _ours_stats(LatticeConfig(rot_only=True), n)

    r_hist = np.bincount(rcat, minlength=4) / n
    o_hist = np.bincount(ocat, minlength=4) / n
    assert np.abs(r_hist - o_hist).max() < 0.08

    assert otheta.mean() == pytest.approx(rtheta.mean(), abs=0.06)
    assert otheta.std() == pytest.approx(rtheta.std(), rel=0.15)
    assert otheta.min() >= 0.0 and otheta.max() <= np.pi / 3 + 1e-6


def test_simple_mode_matches_reference_exactly_up_to_rotation(reference_dataset_cls):
    """`simple` mode has NO randomness in geometry (a=10, theta=0, vac=0,
    jit=0, `data.py:182-186`) except the lattice-type draw — so per-type
    images are deterministic and must match the oracle almost pixel-exactly."""
    from toycrystals_tpu.data import LatticeConfig, generate_batch

    n = 64
    ref = reference_dataset_cls(
        n_samples=n, img_size=64, seed=0, n_types=4, simple=True, rot_only=False
    )
    rx, rcat, _ = _reference_stats(ref, n)
    ox, ocat, _ = generate_batch(LatticeConfig(simple=True), seed=0, idx=np.arange(n))
    ox = np.asarray(ox)[..., 0]
    ocat = np.asarray(ocat)

    # In simple mode the image is a deterministic function of the type alone —
    # except type 1 (rectangular), whose aspect ratio is drawn inside
    # `_lattice_definition` (`data.py:43`) and so stays random even in simple
    # mode; it is excluded here and covered by the distributional tests above.
    for t in (0, 2, 3):
        if not (rcat == t).any() or not (ocat == t).any():
            continue
        r_img = rx[rcat == t][0]
        o_img = ox[ocat == t][0]
        assert np.abs(r_img - o_img).max() < 2e-3, f"type {t} mismatch"
