"""Lattice-fidelity metric (utils/fidelity.py): the quantitative replacement
for judging sample grids by eye (reference judges quality purely visually,
`README.md:21-85`). Calibration contract: real rot_only data scores ~perfect,
noise scores ~chance — so the numbers reported in assets/FIGURES.md are
meaningful."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from toycrystals_tpu.data import LatticeConfig, generate_batch
from toycrystals_tpu.utils.fidelity import (
    extract_grid_tiles,
    score_grid_png,
    score_lattice_fidelity,
    spectrum,
)


def _real_batch(n=48, seed=3):
    cfg = LatticeConfig(img_size=64, rot_only=True)
    x, y_cat, y_cont = generate_batch(cfg, seed=seed, idx=jnp.arange(n))
    return np.asarray(x), np.asarray(y_cat), np.asarray(y_cont[:, 1])


def test_real_data_scores_near_perfect():
    x, y_cat, theta = _real_batch()
    r = score_lattice_fidelity(x, y_cat, theta)
    assert r["type_acc_merged01"] == 1.0
    assert r["type_acc"] >= 0.95  # rect/square only collide at aspect ~ 1
    assert r["theta_mae_deg"] < 1.0
    assert r["cond_fidelity"] > 0.9


def test_noise_scores_near_chance():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(32, 64, 64, 1)).astype(np.float32)
    y_cat = np.arange(32, dtype=np.int32) % 4
    theta = np.linspace(0, math.pi / 3, 32).astype(np.float32)
    r = score_lattice_fidelity(x, y_cat, theta)
    assert r["cond_fidelity"] < 0.4
    assert r["type_acc"] < 0.6
    assert r["theta_mae_deg"] > 5.0


def test_theta_error_respects_lattice_symmetry():
    """A square lattice at theta and theta + 90deg is the same crystal: the
    error metric must be ~0, not 90."""
    x, y_cat, theta = _real_batch(32)
    sq = y_cat == 0
    assert sq.sum() >= 4
    r = score_lattice_fidelity(x[sq], y_cat[sq], theta[sq] + math.pi / 2)
    assert r["theta_mae_deg"] < 1.0


def test_wrong_conditioning_drops_cond_fidelity():
    """cond_corr measures CONDITIONING fidelity, not just 'is a lattice':
    scoring real lattices against shuffled theta must drop it."""
    x, y_cat, theta = _real_batch(48)
    tri = y_cat == 2  # 60deg symmetry, theta identifiable everywhere
    good = score_lattice_fidelity(x[tri], y_cat[tri], theta[tri])
    bad = score_lattice_fidelity(
        x[tri], y_cat[tri],
        (theta[tri] + math.pi / 6) % (math.pi / 3),  # max-distance rotation
    )
    assert good["cond_fidelity"] > bad["cond_fidelity"] + 0.15


def test_spectrum_translation_invariant():
    x, _, _ = _real_batch(4)
    s1 = np.asarray(spectrum(jnp.asarray(x[..., 0])))
    rolled = np.roll(np.roll(x[..., 0], 7, axis=1), -5, axis=2)
    s2 = np.asarray(spectrum(jnp.asarray(rolled)))
    np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_grid_png_roundtrip(tmp_path):
    """save_image_grid -> extract_grid_tiles -> score recovers near-perfect
    scores from the PNG alone (the path used on committed assets, including
    the reference's)."""
    from toycrystals_tpu.utils.figures import save_image_grid

    cfg = LatticeConfig(img_size=64, rot_only=True)
    n = 36
    # render the canonical grid conditions with the real generator: tile i
    # has type i%4; build matching thetas via the scorer's own convention
    theta = np.linspace(0, math.pi / 3, n).astype(np.float32)
    y_cat = (np.arange(n) % 4).astype(np.int32)
    from toycrystals_tpu.data.lattice import make_points, static_point_budget
    from toycrystals_tpu.data.rasterize import rasterize_batch

    budget = static_point_budget(cfg)

    def one(t, th):
        params = {"lattice_type": t, "a": jnp.float32(10.0), "theta": th,
                  "vacancy": jnp.float32(0.0), "jitter": jnp.float32(0.0),
                  "aspect": jnp.float32(1.2)}
        return make_points(cfg, budget, params, jax.random.key(0))

    pts, wts = jax.vmap(one)(jnp.asarray(y_cat), jnp.asarray(theta))
    x = rasterize_batch(pts, wts, jnp.full((n,), 1.2), 64, 64, "xla")

    path = tmp_path / "grid.png"
    save_image_grid(np.asarray(x)[..., None], path, suptitle="sde | steps=300")
    tiles = extract_grid_tiles(path)
    assert tiles.shape == (36, 64, 64)
    r = score_grid_png(path)
    assert r["type_acc_merged01"] == 1.0
    assert r["theta_mae_deg"] < 1.5
    assert r["cond_fidelity"] > 0.8
