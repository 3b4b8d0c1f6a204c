"""Quantitative lattice-fidelity scoring for sampled crystal images.

The reference judges sample quality entirely by eye
(`/root/reference/README.md:21-85`, grid conventions
`sde_score_model.py:301-355`). This module replaces "looks like a lattice"
with numbers, exploiting the fact that we own the exact generative process:
a clean lattice at conditioning (type, theta) can be re-rendered with the
dataset rasterizer, so fidelity is measured in Fourier space against the
*ground-truth template*:

1. `spectrum` — translation-invariant signature: unit-norm magnitude FFT
   with the DC neighbourhood masked (sample origin is arbitrary; the Bragg
   peak pattern is not).
2. A template bank over (lattice type, theta grid, rect aspect grid) rendered
   by `data.lattice.make_points` + `data.rasterize.rasterize_batch` at the
   rot_only dataset parameters (a=10, vacancy=0, jitter=0 — `data.py:188-191`).
3. `score_lattice_fidelity` — per sample:
   - cond_corr: cosine similarity with the template at the CONDITIONED
     (type, nearest-theta), max over aspects — structure + conditioning
     fidelity in one number in [0, 1];
   - pred_type: argmax over types of best-in-type correlation
     (classification accuracy vs the conditioning);
   - theta_hat / theta_err_deg: best-correlating theta within the true type,
     error taken modulo the type's rotational symmetry (square 90deg,
     rect 180deg, triangular/honeycomb 60deg).

Known intrinsic ambiguity: the rot_only rectangular type keeps a random
aspect ~ U(0.75, 1.35) that is NOT in the conditioning (`data.py:43`), so
aspect ~ 1 rectangles are genuinely square — `type_acc_merged01` merges
types {0, 1} for the fair headline; the raw 4-way accuracy is also reported.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from toycrystals_tpu.data.lattice import (
    LatticeConfig,
    make_points,
    static_point_budget,
)
from toycrystals_tpu.data.rasterize import rasterize_batch

# rotational symmetry period (radians) of each lattice type's spectrum
_SYMMETRY = np.array([math.pi / 2, math.pi, math.pi / 3, math.pi / 3])
_RECT_ASPECTS = (0.75, 0.85, 0.95, 1.05, 1.15, 1.25, 1.35)


def spectrum(x: jax.Array, dc_radius: int = 2) -> jax.Array:
    """[..., H, W] image -> unit-L2 magnitude FFT, fftshifted, DC masked."""
    x = x - jnp.mean(x, axis=(-2, -1), keepdims=True)
    p = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(x), axes=(-2, -1)))
    h, w = x.shape[-2], x.shape[-1]
    fy = jnp.arange(h) - h // 2
    fx = jnp.arange(w) - w // 2
    dc = (fy[:, None] ** 2 + fx[None, :] ** 2) <= dc_radius**2
    p = jnp.where(dc, 0.0, p)
    return p / jnp.maximum(
        jnp.linalg.norm(p, axis=(-2, -1), keepdims=True), 1e-12
    )


def _render_templates(
    img_size: int, types: np.ndarray, thetas: np.ndarray, aspects: np.ndarray
) -> jax.Array:
    """Clean rot_only lattices at explicit (type, theta, aspect). [M, H, W]."""
    cfg = LatticeConfig(img_size=img_size, rot_only=True)
    budget = static_point_budget(cfg)
    a = 10.0
    sigma = max(0.6, 0.12 * a)

    def one(t, th, asp):
        params = {
            "lattice_type": t.astype(jnp.int32),
            "a": jnp.float32(a),
            "theta": th.astype(jnp.float32),
            "vacancy": jnp.float32(0.0),
            "jitter": jnp.float32(0.0),
            "aspect": asp.astype(jnp.float32),
        }
        # key only feeds vacancy/jitter draws, both zeroed here
        return make_points(cfg, budget, params, jax.random.key(0))

    pts, wts = jax.vmap(one)(
        jnp.asarray(types), jnp.asarray(thetas), jnp.asarray(aspects)
    )
    sig = jnp.full((pts.shape[0],), sigma, jnp.float32)
    return rasterize_batch(pts, wts, sig, img_size, img_size, "xla")


@functools.lru_cache(maxsize=8)
def template_bank(
    img_size: int,
    n_types: int = 4,
    n_theta: int = 61,
    theta_max: float = math.pi / 3,
):
    """(spectra [M, H, W] jnp, type [M], theta [M] np) for the matching grid.

    Types 0/2/3 render at one aspect; type 1 fans out over `_RECT_ASPECTS`
    (the hidden nuisance parameter). Cached per image size."""
    theta_grid = np.linspace(0.0, theta_max, n_theta)
    rows: list[tuple[int, float, float]] = []
    for t in range(n_types):
        aspects = _RECT_ASPECTS if t == 1 else (1.0,)
        for asp in aspects:
            rows.extend((t, th, asp) for th in theta_grid)
    types = np.array([r[0] for r in rows], np.int32)
    thetas = np.array([r[1] for r in rows], np.float32)
    aspects = np.array([r[2] for r in rows], np.float32)
    imgs = _render_templates(img_size, types, thetas, aspects)
    return spectrum(imgs), types, thetas


def _theta_err(theta_hat: np.ndarray, theta: np.ndarray, types: np.ndarray) -> np.ndarray:
    """Angular error modulo each type's rotational symmetry, in radians."""
    period = _SYMMETRY[np.clip(types, 0, 3)]
    d = np.abs(theta_hat - theta) % period
    return np.minimum(d, period - d)


def extract_grid_tiles(
    path, nrows: int = 6, ncols: int = 6, out_size: int = 64
) -> np.ndarray:
    """Recover the [n, out_size, out_size] sample tiles from a committed
    figure-grid png (both frameworks save 6x6 `imshow` grids with axis off
    on a white figure background, gray cmap vmin=0 vmax=1, dpi 200 —
    reference `sde_score_model.py:347-355`, ours `utils/figures.py:35-59`).

    Tiles are found by projecting darkness onto each axis: lattice samples
    are mostly-dark panels on the white canvas, so rows/columns crossing
    tiles form `nrows`/`ncols` long dark bands (thin text rows are filtered
    by run length). Values survive the roundtrip because the gray colormap
    with vmin/vmax 0/1 is the identity on intensities."""
    import matplotlib.pyplot as plt

    img = np.asarray(plt.imread(path), dtype=np.float32)
    if img.ndim == 3:
        img = img[..., :3].mean(axis=-1)
    dark = img < 0.85

    def bands(mass: np.ndarray, n: int, extent: int) -> list[tuple[int, int]]:
        on = mass > 0.05
        runs = []
        start = None
        for i, v in enumerate(np.append(on, False)):
            if v and start is None:
                start = i
            elif not v and start is not None:
                runs.append((start, i))
                start = None
        min_len = extent // (3 * n)  # text rows are thin; tiles are not
        runs = [r for r in runs if r[1] - r[0] >= min_len]
        if len(runs) < n:
            raise ValueError(f"found {len(runs)} tile bands, expected {n}: {path}")
        runs = sorted(sorted(runs, key=lambda r: r[0] - r[1])[:n])
        return runs

    rows = bands(dark.mean(axis=1), nrows, img.shape[0])
    cols = bands(dark.mean(axis=0), ncols, img.shape[1])
    tiles = []
    for r0, r1 in rows:
        for c0, c1 in cols:
            t = jnp.asarray(img[r0:r1, c0:c1])
            tiles.append(jax.image.resize(t, (out_size, out_size), "bilinear"))
    return np.clip(np.stack(tiles), 0.0, 1.0)


def score_grid_png(
    path,
    nrows: int = 6,
    ncols: int = 6,
    n_types: int = 4,
    theta_max: float = math.pi / 3,
    out_size: int = 64,
) -> dict:
    """Extract a committed figure grid and score it against the canonical
    grid conditions (type = i % n_types, theta = linspace(0, theta_max, n) —
    the convention of `sample_grid_conditions`, `sde_score_model.py:317-321`)."""
    tiles = extract_grid_tiles(path, nrows, ncols, out_size)
    n = tiles.shape[0]
    y_cat = np.arange(n, dtype=np.int32) % n_types
    theta = np.linspace(0.0, theta_max, n).astype(np.float32)
    return score_lattice_fidelity(tiles, y_cat, theta, theta_max=theta_max,
                                  n_types=n_types)


def score_lattice_fidelity(
    x,
    y_cat,
    theta,
    *,
    n_theta: int = 61,
    theta_max: float = math.pi / 3,
    n_types: int = 4,
) -> dict:
    """Score sampled images against their conditioning.

    x: [B, H, W, 1] (or [B, H, W]) in [0, 1]; y_cat: [B] lattice types;
    theta: [B] conditioned rotations (radians, the y_cont[:, 1] convention).

    Returns a dict of per-sample arrays (pred_type, type_correct, theta_hat,
    theta_err_deg, cond_corr) and scalar aggregates (type_acc,
    type_acc_merged01, theta_mae_deg, cond_fidelity)."""
    x = np.asarray(x)
    if x.ndim == 4:
        x = x[..., 0]
    y_cat = np.asarray(y_cat).astype(np.int32)
    theta = np.asarray(theta).astype(np.float32)
    bank_spec, bank_type, bank_theta = template_bank(
        x.shape[-1], n_types, n_theta, theta_max
    )

    s = spectrum(jnp.asarray(x))
    # [B, M] cosine similarities (both operands unit-norm, nonnegative)
    corr = np.asarray(jnp.einsum("bhw,mhw->bm", s, bank_spec))

    b = x.shape[0]
    per_type = np.full((b, n_types), -1.0)
    for t in range(n_types):
        per_type[:, t] = corr[:, bank_type == t].max(axis=1)
    pred_type = per_type.argmax(axis=1).astype(np.int32)
    type_correct = pred_type == y_cat
    merged = np.where(np.isin(pred_type, (0, 1)) & np.isin(y_cat, (0, 1)),
                      True, type_correct)

    theta_hat = np.zeros(b, np.float32)
    cond_corr = np.zeros(b, np.float32)
    for i in range(b):
        in_type = bank_type == y_cat[i]
        c = corr[i, in_type]
        th = bank_theta[in_type]
        theta_hat[i] = th[c.argmax()]
        # conditioned-template correlation: nearest bank theta to the
        # conditioning (symmetry-aware), max over the type's aspect fan
        d = _theta_err(th, np.full_like(th, theta[i]),
                       np.full(th.shape, y_cat[i], np.int32))
        cond_corr[i] = c[d <= d.min() + 1e-6].max()

    theta_err = _theta_err(theta_hat, theta, y_cat)
    return {
        "pred_type": pred_type,
        "type_correct": type_correct,
        "theta_hat": theta_hat,
        "theta_err_deg": np.degrees(theta_err),
        "cond_corr": cond_corr,
        "type_acc": float(type_correct.mean()),
        "type_acc_merged01": float(merged.mean()),
        "theta_mae_deg": float(np.degrees(theta_err).mean()),
        "cond_fidelity": float(cond_corr.mean()),
    }
