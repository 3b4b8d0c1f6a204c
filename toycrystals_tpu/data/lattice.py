"""Procedural toy-crystal lattice geometry, TPU-first.

Re-implements the behavioural contract of the reference dataset generator
(`/root/reference/src/toycrystals/data.py:21-221`) with static shapes so the
whole pipeline is jit/vmap-able and batches render directly on device:

- The reference over-generates lattice points with a *dynamic* triple Python
  loop and crops to a variable-length point list (`data.py:100-127`). Here the
  index grid is a *static* padded buffer sized for the worst case over the
  parameter ranges, with a float validity mask — shapes never depend on data,
  so XLA compiles one program for the whole dataset.
- Per-item determinism (`data.py:171-172`: fresh generator seeded seed+idx)
  becomes `jax.random.fold_in(key(seed), idx)` — deterministic per (seed, idx)
  with identical parameter *distributions* (bit-exactness across frameworks is
  impossible; figure parity is statistical).

Lattice types (`data.py:37-65`): 0=square, 1=rectangular (random aspect
nuisance), 2=triangular, 3=honeycomb (triangular + 2-atom basis).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LatticeConfig:
    """Static dataset configuration (hashable: safe as a jit static arg).

    Parameter ranges mirror `data.py:176-191`:
      lattice spacing a ~ U(6, 14) px, rotation theta ~ U(0, pi/3),
      vacancy ~ U(0, 0.25), jitter std ~ U(0, 0.6) px,
      rectangular aspect ~ U(0.75, 1.35).
    `simple` fixes a=10, theta=0, vacancy=0, jitter=0 (`data.py:182-186`);
    `rot_only` fixes a=10, vacancy=0, jitter=0, keeps theta (`data.py:188-191`).
    """

    img_size: int = 64
    n_types: int = 4
    simple: bool = False
    rot_only: bool = False
    a_min: float = 6.0
    a_max: float = 14.0
    theta_max: float = math.pi / 3.0
    vacancy_max: float = 0.25
    jitter_max: float = 0.6
    aspect_min: float = 0.75
    aspect_max: float = 1.35


@dataclasses.dataclass(frozen=True)
class PointBudget:
    """Static worst-case index-grid extents for a LatticeConfig.

    n1s/n2s bound the dynamic n1/n2 of `data.py:95-96` over the whole
    parameter range; p is the padded flat point count (multiple of 128 so the
    rasterizer's contraction dim tiles the MXU lanes).
    """

    n1s: int
    n2s: int
    k_max: int
    p: int


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def static_point_budget(cfg: LatticeConfig) -> PointBudget:
    """Worst-case grid extents covering every (a, aspect, type) draw.

    Mirrors `data.py:93-96`: margin = 2a, extent = max(H, W) + margin,
    n_i = ceil(extent / ||v_i||) + 2. n is largest at the smallest spacing,
    so evaluate at a_lo (and aspect_min for the rectangular v2).
    """
    a_lo = 10.0 if (cfg.simple or cfg.rot_only) else cfg.a_min
    extent = float(cfg.img_size) + 2.0 * a_lo
    n1s = int(math.ceil(extent / a_lo)) + 2
    # ||v2|| minima: square/triangular/honeycomb have ||v2|| = a;
    # rectangular has ||v2|| = a * aspect, smallest at aspect_min.
    min_v2 = a_lo * min(1.0, cfg.aspect_min)
    n2s = int(math.ceil(extent / min_v2)) + 2
    k_max = 2 if cfg.n_types >= 4 else 1  # honeycomb basis (`data.py:59-65`)
    raw = (2 * n1s + 1) * (2 * n2s + 1) * k_max
    return PointBudget(n1s=n1s, n2s=n2s, k_max=k_max, p=_round_up(raw, 128))


def _index_grid(budget: PointBudget) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static (I, J, K, pad_valid) flat index arrays of length budget.p."""
    i = np.arange(-budget.n1s, budget.n1s + 1)
    j = np.arange(-budget.n2s, budget.n2s + 1)
    k = np.arange(budget.k_max)
    ii, jj, kk = np.meshgrid(i, j, k, indexing="ij")
    flat_i = ii.reshape(-1).astype(np.float32)
    flat_j = jj.reshape(-1).astype(np.float32)
    flat_k = kk.reshape(-1).astype(np.int32)
    n = flat_i.shape[0]
    pad = budget.p - n
    pad_valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    flat_i = np.concatenate([flat_i, np.zeros(pad, np.float32)])
    flat_j = np.concatenate([flat_j, np.zeros(pad, np.float32)])
    flat_k = np.concatenate([flat_k, np.zeros(pad, np.int32)])
    return flat_i, flat_j, flat_k, pad_valid


def sample_params(cfg: LatticeConfig, key: jax.Array) -> dict[str, jax.Array]:
    """Draw per-item lattice parameters (mirrors the draw set of `data.py:176-180`
    plus the rectangular aspect of `data.py:43`).

    Returns a dict of scalars: lattice_type i32, a, theta, vacancy, jitter,
    aspect (aspect is only *used* for type 1, like the reference, but always
    drawn so key consumption is uniform across types).
    """
    k_type, k_a, k_th, k_vac, k_jit, k_asp = jax.random.split(key, 6)
    lattice_type = jax.random.randint(k_type, (), 0, cfg.n_types, dtype=jnp.int32)
    a = jax.random.uniform(k_a, (), minval=cfg.a_min, maxval=cfg.a_max)
    theta = jax.random.uniform(k_th, (), minval=0.0, maxval=cfg.theta_max)
    vacancy = jax.random.uniform(k_vac, (), minval=0.0, maxval=cfg.vacancy_max)
    jitter = jax.random.uniform(k_jit, (), minval=0.0, maxval=cfg.jitter_max)
    aspect = jax.random.uniform(k_asp, (), minval=cfg.aspect_min, maxval=cfg.aspect_max)

    if cfg.simple:  # `data.py:182-186`
        a = jnp.float32(10.0)
        theta = jnp.float32(0.0)
        vacancy = jnp.float32(0.0)
        jitter = jnp.float32(0.0)
    elif cfg.rot_only:  # `data.py:188-191`
        a = jnp.float32(10.0)
        vacancy = jnp.float32(0.0)
        jitter = jnp.float32(0.0)

    return {
        "lattice_type": lattice_type,
        "a": a,
        "theta": theta,
        "vacancy": vacancy,
        "jitter": jitter,
        "aspect": aspect,
    }


def _lattice_vectors(
    lattice_type: jax.Array, a: jax.Array, aspect: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Branch-free `_lattice_definition` (`data.py:21-70`).

    Returns (v1 [2], v2 [2], basis2 [2], n_basis scalar). basis2 is the
    honeycomb second-atom offset (zero for other types); n_basis in {1, 2}.
    """
    s3 = math.sqrt(3.0)
    zero = jnp.zeros_like(a)
    v1 = jnp.stack([a, zero])
    v2_opts = jnp.stack(
        [
            jnp.stack([zero, a]),                      # 0 square
            jnp.stack([zero, a * aspect]),             # 1 rectangular
            jnp.stack([0.5 * a, (s3 / 2.0) * a]),      # 2 triangular
            jnp.stack([0.5 * a, (s3 / 2.0) * a]),      # 3 honeycomb
        ]
    )  # [4, 2]
    v2 = v2_opts[jnp.clip(lattice_type, 0, 3)]
    is_honey = (lattice_type == 3).astype(a.dtype)
    basis2 = jnp.stack([0.5 * a, (s3 / 6.0) * a]) * is_honey  # `data.py:59-65`
    n_basis = 1 + (lattice_type == 3).astype(jnp.int32)
    return v1, v2, basis2, n_basis


def make_points(
    cfg: LatticeConfig,
    budget: PointBudget,
    params: dict[str, jax.Array],
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Static-shape analogue of `_make_points` (`data.py:73-127`).

    Returns (points [P, 2] float32 in (x, y) pixel coords, weights [P] float32
    in {0, 1}). Invalid / vacated / cropped points get weight 0 instead of
    being removed, so shapes stay static for jit.
    """
    h = w = cfg.img_size
    a = params["a"]
    theta = params["theta"]
    v1, v2, basis2, n_basis = _lattice_vectors(params["lattice_type"], a, params["aspect"])

    flat_i, flat_j, flat_k, pad_valid = _index_grid(budget)
    fi = jnp.asarray(flat_i)
    fj = jnp.asarray(flat_j)
    fk = jnp.asarray(flat_k)
    pv = jnp.asarray(pad_valid)

    # Dynamic grid extents (`data.py:93-96`): margin = 2a, n_i = ceil(extent/||v_i||)+2.
    margin = 2.0 * a
    extent = float(max(h, w)) + margin
    n1 = jnp.ceil(extent / jnp.linalg.norm(v1)).astype(jnp.int32) + 2
    n2 = jnp.ceil(extent / jnp.linalg.norm(v2)).astype(jnp.int32) + 2

    in_grid = (
        (jnp.abs(fi) <= n1.astype(fi.dtype))
        & (jnp.abs(fj) <= n2.astype(fj.dtype))
        & (fk < n_basis)
        & pv
    )

    # pts = i*v1 + j*v2 + basis_k, shifted to the image centre (`data.py:99-108`).
    pts = fi[:, None] * v1[None, :] + fj[:, None] * v2[None, :]
    pts = pts + jnp.where(fk[:, None] == 1, basis2[None, :], 0.0)
    centre = jnp.array([w / 2.0, h / 2.0], dtype=jnp.float32)
    pts = pts + centre

    # Rotate about the centre (`data.py:110-112`).
    c, s = jnp.cos(theta), jnp.sin(theta)
    rel = pts - centre
    pts = jnp.stack(
        [rel[:, 0] * c - rel[:, 1] * s, rel[:, 0] * s + rel[:, 1] * c], axis=1
    ) + centre

    # Vacancies: keep iff rand > vacancy (`data.py:114-117`).
    k_vac, k_jit = jax.random.split(key)
    keep = jax.random.uniform(k_vac, (budget.p,)) > params["vacancy"]

    # Gaussian jitter (`data.py:119-121`).
    pts = pts + jax.random.normal(k_jit, (budget.p, 2)) * params["jitter"]

    # Crop to +-margin beyond the bounds (`data.py:123-127`).
    x, y = pts[:, 0], pts[:, 1]
    in_crop = (x > -margin) & (x < w + margin) & (y > -margin) & (y < h + margin)

    weights = (in_grid & keep & in_crop).astype(jnp.float32)
    return pts.astype(jnp.float32), weights


def item_labels(cfg: LatticeConfig, params: dict[str, jax.Array]) -> tuple[jax.Array, jax.Array]:
    """Label packing per mode (`data.py:213-219`)."""
    y_cat = params["lattice_type"].astype(jnp.int32)
    if cfg.simple:
        y_cont = jnp.zeros((4,), jnp.float32)
    elif cfg.rot_only:
        y_cont = jnp.stack(
            [jnp.float32(0.0), params["theta"], jnp.float32(0.0), jnp.float32(0.0)]
        )
    else:
        y_cont = jnp.stack([params["a"], params["theta"], params["vacancy"], params["jitter"]])
    return y_cat, y_cont.astype(jnp.float32)


@partial(jax.jit, static_argnums=(0, 1))
def generate_item(
    cfg: LatticeConfig, budget: PointBudget, key: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One dataset item's geometry: (points [P,2], weights [P], sigma, y_cat, y_cont).

    sigma is the atom blur tied to spacing: max(0.6, 0.12*a) (`data.py:205`).
    Rendering is separate (see `rasterize.py`) so the rasterizer can batch.
    """
    k_params, k_points = jax.random.split(key)
    params = sample_params(cfg, k_params)
    points, weights = make_points(cfg, budget, params, k_points)
    sigma = jnp.maximum(0.6, 0.12 * params["a"]).astype(jnp.float32)
    y_cat, y_cont = item_labels(cfg, params)
    return points, weights, sigma, y_cat, y_cont, params["lattice_type"]


def item_key(seed: int, idx: jax.Array) -> jax.Array:
    """Per-(seed, idx) deterministic key — the contract of `data.py:171-172`."""
    return jax.random.fold_in(jax.random.key(seed), idx)
