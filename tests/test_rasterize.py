"""Rasterizer parity tests: separable matmul and Pallas kernel vs the direct
broadcast formulation mirroring data.py:130-150."""

import jax
import jax.numpy as jnp
import numpy as np

from toycrystals_tpu.data import (
    LatticeConfig,
    static_point_budget,
)
from toycrystals_tpu.data.lattice import generate_item, item_key
from toycrystals_tpu.data.rasterize import (
    rasterize_batch,
    rasterize_pallas,
    rasterize_reference,
    rasterize_separable,
)


def _random_points(key, p=256, h=32, w=32):
    k1, k2, k3 = jax.random.split(key, 3)
    pts = jax.random.uniform(k1, (p, 2), minval=-5.0, maxval=w + 5.0)
    wts = (jax.random.uniform(k2, (p,)) > 0.3).astype(jnp.float32)
    sigma = jax.random.uniform(k3, (), minval=0.6, maxval=2.0)
    return pts, wts, sigma


def test_separable_matches_reference():
    h = w = 32
    pts, wts, sigma = _random_points(jax.random.key(0), p=256, h=h, w=w)
    ref = rasterize_reference(pts, wts, sigma, h, w)
    sep = rasterize_separable(pts, wts, sigma, h, w)
    np.testing.assert_allclose(np.asarray(sep), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_matches_separable_interpret():
    """Pallas kernel (interpret mode on CPU) == jnp separable matmul."""
    h = w = 32
    b = 3
    keys = jax.random.split(jax.random.key(1), b)
    pts = jnp.stack([_random_points(k, p=256)[0] for k in keys])
    wts = jnp.stack([_random_points(k, p=256)[1] for k in keys])
    sig = jnp.stack([_random_points(k, p=256)[2] for k in keys])
    got = rasterize_pallas(pts, wts, sig, h, w, interpret=True)
    want = jax.vmap(lambda p_, w_, s_: rasterize_separable(p_, w_, s_, h, w))(pts, wts, sig)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_zero_weights_give_zero_image():
    """Empty point set -> zeros, matching data.py:136-137 (before normalisation)."""
    h = w = 16
    pts = jnp.ones((64, 2)) * 8.0
    wts = jnp.zeros((64,))
    img = rasterize_separable(pts, wts, jnp.float32(1.0), h, w)
    assert float(jnp.abs(img).max()) == 0.0
    # normalised batch render stays finite (guarded by the +1e-8)
    out = rasterize_batch(pts[None], wts[None], jnp.ones((1,)), h, w, "xla")
    assert np.isfinite(np.asarray(out)).all()


def test_batch_render_normalised():
    cfg = LatticeConfig(rot_only=True)
    budget = static_point_budget(cfg)
    keys = [item_key(0, jnp.int32(i)) for i in range(4)]
    items = [generate_item(cfg, budget, k) for k in keys]
    pts = jnp.stack([it[0] for it in items])
    wts = jnp.stack([it[1] for it in items])
    sig = jnp.stack([it[2] for it in items])
    img = rasterize_batch(pts, wts, sig, 64, 64, "xla")
    arr = np.asarray(img)
    assert arr.shape == (4, 64, 64)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert np.all(arr.max(axis=(1, 2)) > 0.99)  # per-image max-normalised
