"""Tests for the dispatch-latency-immune timing utilities and stretch shapes."""

import jax.numpy as jnp
import numpy as np

from toycrystals_tpu.utils import dispatch_latency, scan_timer


def test_scan_timer_positive_and_sane():
    dt = scan_timer(lambda x: x * 1.0001 + 1.0, jnp.zeros((64, 64)), n_lo=5, n_hi=50)
    assert dt >= 0.0
    assert dt < 0.1  # a 64x64 fma is far below 100 ms/iter on any backend


def test_scan_timer_scales_with_work():
    small = scan_timer(lambda x: jnp.tanh(x @ x), jnp.ones((32, 32)) * 0.01,
                       n_lo=5, n_hi=80)
    big = scan_timer(lambda x: jnp.tanh(x @ x), jnp.ones((512, 512)) * 0.01,
                     n_lo=5, n_hi=80)
    assert big > small * 2  # 4096x the matmul FLOPs must cost visibly more


def test_dispatch_latency_finite():
    lat = dispatch_latency(repeats=3)
    assert 0.0 <= lat < 10.0


def test_datagen_256_stretch_shape():
    """BASELINE.md stretch config: 256x256 lattices render correctly."""
    from toycrystals_tpu.data import LatticeConfig, generate_batch

    cfg = LatticeConfig(img_size=256, rot_only=True)
    x, y_cat, y_cont = generate_batch(cfg, seed=0, idx=np.arange(4))
    assert x.shape == (4, 256, 256, 1)
    xs = np.asarray(x)
    assert xs.min() >= 0.0 and xs.max() <= 1.0
    assert xs.max() > 0.9  # per-image max-normalised
    # 256x256 at a=10 has ~16x the atoms of 64x64 — mean intensity comparable
    assert 0.02 < xs.mean() < 0.6
