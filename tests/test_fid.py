"""Latent-FID (crystal-FID) metric tests — `toycrystals_tpu/utils/fid.py`.

Analytic Fréchet-distance identities, estimator invariances, and the
end-to-end discrimination property (real vs noise) with a tiny VAE
feature extractor. The reference has no quantitative sample metric at all
(`/root/reference/README.md:21-85`); these tests pin OUR metric's math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.data.lattice import LatticeConfig
from toycrystals_tpu.data.datasets import generate_batch
from toycrystals_tpu.models import VAE
from toycrystals_tpu.utils.fid import (
    compute_fid,
    encode_features,
    fid_floor,
    frechet_distance,
    gaussian_stats,
    reference_stats,
)

RNG = np.random.default_rng(0)


def test_identical_stats_zero():
    f = RNG.normal(size=(500, 8))
    mu, cov = gaussian_stats(f)
    assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-9)


def test_mean_shift_analytic():
    # Same covariance, shifted mean: FID == ||dmu||^2 exactly.
    mu = np.zeros(6)
    cov = np.diag(np.linspace(0.5, 2.0, 6))
    d = np.arange(6, dtype=np.float64) / 3.0
    assert frechet_distance(mu, cov, mu + d, cov) == pytest.approx(
        float(d @ d), rel=1e-10
    )


def test_isotropic_scale_analytic():
    # N(0, a^2 I) vs N(0, b^2 I) in D dims: FID == D (a - b)^2.
    D, a, b = 5, 1.3, 0.4
    z = np.zeros(D)
    assert frechet_distance(z, a**2 * np.eye(D), z, b**2 * np.eye(D)) == pytest.approx(
        D * (a - b) ** 2, rel=1e-10
    )


def test_rotation_invariance():
    # Rotating BOTH feature sets by the same orthogonal map preserves FID.
    f1 = RNG.normal(size=(400, 7)) @ np.diag(np.linspace(1, 2, 7))
    f2 = RNG.normal(size=(400, 7)) + 0.5
    q, _ = np.linalg.qr(RNG.normal(size=(7, 7)))
    fid = frechet_distance(*gaussian_stats(f1), *gaussian_stats(f2))
    fid_rot = frechet_distance(*gaussian_stats(f1 @ q), *gaussian_stats(f2 @ q))
    assert fid_rot == pytest.approx(fid, rel=1e-8)


def test_symmetry_and_nonnegativity():
    f1 = RNG.normal(size=(300, 4)) * 2.0
    f2 = RNG.normal(size=(300, 4)) + 1.0
    s1, s2 = gaussian_stats(f1), gaussian_stats(f2)
    a = frechet_distance(*s1, *s2)
    b = frechet_distance(*s2, *s1)
    assert a >= 0.0
    assert a == pytest.approx(b, rel=1e-8)


def test_degenerate_covariance_no_nan():
    # Rank-deficient covariance (constant feature) must not produce NaN.
    f1 = RNG.normal(size=(100, 3))
    f1[:, 2] = 1.0
    f2 = RNG.normal(size=(100, 3))
    fid = frechet_distance(*gaussian_stats(f1), *gaussian_stats(f2))
    assert np.isfinite(fid) and fid >= 0.0


@pytest.fixture(scope="module")
def tiny_extractor():
    """Random-init tiny VAE as the feature map (no training needed: a fixed
    random conv encoder is still a locality-sensitive projection — enough
    for the discrimination tests)."""
    model = VAE(z_dim=8)
    x0 = jnp.zeros((1, 32, 32, 1))
    params = model.init(
        {"params": jax.random.key(7), "reparam": jax.random.key(0)}, x0
    )["params"]
    return model, params


def test_encode_features_deterministic_shape(tiny_extractor):
    model, params = tiny_extractor
    x = jnp.asarray(RNG.uniform(size=(10, 32, 32, 1)), jnp.float32)
    f1 = encode_features(model, params, x, batch_size=4)
    f2 = encode_features(model, params, x, batch_size=10)
    assert f1.shape == (10, 8)
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-6)


def test_fid_discriminates_real_from_noise(tiny_extractor):
    model, params = tiny_extractor
    cfg = LatticeConfig(img_size=32, rot_only=True)
    ref = reference_stats(model, params, cfg=cfg, n=256, seed=11, batch_size=128)

    real2, _, _ = generate_batch(cfg, 999, jnp.arange(192))
    fid_real = compute_fid(real2, model, params, ref_stats=ref)

    noise = jnp.asarray(RNG.uniform(size=(192, 32, 32, 1)), jnp.float32)
    fid_noise = compute_fid(noise, model, params, ref_stats=ref)

    assert fid_noise > 5.0 * fid_real, (fid_real, fid_noise)


def test_fid_floor_below_collapse(tiny_extractor):
    # The same-N real-vs-real floor must sit far below a mode-collapsed set
    # (one image repeated) — the failure mode the FFT metric cannot see.
    model, params = tiny_extractor
    cfg = LatticeConfig(img_size=32, rot_only=True)
    ref = reference_stats(model, params, cfg=cfg, n=256, seed=11, batch_size=128)
    n = 64
    floor = fid_floor(model, params, n, ref, cfg=cfg)
    one, _, _ = generate_batch(cfg, 5, jnp.arange(1))
    collapsed = jnp.tile(one, (n, 1, 1, 1))
    fid_collapsed = compute_fid(collapsed, model, params, ref_stats=ref)
    assert fid_collapsed > 10.0 * max(floor, 1e-6), (floor, fid_collapsed)


def test_load_feature_extractor_rejects_conditional(tmp_path):
    from toycrystals_tpu.utils.checkpoint import save_checkpoint
    from toycrystals_tpu.utils.fid import load_feature_extractor

    p = tmp_path / "cond.msgpack"
    save_checkpoint(p, {"params": {}, "config": {"uncond": False, "z_dim": 16}})
    with pytest.raises(ValueError, match="UNCONDITIONAL"):
        load_feature_extractor(p)


def test_load_feature_extractor_roundtrip(tmp_path, tiny_extractor):
    from toycrystals_tpu.utils.checkpoint import save_checkpoint
    from toycrystals_tpu.utils.fid import load_feature_extractor

    model, params = tiny_extractor
    p = tmp_path / "feat.msgpack"
    save_checkpoint(
        p,
        {
            "params": params,
            "config": {"uncond": True, "z_dim": 8, "img_size": 32},
        },
    )
    m2, p2, cfg = load_feature_extractor(p)
    x = jnp.asarray(RNG.uniform(size=(4, 32, 32, 1)), jnp.float32)
    np.testing.assert_allclose(
        encode_features(model, params, x),
        encode_features(m2, p2, x),
        rtol=1e-6,
    )
    assert cfg["z_dim"] == 8


def test_committed_extractor_is_healthy():
    """The SHIPPED extractor asset must discriminate — this is the test that
    was missing when round 2 committed a posterior-collapsed checkpoint whose
    FID scored everything (including shuffled-pixel garbage) 0.0. Loads the
    actual committed artifact, not a fixture.
    """
    from pathlib import Path

    from toycrystals_tpu.utils.fid import load_feature_extractor

    asset = Path(__file__).resolve().parent.parent / "assets/eval/feature_vae_z16.msgpack"
    if not asset.exists():
        pytest.skip("committed extractor asset absent")
    # load_feature_extractor itself probes for collapse (check=True default);
    # assert the guard's property directly too, with independent draws.
    model, params, cfg = load_feature_extractor(asset)
    x, _, _ = generate_batch(
        LatticeConfig(img_size=int(cfg["img_size"]), rot_only=True),
        31337, jnp.arange(128),
    )
    f = encode_features(model, params, x)
    assert float(np.std(f, axis=0).mean()) > 0.05, "features barely vary"

    ref = reference_stats(model, params, n=512, seed=2024, batch_size=128)
    floor = fid_floor(model, params, 36, ref)
    noise = jnp.asarray(RNG.uniform(size=(36, 64, 64, 1)), jnp.float32)
    fid_noise = compute_fid(noise, model, params, ref_stats=ref)
    assert floor > 0.0, "real-vs-real floor at n=36 must be nonzero"
    assert fid_noise > 5.0 * floor, (floor, fid_noise)


def test_eval_cli_grid_fid(tmp_path):
    """End-to-end: eval CLI scores a committed-convention grid png with
    --fid-vae; a real-lattice grid must land near the FID floor."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    from toycrystals_tpu.utils.checkpoint import save_checkpoint
    from toycrystals_tpu.utils.figures import save_image_grid

    cfg = LatticeConfig(img_size=64, rot_only=True)
    x, _, _ = generate_batch(cfg, 42, jnp.arange(16))
    grid = tmp_path / "grid.png"
    save_image_grid(np.asarray(x), grid, nrows=4, ncols=4, suptitle="t")

    model = VAE(z_dim=8)
    params = model.init(
        {"params": jax.random.key(3), "reparam": jax.random.key(0)},
        jnp.zeros((1, 64, 64, 1)),
    )["params"]
    feat = tmp_path / "feat.msgpack"
    save_checkpoint(
        feat, {"params": params,
               "config": {"uncond": True, "z_dim": 8, "img_size": 64}})

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(
        [sys.executable, str(repo / "scripts" / "eval_sde_score_model.py"),
         "--device", "cpu", "--grid", str(grid), "--grid-rows", "4",
         "--grid-cols", "4", "--fid-vae", str(feat), "--fid-ref-n", "128"],
        capture_output=True, text=True, timeout=900, env=env, cwd=tmp_path)
    assert r.returncode == 0, f"{r.stdout}\n{r.stderr}"
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert "fid" in out and "fid_floor" in out
    assert np.isfinite(out["fid"]) and out["fid"] >= 0.0
    # a real-data grid is in-distribution: within a few floors of 0
    assert out["fid"] < 25.0 * max(out["fid_floor"], 1e-3), out
