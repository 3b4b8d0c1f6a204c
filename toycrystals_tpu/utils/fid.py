"""Latent-space Fréchet distance (crystal-FID) — diversity-aware quality.

The FFT-template fidelity metric (`utils/fidelity.py`) scores STRUCTURE and
CONDITIONING per sample, but it is blind to diversity: a sampler that mode-
collapses onto one perfect lattice per condition would ace cond_fidelity.
The standard fix in generative modelling is the Fréchet distance between
feature-space Gaussians fitted to real and generated sets (FID, Heusel et
al. 2017). There is no Inception net for crystal images, but this framework
OWNS both the exact data generator and a trained domain autoencoder — so:

- features   = the encoder mean of an UNCONDITIONAL VAE trained on the same
  procedural distribution (`models/vae.py:VAE`, `scripts/train_vae.py
  --uncond`); a committed extractor checkpoint makes scores reproducible
  across machines (`assets/eval/feature_vae_z16.msgpack`);
- real stats = an arbitrarily large deterministic procedural draw
  (`data/datasets.py:generate_batch`; the reference's generator has the same
  unlimited-real-data property, `data.py:153-221`, it just never exploits
  it for evaluation — the reference has NO quantitative metric at all,
  `README.md:21-85`).

FID here is computed in the VAE's z-space (default z_dim=16), so a few
hundred generated samples already give stable estimates (16x16 covariances),
unlike the 2048-dim Inception FID that needs tens of thousands. The
estimator is still biased at small N (Chong & Forte 2020); `fid_floor`
reports FID(real, real') at the same N so every score ships with its own
noise floor.

Math: FID = ||mu1-mu2||^2 + tr(C1 + C2 - 2 (C1^{1/2} C2 C1^{1/2})^{1/2}),
computed with symmetric-eigendecomposition PSD square roots in float64
(no scipy dependency; eigenvalues clipped at 0 against round-off).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from toycrystals_tpu.data.lattice import LatticeConfig
from toycrystals_tpu.data.datasets import generate_batch

__all__ = [
    "gaussian_stats",
    "frechet_distance",
    "load_feature_extractor",
    "encode_features",
    "reference_stats",
    "compute_fid",
    "fid_floor",
]


def gaussian_stats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[N, D] features -> (mean [D], covariance [D, D]) in float64."""
    f = np.asarray(feats, dtype=np.float64)
    if f.ndim != 2 or f.shape[0] < 2:
        raise ValueError(f"need [N>=2, D] features, got shape {f.shape}")
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(cov)


def _psd_sqrt(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigendecomposition (f64, clipped)."""
    sym = (mat + mat.T) / 2.0
    w, v = np.linalg.eigh(sym)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)) @ v.T


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """Fréchet distance between two Gaussians, >= 0, 0 iff identical."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    cov1 = np.atleast_2d(np.asarray(cov1, np.float64))
    cov2 = np.atleast_2d(np.asarray(cov2, np.float64))
    diff = mu1 - mu2
    s1 = _psd_sqrt(cov1)
    inner = _psd_sqrt(s1 @ cov2 @ s1)
    fid = float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(inner))
    # round-off can leave a tiny negative residue when the gap is ~0
    return max(fid, 0.0)


def load_feature_extractor(path: str | Path, check: bool = True):
    """Load an UNCONDITIONAL VAE checkpoint as (model, params, config).

    Expects the `scripts/train_vae.py --uncond` checkpoint layout
    (`{"params": ..., "config": {...}}`); rejects conditional checkpoints —
    conditioning leaking into the features would hide conditioning errors
    from the metric.

    With `check=True` (default) the loaded encoder is probed for posterior
    collapse: a small deterministic procedural draw must produce features
    whose per-dim std is materially non-zero. A collapsed encoder maps every
    input to the same mean, so FID(anything, anything) = 0 and the metric is
    a dead instrument — better to refuse to load than to publish perfect
    scores from it.
    """
    from toycrystals_tpu.models import VAE
    from toycrystals_tpu.utils.checkpoint import load_checkpoint

    raw = load_checkpoint(path)
    cfg = raw.get("config", {})
    if not cfg.get("uncond", False):
        raise ValueError(
            f"{path}: FID feature extractor must be an UNCONDITIONAL VAE "
            "(train one with scripts/train_vae.py --uncond); this checkpoint "
            "is conditional."
        )
    img_size = int(cfg.get("img_size", 64))
    model = VAE(z_dim=int(cfg.get("z_dim", 16)))
    x0 = jnp.zeros((1, img_size, img_size, 1))
    target = model.init(
        {"params": jax.random.key(0), "reparam": jax.random.key(0)}, x0
    )["params"]
    params = jax.tree.map(
        lambda t, r: jnp.asarray(r, t.dtype),
        target,
        jax.tree.map(jnp.asarray, raw["params"]),
    )
    if check:
        probe_cfg = LatticeConfig(img_size=img_size, rot_only=True)
        probe, _, _ = generate_batch(probe_cfg, 7, jnp.arange(16))
        f = encode_features(model, params, probe, batch_size=16)
        if float(np.std(f, axis=0).mean()) < 1e-3:
            raise ValueError(
                f"{path}: feature extractor is posterior-collapsed — encoder "
                "means are (near-)constant across a 16-image probe batch, so "
                "every FID would score ~0. Retrain the unconditional VAE "
                "until encoder features vary with the input (check per-dim "
                "mu std during training)."
            )
    return model, params, cfg


@partial(jax.jit, static_argnums=0)
def _encode_mu(model_static, params, x):
    mu, _ = model_static.apply({"params": params}, x, method="encode")
    return mu


def encode_features(
    model, params, images, batch_size: int = 512
) -> np.ndarray:
    """[N, H, W, 1] images in [0, 1] -> encoder-mean features [N, z_dim].

    Deterministic (encoder mean, no reparameterisation noise). Batched to
    keep single dispatches small on the tunneled chip. The jitted encoder is
    module-level (static model as a hashable aux arg) so repeated calls —
    e.g. `reference_stats`' per-512-batch loop — hit the jit cache instead of
    retracing a fresh closure each call.
    """
    images = jnp.asarray(images, jnp.float32)
    if images.ndim == 3:
        images = images[..., None]

    out = []
    for i in range(0, images.shape[0], batch_size):
        out.append(np.asarray(_encode_mu(model, params, images[i : i + batch_size])))
    return np.concatenate(out, axis=0)


def reference_stats(
    model,
    params,
    cfg: LatticeConfig | None = None,
    n: int = 4096,
    seed: int = 1234,
    batch_size: int = 512,
) -> tuple[np.ndarray, np.ndarray]:
    """Real-distribution Gaussian stats from a deterministic procedural draw.

    (seed, idx) determinism (`data.py:171-172` contract) makes the real set
    — hence the stats — bit-reproducible across machines.
    """
    cfg = cfg or LatticeConfig(img_size=64, rot_only=True)
    feats = []
    for i in range(0, n, batch_size):
        idx = jnp.arange(i, min(i + batch_size, n))
        x, _, _ = generate_batch(cfg, seed, idx)
        feats.append(encode_features(model, params, x, batch_size=batch_size))
    return gaussian_stats(np.concatenate(feats, axis=0))


def compute_fid(
    gen_images,
    model,
    params,
    ref_stats: tuple[np.ndarray, np.ndarray] | None = None,
    cfg: LatticeConfig | None = None,
    n_ref: int = 4096,
    seed: int = 1234,
) -> float:
    """FID between generated images and the procedural real distribution."""
    if ref_stats is None:
        ref_stats = reference_stats(model, params, cfg=cfg, n=n_ref, seed=seed)
    gstats = gaussian_stats(encode_features(model, params, gen_images))
    return frechet_distance(*gstats, *ref_stats)


def fid_floor(
    model,
    params,
    n: int,
    ref_stats: tuple[np.ndarray, np.ndarray],
    cfg: LatticeConfig | None = None,
    seed: int = 97531,
) -> float:
    """FID(real draw of size n, large real stats): the small-N noise floor.

    Any generated-set score at the same n should be read relative to this —
    at n=36 (one canonical grid) the floor is substantial; by n~512 it is
    small. Uses a seed disjoint from `reference_stats`'s so the floor draw
    is independent of the reference draw.
    """
    cfg = cfg or LatticeConfig(img_size=64, rot_only=True)
    x, _, _ = generate_batch(cfg, seed, jnp.arange(n))
    gstats = gaussian_stats(encode_features(model, params, x))
    return frechet_distance(*gstats, *ref_stats)
