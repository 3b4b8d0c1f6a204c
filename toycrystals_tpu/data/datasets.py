"""Dataset sources: on-device procedural batches and a disk-backed archive.

The reference exposes two torch Datasets (`data.py:153-221`,
`disk_data.py:8-31`). Here the primary path is TPU-native: a whole batch of
lattices is generated and rasterized *on device* per training step (no files),
by vmapping the static-shape geometry of `lattice.py` over folded-in item keys
and rendering with the batched rasterizer. An indexable `ToyCrystalsDataset`
and an npz-backed `ToyCrystalsDiskDataset` keep the reference's CLI surface
(build_dataset / disk training) working identically.

Item layout matches the reference: x float32 [H, W, 1] in [0, 1] (NHWC, the
TPU-native layout, vs the reference's [1, H, W]), y_cat int32, y_cont [4]
float32 (`data.py:212-221`).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from toycrystals_tpu.data.lattice import (
    LatticeConfig,
    PointBudget,
    generate_item,
    static_point_budget,
)
from toycrystals_tpu.data.rasterize import rasterize_batch


@partial(jax.jit, static_argnums=(0, 1, 4))
def _generate_batch_seeded(
    cfg: LatticeConfig, budget: PointBudget, seed: jax.Array, idx: jax.Array, backend: str
) -> tuple[jax.Array, jax.Array, jax.Array]:
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(seed), i))(idx)
    points, weights, sigma, y_cat, y_cont, _ = jax.vmap(
        lambda k: generate_item(cfg, budget, k)
    )(keys)
    x = rasterize_batch(points, weights, sigma, cfg.img_size, cfg.img_size, backend)
    return x[..., None], y_cat, y_cont


def generate_batch(
    cfg: LatticeConfig,
    seed: int,
    idx: jax.Array,
    budget: PointBudget | None = None,
    backend: str = "auto",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Render the items at dataset indices `idx` fully on device.

    Deterministic per (seed, idx) — the contract of `data.py:171-172`.
    Returns (x [B, H, W, 1] in [0,1], y_cat [B] int32, y_cont [B, 4] float32).
    """
    if budget is None:
        budget = static_point_budget(cfg)
    idx = jnp.asarray(idx, dtype=jnp.int32)
    return _generate_batch_seeded(cfg, budget, jnp.uint32(seed), idx, backend)


class ToyCrystalsDataset:
    """Indexable procedural dataset (mirrors `data.py:153-221`'s surface).

    Items are deterministically generated from (seed, idx). `__getitem__`
    renders one item (host-convenient, used by preview/build CLIs); bulk
    consumers should call `.batch(idx)` which renders whole batches on device.
    """

    def __init__(
        self,
        n_samples: int = 50_000,
        img_size: int = 64,
        seed: int = 0,
        n_types: int = 4,
        simple: bool = False,
        rot_only: bool = False,
    ) -> None:
        self.n_samples = int(n_samples)
        self.seed = int(seed)
        self.cfg = LatticeConfig(
            img_size=int(img_size),
            n_types=int(n_types),
            simple=bool(simple),
            rot_only=bool(rot_only),
        )
        self.budget = static_point_budget(self.cfg)

    def __len__(self) -> int:
        return self.n_samples

    def batch(self, idx, backend: str = "auto"):
        return generate_batch(self.cfg, self.seed, jnp.asarray(idx), self.budget, backend)

    def __getitem__(self, idx: int):
        x, y_cat, y_cont = self.batch(jnp.asarray([idx]))
        return x[0], y_cat[0], y_cont[0]


def load_archive(path: str | Path) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load a dataset archive as (x_u8 [N,H,W,1] NHWC, y_cat i32, y_cont f32).

    Accepts BOTH archive formats:
    - our `.npz` written by `scripts/build_dataset.py` (NHWC u8), and
    - the reference's `.pt` torch dict written by its build_dataset.py
      (`/root/reference/scripts/build_dataset.py:28-41`:
      `{x_u8 [N,1,H,W] u8, y_cat [N] i64, y_cont [N,4] f32}`, NCHW) — so a
      migrating user's prebuilt archive trains here unmodified.

    Format is sniffed from the file, not the extension: both formats are
    zips, but an npz carries an `x_u8.npy` member while a torch archive
    carries `data.pkl` (legacy torch saves aren't zips at all). Sniffing
    the member list — instead of try-npz-except-torch — keeps a corrupted
    or partially-written npz surfacing its REAL npz error rather than a
    confusing torch-parse failure.
    """
    import zipfile

    p = Path(path)
    is_npz = False
    try:
        with zipfile.ZipFile(p) as zf:
            is_npz = any(n.endswith("x_u8.npy") for n in zf.namelist())
    except (zipfile.BadZipFile, OSError):
        is_npz = False  # legacy (non-zip) torch pickle, or not an archive
    if is_npz:
        obj = np.load(p)
        x_u8 = np.asarray(obj["x_u8"])
        y_cat = np.asarray(obj["y_cat"])
        y_cont = np.asarray(obj["y_cont"])
    else:
        from toycrystals_tpu.utils.torch_interop import _torch_load

        obj = _torch_load(str(p))
        if not isinstance(obj, dict) or "x_u8" not in obj:
            raise ValueError(
                f"{p}: not a dataset archive (expected .npz with x_u8/y_cat/"
                "y_cont or a reference torch dict with the same keys)"
            ) from None
        x_u8 = obj["x_u8"].numpy()
        y_cat = obj["y_cat"].numpy()
        y_cont = obj["y_cont"].numpy()
    if x_u8.ndim == 4 and x_u8.shape[1] == 1 and x_u8.shape[-1] != 1:
        x_u8 = np.transpose(x_u8, (0, 2, 3, 1))  # NCHW (reference) -> NHWC
    elif x_u8.ndim == 3:
        x_u8 = x_u8[..., None]
    return (
        np.ascontiguousarray(x_u8),
        y_cat.astype(np.int32),
        y_cont.astype(np.float32),
    )


class ToyCrystalsDiskDataset:
    """Loads a prebuilt archive written by scripts/build_dataset.py.

    Stored images are uint8 in [0, 255] (same space-saving contract as
    `disk_data.py:8-31`); returned images are float32 in [0, 1], NHWC.
    The file is a .npz with keys x_u8 [N,H,W,1], y_cat [N], y_cont [N,4] —
    or the reference's `.pt` torch dict (see `load_archive`).
    """

    def __init__(self, path: str | Path) -> None:
        self.x_u8, self.y_cat, self.y_cont = load_archive(path)

    def __len__(self) -> int:
        return int(self.x_u8.shape[0])

    def __getitem__(self, idx: int):
        x = self.x_u8[idx].astype(np.float32) / 255.0
        return x, self.y_cat[idx], self.y_cont[idx]

    def as_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return (
            self.x_u8.astype(np.float32) / 255.0,
            self.y_cat,
            self.y_cont,
        )


def batch_iterator(
    n: int,
    batch_size: int,
    *,
    rng: np.random.Generator | None = None,
    shuffle: bool = True,
    drop_last: bool = True,
):
    """Yield index arrays covering [0, n) — the DataLoader-equivalent.

    Shuffling happens on host over indices only; actual data stays on device
    (procedural) or in one resident array (disk).
    """
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        yield order[start : start + batch_size]
