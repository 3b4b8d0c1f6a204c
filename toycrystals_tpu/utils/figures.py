"""Matplotlib figure grids matching the reference's committed conventions.

Grid layouts, titles, vmin/vmax and dpi=200 follow the four figure writers in
the reference: recon pairs (`train_vae.py:39-73`), 6x6 condition grids
(`train_vae.py:76-111`, `train_diffusion_prior.py:61-105`,
`sde_score_model.py:301-355`) and loss curves (`train_vae.py:349-358` et al.).
Figure generation is host-side; images arrive as [N, H, W(, 1)] in [0, 1].
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _to_hw(img) -> np.ndarray:
    arr = np.asarray(img)
    if arr.ndim == 3:
        arr = arr[..., 0] if arr.shape[-1] == 1 else arr[0]
    return arr


def _ensure_dir(path: str | Path) -> Path:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    return p


def save_image_grid(
    images,
    out_path: str | Path,
    nrows: int = 6,
    ncols: int = 6,
    titles: Sequence[str] | None = None,
    suptitle: str | None = None,
    figsize: tuple[float, float] | None = None,
    title_fontsize: int = 7,
    dpi: int | None = None,
) -> None:
    """6x6-style grid, grayscale, vmin=0 vmax=1.

    dpi defaults to the reference's 200 (`train_vae.py:101` etc.) — enough
    for 64px tiles (~180px each on the figure). For larger tiles it scales
    so each stored tile keeps >= its native resolution: at dpi 200 a 256px
    tile is downsampled to ~180px in the png, which measurably depresses
    the fidelity scores of committed 256 grids (real 256 data: 0.867
    in-memory -> 0.837 through a dpi-200 png; benchmarks/NOTES.md).

    `out_path` may be a filesystem path or a binary file-like object
    (PNG bytes; used by the serving front-end, toycrystals_tpu/serve.py)."""
    if not hasattr(out_path, "write"):
        out_path = _ensure_dir(out_path)
    images = np.asarray(images)
    if dpi is None:
        tile_px = int(_to_hw(images[0]).shape[0]) if len(images) else 64
        # each tile occupies ~0.9 inch of the default 1-inch-per-tile figure
        dpi = max(200, int(tile_px / 0.88))
    fig, axes = plt.subplots(nrows, ncols, figsize=figsize or (ncols, nrows))
    if suptitle:
        fig.suptitle(suptitle, fontsize=10)
    for i, ax in enumerate(np.asarray(axes).flat):
        if i < len(images):
            ax.imshow(_to_hw(images[i]), cmap="gray", vmin=0.0, vmax=1.0)
            if titles is not None and i < len(titles) and titles[i]:
                ax.set_title(titles[i], fontsize=title_fontsize)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)


def save_recon_grid(x, x_hat, y_cat, out_path: str | Path, n_pairs: int = 16) -> None:
    """4x8 grid of (X, X_hat) pairs with type titles (`train_vae.py:39-73`)."""
    out_path = _ensure_dir(out_path)
    x = np.asarray(x)
    x_hat = np.asarray(x_hat)
    y_cat = np.asarray(y_cat)
    n = min(n_pairs, x.shape[0])
    fig, axes = plt.subplots(4, 8, figsize=(8, 4))
    axes = list(np.asarray(axes).flat)
    for i in range(n):
        t = int(y_cat[i])
        axes[2 * i].imshow(_to_hw(x[i]), cmap="gray", vmin=0.0, vmax=1.0)
        axes[2 * i].set_title(f"X (type={t})")
        axes[2 * i].axis("off")
        axes[2 * i + 1].imshow(_to_hw(x_hat[i]), cmap="gray", vmin=0.0, vmax=1.0)
        axes[2 * i + 1].set_title(f"X̂ (type={t})")
        axes[2 * i + 1].axis("off")
    for ax in axes[2 * n :]:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=200)
    plt.close(fig)


def save_loss_curves(hists: dict[str, Sequence[float]], out_path: str | Path) -> None:
    """Loss-curve png: one labelled line per history (`train_vae.py:349-358`)."""
    out_path = _ensure_dir(out_path)
    fig = plt.figure(figsize=(5, 3))
    for name, hist in hists.items():
        plt.plot(list(hist), label=name)
    plt.xlabel("epoch")
    plt.ylabel("loss")
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_path, dpi=200)
    plt.close(fig)


def type_titles(y_cat) -> list[str]:
    return [f"t={int(t)}" for t in np.asarray(y_cat)]
