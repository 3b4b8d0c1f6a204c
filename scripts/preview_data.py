#!/usr/bin/env python3
"""6x6 preview grid of the full-variability dataset.

Mirrors `/root/reference/scripts/preview_data.py:8-32`: simple=False,
rot_only=False, titles show the lattice type, saved to
results/preview_toycrystals.png at dpi=200.
"""

from __future__ import annotations

import argparse

from _common import select_device  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--out", type=str, default="results/preview_toycrystals.png")
    p.add_argument("--img-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    select_device(args.device)

    import jax.numpy as jnp

    from toycrystals_tpu.data import LatticeConfig, generate_batch
    from toycrystals_tpu.utils.figures import save_image_grid

    cfg = LatticeConfig(img_size=args.img_size, n_types=4)
    x, y_cat, _ = generate_batch(cfg, seed=args.seed, idx=jnp.arange(36))
    save_image_grid(
        x,
        args.out,
        titles=[f"type={int(t)}" for t in y_cat],
        title_fontsize=8,
    )
    print(f"Saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
