#!/usr/bin/env python3
"""Materialise the procedural dataset to a .npz (or reference .pt) archive.

Same flag surface and artefact contract as the reference
(`/root/reference/scripts/build_dataset.py:12-47`): u8-quantised images +
labels, deterministic per (seed, idx). The reference runs a serial Python
loop over 50k items (its biggest CPU bottleneck, SURVEY.md §3.1); here whole
batches are generated and rasterized on device and only the u8 quantisation
crosses back to host.

Note: on TPU the disk archive is optional — the trainers accept --procedural
to render batches straight into HBM each step.
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from _common import select_device  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="data/toycrystals_train_rotonly.npz")
    p.add_argument("--n-samples", type=int, default=50_000)
    p.add_argument("--img-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-types", type=int, default=4)
    p.add_argument("--simple", default=False, action="store_true")
    p.add_argument("--rot-only", default=True, action="store_true")
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--batch-size", type=int, default=2048, help="on-device generation batch")
    p.add_argument("--format", type=str, default=None, choices=["npz", "pt"],
                   help="Archive format: npz (ours, default) or pt — the "
                        "reference's torch dict {x_u8 [N,1,H,W] u8, y_cat "
                        "i64, y_cont f32} (`/root/reference/scripts/"
                        "build_dataset.py:28-41`), so a dataset built here "
                        "feeds the reference's own trainers unmodified (the "
                        "reverse direction — its .pt loading here — is "
                        "data/datasets.py:load_archive). Default: inferred "
                        "from --out's extension.")
    args = p.parse_args()
    if args.format is None:
        args.format = "pt" if args.out.endswith(".pt") else "npz"
    if args.format == "pt":
        # fail in milliseconds, not after minutes of on-device generation
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise SystemExit(f"--format pt needs torch installed: {e}")
    select_device(args.device)

    import jax.numpy as jnp

    from toycrystals_tpu.data import LatticeConfig, generate_batch, static_point_budget

    out_path = Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    cfg = LatticeConfig(
        img_size=args.img_size,
        n_types=args.n_types,
        simple=args.simple,
        rot_only=args.rot_only,
    )
    budget = static_point_budget(cfg)

    n = args.n_samples
    x_u8 = np.empty((n, args.img_size, args.img_size, 1), dtype=np.uint8)
    y_cat = np.empty((n,), dtype=np.int32)
    y_cont = np.empty((n, 4), dtype=np.float32)

    t0 = time.perf_counter()
    bs = args.batch_size
    for start in range(0, n, bs):
        stop = min(start + bs, n)
        idx = jnp.arange(start, stop)
        x, yc, yv = generate_batch(cfg, args.seed, idx, budget)
        x_u8[start:stop] = np.asarray(
            jnp.clip(x * 255.0, 0, 255).astype(jnp.uint8)
        )
        y_cat[start:stop] = np.asarray(yc)
        y_cont[start:stop] = np.asarray(yv)
        print(f"{stop}/{n}")

    if args.format == "pt":
        import torch

        # exact reference schema: NCHW u8 images, int64 categories
        torch.save(
            {
                "x_u8": torch.from_numpy(
                    np.ascontiguousarray(np.transpose(x_u8, (0, 3, 1, 2)))
                ),
                "y_cat": torch.from_numpy(y_cat.astype(np.int64)),
                "y_cont": torch.from_numpy(y_cont),
            },
            str(out_path),
        )
    else:
        np.savez_compressed(out_path, x_u8=x_u8, y_cat=y_cat, y_cont=y_cont)
    dt = time.perf_counter() - t0
    print(f"saved {out_path} ({n} items in {dt:.1f}s, {n / dt:.0f} items/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
