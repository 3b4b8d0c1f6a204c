#!/usr/bin/env python3
"""Overlay two metrics.jsonl loss trajectories (ours vs the reference's
committed run) into one log-scale comparison figure.

Usage:
  python benchmarks/plot_parity.py --ours runs/sde_repro_torchinit/metrics.jsonl \
      --theirs /root/reference/assets/score_based_diffusion/metrics.jsonl \
      --out assets/score_based_diffusion/loss_parity.png
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load(path: str) -> tuple[list[int], list[float]]:
    rows = [json.loads(line) for line in Path(path).read_text().splitlines() if line.strip()]
    return [r["epoch"] for r in rows], [r["loss"] for r in rows]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ours", required=True)
    p.add_argument("--theirs", required=True)
    p.add_argument("--labels", default="toycrystals-tpu,reference")
    p.add_argument("--out", required=True)
    p.add_argument("--title", default="SDE eps-MSE per epoch")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    lab_ours, lab_theirs = args.labels.split(",", 1)
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for path, label, style in ((args.ours, lab_ours, "-"), (args.theirs, lab_theirs, "--")):
        e, l = load(path)
        if not e:
            raise SystemExit(f"error: {path} has no metric rows")
        ax.plot(e, l, style, label=f"{label} (final {l[-1]:.5f})")
    ax.set_yscale("log")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_title(args.title)
    ax.legend()
    ax.grid(alpha=0.3)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.out, dpi=200, bbox_inches="tight")
    print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
