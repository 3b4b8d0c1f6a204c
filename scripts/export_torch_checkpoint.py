#!/usr/bin/env python3
"""Export one of our SDE score-model checkpoints to the reference's torch
`.pt` layout (new migration scope; inverse of the `.pt` ingestion on
`sample_sde_score_model.py`).

The output matches `/root/reference/scripts/train_sde_score_model.py:35-54`:
`{"epoch_next", "model": state_dict, "opt": {}, "loss_hist", "config",
["ema"]}` — loadable by the reference's `sample_sde_score_model.py` for a
same-weights cross-framework comparison (the optimiser state does not
convert; see utils/torch_interop.py).

Usage:
  python scripts/export_torch_checkpoint.py \
      --ckpt runs/sde_score/<run>/checkpoints/sde_score_model_last.msgpack \
      --out sde_ref.pt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="path to a .msgpack score-model checkpoint")
    p.add_argument("--out", required=True, help="output .pt path")
    args = p.parse_args()

    import torch

    from toycrystals_tpu.utils import load_checkpoint
    from toycrystals_tpu.utils.torch_interop import torch_state_dict_from_flax_params

    payload = load_checkpoint(args.ckpt)
    if str(payload.get("config", {}).get("stem", "none")) != "none":
        raise SystemExit(
            "this checkpoint was trained with --stem s2d; the reference "
            "architecture has no space-to-depth stem, so there is no torch "
            "layout to export to")
    state = payload["state"]
    obj = {
        "epoch_next": int(payload.get("epoch_next", 0)),
        "model": {k: torch.tensor(v) for k, v in
                  torch_state_dict_from_flax_params(state["params"]).items()},
        "opt": {},
        "loss_hist": [float(v) for v in payload.get("loss_hist", [])],
        "config": dict(payload.get("config", {})),
    }
    if state.get("ema_params") is not None:
        obj["ema"] = {k: torch.tensor(v) for k, v in
                      torch_state_dict_from_flax_params(state["ema_params"]).items()}
    torch.save(obj, args.out)
    print(f"exported {args.ckpt} -> {args.out} "
          f"({'with' if 'ema' in obj else 'no'} EMA)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
