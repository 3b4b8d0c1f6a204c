#!/usr/bin/env python3
"""Export a score-model checkpoint as a self-contained AOT artifact.

The reference's only deployment unit is "the .pt plus the source tree"
(`/root/reference/scripts/sample_sde_score_model.py:19-135` rebuilds the
model from code per use). This CLI packages the COMPILED sampler instead
(`toycrystals_tpu/export.py`, via jax.export/StableHLO): weights baked as
constants, sampler/steps/CFG frozen, callable on any host with jax — no
model code, no checkpoint, no this-package.

  # package the serving config (auto-resolved like serve/eval) at batch 36
  python scripts/export_sde_score_model.py --ckpt <ckpt> --out model.tcx

  # cross-platform module: lower once, run on TPU serving hosts or CPU
  python scripts/export_sde_score_model.py --ckpt <ckpt> --out model.tcx \
      --platform tpu --platform cpu

  # consume (3 lines, anywhere):
  #   from toycrystals_tpu.export import load_exported   # or inline the
  #   exp, meta = load_exported("model.tcx")             # 20-line loader
  #   x = exp.call(y_cat, y_cont, seed)                  # [B,H,W,1] in [0,1]

`--selftest` round-trips the artifact in-process and checks it reproduces
the live service's samples exactly.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

from _common import select_device  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    p.add_argument("--ckpt", required=True,
                   help="Score-model checkpoint (.msgpack, orbax dir, or a "
                        "reference .pt).")
    p.add_argument("--out", required=True, help="Artifact path (.tcx).")
    p.add_argument("--batch", type=int, default=36,
                   help="Static batch shape to export (default 36 = the "
                        "committed 6x6 grid). One artifact per shape, like "
                        "the serving buckets.")
    p.add_argument("--platform", action="append", default=None,
                   metavar="PLAT", choices=["tpu", "cpu", "cuda"],
                   help="Lowering platform(s); repeatable. Default: the "
                        "current backend. Multi-platform modules run on any "
                        "listed backend (configs that auto-select the Pallas "
                        "flash-attention kernel are tpu-only).")
    # serving knobs: None resolves from the checkpoint exactly like serving
    p.add_argument("--sampler", default=None,
                   choices=["ode", "sde", "dpm", "ddim", "rf"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--cfg", type=float, default=None)
    p.add_argument("--t-end", type=float, default=None)
    p.add_argument("--use-ema", type=int, default=1, choices=[0, 1])
    p.add_argument("--clip-x0", type=int, default=0, choices=[0, 1])
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--attn-impl", default="auto",
                   choices=["auto", "xla", "flash"])
    p.add_argument("--selftest", action="store_true",
                   help="After writing, reload the artifact and check its "
                        "output matches the live service (atol 1e-4; bitwise "
                        "on TPU in practice — runs one sampling dispatch and "
                        "needs a backend the module was lowered for).")
    p.add_argument("--seed", type=int, default=0, help="--selftest seed.")
    p.add_argument("--theta-max", type=float, default=math.pi / 3.0,
                   help="--selftest grid conditions sweep.")
    args = p.parse_args()
    select_device(args.device)

    if not os.path.exists(args.ckpt):
        raise FileNotFoundError(args.ckpt)

    from toycrystals_tpu.export import (
        export_meta,
        export_service,
        load_exported,
        save_exported,
    )
    from toycrystals_tpu.serve import ScoreModelService

    service = ScoreModelService(
        args.ckpt, use_ema=bool(args.use_ema), sampler=args.sampler,
        steps=args.steps, guidance_scale=args.cfg, t_end=args.t_end,
        clip_x0=bool(args.clip_x0), dtype=args.dtype,
        attn_impl=args.attn_impl,
    )
    print(f"exporting: sampler={service.sampler_name} steps={service.steps} "
          f"cfg={service.guidance_scale} t_end={service.t_end} "
          f"batch={args.batch} platforms={args.platform or 'native'}",
          file=sys.stderr)
    exported = export_service(service, args.batch, args.platform)
    meta = export_meta(service, args.batch, exported)
    save_exported(args.out, exported, meta)
    size_mb = os.path.getsize(args.out) / 1e6

    if args.selftest:
        import numpy as np

        from toycrystals_tpu.models.sde_score_model import sample_grid_conditions

        exp, meta2 = load_exported(args.out)
        y_cat, y_cont = sample_grid_conditions(
            args.batch, service.n_types, service.y_cont_dim, args.theta_max)
        y_cat = np.asarray(y_cat, np.int32)
        y_cont = np.asarray(y_cont, np.float32)
        got = np.asarray(exp.call(y_cat, y_cont, np.int32(args.seed)))
        fn = service.sampler_callable(args.batch)
        import jax

        want = np.asarray(jax.jit(fn)(service.params, y_cat, y_cont,
                                      np.int32(args.seed)))
        # same program + same draws; baking weights as constants lets XLA
        # re-fuse float chains (bitwise on TPU, ~1e-5 max on CPU)
        np.testing.assert_allclose(got, want, atol=1e-4)
        print(f"selftest: artifact == live service on {args.batch} samples "
              f"(seed {args.seed}, atol 1e-4)", file=sys.stderr)

    print(json.dumps({"out": args.out, "size_mb": round(size_mb, 2), **meta}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
