#!/usr/bin/env python3
"""Standalone quantitative evaluation for score-model checkpoints.

The reference judges sample quality entirely by eye (committed 6x6 grids,
`/root/reference/README.md:21-85`); this framework scores grids with the
FFT-template lattice-fidelity metric (`toycrystals_tpu/utils/fidelity.py`).
Until now that metric was only reachable through the benchmark harness
(`benchmarks/run.py --only fidelity`, committed-png scoring). This CLI makes
it a first-class user tool:

  # sample a fresh canonical grid from a checkpoint and score it in-memory
  python scripts/eval_sde_score_model.py --ckpt runs/sde/<run>/checkpoints/sde_score_model_last.msgpack

  # score an already-committed figure grid png (no device work)
  python scripts/eval_sde_score_model.py --grid assets/score_based_diffusion/score_based_diffusion_samples.png

Checkpoint mode samples `--n` images at the canonical grid conditions
(type = i % n_types, theta = linspace(0, theta-max, n) — the convention of
`sample_grid_conditions`, reference `sde_score_model.py:317-321`), through
the serving runtime (`ScoreModelService`): distilled students auto-resolve
their trained sampler/steps/guidance, reference `.pt` checkpoints load
directly, dispatches stay tunnel-safe. Scoring runs on the in-memory float
samples — no PNG round-trip loss.

Prints a human summary plus ONE machine-readable JSON line; `--json-out`
additionally writes the full per-sample arrays.
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
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt", default=None,
                     help="Score-model checkpoint (.msgpack, or a reference "
                          ".pt) to sample from and score.")
    src.add_argument("--grid", default=None,
                     help="An already-saved figure-grid png to score instead "
                          "(6x6 canonical-conditions grid; tiles are "
                          "recovered from the figure and scored — the "
                          "assets/FIGURES.md path).")

    # checkpoint-mode sampling knobs; None = resolve from the checkpoint the
    # way serving does (distilled: trained sampler/steps/cfg; else the
    # reference's committed settings: sde/300/1.5/0.005)
    p.add_argument("--n", type=int, default=36,
                   help="Samples to draw and score (canonical grid "
                        "conditions; default 36 = the committed 6x6 grid).")
    p.add_argument("--sampler", default=None,
                   choices=["ode", "sde", "dpm", "ddim", "rf"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--cfg", type=float, default=None)
    p.add_argument("--t-end", type=float, default=None)
    p.add_argument("--use-ema", type=int, default=1, choices=[0, 1])
    p.add_argument("--clip-x0", type=int, default=0, choices=[0, 1])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--theta-max", type=float, default=math.pi / 3.0)
    p.add_argument("--grid-rows", type=int, default=6,
                   help="Grid-png mode: tile rows in the figure (default 6).")
    p.add_argument("--grid-cols", type=int, default=6,
                   help="Grid-png mode: tile cols in the figure (default 6).")
    p.add_argument("--grid-size", type=int, default=64,
                   help="Grid-png mode: tile resolution to score at (the "
                        "sampled image size; 256 for the stretch grids — "
                        "scoring 256px tiles at 64 aliases the fine lattice "
                        "away and reads as noise).")
    p.add_argument("--dtype", default="auto",
                   choices=["auto", "float32", "bfloat16"])
    p.add_argument("--attn-impl", default="auto",
                   choices=["auto", "xla", "flash"])
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8: dynamic-quantized convs (MXU 2x-rate path); "
                        "eval quantified quality of the quantized serving "
                        "path vs the float checkpoint")

    p.add_argument("--fid-vae", default=None,
                   help="Unconditional-VAE feature-extractor checkpoint "
                        "(scripts/train_vae.py --uncond; the committed "
                        "assets/eval/feature_vae_z16.msgpack). Adds latent-"
                        "FID: the Fréchet distance between the samples and "
                        "a deterministic procedural real draw in the VAE's "
                        "z-space (utils/fid.py) — the diversity axis the "
                        "FFT metric cannot see. Reported with its same-N "
                        "real-vs-real noise floor.")
    p.add_argument("--fid-ref-n", type=int, default=4096,
                   help="Real-draw size for the FID reference stats.")
    p.add_argument("--save-grid", default=None,
                   help="Also save the sampled grid png here (ckpt mode).")
    p.add_argument("--json-out", default=None,
                   help="Write the full result (scalars + per-sample arrays) "
                        "as JSON to this path.")
    args = p.parse_args()
    select_device(args.device)

    import numpy as np

    from toycrystals_tpu.utils.fidelity import (
        score_grid_png,
        score_lattice_fidelity,
    )

    if args.grid is not None:
        if not os.path.exists(args.grid):
            raise FileNotFoundError(args.grid)
        res = score_grid_png(args.grid, nrows=args.grid_rows,
                             ncols=args.grid_cols, theta_max=args.theta_max,
                             out_size=args.grid_size)
        source = {"grid": args.grid}
        if args.fid_vae:
            from toycrystals_tpu.utils.fidelity import extract_grid_tiles

            fid_images = extract_grid_tiles(
                args.grid, args.grid_rows, args.grid_cols, 64)[..., None]
    else:
        if not os.path.exists(args.ckpt):
            raise FileNotFoundError(args.ckpt)
        from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
        from toycrystals_tpu.serve import ScoreModelService

        svc = ScoreModelService(
            args.ckpt, use_ema=bool(args.use_ema), sampler=args.sampler,
            steps=args.steps, guidance_scale=args.cfg, t_end=args.t_end,
            clip_x0=bool(args.clip_x0), dtype=args.dtype,
            attn_impl=args.attn_impl, quantize=args.quantize,
        )
        y_cat, y_cont = sample_grid_conditions(
            args.n, svc.n_types, svc.y_cont_dim, args.theta_max)
        print(f"sampling {args.n} images: sampler={svc.sampler_name} "
              f"steps={svc.steps} cfg={svc.guidance_scale} "
              f"t_end={svc.t_end} ema={bool(args.use_ema)}", file=sys.stderr)
        x = svc.sample(np.asarray(y_cat), np.asarray(y_cont), seed=args.seed)
        if args.save_grid:
            from toycrystals_tpu.utils.figures import save_image_grid

            side = int(math.ceil(math.sqrt(args.n)))
            save_image_grid(
                x, args.save_grid, nrows=side, ncols=side,
                suptitle=f"{svc.sampler_name} | steps={svc.steps} | "
                         f"cfg={svc.guidance_scale:.2f}")
            print(f"saved grid -> {args.save_grid}", file=sys.stderr)
        res = score_lattice_fidelity(
            x, np.asarray(y_cat), np.asarray(y_cont)[:, 1],
            theta_max=args.theta_max, n_types=svc.n_types)
        source = {"ckpt": args.ckpt, "sampler": svc.sampler_name,
                  "steps": svc.steps, "cfg": svc.guidance_scale,
                  "t_end": svc.t_end, "use_ema": bool(args.use_ema),
                  "quantize": svc.quantize,
                  "seed": args.seed, "n": args.n}
        if args.fid_vae:
            fid_images = np.asarray(x)

    scalars = {k: v for k, v in res.items() if isinstance(v, float)}
    if args.fid_vae:
        from toycrystals_tpu.data.lattice import LatticeConfig
        from toycrystals_tpu.utils.fid import (
            compute_fid,
            fid_floor,
            load_feature_extractor,
            reference_stats,
        )

        fmodel, fparams, fcfg = load_feature_extractor(args.fid_vae)
        lat_cfg = LatticeConfig(img_size=int(fcfg.get("img_size", 64)),
                                rot_only=True)
        ref = reference_stats(fmodel, fparams, cfg=lat_cfg, n=args.fid_ref_n)
        scalars["fid"] = compute_fid(fid_images, fmodel, fparams,
                                     ref_stats=ref)
        scalars["fid_floor"] = fid_floor(
            fmodel, fparams, int(fid_images.shape[0]), ref, cfg=lat_cfg)
        source["fid_vae"] = args.fid_vae
        source["fid_ref_n"] = args.fid_ref_n
    print("lattice-fidelity metrics (utils/fidelity.py):")
    print(f"  cond_fidelity     {scalars['cond_fidelity']:.3f}   "
          "(conditioned spectral correlation, 1 = template-perfect)")
    print(f"  type_acc          {scalars['type_acc']:.3f}   raw 4-way")
    print(f"  type_acc_merged01 {scalars['type_acc_merged01']:.3f}   "
          "(square/rect merged: aspect~1 rects are genuinely square)")
    print(f"  theta_mae_deg     {scalars['theta_mae_deg']:.2f}   "
          "(symmetry-aware rotation recovery error)")
    if "fid" in scalars:
        print(f"  fid               {scalars['fid']:.3f}   "
              f"(latent-FID, utils/fid.py; same-N real-vs-real floor "
              f"{scalars['fid_floor']:.3f})")
    print(json.dumps({**source, **scalars}))

    if args.json_out:
        full = {**source, **scalars,
                **{k: np.asarray(v).tolist() for k, v in res.items()
                   if not isinstance(v, float)}}
        with open(args.json_out, "w") as f:
            json.dump(full, f, indent=1)
        print(f"wrote {args.json_out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
