#!/usr/bin/env python3
"""Standalone sampler from an SDE score-model checkpoint.

Same flag surface and conventions as the reference
(`/root/reference/scripts/sample_sde_score_model.py:19-135`): checkpoint
resolution (direct path or "last"/"best" under <out-dir>/checkpoints/), model
rebuilt from the checkpoint's embedded config with CLI fallback, --use-ema,
ode|sde sampler choice, and an auto output name encoding the settings. The
whole denoising loop runs as one compiled lax.scan program with fused CFG.
"""

from __future__ import annotations

import argparse
import math
import os

from _common import (  # noqa: E402
    add_dist_flags,
    add_shard_flag,
    init_distributed,
    infer_score_ckpt_path,
    select_device,
    setup_mesh,
)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    p.add_argument("--out-dir", required=True, help="Training output dir containing checkpoints/")
    p.add_argument("--ckpt", default="last", help="Checkpoint: last, best, or path/to/file.msgpack")

    # sampling knobs
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--cfg", type=float, default=0.0)
    p.add_argument("--t-end", type=float, default=1e-3)
    p.add_argument("--theta-max", type=float, default=math.pi / 3.0)
    p.add_argument("--n", type=int, default=36)
    p.add_argument("--use-ema", type=int, default=0, choices=[0, 1],
                   help="If checkpoint has EMA weights, sample using them.")
    p.add_argument("--sampler", type=str, default="ode",
                   choices=["ode", "sde", "dpm", "ddim", "rf"],
                   help="ode = prob-flow Heun, sde = reverse-SDE Euler-Maruyama "
                        "(the reference's two samplers); dpm = DPM-Solver++(2M), "
                        "a 2nd-order multistep ODE solver that needs far fewer "
                        "steps (new TPU scope; try --steps 30-50); ddim = "
                        "deterministic DDIM, exactly --steps net evals — the "
                        "sampler for progressive-distilled checkpoints "
                        "(scripts/distill_sde_score_model.py; those bake the "
                        "guidance in, so run with --cfg 0); rf = rectified-flow "
                        "Euler, the (auto-selected) sampler for --param fm "
                        "checkpoints (models/flow_matching.py; try --steps "
                        "20-50).")
    p.add_argument("--rf-solver", type=str, default="euler",
                   choices=["euler", "heun"],
                   help="--sampler rf integrator: euler (1 eval/step) or "
                        "heun (trapezoidal, 2 evals/step — compare N heun "
                        "steps against 2N euler steps; worthwhile only at "
                        "very low step counts where Euler's truncation "
                        "error on the not-quite-straight path bites).")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk", type=int, default=None,
                   help="Max images per compiled dispatch. Large batches are "
                        "sampled in equal-size chunks (one shared executable; "
                        "last chunk padded+trimmed) because the tunneled-TPU "
                        "backend kills single dispatches over ~1-2 min. "
                        "Default: auto from img size / steps / sampler, "
                        "calibrated at base_ch=96 (e.g. 12 at 256x256/300-step "
                        "sde). 0 disables chunking.")
    p.add_argument("--clip-x0", type=int, default=0, choices=[0, 1],
                   help="Static x0-thresholding inside the sampler: clip the "
                        "implied x0 to [-1,1] each step and re-derive eps. Off "
                        "by default (reference semantics); REQUIRED for "
                        "coherent 256x256 stretch samples — the raw "
                        "eps-parameterization's trajectories saturate there "
                        "(see benchmarks/NOTES.md).")
    p.add_argument("--quantize", type=str, default="none", choices=["none", "int8"],
                   help="int8: dynamic-quantized convs on the MXU's 2x-rate "
                        "int8 path (post-training; any float ckpt)")
    p.add_argument("--attn-impl", type=str, default="auto",
                   choices=["auto", "xla", "flash"],
                   help="Attention backend (same checkpoint weights work "
                        "under either). auto = tuned Pallas flash kernel at "
                        ">=2048 tokens — measured 1.33x faster than xla at "
                        "256x256 sampling (0.71 vs 0.53 img/s); xla kept as "
                        "a debug/fallback path — benchmarks/NOTES.md.")
    add_shard_flag(p, space=True, train=False)
    add_dist_flags(p)

    # fallback model config (only used if checkpoint has no config)
    p.add_argument("--n-types", type=int, default=4)
    p.add_argument("--y-cont-dim", type=int, default=4)
    p.add_argument("--base-ch", type=int, default=96)
    p.add_argument("--emb-dim", type=int, default=128)
    p.add_argument("--cond-ch", type=int, default=8)
    p.add_argument("--time-ch", type=int, default=8)

    # fallback SDE config
    p.add_argument("--beta-min", type=float, default=0.1)
    p.add_argument("--beta-max", type=float, default=30.0)
    p.add_argument("--logsnr-shift", type=float, default=0.0)
    p.add_argument("--param", type=str, default="eps", choices=["eps", "v", "fm"],
                   help="Prediction target fallback (only used if the "
                        "checkpoint has no embedded config).")

    p.add_argument("--out-path", default=None, help="Where to save the sample grid png")
    p.add_argument("--dtype", type=str, default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="Computation dtype for sampling; 'auto' follows the "
                        "checkpoint's training dtype.")
    args = p.parse_args()
    multihost = init_distributed(args)
    select_device(args.device)

    import jax

    from toycrystals_tpu.models import (
        CondUNetTiny,
        VPSDE,
        auto_chunk,
        sample_chunked,
        sample_ddim,
        sample_dpmpp_2m,
        sample_probability_flow_ode,
        sample_rectified_flow,
        sample_reverse_sde_euler_maruyama,
    )
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
    from toycrystals_tpu.utils import load_score_payload
    from toycrystals_tpu.utils.figures import save_image_grid

    ckpt_path = infer_score_ckpt_path(args.out_dir, args.ckpt)
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found: {ckpt_path}")

    # .pt = reference torch checkpoint converted onto our param tree (the
    # same-weights figure-parity path); directory = --ckpt-format orbax
    # per-shard restore; otherwise msgpack (utils/checkpoint.py).
    payload = load_score_payload(ckpt_path)

    cfg = payload.get("config") or {
        "img_ch": 1, "n_types": args.n_types, "y_cont_dim": args.y_cont_dim,
        "base_ch": args.base_ch, "emb_dim": args.emb_dim, "cond_ch": args.cond_ch,
        "time_ch": args.time_ch, "beta_min": args.beta_min, "beta_max": args.beta_max,
        "param": args.param,
    }

    import jax.numpy as jnp

    if args.dtype == "auto":
        dtype_name = str(cfg.get("dtype", "float32"))
    else:
        dtype_name = args.dtype
    model = CondUNetTiny(
        n_types=int(cfg["n_types"]), y_cont_dim=int(cfg["y_cont_dim"]),
        base_ch=int(cfg["base_ch"]), emb_dim=int(cfg["emb_dim"]),
        cond_ch=int(cfg["cond_ch"]), time_ch=int(cfg["time_ch"]),
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        conv_impl="int8" if args.quantize == "int8" else "pad",
        attn_impl=args.attn_impl, stem=str(cfg.get("stem", "none")),
    )
    state = payload["state"]
    params = state["params"]
    if args.use_ema == 1 and state.get("ema_params") is not None:
        params = state["ema_params"]

    sde = VPSDE(
        beta_min=float(cfg.get("beta_min", 0.1)),
        beta_max=float(cfg.get("beta_max", 30.0)),
        logsnr_shift=float(cfg.get("logsnr_shift", args.logsnr_shift)),
    )

    apply_fn = lambda prm, xt, t, yc, yv: model.apply({"params": prm}, xt, t, yc, yv)
    extra_kw = {}
    ckpt_param = str(cfg.get("param", "eps"))
    if ckpt_param == "fm":
        # rectified-flow checkpoint: the net is a velocity field on the
        # straight-line path, which the VP-marginal samplers cannot consume —
        # only the rf integrator applies (models/flow_matching.py)
        if args.sampler != "rf":
            if args.sampler != p.get_default("sampler"):
                raise SystemExit(
                    f"--sampler {args.sampler} expects a VP eps/v model; this "
                    "checkpoint was trained with --param fm — use --sampler rf")
            args.sampler = "rf"
            print("flow-matching checkpoint: --sampler defaulting to rf")
        # sample on the shifted grid the model was trained for (--fm-shift)
        if float(cfg.get("fm_shift", 1.0)) != 1.0:
            extra_kw["t_shift"] = float(cfg["fm_shift"])
        if args.rf_solver != "euler":
            extra_kw["solver"] = args.rf_solver
    elif args.sampler == "rf":
        raise SystemExit(
            "--sampler rf integrates a rectified-flow velocity field; this "
            f"checkpoint was trained with --param {ckpt_param} — use "
            "ode/sde/dpm (or ddim for distilled checkpoints)")
    elif args.sampler == "ddim":
        # ddim consumes the raw net output (static `prediction` arg) — the v
        # path computes x0 = alpha*x - sigma*v directly, which is the only
        # well-conditioned route at the t=1 evals a 1-4 step student makes
        extra_kw["prediction"] = ckpt_param
    elif ckpt_param == "v":
        # v-prediction checkpoint: adapt to the eps-space the samplers expect
        from toycrystals_tpu.models import eps_apply_from_v

        apply_fn = eps_apply_from_v(sde, apply_fn)
    if cfg.get("distilled"):
        # a distilled student is grid-committed: default the step count and
        # t_end to what it was trained for, and its guidance is baked in
        if args.steps == p.get_default("steps"):
            args.steps = int(cfg.get("distill_steps", args.steps))
            print(f"distilled checkpoint: --steps defaulting to {args.steps}")
        if args.t_end == p.get_default("t_end"):
            args.t_end = float(cfg.get("distill_t_end", args.t_end))
        if args.sampler != "ddim":
            print(f"NOTE: checkpoint was distilled for the ddim sampler at "
                  f"{cfg.get('distill_steps')} steps; --sampler {args.sampler} "
                  "will work but wastes the distillation")
        if args.cfg > 0:
            print(f"NOTE: guidance {cfg.get('distill_cfg')} is baked into this "
                  f"distilled checkpoint; --cfg {args.cfg} applies guidance ON "
                  "TOP of that (use --cfg 0 for the trained behaviour)")
    # auto filename AFTER sampler/steps/t_end resolution so it encodes the
    # settings actually used (fm -> rf switch, distilled step defaulting)
    if args.out_path is None:
        os.makedirs(os.path.join(args.out_dir, "results"), exist_ok=True)
        base = os.path.splitext(os.path.basename(ckpt_path))[0]
        args.out_path = os.path.join(
            args.out_dir, "results",
            f"samples_ckpt-{base}_steps{args.steps}_cfg{args.cfg:.2f}"
            f"_tend{args.t_end:g}_sampler{args.sampler}_ema{args.use_ema}.png",
        )

    y_cat, y_cont = sample_grid_conditions(
        args.n, int(cfg["n_types"]), int(cfg["y_cont_dim"]), args.theta_max
    )
    # --shard needs no divisibility from --n: sample_chunked pads each chunk
    # up to a mesh multiple and trims after the gather, so the reference's
    # canonical 36-grid shards over 8 chips.
    img_size = int(cfg.get("img_size", 64))
    mesh = setup_mesh(args.shard, shard_space=getattr(args, "shard_space", 0),
                      shard_model=getattr(args, "shard_model", 0),
                      img_size=img_size)
    sampler_fn = {
        "ode": sample_probability_flow_ode,
        "sde": sample_reverse_sde_euler_maruyama,
        "dpm": sample_dpmpp_2m,
        "ddim": sample_ddim,
        "rf": sample_rectified_flow,
    }[args.sampler]
    chunk = args.chunk
    if chunk is None:
        chunk = auto_chunk(img_size, args.steps, args.sampler)
    if chunk == 0:
        chunk = args.n
    if chunk < args.n:
        print(f"sampling {args.n} images in dispatches of {chunk} "
              f"(tunnel-safe; --chunk 0 to disable)")
    sp_kw = {}
    if mesh is not None and "space" in mesh.axis_names:
        from toycrystals_tpu.parallel import image_sharding

        sp_kw["sharding"] = image_sharding(mesh)
    x = sample_chunked(
        sampler_fn, apply_fn, params, sde, y_cat, y_cont,
        (args.n, img_size, img_size, 1), jax.random.key(args.seed),
        chunk=chunk, mesh=mesh, n_steps=args.steps,
        guidance_scale=args.cfg, t_end=args.t_end, n_types=int(cfg["n_types"]),
        clip_x0=bool(args.clip_x0), **sp_kw, **extra_kw,
    )
    if multihost:
        # sample_chunked already allgathers sharded chunks to every process
        # (a second host-side gather here would tile duplicate copies);
        # only process 0 writes (parallel/multihost.py conventions)
        if jax.process_index() != 0:
            return 0
    side = int(math.ceil(math.sqrt(args.n)))
    save_image_grid(
        x, args.out_path, nrows=side, ncols=side,
        suptitle=f"{args.sampler} | steps={args.steps} | cfg={args.cfg:.2f} | t_end={args.t_end:g}",
    )
    print(f"Saved samples -> {args.out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
