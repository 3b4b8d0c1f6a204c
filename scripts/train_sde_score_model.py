#!/usr/bin/env python3
"""Train the VP-SDE score model (conditional tiny U-Net, eps-prediction).

Same flag surface, run-dir/checkpoint/metrics conventions as the reference
(`/root/reference/scripts/train_sde_score_model.py:82-298`): timestamped run
dirs under runs/sde_score/, a rich self-describing checkpoint
{epoch_next, state (params/opt/ema), loss_hist, config}, --resume, EMA,
append-only metrics.jsonl, periodic sample grids and a final loss curve.

TPU-first: one jitted donated train step with the EMA lerp inside
(`train_sde_score_model.py:236-240` is an eager Python loop), disk archive
resident in HBM or --procedural on-device rasterization, and sample grids
from the compiled lax.scan samplers.
"""

from __future__ import annotations

import argparse
import math
import os
import time
from datetime import datetime

import numpy as np

from _common import (  # noqa: E402
    ResidentDiskDataset,
    add_dist_flags,
    add_shard_flag,
    init_distributed,
    place_state,
    select_device,
    setup_mesh,
)


def _make_run_name(args) -> str:
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    return (
        f"{ts}_lr{args.lr:.2e}_ch{args.base_ch}"
        f"_b{args.beta_max:g}_tp{args.t_power:g}_pu{args.p_uncond:g}"
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--data-path", type=str, default="data/toycrystals_train_rotonly.npz")
    p.add_argument("--img-size", type=int, default=None,
                   help="Lattice image size for --procedural data (the U-Net "
                        "is fully convolutional; disk data infers its own "
                        "size). Default: 64, or the checkpoint's img_size on "
                        "--resume. The 256 stretch config trains at "
                        "--img-size 256.")
    p.add_argument("--procedural", action="store_true",
                   help="rasterize rot-only batches on device, no files")
    p.add_argument("--n-samples", type=int, default=50_000,
                   help="items per epoch when --procedural")

    # Output
    p.add_argument("--out-dir", type=str, default=None,
                   help="Run output directory. If omitted, a timestamped run dir is "
                        "created under runs/sde_score/")
    p.add_argument("--resume", action="store_true")

    # Model
    p.add_argument("--n-types", type=int, default=4)
    p.add_argument("--y-cont-dim", type=int, default=4)
    p.add_argument("--base-ch", type=int, default=96)
    p.add_argument("--emb-dim", type=int, default=128)
    p.add_argument("--stem", type=str, default=None,
                   choices=["none", "s2d", "s2dr"],
                   help="U-Net stem: 's2d' folds 2x2 patches into channels at "
                        "input (whole trunk one octave lower, ~3.8x fewer "
                        "FLOPs, +4.6pt MFU — benchmarks/NOTES.md); 's2dr' "
                        "adds a ~1%%-FLOP full-res residual refinement head "
                        "that restores the high-frequency detail plain s2d "
                        "loses. Changes the architecture; checkpoints are "
                        "not interchangeable across stems. Default: none, "
                        "or the checkpoint's stem on --resume.")
    p.add_argument("--cond-ch", type=int, default=8)
    p.add_argument("--time-ch", type=int, default=8)

    # SDE schedule. Defaults are None so --resume can restore the trained
    # schedule from the checkpoint config: silently continuing a shifted
    # schedule at shift=0 (and rewriting the config) would corrupt both the
    # run and later sampling.
    p.add_argument("--beta-min", type=float, default=None,
                   help="Default: 0.1, or the checkpoint's value on --resume.")
    p.add_argument("--beta-max", type=float, default=None,
                   help="Default: 30.0, or the checkpoint's value on --resume.")
    p.add_argument("--logsnr-shift", type=float, default=None,
                   help="Shift the schedule's log-SNR profile by this many "
                        "nats (0 = the reference schedule). Training at "
                        "resolution R with the 64x64-tuned schedule wants "
                        "2*ln(64/R), e.g. -2.77 at 256x256. Default: 0, or "
                        "the checkpoint's value on --resume.")

    # Training
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--p-uncond", type=float, default=0.1)
    p.add_argument("--t-power", type=float, default=1.0,
                   help="Sample t as t=u**t_power. >1 biases towards small t.")
    p.add_argument("--param", type=str, default=None, choices=["eps", "v", "fm"],
                   help="Prediction target: eps (the reference's), v "
                        "(Salimans & Ho v-prediction — well-conditioned at "
                        "every t; recommended with --logsnr-shift for "
                        "high-res training), or fm (rectified-flow velocity "
                        "matching on the straight-line path, "
                        "models/flow_matching.py — sample with --sampler rf, "
                        "accurate at few Euler steps). Stored in the "
                        "checkpoint config so the sampler adapts "
                        "automatically. Default: eps, or the checkpoint's "
                        "param on --resume.")
    p.add_argument("--fm-shift", type=float, default=None,
                   help="SD3/Flux resolution timestep shift for --param fm: "
                        "t -> s*t/(1+(s-1)*t) in the training draw AND the "
                        "rf sampling grid (flow_matching.py:shift_t). "
                        "s = img_size/64 matches the VP --logsnr-shift "
                        "recipe (use 4.0 at 256x256). Default: 1.0, or the "
                        "checkpoint's value on --resume.")
    p.add_argument("--min-snr-gamma", type=float, default=None,
                   help="min-SNR-γ loss weighting (Hang et al. 2023) for "
                        "--param eps|v: per-sample MSE scaled by "
                        "min(SNR,γ)/SNR (eps) or min(SNR,γ)/(SNR+1) (v), "
                        "capping the low-noise steps' gradient dominance. "
                        "Typical γ=5. Stored in the checkpoint config. "
                        "Default: 0 (off, reference semantics), or the "
                        "checkpoint's value on --resume.")
    p.add_argument("--clip-grad-norm", type=float, default=None,
                   help="Clip gradients to this global L2 norm before Adam "
                        "(optax.clip_by_global_norm inside the compiled "
                        "step). 0 disables (reference semantics). Default: "
                        "0, or the checkpoint's value on --resume.")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="0 disables EMA. Typical: 0.999 or 0.9999")

    # Sampling during training
    p.add_argument("--sample-every", type=int, default=10000,
                   help="Write a diagnostic sample grid every N epochs (and "
                        "on the final epoch). 0 disables in-training grids.")
    p.add_argument("--sample-steps", type=int, default=200)
    p.add_argument("--cfg", type=float, default=0)
    p.add_argument("--t-end", type=float, default=1e-3)
    p.add_argument("--sample-from-ema", type=int, default=1, choices=[0, 1],
                   help="If EMA enabled, save sample grids using EMA weights.")
    p.add_argument("--clip-x0", type=int, default=0, choices=[0, 1],
                   help="Static x0-thresholding in the in-training sample "
                        "grids (see sample_sde_score_model.py --clip-x0).")
    p.add_argument("--dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="Computation dtype (params stay float32). bfloat16 "
                        "runs activations on the MXU at 2x peak FLOPs. "
                        "Default: float32, or the checkpoint's dtype on "
                        "--resume.")
    p.add_argument("--attn-impl", type=str, default="auto",
                   choices=["auto", "xla", "flash"],
                   help="Attention backend. auto = Pallas flash kernel at "
                        ">=2048 tokens (required to fit 256x256 training "
                        "batches; tuned block sizes, benchmarks/NOTES.md).")
    p.add_argument("--lr-schedule", type=str, default="constant",
                   choices=["constant", "cosine"],
                   help="LR schedule (new scope; the reference is constant): "
                        "cosine = warmup to --lr then cosine decay to 1%% "
                        "over the run, stepped per optimizer update and "
                        "resume-exact (the schedule reads the opt_state "
                        "count).")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="Linear LR warmup steps (works with either "
                        "--lr-schedule).")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="Gradient accumulation: split each batch into N "
                        "sequential chunks inside the compiled step (one "
                        "lax.scan) — peak activation HBM scales 1/N while "
                        "the update stays numerically the full-batch step "
                        "(randomness drawn once per batch). The memory "
                        "lever for 256x256 training. batch-size must "
                        "divide by N (and by N x --shard together).")
    p.add_argument("--skip-nonfinite", type=int, default=0, metavar="K",
                   help="Production guard for long bf16 runs: skip optimizer/"
                        "EMA updates whose gradients contain NaN/Inf, up to K "
                        "consecutive times (optax.apply_if_finite; params/"
                        "opt/EMA untouched on a skipped step, skips counted "
                        "and reported per epoch). After K consecutive bad "
                        "steps the NaNs propagate and the divergence guard "
                        "halts with the last good checkpoint intact. 0 "
                        "disables (reference semantics). Changes the "
                        "optimizer-state layout: pass the same value when "
                        "resuming.")
    p.add_argument("--fused-epoch", type=int, default=1, choices=[0, 1],
                   help="Compile each whole epoch (shuffle + datagen/gather + "
                        "all steps) as ONE program — zero host round-trips "
                        "per epoch. 0 falls back to one dispatch per batch.")
    p.add_argument("--stream", type=int, nargs="?", const=2, default=0,
                   metavar="DEPTH",
                   help="Stream the archive from HOST memory instead of "
                        "pinning it in HBM: batches gathered on host as u8 "
                        "and prefetched to device DEPTH steps ahead "
                        "(async device_put double-buffering; /255 runs on "
                        "device — data/stream.py). For archives that "
                        "outgrow HBM but fit host RAM. Requires "
                        "--data-path; implies --fused-epoch 0.")
    p.add_argument("--fresh-data", action="store_true",
                   help="Procedural source only: draw a FRESH deterministic "
                        "slice of --n-samples items every epoch (epoch e "
                        "trains on items [e*n, (e+1)*n)) instead of "
                        "re-shuffling the same n — unlimited unique data at "
                        "zero extra cost, since items render on device per "
                        "batch anyway. No disk pipeline can offer this; it "
                        "is the TPU-native answer to dataset-size limits "
                        "(train/steps.py:make_sde_train_epoch).")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="Capture a jax.profiler (XPlane/Perfetto) trace of one "
                        "post-warmup epoch into this directory.")
    p.add_argument("--init", type=str, default="flax", choices=["flax", "torch"],
                   help="Parameter init: flax defaults, or torch-default "
                        "statistics for apples-to-apples loss-curve "
                        "comparison with the reference.")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="Save the checkpoint every N epochs (always at the "
                        "end; 0 = end only). The reference saves every epoch; "
                        "on a tunneled TPU each save pulls the full state to "
                        "the host.")
    p.add_argument("--ckpt-format", default="msgpack",
                   choices=["msgpack", "orbax"],
                   help="msgpack = single self-describing file (default; "
                        "gathers the full state to the host on save). orbax "
                        "= distributed per-shard checkpointing "
                        "(utils/orbax_io.py): under --fsdp / --shard-model "
                        "each device's shard is written directly (no gather) "
                        "into a step-managed directory with atomic commit + "
                        "retention, saves overlap the next epoch, and "
                        "--resume restores STRAIGHT INTO the new run's "
                        "shardings — including a different mesh layout than "
                        "the saving run. The sampler/serving/eval CLIs read "
                        "either format.")
    p.add_argument("--async-ckpt", type=int, default=1, choices=[0, 1],
                   help="Overlap checkpoint serialization + disk IO with the "
                        "next epoch (utils/AsyncCheckpointer). The device-to-"
                        "host pull stays synchronous (the train step donates "
                        "its state); the process waits for the last write "
                        "before exiting. 0 = fully synchronous saves.")
    add_shard_flag(p, space=True)
    add_dist_flags(p)
    p.add_argument("--save-best", type=int, default=0, choices=[0, 1],
                   help="Also write sde_score_model_best.msgpack whenever the "
                        "epoch loss improves. The reference's sampler resolves "
                        "a 'best' checkpoint name but its trainer never writes "
                        "one (sample_sde_score_model.py:23-27) — this closes "
                        "that gap, off by default for parity.")

    args = p.parse_args()
    multihost = init_distributed(args)
    select_device(args.device)

    import jax
    import jax.numpy as jnp
    import optax

    from toycrystals_tpu.data import LatticeConfig, generate_batch, batch_iterator
    from toycrystals_tpu.parallel import replicate, shard_batch
    from toycrystals_tpu.models import (
        CondUNetTiny,
        VPSDE,
        auto_chunk,
        sample_chunked,
        sample_probability_flow_ode,
    )
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
    from toycrystals_tpu.train import (
        create_train_state,
        make_sde_train_epoch,
        make_sde_train_step,
    )
    from toycrystals_tpu.utils import (
        AsyncCheckpointer,
        GracefulShutdown,
        append_jsonl,
        ensure_file,
        load_checkpoint,
        save_checkpoint,
        truncate_jsonl,
    )
    from toycrystals_tpu.utils.figures import save_image_grid, save_loss_curves

    from toycrystals_tpu.parallel.multihost import is_primary

    # Exactly one process owns host-side artefacts (msgpack checkpoints,
    # figures, metrics.jsonl); Orbax writes stay cooperative — every
    # process writes its own shards (utils/orbax_io.py).
    primary = is_primary()

    if args.out_dir is None:
        # a fresh timestamped run dir cannot hold a resume checkpoint, so the
        # schedule flags resolve to their defaults before naming the run
        args.beta_max = 30.0 if args.beta_max is None else args.beta_max
        args.out_dir = os.path.join("runs", "sde_score", _make_run_name(args))
    print(f"run dir: {args.out_dir}")

    results_dir = os.path.join(args.out_dir, "results")
    ckpt_dir = os.path.join(args.out_dir, "checkpoints")
    os.makedirs(results_dir, exist_ok=True)
    os.makedirs(ckpt_dir, exist_ok=True)
    metrics_path = os.path.join(args.out_dir, "metrics.jsonl")
    orbax_fmt = args.ckpt_format == "orbax"
    ckpt_name = "sde_score_model_last." + ("orbax" if orbax_fmt else "msgpack")
    ckpt_path = os.path.join(ckpt_dir, ckpt_name)

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)

    # Peek the checkpoint BEFORE anything is built: on --resume the saved
    # config decides the computation dtype and procedural img_size unless the
    # flags override them. (Orbax: meta sidecar only — the arrays restore
    # later, straight into the placed state's shardings.)
    resume_raw = None
    if args.resume and os.path.exists(ckpt_path):
        if orbax_fmt:
            from toycrystals_tpu.utils import load_orbax_meta

            resume_raw = load_orbax_meta(ckpt_path)
        else:
            resume_raw = load_checkpoint(ckpt_path)
    rcfg = (resume_raw or {}).get("config", {})
    dtype_name = args.dtype or str(rcfg.get("dtype") or "float32")
    if args.img_size is None:
        args.img_size = int(rcfg.get("img_size") or 64)
    if args.param is None:
        args.param = str(rcfg.get("param") or "eps")
    if args.stem is None:
        args.stem = str(rcfg.get("stem") or "none")
    # the SDE schedule must survive --resume (a shifted run silently
    # continuing at shift=0 diverges AND rewrites the config the sampler
    # trusts); explicit flags still override
    if args.beta_min is None:
        args.beta_min = float(rcfg.get("beta_min", 0.1))
    if args.beta_max is None:
        args.beta_max = float(rcfg.get("beta_max", 30.0))
    if args.logsnr_shift is None:
        args.logsnr_shift = float(rcfg.get("logsnr_shift", 0.0))
    if args.fm_shift is None:
        args.fm_shift = float(rcfg.get("fm_shift", 1.0))
    if args.fm_shift != 1.0 and args.param != "fm":
        raise SystemExit("--fm-shift shifts the rectified-flow timestep draw "
                         "(--param fm); VP runs shift via --logsnr-shift")
    if args.min_snr_gamma is None:
        args.min_snr_gamma = float(rcfg.get("min_snr_gamma", 0.0))
    if args.min_snr_gamma > 0.0 and args.param == "fm":
        raise SystemExit("--min-snr-gamma weights the VP objectives "
                         "(--param eps|v); rectified flow weights timesteps "
                         "via --fm-shift instead")
    # clip changes the opt_state layout (optax.chain adds a leaf) — falling
    # back to the checkpoint's value keeps --resume restores structural
    if args.clip_grad_norm is None:
        args.clip_grad_norm = float(rcfg.get("clip_grad_norm", 0.0))

    mesh = setup_mesh(args.shard, args.batch_size,
                      shard_space=getattr(args, "shard_space", 0),
                      shard_model=getattr(args, "shard_model", 0),
                      img_size=args.img_size)
    if multihost and not args.ckpt_format == "orbax" and (
        args.fsdp or getattr(args, "shard_model", 0) > 1
    ):
        # msgpack saves gather the full state to one host — impossible when
        # fsdp/tp leave each process holding only its own weight shards
        raise SystemExit("multi-host --fsdp/--shard-model needs "
                         "--ckpt-format orbax (per-shard writes; msgpack "
                         "would gather non-addressable arrays)")
    if args.grad_accum < 1:
        raise SystemExit(f"--grad-accum must be >= 1, got {args.grad_accum}")
    if args.batch_size % args.grad_accum:
        raise SystemExit(f"batch size {args.batch_size} not divisible by "
                         f"--grad-accum {args.grad_accum}")

    # --- data ---
    img_size = args.img_size
    procedural = args.procedural or not args.data_path
    if args.stream:
        if procedural:
            raise SystemExit("--stream needs --data-path (the procedural "
                             "dataset already renders on device)")
        if args.fused_epoch:
            print("--stream: per-batch dispatch path (the fused-epoch "
                  "program needs the archive resident in HBM)")
            args.fused_epoch = 0
    if args.fresh_data and not procedural:
        raise SystemExit("--fresh-data needs the procedural source (a disk "
                         "archive has only its n items)")
    if args.fresh_data and args.epochs * args.n_samples >= 2**31:
        # generate_batch folds int32 indices into the RNG; past 2^31 the
        # offset would wrap and silently alias back onto earlier slices
        raise SystemExit(
            f"--fresh-data: epochs x n-samples = "
            f"{args.epochs * args.n_samples:,} overflows the int32 item-"
            f"index space (2^31); lower --epochs or --n-samples")
    if procedural:
        cfg = LatticeConfig(img_size=img_size, n_types=args.n_types, rot_only=True)
        n_items = args.n_samples

        def get_batch(idx):
            return generate_batch(cfg, args.seed, jnp.asarray(idx))
    elif args.stream:
        from toycrystals_tpu.data import StreamingDiskDataset

        sds = StreamingDiskDataset(args.data_path)
        n_items = len(sds)
        img_size = int(sds.x_u8.shape[1])
        get_batch = None  # streaming epochs build their own iterator
    else:
        ds = ResidentDiskDataset(args.data_path)
        if args.fused_epoch:
            # the HBM-resident archive is closed over by the compiled epoch
            # program; replicate it so every device gathers its shard locally
            # (the per-batch path shards each gathered batch instead)
            ds.x_u8, ds.y_cat, ds.y_cont = replicate(
                mesh, (ds.x_u8, ds.y_cat, ds.y_cont)
            )
        n_items = len(ds)
        img_size = int(ds.x_u8.shape[1])
        get_batch = ds.gather

    # --- model + sde + state ---
    # --dtype bfloat16 = mixed precision: bf16 activations on the MXU, f32
    # parameters/optimiser/EMA (flax `dtype` only sets computation dtype).
    comp_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = CondUNetTiny(
        n_types=args.n_types, y_cont_dim=args.y_cont_dim, base_ch=args.base_ch,
        emb_dim=args.emb_dim, cond_ch=args.cond_ch, time_ch=args.time_ch,
        dtype=comp_dtype, attn_impl=args.attn_impl, stem=args.stem,
    )
    sde = VPSDE(beta_min=args.beta_min, beta_max=args.beta_max,
                logsnr_shift=args.logsnr_shift)

    dummy = (
        jnp.zeros((2, img_size, img_size, 1)),
        jnp.zeros((2,)),
        jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, args.y_cont_dim)),
    )
    params = model.init(key, *dummy)["params"]
    if args.init == "torch":
        from toycrystals_tpu.models.torch_init import torch_like_init

        params = torch_like_init(jax.random.fold_in(key, 7), params)
    if args.lr_schedule == "cosine":
        # warmup -> cosine decay over the whole run, stepped per optimizer
        # update (the schedule rides the opt_state count, so --resume
        # continues exactly where it left off). New TPU scope — the
        # reference trains at constant LR (`train_sde_score_model.py:210`).
        total_steps = max(args.epochs * (n_items // args.batch_size), 1)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=args.lr,
            warmup_steps=min(args.warmup_steps, total_steps),
            decay_steps=total_steps, end_value=args.lr * 0.01)
        print(f"lr schedule: cosine (peak {args.lr:g}, "
              f"{args.warmup_steps} warmup of {total_steps} steps)")
    else:
        lr = args.lr
        if args.warmup_steps:
            lr = optax.linear_schedule(0.0, args.lr, args.warmup_steps)
            print(f"lr schedule: constant {args.lr:g} after "
                  f"{args.warmup_steps} warmup steps")
    tx = optax.adam(lr)
    if args.clip_grad_norm > 0.0:
        # clip BEFORE Adam so the moments see the clipped gradients too
        tx = optax.chain(optax.clip_by_global_norm(args.clip_grad_norm), tx)
        print(f"gradient clipping: global norm <= {args.clip_grad_norm:g}")
    if args.skip_nonfinite > 0:
        # reject NaN/Inf gradient steps in the compiled update itself — the
        # optimizer state, params and EMA pass through untouched on a
        # skipped step (total skips surface per epoch below)
        tx = optax.apply_if_finite(tx, max_consecutive_errors=args.skip_nonfinite)
        print(f"non-finite-gradient guard: skipping up to "
              f"{args.skip_nonfinite} consecutive bad steps")
    if args.ema_decay != 0.0 and not (0.0 < args.ema_decay < 1.0):
        raise ValueError("--ema-decay must be in (0,1) or 0 to disable.")
    state = create_train_state(params, tx, ema=args.ema_decay > 0.0)
    if args.fused_epoch:
        epoch_fn = make_sde_train_epoch(
            model, tx, sde, args.n_types, args.p_uncond, args.t_power,
            args.ema_decay, args.batch_size, n_items,
            lattice_cfg=cfg if procedural else None,
            dataset_seed=args.seed,
            resident=None if procedural else (ds.x_u8, ds.y_cat, ds.y_cont),
            mesh=mesh,
            parameterization=args.param,
            grad_accum=args.grad_accum,
            nan_safe_metrics=args.skip_nonfinite > 0,
            t_shift=args.fm_shift,
            min_snr_gamma=args.min_snr_gamma,
            fresh_data=args.fresh_data,
        )
    else:
        step = make_sde_train_step(
            model, tx, sde, args.n_types, args.p_uncond, args.t_power,
            args.ema_decay, args.param, args.grad_accum,
            t_shift=args.fm_shift,
            min_snr_gamma=args.min_snr_gamma,
        )
        if get_batch is not None:
            _get_batch = get_batch
            get_batch = lambda idx: shard_batch(mesh, _get_batch(idx))

    def device_batches(epoch_rng, idx_offset: int = 0):
        """One epoch of device-resident batches, either path. idx_offset
        shifts the drawn indices into later deterministic procedural slices
        (--fresh-data)."""
        idx_it = batch_iterator(n_items, args.batch_size, rng=epoch_rng)
        if idx_offset:
            idx_it = (b + idx_offset for b in idx_it)
        if args.stream:
            from toycrystals_tpu.data import prefetch_to_device, to_f01

            host_it = (sds.host_batch(b) for b in idx_it)
            place = (lambda b: shard_batch(mesh, b)) if mesh is not None else None
            for x_u8, y_cat, y_cont in prefetch_to_device(
                host_it, size=args.stream, place=place
            ):
                yield to_f01(x_u8), y_cat, y_cont
        else:
            for bidx in idx_it:
                yield get_batch(bidx)

    # Self-describing config embedded in the ckpt (`train_sde_score_model.py:179-192`).
    config = {
        "img_ch": 1, "img_size": img_size,
        "n_types": args.n_types, "y_cont_dim": args.y_cont_dim,
        "base_ch": args.base_ch, "emb_dim": args.emb_dim, "cond_ch": args.cond_ch,
        "time_ch": args.time_ch, "beta_min": args.beta_min, "beta_max": args.beta_max,
        "logsnr_shift": args.logsnr_shift,
        "t_power": args.t_power, "p_uncond": args.p_uncond, "dtype": dtype_name,
        "param": args.param, "fm_shift": args.fm_shift, "stem": args.stem,
        "min_snr_gamma": args.min_snr_gamma,
        "clip_grad_norm": args.clip_grad_norm,
        "fresh_data": bool(args.fresh_data),
    }

    start_epoch = 0
    loss_hist: list[float] = []
    if resume_raw is not None:
        if not orbax_fmt:
            import flax.serialization as ser

            state = ser.from_state_dict(state, resume_raw["state"])
        start_epoch = int(resume_raw["epoch_next"])
        hist = resume_raw.get("loss_hist", [])
        loss_hist = [float(v) for v in (hist.values() if isinstance(hist, dict) else hist)]
        # --ckpt-every N > 1 means metrics.jsonl can be ahead of the restored
        # epoch; drop those rows so the re-trained epochs don't duplicate them.
        if primary:
            truncate_jsonl(metrics_path, "epoch", start_epoch)
        if start_epoch > 0 and primary:
            print(f"resumed from: {ckpt_path} (next epoch {start_epoch + 1})")

    # mesh-aware placement: replication / tp channel sharding / --fsdp
    # ZeRO-3 (scripts/_common.py place_state).
    state = place_state(mesh, state, fsdp=args.fsdp, what="base_ch")

    ckpt_mgr = best_mgr = None
    if orbax_fmt:
        from toycrystals_tpu.utils import ShardedCheckpointManager

        ckpt_mgr = ShardedCheckpointManager(ckpt_path, max_to_keep=2)
        if args.save_best:
            best_mgr = ShardedCheckpointManager(
                os.path.join(ckpt_dir, "sde_score_model_best.orbax"),
                max_to_keep=1)
        if resume_raw is not None:
            # per-shard restore DIRECTLY into the placed state's shardings —
            # the saving run's mesh (or lack of one) is irrelevant
            state, _ = ckpt_mgr.restore_onto(state)

    apply_fn = lambda prm, xt, t, yc, yv: model.apply({"params": prm}, xt, t, yc, yv)
    grid_sampler, grid_name, grid_kw = sample_probability_flow_ode, "ode", {}
    if args.param == "v":
        from toycrystals_tpu.models import eps_apply_from_v

        apply_fn = eps_apply_from_v(sde, apply_fn)
    elif args.param == "fm":
        # the net predicts a velocity field, not eps: in-training grids
        # integrate it with the rectified-flow Euler sampler, on the same
        # shifted grid the model was trained for
        from toycrystals_tpu.models import sample_rectified_flow

        grid_sampler, grid_name = sample_rectified_flow, "rf"
        grid_kw = {"t_shift": args.fm_shift}

    def save_samples(out_path, sample_state):
        prm = sample_state.sample_params if args.sample_from_ema == 1 else sample_state.params
        y_cat, y_cont = sample_grid_conditions(36, args.n_types, args.y_cont_dim)
        # in-training grids use the ODE sampler (rf for --param fm), like the
        # reference's save_sde_samples default (`sde_score_model.py:312`),
        # chunked so a 256x256 grid stays under the tunnel's per-dispatch
        # duration cap
        sp_kw = {}
        if mesh is not None and "space" in mesh.axis_names:
            from toycrystals_tpu.parallel import image_sharding

            sp_kw["sharding"] = image_sharding(mesh)
        x = sample_chunked(
            grid_sampler, apply_fn, prm, sde, y_cat, y_cont,
            (36, img_size, img_size, 1), jax.random.key(args.seed + 1),
            chunk=auto_chunk(img_size, args.sample_steps, grid_name), mesh=mesh,
            n_steps=args.sample_steps, guidance_scale=args.cfg,
            t_end=args.t_end, n_types=args.n_types,
            clip_x0=bool(args.clip_x0), **grid_kw, **sp_kw,
        )
        # sample_chunked allgathers sharded chunks to every process, so x
        # is always the full host-resident grid here; primary writes once.
        if primary:
            save_image_grid(
                x, out_path,
                suptitle=f"{grid_name} | steps={args.sample_steps} | cfg={args.cfg:.2f} | t_end={args.t_end:g}",
            )

    if primary:
        print("starting SDE score-model training loop.")
        ensure_file(metrics_path)
    sample_grid_ok = False

    steps_per_epoch = n_items // args.batch_size
    # Profile the SECOND trained epoch (first is compile + warmup).
    profile_epoch = start_epoch + 1 if args.epochs - start_epoch > 1 else start_epoch
    import contextlib

    # Async checkpointing: serialize+write on a background thread while the
    # next epoch trains; the context manager blocks process exit until the
    # last write is durable (and re-raises a failed one).
    ckptr = AsyncCheckpointer()
    save_ckpt = ckptr.save if args.async_ckpt else save_checkpoint

    def write_ckpt(which: str, epoch: int) -> None:
        """One checkpoint write, either format ('last' or 'best' target)."""
        meta = {"epoch_next": epoch + 1, "loss_hist": loss_hist,
                "config": config}
        if orbax_fmt:
            (ckpt_mgr if which == "last" else best_mgr).save(
                epoch + 1, state, meta)
        elif primary:
            path = ckpt_path if which == "last" else os.path.join(
                ckpt_dir, "sde_score_model_best.msgpack")
            save_ckpt(path, {**meta, "state": state})

    with GracefulShutdown() as stop, ckptr, contextlib.ExitStack() as mgr_stack:
        for m in (ckpt_mgr, best_mgr):
            if m is not None:
                mgr_stack.enter_context(m)
        for epoch in range(start_epoch, args.epochs):
            profiling = (
                jax.profiler.trace(args.profile_dir)
                if (args.profile_dir and epoch == profile_epoch)
                else contextlib.nullcontext()
            )
            t0 = time.perf_counter()
            key, sub = jax.random.split(key)
            if args.fused_epoch:
                with profiling:
                    if args.fresh_data:
                        state, avg = epoch_fn(
                            state, sub, jnp.int32(epoch * n_items))
                    else:
                        state, avg = epoch_fn(state, sub)
                    avg = float(avg)
            else:
                with profiling:
                    losses = []
                    for x0, y_cat, y_cont in device_batches(
                        rng, idx_offset=epoch * n_items if args.fresh_data else 0
                    ):
                        sub, k_step = jax.random.split(sub)
                        state, loss = step(state, x0, y_cat, y_cont, k_step)
                        losses.append(loss)
                    _mean = jnp.nanmean if args.skip_nonfinite > 0 else jnp.mean
                    avg = float(_mean(jnp.stack(losses)))
            dt = time.perf_counter() - t0
            if not math.isfinite(avg):
                # Divergence guard (new TPU scope — the reference trains on
                # silently, `train_sde_score_model.py:212-247`): halt BEFORE the
                # checkpoint write so the last finite-loss checkpoint survives;
                # resume from it with a lower lr / different seed.
                raise SystemExit(
                    f"epoch {epoch + 1}: non-finite loss ({avg}) — training "
                    f"diverged. Last good checkpoint kept at {ckpt_path} "
                    f"(epoch {epoch}); resume with --resume after lowering --lr."
                )
            loss_hist.append(avg)
            ips = steps_per_epoch * args.batch_size / dt
            skipped = ""
            if args.skip_nonfinite > 0:
                # apply_if_finite keeps a running skip counter in the
                # wrapped opt_state; one scalar pull per epoch
                total_nf = int(jax.device_get(state.opt_state.total_notfinite))
                if total_nf:
                    skipped = f" [{total_nf} non-finite steps skipped so far]"
            if primary:
                print(f"epoch {epoch + 1:03d}/{args.epochs}: loss={avg:.6f} "
                      f"({ips:.0f} img/s){skipped}")

            # single read per epoch: a signal landing between two reads must
            # not let the preempt branch claim a save that never happened
            preempted = stop.requested
            if preempted or (
                args.ckpt_every > 0 and (epoch + 1) % args.ckpt_every == 0
            ) or (epoch == args.epochs - 1):
                write_ckpt("last", epoch)
            if args.save_best and avg <= min(loss_hist):
                write_ckpt("best", epoch)
            if primary:
                append_jsonl(metrics_path, {"epoch": epoch + 1, "loss": avg})
            if preempted:
                # Preemption (utils/preempt.py): checkpoint is saved above
                # regardless of --ckpt-every; skip diagnostics and exit clean.
                print(f"preempted ({stop.signame}) after epoch {epoch + 1}: "
                      f"checkpoint saved at {ckpt_path} — continue with "
                      f"--resume")
                break

            if args.sample_every > 0 and (
                ((epoch + 1) % args.sample_every == 0) or (epoch == args.epochs - 1)
            ):
                out_path = os.path.join(results_dir, f"sde_samples_epoch_{epoch + 1:03d}.png")
                # A transient backend failure in a diagnostic grid must not turn a
                # long completed run into a failure (checkpoint/metrics above are
                # already saved) — but a sampling path that has NEVER worked in
                # this run is a real bug and re-raises.
                try:
                    save_samples(out_path, state)
                    sample_grid_ok = True
                    if primary:
                        print(f"  saved: {out_path}")
                except Exception as e:  # noqa: BLE001
                    if not sample_grid_ok:
                        raise
                    print(f"  WARNING: sample grid failed ({type(e).__name__}); "
                          f"training artefacts are saved — rerun via "
                          f"sample_sde_score_model.py: {e}")

    if primary:
        save_loss_curves({f"{args.param}_mse": loss_hist},
                         os.path.join(results_dir, "sde_loss.png"))
        print(f"saved: {os.path.join(results_dir, 'sde_loss.png')}")
        print(f"checkpoint: {ckpt_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
