#!/usr/bin/env python3
"""Progressively distill a trained SDE score model into a few-step sampler.

NEW TPU scope — no reference counterpart (the reference ships only the
300-step eager samplers, `/root/reference/src/toycrystals/models/sde_score_model.py:452-569`).
Each phase halves the DDIM step count (Salimans & Ho 2022), with the
classifier-free guidance weight baked into the student (Meng et al. 2023), so
the final student samples in 1-8 SINGLE-PASS net evals instead of the
reference's 602 doubled-batch evals per image. See train/distill.py for the
math; sampling uses `sample_ddim` (also exposed as `--sampler ddim` on
sample_sde_score_model.py).

Artefact conventions follow the other trainers: run dir with checkpoints/
(one self-describing msgpack per phase), metrics.jsonl, results/ sample grid
per phase, and a lattice-fidelity score line per phase (utils/fidelity.py)
appended to distill_summary.jsonl so quality-vs-steps is a committed number,
not an eyeball call.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

from _common import ResidentDiskDataset, select_device, setup_mesh  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--teacher", type=str, required=True,
                   help="Teacher checkpoint: .msgpack or --ckpt-format "
                        "orbax directory from train_sde_score_model.py "
                        "(or a reference .pt — utils/torch_interop.py).")
    p.add_argument("--use-ema", type=int, default=1, choices=[0, 1],
                   help="Distill from the teacher's EMA weights when present "
                        "(the committed sampling convention).")
    p.add_argument("--out-dir", type=str, default=None,
                   help="Run dir (default: runs/distill/<timestamp>_...)")

    # data (same contract as the SDE trainer: procedural on-device datagen
    # or a resident disk archive)
    p.add_argument("--procedural", action="store_true",
                   help="rasterize rot-only batches on device (default when "
                        "no --data-path; overrides --data-path when both are "
                        "given, same semantics as the SDE trainer)")
    p.add_argument("--data-path", type=str, default=None,
                   help="npz archive instead of --procedural")
    p.add_argument("--n-samples", type=int, default=50_000,
                   help="items per epoch when procedural")

    # distillation schedule
    p.add_argument("--from-steps", type=int, default=64,
                   help="Step count of the first student phase; the teacher "
                        "is run at 2x this on the nested grid.")
    p.add_argument("--to-steps", type=int, default=1,
                   help="Final student step count; phases halve from "
                        "--from-steps down to this (both powers of 2).")
    p.add_argument("--epochs", type=int, default=8, help="Epochs per phase.")
    p.add_argument("--phase0-epochs", type=int, default=None,
                   help="Epochs for the FIRST phase only (default: --epochs). "
                        "Needed when the teacher is eps-parameterized: the "
                        "student outputs v, so phase 0 doubles as an eps->v "
                        "conversion (the analytic wrap v = eps/alpha - "
                        "(sigma/alpha) x is 1/alpha ~ 2000x ill-conditioned "
                        "at t=1, so it must be LEARNED) and converges far "
                        "slower than the later v->v phases. Prefer a --param v "
                        "teacher (train_sde_score_model.py), the Salimans & Ho "
                        "setup, which makes phase 0 a pure solver-gap fit.")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--clip-grad-norm", type=float, default=0.0,
                   help="Clip gradients to this global L2 norm before Adam "
                        "(optax.clip_by_global_norm inside the compiled "
                        "step). 0 disables (reference semantics). Changes "
                        "the optimizer-state layout: pass the same value "
                        "when resuming.")
    p.add_argument("--ema-decay", type=float, default=0.0,
                   help="Student EMA (0 disables; Salimans & Ho distill "
                        "without EMA).")
    p.add_argument("--cfg", type=float, default=1.5,
                   help="Guidance weight BAKED INTO the student: every "
                        "teacher eval during distillation is CFG-combined at "
                        "this scale, so the student needs no CFG doubling at "
                        "sampling time (sample with --cfg 0).")
    p.add_argument("--t-end", type=float, default=0.005,
                   help="Integration endpoint baked into the student's grid "
                        "(the committed sampling config's value, README).")
    p.add_argument("--dtype", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="Computation dtype; default: the teacher's.")
    p.add_argument("--attn-impl", type=str, default="auto",
                   choices=["auto", "xla", "flash"])
    p.add_argument("--shard", type=int, default=0,
                   help="Data-parallel: shard each distillation batch over "
                        "the first N devices (teacher + student replicated, "
                        "GSPMD gradient all-reduce).")

    # per-phase diagnostics
    p.add_argument("--grid-n", type=int, default=36,
                   help="Sample-grid size scored after each phase "
                        "(0 disables grids + fidelity scoring).")
    p.add_argument("--theta-max", type=float, default=math.pi / 3.0)
    args = p.parse_args()
    select_device(args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from toycrystals_tpu.data import LatticeConfig
    from toycrystals_tpu.models import CondUNetTiny, VPSDE, sample_ddim
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
    from toycrystals_tpu.parallel import replicate
    from toycrystals_tpu.train import create_train_state, make_distill_train_epoch
    from toycrystals_tpu.utils import (
        AsyncCheckpointer,
        GracefulShutdown,
        append_jsonl,
        load_score_payload,
    )
    from toycrystals_tpu.utils.fidelity import score_lattice_fidelity
    from toycrystals_tpu.utils.figures import save_image_grid

    # ---- teacher (msgpack / reference .pt / --ckpt-format orbax dir) ------
    payload = load_score_payload(args.teacher)
    tcfg = payload.get("config")
    if not tcfg:
        raise SystemExit("teacher checkpoint has no embedded config")
    state_t = payload["state"]
    teacher_params = state_t["params"]
    if args.use_ema and state_t.get("ema_params") is not None:
        teacher_params = state_t["ema_params"]
    teacher_pred = str(tcfg.get("param", "eps"))
    if teacher_pred == "fm":
        raise SystemExit(
            "progressive distillation consumes a VP eps/v teacher (DDIM "
            "nested-grid steps); this teacher was trained with --param fm — "
            "rectified-flow checkpoints already sample accurately at few "
            "Euler steps (--sampler rf), no distillation needed")
    dtype_name = args.dtype or str(tcfg.get("dtype", "float32"))
    img_size = int(tcfg.get("img_size", 64))
    n_types = int(tcfg["n_types"])

    model = CondUNetTiny(
        n_types=n_types, y_cont_dim=int(tcfg["y_cont_dim"]),
        base_ch=int(tcfg["base_ch"]), emb_dim=int(tcfg["emb_dim"]),
        cond_ch=int(tcfg.get("cond_ch", 8)), time_ch=int(tcfg.get("time_ch", 8)),
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        attn_impl=args.attn_impl, stem=str(tcfg.get("stem", "none")),
    )
    apply_fn = lambda prm, xt, t, yc, yv: model.apply({"params": prm}, xt, t, yc, yv)
    sde = VPSDE(
        beta_min=float(tcfg.get("beta_min", 0.1)),
        beta_max=float(tcfg.get("beta_max", 30.0)),
        logsnr_shift=float(tcfg.get("logsnr_shift", 0.0)),
    )

    # ---- schedule ----------------------------------------------------------
    fs, ts_ = args.from_steps, args.to_steps
    if fs < 1 or ts_ < 1 or (fs & (fs - 1)) or (ts_ & (ts_ - 1)) or ts_ > fs:
        raise SystemExit("--from-steps/--to-steps must be powers of 2 with "
                         f"to <= from, got {fs} -> {ts_}")
    schedule = []
    n = fs
    while n >= ts_:
        schedule.append(n)
        n //= 2
    print(f"distilling {teacher_pred}-teacher at cfg {args.cfg}: "
          f"phases {schedule} ({args.epochs} epochs each)")
    if teacher_pred == "eps" and args.phase0_epochs is None:
        print("WARNING: eps-parameterized teacher — phase 0 must also LEARN "
              "the eps->v parameterization conversion (loss starts ~1 and "
              "falls slowly). Give it --phase0-epochs >> --epochs, or train "
              "the teacher with --param v (recommended; see --phase0-epochs "
              "help).")

    # ---- run dir -----------------------------------------------------------
    if args.out_dir is None:
        from datetime import datetime

        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        args.out_dir = os.path.join(
            "runs", "distill", f"{stamp}_s{fs}-{ts_}_cfg{args.cfg:g}")
    ckpt_dir = os.path.join(args.out_dir, "checkpoints")
    results_dir = os.path.join(args.out_dir, "results")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(results_dir, exist_ok=True)
    metrics_path = os.path.join(args.out_dir, "metrics.jsonl")
    summary_path = os.path.join(args.out_dir, "distill_summary.jsonl")
    print(f"run dir: {args.out_dir}")

    # ---- data + mesh -------------------------------------------------------
    mesh = setup_mesh(args.shard, args.batch_size)
    data_kw: dict = {}
    if args.data_path and not args.procedural:
        ds = ResidentDiskDataset(args.data_path)
        data_kw = {"resident": (ds.x_u8, ds.y_cat, ds.y_cont)}
        n_items = len(ds)
        if img_size != int(ds.x_u8.shape[1]):
            raise SystemExit(f"teacher img_size {img_size} != archive "
                             f"{int(ds.x_u8.shape[1])}")
    else:
        data_kw = {"lattice_cfg": LatticeConfig(img_size=img_size, rot_only=True),
                   "dataset_seed": args.seed}
        n_items = args.n_samples

    if mesh is not None:
        teacher_params = replicate(mesh, teacher_params)

    y_cat_g, y_cont_g = sample_grid_conditions(
        args.grid_n or 36, n_types, int(tcfg["y_cont_dim"]), args.theta_max)

    key = jax.random.key(args.seed)
    tx = optax.adam(args.lr)
    if args.clip_grad_norm > 0.0:
        tx = optax.chain(
            optax.clip_by_global_norm(args.clip_grad_norm), tx)
    student_cfg = dict(tcfg)
    student_cfg.update({
        "param": "v", "dtype": dtype_name, "img_size": img_size,
        "distilled": True, "distill_cfg": float(args.cfg),
        "distill_t_end": float(args.t_end),
        "distill_teacher": os.path.abspath(args.teacher),
    })

    # Async checkpointing: the phase-end save overlaps with the (minutes-long)
    # grid + fidelity diagnostics pass; the context manager joins the writer
    # before any exit path, so every "saved:" print is durable by process end.
    ckptr = AsyncCheckpointer()

    with GracefulShutdown() as stop, ckptr:
        for phase, n_steps in enumerate(schedule):
            t0 = time.time()
            n_epochs = (args.phase0_epochs
                        if phase == 0 and args.phase0_epochs is not None
                        else args.epochs)
            # student init = teacher weights (fresh copies: the donated step
            # would otherwise free the teacher's buffers out from under phase+1)
            student = create_train_state(
                jax.tree.map(jnp.copy, teacher_params), tx, ema=args.ema_decay > 0)
            if mesh is not None:
                student = replicate(mesh, student)
            epoch_fn = make_distill_train_epoch(
                model, apply_fn, teacher_params, tx, sde, n_steps,
                n_types=n_types, guidance_scale=args.cfg,
                teacher_prediction=teacher_pred, t_end=args.t_end,
                ema_decay=args.ema_decay, batch_size=args.batch_size,
                n_items=n_items, mesh=mesh, **data_kw)
            losses = []
            for ep in range(n_epochs):
                key, k_ep = jax.random.split(key)
                student, loss = epoch_fn(student, k_ep)
                loss = float(jax.device_get(loss))
                losses.append(loss)
                print(f"[phase {phase} | {n_steps}-step] epoch {ep + 1}/"
                      f"{n_epochs} v-mse {loss:.5f}")
                append_jsonl(metrics_path,
                             {"phase": phase, "steps": n_steps,
                              "epoch": ep + 1, "loss": loss})
                if stop.requested:
                    # Preemption (utils/preempt.py): persist the partially-
                    # distilled student for THIS phase — it is a working
                    # n_steps-student, just undertrained; re-run the script with
                    # --teacher <this ckpt> --from-steps n_steps to continue.
                    student_cfg["distill_steps"] = n_steps
                    ckpt_path = os.path.join(
                        ckpt_dir, f"distilled_{n_steps}step.msgpack")
                    ckptr.save(ckpt_path, {
                        "epoch_next": ep + 1, "state": student,
                        "loss_hist": losses, "config": dict(student_cfg),
                    })
                    print(f"preempted ({stop.signame}) in phase {phase} after "
                          f"epoch {ep + 1}: partial student saved at {ckpt_path}")
                    return 0

            student_cfg["distill_steps"] = n_steps
            ckpt_path = os.path.join(ckpt_dir, f"distilled_{n_steps}step.msgpack")
            ckptr.save(ckpt_path, {
                "epoch_next": n_epochs, "state": student,
                "loss_hist": losses, "config": dict(student_cfg),
            })
            print(f"  saved: {ckpt_path}  ({time.time() - t0:.0f}s)")

            sample_params = student.sample_params
            # poll at the phase boundary too: a signal landing during the
            # final epoch's bookkeeping must not buy a whole grid sampling +
            # fidelity pass (minutes) inside a ~30 s preemption grace window
            if stop.requested:
                print(f"preempted ({stop.signame}) after phase {phase}: "
                      f"checkpoint saved at {ckpt_path}; skipping diagnostics "
                      f"and later phases")
                return 0
            if args.grid_n:
                x = sample_ddim(
                    apply_fn, sample_params, sde, y_cat_g, y_cont_g,
                    (int(y_cat_g.shape[0]), img_size, img_size, 1),
                    jax.random.key(args.seed + 1), n_steps=n_steps,
                    guidance_scale=0.0, t_end=args.t_end, n_types=n_types,
                    prediction="v")
                x = np.asarray(jax.device_get(x))
                side = int(math.ceil(math.sqrt(args.grid_n)))
                grid_path = os.path.join(results_dir, f"ddim_{n_steps}step.png")
                save_image_grid(
                    x[: args.grid_n], grid_path, nrows=side, ncols=side,
                    suptitle=f"distilled ddim | steps={n_steps} | "
                             f"baked cfg={args.cfg:g}")
                score = score_lattice_fidelity(
                    x[: args.grid_n], y_cat_g[: args.grid_n],
                    np.asarray(y_cont_g)[: args.grid_n, 1],
                    n_types=n_types, theta_max=args.theta_max)
                line = {"steps": n_steps,
                        "final_loss": losses[-1] if losses else None,
                        "type_acc": score["type_acc"],
                        "type_acc_merged01": score["type_acc_merged01"],
                        "theta_mae_deg": score["theta_mae_deg"],
                        "cond_fidelity": score["cond_fidelity"]}
                append_jsonl(summary_path, line)
                print(f"  grid: {grid_path}\n  fidelity: {json.dumps(line)}")

            # this phase's student teaches the next (always v from here on)
            teacher_params = sample_params
            teacher_pred = "v"
            if stop.requested:  # signal during the diagnostics pass
                print(f"preempted ({stop.signame}) after phase {phase} "
                      f"diagnostics: checkpoint saved at {ckpt_path}; "
                      f"skipping later phases")
                return 0

    print(f"done: {len(schedule)} phases -> {ckpt_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
