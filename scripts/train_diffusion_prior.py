#!/usr/bin/env python3
"""Train the latent diffusion prior on cached (frozen-)VAE latents.

Same flag surface and pipeline as the reference
(`/root/reference/scripts/train_diffusion_prior.py:108-316`): frozen VAE from
checkpoint, latent cache built once (z = mu or a posterior sample) and
standardised per-dim, FiLM prior (n_blocks=8, y_cat_emb_dim=64 hardcoded like
the trainer, `:196-204`), small-t-biased timesteps t = clamp((u^2 T), 0, T-1),
per-t-bucket diagnostic losses, DDIM(eta=0) sample grid decoded through the
frozen VAE every epoch, --resume / --sample-only.

TPU-first: the latent cache is built by a jitted batched encode sweep; the
DDIM loop is one compiled lax.scan (`toycrystals_tpu.models.diffusion_prior`).
"""

from __future__ import annotations

import argparse
import math
import os
import time

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


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--data-path", type=str, default="data/toycrystals_train_rotonly.npz")
    p.add_argument("--procedural", action="store_true",
                   help="rasterize rot-only batches on device (no image archive)")
    # Load frozen VAE
    p.add_argument("--vae-ckpt", type=str, default="checkpoints/vae_last.msgpack")
    p.add_argument("--z-dim", type=int, default=32)
    p.add_argument("--n-types", type=int, default=4)
    p.add_argument("--y-cont-dim", type=int, default=4)
    # Latent dataset
    p.add_argument("--z-target", type=str, choices=["mu", "sample"], default="mu")
    p.add_argument("--latent-cache", type=str, default="data/latents_rotonly_mu.npz")
    p.add_argument("--rebuild-latents", action="store_true")
    p.add_argument("--max-items", type=int, default=50_000)
    # Diffusion
    p.add_argument("--T", type=int, default=200)
    p.add_argument("--beta-start", type=float, default=1e-4)
    p.add_argument("--beta-end", type=float, default=1.0)
    p.add_argument("--t-emb-dim", type=int, default=64)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=600)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--clip-grad-norm", type=float, default=0.0,
                   help="Clip gradients to this global L2 norm before Adam "
                        "(optax.clip_by_global_norm inside the compiled "
                        "step). 0 disables (reference semantics). Changes "
                        "the optimizer-state layout: pass the same value "
                        "when resuming.")
    # Sampling
    p.add_argument("--ddim-steps", type=int, default=50)
    p.add_argument("--prior-ckpt", type=str, default="checkpoints/diffusion_prior_last.msgpack")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--sample-only", action="store_true")
    p.add_argument("--fused-epoch", type=int, default=1, choices=[0, 1],
                   help="Compile each whole epoch (shuffle + all steps + "
                        "bucket diagnostics) as ONE program.")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="Save the prior checkpoint every N epochs (always at "
                        "the end; 0 = end only).")
    p.add_argument("--async-ckpt", type=int, default=1, choices=[0, 1],
                   help="Overlap checkpoint serialization + disk IO with the "
                        "next epoch (utils/AsyncCheckpointer); the process "
                        "waits for the last write before exiting. 0 = "
                        "synchronous saves.")
    add_shard_flag(p)
    p.add_argument("--shard-pipe", type=int, default=0,
                   help="Pipeline parallelism: place the prior's 8 FiLM "
                        "blocks on N stages of a ('data','pipe') mesh and "
                        "stream microbatches through them (shard_map + "
                        "ppermute, parallel/pipeline.py). Composes with "
                        "--shard; 8 must divide by N. 0/1 = off.")
    p.add_argument("--pipe-micro", type=int, default=4,
                   help="Microbatches per pipeline replica (bubble fraction "
                        "= (stages-1)/(micro+stages-1)). batch-size must "
                        "divide by max(1,--shard) * this.")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="Train the mixture-of-experts prior instead of the "
                        "dense FiLM prior: E switch-routed expert MLPs per "
                        "block, routed on the (t, y) conditioning "
                        "(models/moe_prior.py — new TPU scope, no reference "
                        "counterpart). 0 = dense. Resume/sample-only need "
                        "the same value the checkpoint was trained with "
                        "(recorded in its config).")
    p.add_argument("--moe-aux-weight", type=float, default=0.01,
                   help="Weight of the switch load-balancing auxiliary loss "
                        "(only with --moe-experts).")
    p.add_argument("--shard-expert", type=int, default=0,
                   help="Expert parallelism: shard the MoE prior's stacked "
                        "experts (and their Adam moments) over N devices of "
                        "a ('data','expert') mesh; the per-block combine is "
                        "one psum over ICI (parallel/expert.py). Requires "
                        "--moe-experts divisible by N; composes with "
                        "--shard. 0/1 = off.")
    p.add_argument("--sample-every", type=int, default=1,
                   help="epochs between sample grids (reference samples every "
                        "epoch); 0 disables in-training grids")
    add_dist_flags(p)
    args = p.parse_args()
    multihost = init_distributed(args)
    if multihost and (args.fsdp or getattr(args, "shard_model", 0) > 1
                      or getattr(args, "shard_pipe", 0) > 1
                      or getattr(args, "shard_expert", 0) > 1):
        # msgpack-only checkpoints: the save gathers the full state to one
        # host, impossible under any weight-sharding axis (fsdp/tp, and
        # equally pipe stages / expert slices) when the axis spans
        # processes (same refusal as the SDE trainer's msgpack path)
        raise SystemExit("multi-host --fsdp/--shard-model/--shard-pipe/"
                         "--shard-expert is unsupported in this trainer "
                         "(msgpack checkpoints gather non-addressable "
                         "arrays); drop the flag or train single-host")
    select_device(args.device)

    import flax.serialization as ser
    import jax
    import jax.numpy as jnp
    import optax

    from toycrystals_tpu.data import LatticeConfig, generate_batch, batch_iterator
    from toycrystals_tpu.models import CondVAE, DiffusionPriorFiLM, DiffusionSchedule
    from toycrystals_tpu.models.diffusion_prior import ddim_sample
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
    from toycrystals_tpu.train import (
        create_train_state,
        make_prior_train_epoch,
        make_prior_train_step,
    )
    from toycrystals_tpu.utils import (
        AsyncCheckpointer,
        GracefulShutdown,
        load_checkpoint,
        save_checkpoint,
    )
    from toycrystals_tpu.utils.figures import save_image_grid, save_loss_curves, type_titles

    from toycrystals_tpu.parallel.multihost import is_primary

    # one process owns host-side writes (ckpt/figures); computation runs on
    # every process (SPMD over the global mesh)
    primary = is_primary()

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)
    pipe = max(1, args.shard_pipe) if args.shard_pipe > 1 else 0
    ep = args.shard_expert if args.shard_expert > 1 else 0
    if ep and pipe:
        raise SystemExit("--shard-expert and --shard-pipe are mutually "
                         "exclusive (pick one way to split the blocks)")
    if ep and getattr(args, "shard_model", 0) > 1:
        raise SystemExit("--shard-expert and --shard-model are mutually "
                         "exclusive (pick one way to split the weights)")
    if ep and (args.moe_experts <= 0 or args.moe_experts % ep):
        raise SystemExit(f"--shard-expert {ep} requires --moe-experts "
                         f"divisible by it (got {args.moe_experts})")
    if args.moe_experts and pipe:
        raise SystemExit("--moe-experts does not support --shard-pipe "
                         "(the pipelined forward is the dense FiLM prior)")
    if pipe:
        if getattr(args, "shard_model", 0) > 1:
            raise SystemExit("--shard-pipe and --shard-model are mutually "
                             "exclusive (pick one way to split the weights)")
        if 8 % pipe:
            raise SystemExit(f"--shard-pipe {pipe} must divide the prior's "
                             "8 blocks")
        n_data = max(1, args.shard)
        if args.batch_size % (n_data * args.pipe_micro):
            raise SystemExit(
                f"batch size {args.batch_size} must divide by --shard "
                f"{n_data} x --pipe-micro {args.pipe_micro}")
        from toycrystals_tpu.parallel import make_mesh_pp

        print(f"2-D mesh: {n_data} data x {pipe} pipe stages")
        try:
            mesh = make_mesh_pp(n_data, pipe)
        except ValueError as e:
            raise SystemExit(str(e))
    elif ep:
        from toycrystals_tpu.parallel import make_mesh_ep

        n_data = max(1, args.shard)
        if args.batch_size % n_data:
            raise SystemExit(f"batch size {args.batch_size} not divisible "
                             f"by --shard {args.shard}")
        print(f"2-D mesh: {n_data} data x {ep} expert devices")
        try:
            mesh = make_mesh_ep(n_data, ep)
        except ValueError as e:
            raise SystemExit(str(e))
    else:
        mesh = setup_mesh(args.shard, args.batch_size,
                          shard_model=getattr(args, "shard_model", 0))
    if mesh is not None and args.sample_only:
        print("note: --shard only parallelises training; --sample-only runs "
              "on one device")

    os.makedirs("results", exist_ok=True)
    os.makedirs("checkpoints", exist_ok=True)
    os.makedirs("data", exist_ok=True)

    # --- frozen VAE (`train_diffusion_prior.py:154-159`) ---
    vae = CondVAE(z_dim=args.z_dim, n_types=args.n_types,
                  y_cont_dim=args.y_cont_dim, cond_drop=0.0)
    if args.vae_ckpt.endswith(".pt"):
        # reference torch VAE checkpoint (raw state_dict) converts directly
        from toycrystals_tpu.utils.torch_interop import load_torch_vae_checkpoint

        vae_obj = load_torch_vae_checkpoint(args.vae_ckpt)
    else:
        vae_obj = load_checkpoint(args.vae_ckpt)
    vae_params = vae_obj["params"] if "params" in vae_obj else vae_obj
    vae_z_dim = args.z_dim

    @jax.jit
    def encode_mu_logvar(x, y_cat, y_cont):
        return vae.apply({"params": vae_params}, x, y_cat, y_cont, method="encode")

    @jax.jit
    def vae_decode(z, y_cat, y_cont):
        return vae.apply({"params": vae_params}, z, y_cat, y_cont, method="decode")

    # --- latent dataset (`train_diffusion_prior.py:17-59,161-187`) ---
    if (not args.rebuild_latents) and os.path.exists(args.latent_cache):
        obj = np.load(args.latent_cache)
        z0 = jnp.asarray(obj["z0"])
        y_cat = jnp.asarray(obj["y_cat"].astype(np.int32))
        y_cont = jnp.asarray(obj["y_cont"].astype(np.float32))
        z_mean = jnp.asarray(obj["z_mean"]) if "z_mean" in obj else jnp.mean(z0, 0, keepdims=True)
        z_std = (jnp.asarray(obj["z_std"]) if "z_std" in obj
                 else jnp.clip(jnp.std(z0, 0, keepdims=True), min=1e-6))
        print(f"loaded latents: {args.latent_cache}  z0={tuple(z0.shape)}")
    else:
        if args.procedural or not args.data_path:
            cfg = LatticeConfig(img_size=64, n_types=args.n_types, rot_only=True)
            n_items = args.max_items

            def get_batch(idx):
                return generate_batch(cfg, args.seed, jnp.asarray(idx))
        else:
            ds = ResidentDiskDataset(args.data_path)
            n_items = min(len(ds), args.max_items)
            get_batch = ds.gather

        zs, cats, conts = [], [], []
        t0 = time.perf_counter()
        for start in range(0, n_items, 512):
            idx = np.arange(start, min(start + 512, n_items))
            x, yc, yv = get_batch(idx)
            mu, logvar = encode_mu_logvar(x, yc, yv)
            if args.z_target == "mu":
                z = mu
            else:
                key, sub = jax.random.split(key)
                z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(sub, mu.shape)
            zs.append(z)
            cats.append(yc)
            conts.append(yv)
        z0 = jnp.concatenate(zs)
        y_cat = jnp.concatenate(cats)
        y_cont = jnp.concatenate(conts)
        z_mean = jnp.mean(z0, axis=0, keepdims=True)
        z_std = jnp.clip(jnp.std(z0, axis=0, keepdims=True), min=1e-6)
        np.savez(args.latent_cache, z0=np.asarray(z0), y_cat=np.asarray(y_cat),
                 y_cont=np.asarray(y_cont), z_mean=np.asarray(z_mean),
                 z_std=np.asarray(z_std))
        print(f"saved latents: {args.latent_cache}  z0={tuple(z0.shape)} "
              f"({time.perf_counter() - t0:.1f}s)")

    # Standardise for diffusion training (`train_diffusion_prior.py:190`).
    z0_norm = (z0 - z_mean) / z_std
    n_items = int(z0_norm.shape[0])

    # --- prior + schedule (`train_diffusion_prior.py:196-212`) ---
    if args.moe_experts > 0:
        from toycrystals_tpu.models import DiffusionPriorMoE

        print(f"MoE prior: {args.moe_experts} experts/block "
              f"(aux weight {args.moe_aux_weight})")
        prior = DiffusionPriorMoE(
            z_dim=vae_z_dim, n_types=args.n_types, y_cont_dim=args.y_cont_dim,
            n_experts=args.moe_experts, t_emb_dim=args.t_emb_dim,
            width=args.width, n_blocks=8, y_cat_emb_dim=64,
        )
    else:
        prior = DiffusionPriorFiLM(
            z_dim=vae_z_dim, n_types=args.n_types, y_cont_dim=args.y_cont_dim,
            t_emb_dim=args.t_emb_dim, width=args.width, n_blocks=8, y_cat_emb_dim=64,
        )
    sched = DiffusionSchedule.linear(args.T, args.beta_start, args.beta_end)

    params = prior.init(
        key, jnp.zeros((2, vae_z_dim)), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2, args.y_cont_dim)),
    )["params"]
    tx = optax.adam(args.lr)
    if args.clip_grad_norm > 0.0:
        tx = optax.chain(
            optax.clip_by_global_norm(args.clip_grad_norm), tx)
    state = create_train_state(params, tx)

    if (args.sample_only or args.resume) and os.path.exists(args.prior_ckpt):
        if args.prior_ckpt.endswith(".pt"):
            from toycrystals_tpu.utils.torch_interop import load_torch_prior_checkpoint

            raw = load_torch_prior_checkpoint(args.prior_ckpt)
        else:
            raw = load_checkpoint(args.prior_ckpt)
        state = state.replace(params=ser.from_state_dict(state.params, raw["params"]))
        print(f"loaded diffusion prior: {args.prior_ckpt}")

    prior_apply = lambda prm, z, t, yc, yv: prior.apply({"params": prm}, z, t, yc, yv)

    if pipe:
        # Pipeline layout: blocks stacked [stages, blocks/stage, ...] and
        # stage-sharded over 'pipe' (so are the Adam moments); training AND
        # DDIM sampling run through the pipelined forward. Checkpoints keep
        # the flax layout (stack on load, unstack on save).
        from toycrystals_tpu.parallel import (
            make_pipeline_apply,
            place_pipeline_state,
            stack_pipeline_params,
            unstack_pipeline_params,
        )

        # re-create the state so the Adam moments are born in (and shard
        # with) the stacked layout
        state = create_train_state(stack_pipeline_params(state.params, pipe), tx)
        pipe_apply = make_pipeline_apply(mesh, args.pipe_micro,
                                         t_emb_dim=args.t_emb_dim)

    def save_samples(out_path):
        yg_cat, yg_cont = sample_grid_conditions(36, args.n_types, args.y_cont_dim)
        key_s = jax.random.key(args.seed + 1)
        if pipe and 36 % (max(1, args.shard) * args.pipe_micro) == 0:
            z_norm = ddim_sample(pipe_apply, state.params, sched, yg_cat, yg_cont,
                                 args.ddim_steps, vae_z_dim, key_s)
        elif pipe:
            # grid batch doesn't divide the pipeline's microbatching —
            # sample single-device from the unstacked weights instead
            z_norm = ddim_sample(prior_apply, unstack_pipeline_params(state.params),
                                 sched, yg_cat, yg_cont,
                                 args.ddim_steps, vae_z_dim, key_s)
        else:
            z_norm = ddim_sample(prior_apply, state.params, sched, yg_cat, yg_cont,
                                 args.ddim_steps, vae_z_dim, key_s)
        z = z_norm * z_std + z_mean  # un-standardise (`train_diffusion_prior.py:92-93`)
        x = vae_decode(z, yg_cat, yg_cont)
        if primary:
            save_image_grid(x, out_path, titles=type_titles(yg_cat))

    if args.sample_only:
        save_samples("results/diffusion_samples.png")
        print("sample-only: saved results/diffusion_samples.png")
        return 0

    from toycrystals_tpu.parallel import replicate, shard_batch

    # mesh-aware placement: replicated on a 1-D data mesh (1/N-sharded
    # with --fsdp); dense columns / embedding features / Adam moments
    # sharded 1/N over 'model' on a ('data','model') mesh
    # (parallel/tensor.py) — the width-1024 MLP is the most
    # tensor-parallel-natural model in the framework; stage-sharded
    # stacked blocks over 'pipe' on a pipeline mesh (parallel/pipeline.py).
    if pipe:
        state = place_pipeline_state(mesh, state)
        train_apply = pipe_apply
    elif mesh is not None and "expert" in mesh.axis_names:
        from toycrystals_tpu.parallel import ep_coverage, place_expert_state

        state = place_expert_state(mesh, state, args.moe_experts)
        print(f"expert parallelism: "
              f"{ep_coverage(mesh, state.params, args.moe_experts):.0%} of "
              "param elements sharded over 'expert'")
        train_apply = None
    else:
        state = place_state(mesh, state, fsdp=args.fsdp, what="--width")
        train_apply = None
    if args.fused_epoch:
        # replicate the latent cache (closed over by the epoch program);
        # GSPMD shards the per-step gathered batches via the mesh
        z0_norm, y_cat, y_cont = replicate(mesh, (z0_norm, y_cat, y_cont))
        epoch_fn = make_prior_train_epoch(
            prior, tx, args.T, args.batch_size, (z0_norm, y_cat, y_cont), mesh=mesh,
            apply_fn=train_apply,
            aux_weight=args.moe_aux_weight if args.moe_experts else 0.0,
        )
    else:
        step = make_prior_train_step(
            prior, tx, T=args.T, apply_fn=train_apply,
            aux_weight=args.moe_aux_weight if args.moe_experts else 0.0)

    loss_hist = []
    print("starting diffusion training loop.")
    steps_per_epoch = n_items // args.batch_size
    ckptr = AsyncCheckpointer()
    save_ckpt = ckptr.save if args.async_ckpt else save_checkpoint

    with GracefulShutdown() as stop, ckptr:
        for epoch in range(args.epochs):
            t0 = time.perf_counter()
            key, sub = jax.random.split(key)
            if args.fused_epoch:
                state, em = epoch_fn(state, sched, sub)
                avg = float(em["loss"])
                bucket_sum = np.asarray(em["bucket_sum"])
                bucket_n = np.asarray(em["bucket_n"])
            else:
                metrics = []
                for bidx in batch_iterator(n_items, args.batch_size, rng=rng):
                    bidx = jnp.asarray(bidx)
                    sub, k_step = jax.random.split(sub)
                    batch = shard_batch(mesh, (z0_norm[bidx], y_cat[bidx], y_cont[bidx]))
                    state, m = step(state, sched, *batch, k_step)
                    metrics.append(m)
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *metrics)
                avg = float(jnp.mean(stacked["loss"]))
                bucket_sum = np.asarray(jnp.sum(stacked["bucket_sum"], axis=0))
                bucket_n = np.asarray(jnp.sum(stacked["bucket_n"], axis=0))
            dt = time.perf_counter() - t0
            if not math.isfinite(avg):
                # divergence guard: halt before the checkpoint write so the last
                # finite-loss checkpoint survives (same policy as the SDE trainer)
                raise SystemExit(
                    f"epoch {epoch + 1}: non-finite loss ({avg}) — training "
                    f"diverged; last good checkpoint kept at {args.prior_ckpt}."
                )
            loss_hist.append(avg)
            if primary:
                print(f"epoch {epoch + 1:02d}/{args.epochs} diffusion_loss={avg:.6f} "
                      f"({steps_per_epoch * args.batch_size / dt:.0f} z/s)")

            # single read per epoch: a signal landing between two reads must
            # not let the preempt branch claim a save that never happened
            preempted = stop.requested
            if preempted or (
                args.ckpt_every > 0 and (epoch + 1) % args.ckpt_every == 0
            ) or (epoch == args.epochs - 1):
                if primary:
                    save_ckpt(args.prior_ckpt, {
                        "params": unstack_pipeline_params(state.params) if pipe
                        else state.params,
                        "config": {"z_dim": vae_z_dim, "n_types": args.n_types,
                                   "y_cont_dim": args.y_cont_dim, "t_emb_dim": args.t_emb_dim,
                                   "width": args.width, "n_blocks": 8, "y_cat_emb_dim": 64,
                                   "T": args.T, "beta_start": args.beta_start,
                                   "beta_end": args.beta_end,
                                   "n_experts": args.moe_experts},
                    })
            if preempted:
                # Preemption (utils/preempt.py): weights saved above regardless
                # of --ckpt-every; continue with --resume (weights-only, the
                # reference's resume semantics).
                print(f"preempted ({stop.signame}) after epoch {epoch + 1}: "
                      f"checkpoint saved at {args.prior_ckpt} — continue with "
                      f"--resume")
                break

            if args.sample_every > 0 and (
                (epoch + 1) % args.sample_every == 0 or epoch == args.epochs - 1
            ):
                save_samples("results/diffusion_samples.png")

            bucket_avg = bucket_sum / np.maximum(bucket_n, 1.0)
            if primary:
                print("  bucket loss (low t -> high t):", [f"{v:.3f}" for v in bucket_avg])

    if primary:
        save_loss_curves({"diffusion_loss": loss_hist}, "results/diffusion_loss.png")
        print("saved: results/diffusion_samples.png, results/diffusion_loss.png, "
              f"{args.prior_ckpt}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
