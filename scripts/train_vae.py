#!/usr/bin/env python3
"""Train the (conditional) VAE and emit the three diagnostic figure grids.

Same flag surface, loss semantics and artefacts as the reference trainer
(`/root/reference/scripts/train_vae.py:223-362`): MSE recon + beta-warmed
free-bits KL, per-epoch checkpoint `checkpoints/vae_last.msgpack`, and
recon / standard-prior / mixture-of-posteriors grids + loss curves under
results/. TPU-first: one jitted train step (donated state), disk archive
resident in HBM (or --procedural to rasterize batches on device, no files),
and fully vectorised MoP matching instead of the reference's per-cell Python
loop (`train_vae.py:174-189`).
"""

from __future__ import annotations

import argparse
import math
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
    p.add_argument("--img-size", type=int, default=64)
    p.add_argument("--n-samples", type=int, default=50_000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--clip-grad-norm", type=float, default=0.0,
                   help="Clip gradients to this global L2 norm before Adam "
                        "(optax.clip_by_global_norm inside the compiled "
                        "step). 0 disables (reference semantics). Changes "
                        "the optimizer-state layout: pass the same value "
                        "when resuming.")
    p.add_argument("--z-dim", type=int, default=32)
    p.add_argument("--n-types", type=int, default=4)
    p.add_argument("--y-cont-dim", type=int, default=4)
    p.add_argument("--beta", type=float, default=0.0003)
    p.add_argument("--device", type=str, default="auto")
    p.add_argument("--data-path", type=str, default="data/toycrystals_train_rotonly.npz")
    p.add_argument("--procedural", action="store_true",
                   help="TPU-native path: rasterize rot-only batches on device, no files")
    p.add_argument("--cond-drop", type=float, default=0.0)
    p.add_argument("--num-workers", type=int, default=0,
                   help="Accepted for reference CLI parity "
                        "(`/root/reference/scripts/train_vae.py:236`); unused "
                        "here — batches are rendered/gathered on device, there "
                        "is no host DataLoader to parallelise.")
    p.add_argument("--uncond", dest="uncond", action="store_true",
                   help="Train unconditional VAE.")
    p.add_argument("--cond", dest="uncond", action="store_false",
                   help="Train conditional VAE.")
    p.add_argument("--fused-epoch", type=int, default=1, choices=[0, 1],
                   help="Compile each whole epoch (shuffle + datagen/gather + "
                        "all steps) as ONE program.")
    p.add_argument("--free-bits", type=float, default=0.05,
                   help="Free bits threshold in nats per latent dim (0 disables).")
    p.add_argument("--resume", action="store_true",
                   help="Resume from checkpoints/vae_last.msgpack (params, "
                        "optimiser state, epoch, loss histories). New scope: "
                        "the reference trainer overwrites vae_last.pt every "
                        "epoch with no resume path (train_vae.py:336).")
    p.add_argument("--async-ckpt", type=int, default=1, choices=[0, 1],
                   help="Overlap checkpoint serialization + disk IO with the "
                        "next epoch (utils/AsyncCheckpointer); the process "
                        "waits for the last write before exiting. 0 = "
                        "synchronous saves.")
    add_shard_flag(p)
    add_dist_flags(p)
    p.set_defaults(uncond=False)
    args = p.parse_args()
    multihost = init_distributed(args)
    if multihost and (args.fsdp or getattr(args, "shard_model", 0) > 1):
        # this trainer checkpoints msgpack-only: the save gathers the full
        # state to one host, impossible when fsdp/tp leave each process
        # holding only its own shards (same refusal as the SDE trainer's
        # msgpack path; use the SDE trainer's --ckpt-format orbax for
        # multi-host sharded-state training)
        raise SystemExit("multi-host --fsdp/--shard-model is unsupported in "
                         "this trainer (msgpack checkpoints gather "
                         "non-addressable arrays); drop the flag or train "
                         "single-host")
    select_device(args.device)

    import jax
    import jax.numpy as jnp
    import optax

    from toycrystals_tpu.data import LatticeConfig, generate_batch, batch_iterator
    from toycrystals_tpu.parallel import replicate, shard_batch
    from toycrystals_tpu.models import CondVAE, VAE
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
    from toycrystals_tpu.train import (
        create_train_state,
        make_vae_train_epoch,
        make_vae_train_step,
    )
    from toycrystals_tpu.utils import (
        AsyncCheckpointer,
        GracefulShutdown,
        load_checkpoint,
        save_checkpoint,
    )
    from toycrystals_tpu.utils.figures import (
        save_image_grid,
        save_loss_curves,
        save_recon_grid,
        type_titles,
    )

    from toycrystals_tpu.parallel.multihost import is_primary

    # one process owns host-side writes (ckpt/figures); computation — incl.
    # the diagnostic grids — runs on every process (SPMD over the global mesh)
    primary = is_primary()

    rng = np.random.default_rng(args.seed)
    key = jax.random.key(args.seed)
    mesh = setup_mesh(args.shard, args.batch_size,
                      shard_model=getattr(args, "shard_model", 0))

    # --- data source ---
    procedural = args.procedural or not args.data_path
    if procedural:
        # Reference semantics: no data-path -> procedural full-variability set
        # (`train_vae.py:256-260`); --procedural keeps rot-only for figure parity.
        cfg = LatticeConfig(img_size=args.img_size, n_types=args.n_types,
                            rot_only=args.procedural)
        n_items = args.n_samples

        def get_batch(idx):
            return generate_batch(cfg, args.seed, jnp.asarray(idx))
    else:
        ds = ResidentDiskDataset(args.data_path)
        if args.fused_epoch:
            # closed over by the compiled epoch program (per-batch path
            # shards each gathered batch instead)
            ds.x_u8, ds.y_cat, ds.y_cont = replicate(
                mesh, (ds.x_u8, ds.y_cat, ds.y_cont)
            )
        n_items = len(ds)
        get_batch = ds.gather

    # --- model + optimiser ---
    if args.uncond:
        model = VAE(z_dim=args.z_dim)
        init_args = (jnp.zeros((2, args.img_size, args.img_size, 1)),)
    else:
        print("Training conditional VAE")
        model = CondVAE(z_dim=args.z_dim, n_types=args.n_types,
                        y_cont_dim=args.y_cont_dim, cond_drop=args.cond_drop)
        init_args = (
            jnp.zeros((2, args.img_size, args.img_size, 1)),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, args.y_cont_dim)),
        )
    params = model.init({"params": key, "reparam": key}, *init_args)["params"]
    tx = optax.adam(args.lr)
    if args.clip_grad_norm > 0.0:
        tx = optax.chain(
            optax.clip_by_global_norm(args.clip_grad_norm), tx)
    state = create_train_state(params, tx)

    import os

    ckpt_path = "checkpoints/vae_last.msgpack"
    start_epoch = 0
    loss_hist, recon_hist, kl_hist, klr_hist = [], [], [], []
    if args.resume and os.path.exists(ckpt_path):
        import flax.serialization as ser

        raw = load_checkpoint(ckpt_path)
        state = state.replace(
            params=ser.from_state_dict(state.params, raw["params"]),
            opt_state=ser.from_state_dict(state.opt_state, raw["opt_state"])
            if "opt_state" in raw else state.opt_state,
        )
        start_epoch = int(raw.get("epoch_next", 0))

        def _aslist(v):
            return [float(x) for x in (v.values() if isinstance(v, dict) else v)]

        hists = raw.get("hists", {})
        loss_hist = _aslist(hists.get("loss", []))
        recon_hist = _aslist(hists.get("recon", []))
        kl_hist = _aslist(hists.get("kl", []))
        klr_hist = _aslist(hists.get("kl_raw", []))
        print(f"resumed from: {ckpt_path} (next epoch {start_epoch + 1})")
    # mesh-aware placement: replication / tp channel sharding / --fsdp
    # ZeRO-3 (scripts/_common.py place_state).
    state = place_state(mesh, state, fsdp=args.fsdp)
    if args.fused_epoch:
        epoch_fn = make_vae_train_epoch(
            model, tx, args.free_bits, args.batch_size, n_items, uncond=args.uncond,
            lattice_cfg=cfg if procedural else None, dataset_seed=args.seed,
            resident=None if procedural else (ds.x_u8, ds.y_cat, ds.y_cont),
            mesh=mesh,
        )
    else:
        step = make_vae_train_step(model, tx, free_bits=args.free_bits, uncond=args.uncond)

    # training batches only — diagnostics (recon/MoP grids) use other
    # batch sizes that need not divide over the mesh
    get_train_batch = lambda idx: shard_batch(mesh, get_batch(idx))

    config = {
        "z_dim": args.z_dim, "n_types": args.n_types, "y_cont_dim": args.y_cont_dim,
        "cond_drop": args.cond_drop, "uncond": args.uncond, "img_size": args.img_size,
    }

    print("starting training loop...")

    n_batches = n_items // args.batch_size
    ckptr = AsyncCheckpointer()
    save_ckpt = ckptr.save if args.async_ckpt else save_checkpoint

    with GracefulShutdown() as stop, ckptr:
        for epoch in range(start_epoch, args.epochs):
            beta_eff = args.beta * min(1.0, (epoch + 1) / 5.0)  # warm-up (`train_vae.py:311`)
            t0 = time.perf_counter()
            key, sub = jax.random.split(key)
            if args.fused_epoch:
                state, em = epoch_fn(state, jnp.float32(beta_eff), sub)
                stacked = jax.device_get(em)
            else:
                batch_metrics = []  # device arrays; one host sync per epoch, not per step
                for bidx in batch_iterator(n_items, args.batch_size, rng=rng):
                    x, y_cat, y_cont = get_train_batch(bidx)
                    sub, k_step = jax.random.split(sub)
                    state, m = step(state, x, y_cat, y_cont, jnp.float32(beta_eff), k_step)
                    batch_metrics.append(m)
                stacked = jax.device_get(
                    jax.tree.map(lambda *xs: jnp.mean(jnp.stack(xs)), *batch_metrics)
                )
            dt = time.perf_counter() - t0
            avg = {k: float(v) for k, v in stacked.items()}
            if not math.isfinite(avg["loss"]):
                # divergence guard: halt before the checkpoint write so the last
                # finite-loss checkpoint survives (same policy as the SDE trainer)
                raise SystemExit(
                    f"epoch {epoch + 1}: non-finite loss ({avg['loss']}) — "
                    f"training diverged; last good checkpoint kept at {ckpt_path}."
                )
            loss_hist.append(avg["loss"])
            recon_hist.append(avg["recon"])
            kl_hist.append(avg["kl"])
            klr_hist.append(avg["kl_raw"])
            ips = n_batches * args.batch_size / dt
            if primary:
                print(
                    f"epoch {epoch + 1:02d}/{args.epochs} loss={avg['loss']:.4f} "
                    f"recon={avg['recon']:.4f} kl={avg['kl']:.6f} ({ips:.0f} img/s)"
                )
                # `params` stays top-level so the frozen-VAE consumers
                # (train_diffusion_prior.py) keep their schema; the extra fields make
                # the checkpoint resumable.
                save_ckpt(ckpt_path, {
                    "params": state.params, "config": config,
                    "opt_state": state.opt_state, "epoch_next": epoch + 1,
                    "hists": {"loss": loss_hist, "recon": recon_hist,
                              "kl": kl_hist, "kl_raw": klr_hist},
                })
            if stop.requested:
                # Preemption (utils/preempt.py): the per-epoch save above is
                # durable before process exit (AsyncCheckpointer joins its
                # writer on context exit); skip diagnostics and exit clean.
                print(f"preempted ({stop.signame}) after epoch {epoch + 1}: "
                      f"checkpoint saved at {ckpt_path} — continue with --resume")
                return 0

    # --- diagnostics on one fresh batch (`train_vae.py:339-347`) ---
    fresh_idx = rng.permutation(n_items)[: args.batch_size]
    x0, y0_cat, y0_cont = get_batch(fresh_idx)
    x0, y0_cat, y0_cont = x0[:16], y0_cat[:16], y0_cont[:16]

    key, k_rep = jax.random.split(key)
    if args.uncond:
        x_hat, _, _ = model.apply({"params": state.params}, x0, rngs={"reparam": k_rep})
    else:
        x_hat, _, _ = model.apply(
            {"params": state.params}, x0, y0_cat, y0_cont, rngs={"reparam": k_rep}
        )
    if primary:
        save_recon_grid(x0, x_hat, y0_cat, "results/vae_recon.png")

    # standard-prior samples (`train_vae.py:76-111`)
    n_grid = 36
    key, k_z = jax.random.split(key)
    z = jax.random.normal(k_z, (n_grid, args.z_dim))
    if args.uncond:
        x_prior = model.apply({"params": state.params}, z, method="decode")
        if primary:
            save_image_grid(x_prior, "results/vae_samples_prior.png")
    else:
        yg_cat, yg_cont = sample_grid_conditions(n_grid, args.n_types, args.y_cont_dim)
        x_prior = model.apply(
            {"params": state.params}, z, yg_cat, yg_cont, method="decode"
        )
        if primary:
            save_image_grid(x_prior, "results/vae_samples_prior.png", titles=type_titles(yg_cat))

    # mixture-of-posteriors samples (`train_vae.py:115-220`), vectorised matching
    pool_size = 4096
    pool_idx = rng.permutation(n_items)[: min(pool_size, n_items)]
    px, pcat, pcont = get_batch(pool_idx)
    key, k_rep2, k_pick = jax.random.split(key, 3)
    if args.uncond:
        sel = jax.random.randint(k_pick, (n_grid,), 0, px.shape[0])
        mu, logvar = model.apply({"params": state.params}, px[sel], method="encode")
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(k_rep2, mu.shape)
        x_mop = model.apply({"params": state.params}, z, method="decode")
        if primary:
            save_image_grid(x_mop, "results/vae_samples_mop.png")
    else:
        yg_cat, yg_cont = sample_grid_conditions(n_grid, args.n_types, args.y_cont_dim)

        def match(tc, tth):  # same type, nearest theta (`train_vae.py:174-189`)
            d = jnp.abs(pcont[:, 1] - tth)
            return jnp.argmin(jnp.where(pcat == tc, d, jnp.inf))

        sel = jax.vmap(match)(yg_cat, yg_cont[:, 1])
        mu, logvar = model.apply(
            {"params": state.params}, px[sel], pcat[sel], pcont[sel], method="encode"
        )
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(k_rep2, mu.shape)
        # decode with the *target* condition (decode_with_target=True, `:197-205`)
        x_mop = model.apply(
            {"params": state.params}, z, yg_cat, yg_cont, method="decode"
        )
        if primary:
            save_image_grid(x_mop, "results/vae_samples_mop.png", titles=type_titles(yg_cat))

    if primary:
        save_loss_curves(
            {"total": loss_hist, "recon": recon_hist, "kl": kl_hist}, "results/vae_loss.png"
        )
        print("saved: results/vae_recon.png, results/vae_samples_prior.png, results/vae_loss.png")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
