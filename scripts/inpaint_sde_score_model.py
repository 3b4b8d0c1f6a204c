#!/usr/bin/env python3
"""Inpaint masked crystal images with a trained SDE score model.

NEW TPU scope — the reference has no conditional-completion path (its only
samplers generate full images, `/root/reference/src/toycrystals/models/
sde_score_model.py:452-569`). This drives
`models.sample_inpaint_reverse_sde`: ground-truth rot_only lattices are
rendered procedurally at the canonical grid conditions (type cycle +
theta sweep), a region is masked out, and the model regenerates it
conditioned on the surrounding crystal + (type, theta). Because the source
is procedural, the script reports a QUANTITATIVE continuation error: MSE of
the generated region against the hidden ground truth (the known boundary
pins the lattice phase, so a faithful model reconstructs the hidden atoms
in place).

Outputs an n x 3 figure (original | masked | inpainted) and one JSON
metrics line.

Example:
  python scripts/inpaint_sde_score_model.py --out-dir runs/sde_... \
      --mask center --mask-frac 0.5 --steps 200 --cfg 1.5 --resample 2
"""

from __future__ import annotations

import argparse
import json
import math
import os

from _common import (  # noqa: E402
    add_shard_flag,
    infer_score_ckpt_path,
    select_device,
    setup_mesh,
)


def _mask_batch(kind: str, frac: float, n: int, hw: int):
    """(n, hw, hw, 1) float32; 1 = keep from the source, 0 = regenerate."""
    import numpy as np

    m = np.ones((n, hw, hw, 1), np.float32)
    k = max(1, min(hw - 1, int(round(hw * frac))))
    if kind == "center":  # hide a centred k x k box
        lo = (hw - k) // 2
        m[:, lo:lo + k, lo:lo + k, :] = 0.0
    elif kind == "left":  # hide the left k columns
        m[:, :, :k, :] = 0.0
    elif kind == "bands":  # hide every other band of k rows
        for r0 in range(0, hw, 2 * k):
            m[:, r0:r0 + k, :, :] = 0.0
    else:
        raise ValueError(f"mask must be center|left|bands, got {kind}")
    return m


def _render_sources(n: int, img_size: int, n_types: int, theta_max: float):
    """Clean max-normalised rot_only lattices at the grid conditions —
    the same renderer the training data and fidelity templates use
    (data/lattice.py; cf. utils/fidelity.py:_render_templates)."""
    import jax
    import jax.numpy as jnp

    from toycrystals_tpu.data.lattice import (
        LatticeConfig,
        make_points,
        static_point_budget,
    )
    from toycrystals_tpu.data.rasterize import rasterize_batch
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions

    y_cat, y_cont = sample_grid_conditions(n, n_types, 4, theta_max)
    cfg = LatticeConfig(img_size=img_size, rot_only=True)
    budget = static_point_budget(cfg)

    def one(t, th):
        params = {
            "lattice_type": t.astype(jnp.int32), "a": jnp.float32(10.0),
            "theta": th.astype(jnp.float32), "vacancy": jnp.float32(0.0),
            "jitter": jnp.float32(0.0), "aspect": jnp.float32(1.0),
        }
        return make_points(cfg, budget, params, jax.random.key(0))

    pts, wts = jax.vmap(one)(y_cat, y_cont[:, 1])
    sig = jnp.full((n,), max(0.6, 0.12 * 10.0), jnp.float32)
    x = rasterize_batch(pts, wts, sig, img_size, img_size, "xla")[..., None]
    x = x / jnp.clip(jnp.max(x, axis=(1, 2, 3), keepdims=True), 1e-6)
    return x, y_cat, y_cont


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    p.add_argument("--out-dir", required=True,
                   help="Training output dir containing checkpoints/")
    p.add_argument("--ckpt", default="last",
                   help="Checkpoint: last, best, or path/to/file.msgpack|.pt")
    p.add_argument("--n", type=int, default=12)
    p.add_argument("--mask", type=str, default="center",
                   choices=["center", "left", "bands"])
    p.add_argument("--mask-frac", type=float, default=0.5,
                   help="Masked extent as a fraction of the image side.")
    p.add_argument("--resample", type=int, default=1,
                   help="RePaint harmonisation repeats per step (1 = plain "
                        "replacement; 2-4 adapts the generated region to the "
                        "known boundary at resample x the model evals).")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--cfg", type=float, default=0.0)
    p.add_argument("--t-end", type=float, default=1e-3)
    p.add_argument("--theta-max", type=float, default=math.pi / 3.0)
    p.add_argument("--use-ema", type=int, default=0, choices=[0, 1])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk", type=int, default=None,
                   help="Max images per compiled dispatch (tunnel-safe "
                        "chunking, same semantics as the sampler CLI); "
                        "default auto, 0 disables.")
    p.add_argument("--clip-x0", type=int, default=0, choices=[0, 1])
    p.add_argument("--attn-impl", type=str, default="auto",
                   choices=["auto", "xla", "flash"])
    p.add_argument("--out-path", default=None)
    add_shard_flag(p, space=True, train=False)
    args = p.parse_args()
    select_device(args.device)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from toycrystals_tpu.models import (
        CondUNetTiny,
        VPSDE,
        auto_chunk,
        eps_apply_from_v,
        sample_chunked,
        sample_inpaint_reverse_sde,
    )
    from toycrystals_tpu.utils import load_score_payload
    from toycrystals_tpu.utils.figures import save_image_grid

    # checkpoint resolution — same conventions as the sampler CLI
    # (msgpack / reference .pt / --ckpt-format orbax dir / last|best)
    ckpt_path = infer_score_ckpt_path(args.out_dir, args.ckpt)
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(f"Checkpoint not found: {ckpt_path}")
    payload = load_score_payload(ckpt_path)
    cfg = payload["config"]
    state = payload["state"]
    params = state["params"]
    if args.use_ema == 1 and state.get("ema_params") is not None:
        params = state["ema_params"]

    dtype_name = str(cfg.get("dtype", "float32"))
    model = CondUNetTiny(
        n_types=int(cfg["n_types"]), y_cont_dim=int(cfg["y_cont_dim"]),
        base_ch=int(cfg["base_ch"]), emb_dim=int(cfg["emb_dim"]),
        cond_ch=int(cfg.get("cond_ch", 8)), time_ch=int(cfg.get("time_ch", 8)),
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
        attn_impl=args.attn_impl, stem=str(cfg.get("stem", "none")),
    )
    sde = VPSDE(beta_min=float(cfg.get("beta_min", 0.1)),
                beta_max=float(cfg.get("beta_max", 30.0)),
                logsnr_shift=float(cfg.get("logsnr_shift", 0.0)))
    apply_fn = lambda prm, xt, t, yc, yv: model.apply({"params": prm}, xt, t, yc, yv)
    if str(cfg.get("param", "eps")) == "fm":
        raise SystemExit(
            "inpainting runs the reverse-SDE repaint loop, which needs a VP "
            "eps/v model; this checkpoint was trained with --param fm "
            "(rectified flow)")
    if str(cfg.get("param", "eps")) == "v":
        apply_fn = eps_apply_from_v(sde, apply_fn)

    img_size = int(cfg.get("img_size", 64))
    n_types = int(cfg["n_types"])
    x_src, y_cat, y_cont = _render_sources(args.n, img_size, n_types, args.theta_max)
    mask = jnp.asarray(_mask_batch(args.mask, args.mask_frac, args.n, img_size))

    mesh = setup_mesh(args.shard, shard_space=getattr(args, "shard_space", 0),
                      shard_model=getattr(args, "shard_model", 0),
                      img_size=img_size)
    chunk = args.chunk
    if chunk is None:
        # resample multiplies the per-step model evals; fold it into the
        # tunnel-safe dispatch budget
        chunk = auto_chunk(img_size, args.steps * max(1, args.resample), "sde")
    if chunk == 0:
        chunk = args.n
    sp_kw = {}
    if mesh is not None and "space" in mesh.axis_names:
        from toycrystals_tpu.parallel import image_sharding

        sp_kw["sharding"] = image_sharding(mesh)
    x_out = sample_chunked(
        sample_inpaint_reverse_sde, apply_fn, params, sde, y_cat, y_cont,
        (args.n, img_size, img_size, 1), jax.random.key(args.seed),
        chunk=chunk, mesh=mesh, batch_kw={"x_known": x_src, "mask": mask},
        n_steps=args.steps, guidance_scale=args.cfg, t_end=args.t_end,
        n_types=n_types, resample=args.resample, clip_x0=bool(args.clip_x0),
        **sp_kw,
    )

    x_src_np = np.asarray(x_src, np.float32)
    mask_np = np.asarray(mask, np.float32)
    # continuation error: generated region vs the hidden ground truth
    gen = 1.0 - mask_np
    mse = float(np.sum(gen * (x_out - x_src_np) ** 2) / max(1.0, np.sum(gen)))
    base = float(np.sum(gen * (x_src_np - x_src_np.mean()) ** 2)
                 / max(1.0, np.sum(gen)))

    if args.out_path is None:
        os.makedirs(os.path.join(args.out_dir, "results"), exist_ok=True)
        stem = os.path.splitext(os.path.basename(ckpt_path))[0]
        args.out_path = os.path.join(
            args.out_dir, "results",
            f"inpaint_ckpt-{stem}_{args.mask}{args.mask_frac:g}"
            f"_steps{args.steps}_r{args.resample}_cfg{args.cfg:.2f}.png")
    shown = x_src_np * mask_np + 0.5 * (1.0 - mask_np)  # masked region = gray
    tri = np.stack([x_src_np, shown, x_out], axis=1).reshape(
        3 * args.n, img_size, img_size, 1)
    save_image_grid(
        tri, args.out_path, nrows=args.n, ncols=3,
        suptitle=(f"inpaint {args.mask} {args.mask_frac:g} | steps={args.steps} "
                  f"resample={args.resample} cfg={args.cfg:.2f} | "
                  f"original / masked / inpainted"))
    print(f"Saved inpainting grid -> {args.out_path}")
    print(json.dumps({
        "mask": args.mask, "mask_frac": args.mask_frac, "n": args.n,
        "steps": args.steps, "resample": args.resample, "cfg": args.cfg,
        "region_mse": round(mse, 6),
        "region_var": round(base, 6),
        "region_rel_mse": round(mse / max(base, 1e-12), 4),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
