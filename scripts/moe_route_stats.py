"""Expert-utilisation report for a trained MoE diffusion prior.

Loads a `--moe-experts` checkpoint written by `train_diffusion_prior.py`
(config-in-ckpt: `{..., "n_experts": E}`), runs the canonical conditioning
sweep (every lattice type x a theta sweep, the same 6x6 conditions the
committed DDIM grids use) across the full timestep range, and prints the
per-block routing fractions the switch router actually uses — the evidence
axis for whether the MoE prior specialises or collapses onto one expert.

Routing here is top-1 on the (t, y) conditioning (models/moe_prior.py), so
fractions are exact over the swept conditions, not a sampling estimate.

Usage:
  python scripts/moe_route_stats.py --ckpt checkpoints/prior_moe.msgpack
Output: a human table + one JSON line (per-block fractions, entropy,
max-share) for benchmarks/NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/toycrystals_jax_cache")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--device", default="auto", choices=["cpu", "tpu", "auto"])
    p.add_argument("--t-points", type=int, default=64,
                   help="timesteps sampled uniformly over [0, T)")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from toycrystals_tpu.models import DiffusionPriorMoE
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
    from toycrystals_tpu.utils.checkpoint import load_checkpoint

    raw = load_checkpoint(args.ckpt)
    cfg = raw["config"]
    e = int(cfg.get("n_experts", 0))
    if e < 2:
        # e == 1 would also pass the old <= 0 guard and then divide the
        # entropy by log(1) = 0 below; a 1-expert "MoE" has no routing to
        # report anyway
        raise SystemExit(f"{args.ckpt}: not a routed MoE prior checkpoint "
                         f"(config n_experts={e}); train with "
                         f"--moe-experts >= 2")
    prior = DiffusionPriorMoE(
        z_dim=int(cfg["z_dim"]), n_types=int(cfg["n_types"]),
        y_cont_dim=int(cfg["y_cont_dim"]), n_experts=e,
        t_emb_dim=int(cfg["t_emb_dim"]), width=int(cfg["width"]),
        n_blocks=int(cfg["n_blocks"]), y_cat_emb_dim=int(cfg["y_cat_emb_dim"]),
    )
    params = jax.tree.map(jnp.asarray, raw["params"])

    # canonical 6x6 grid conditions x uniform t sweep
    y_cat, y_cont = sample_grid_conditions(36, int(cfg["n_types"]),
                                           int(cfg["y_cont_dim"]))
    ts = jnp.linspace(0, int(cfg["T"]) - 1, args.t_points).astype(jnp.int32)
    bt = jnp.repeat(ts, 36)
    by_cat = jnp.tile(y_cat, (args.t_points,))
    by_cont = jnp.tile(y_cont, (args.t_points, 1))
    z = jnp.zeros((bt.shape[0], int(cfg["z_dim"])))

    @jax.jit
    def routes(prm, z, t, yc, yv):
        _, inter = prior.apply({"params": prm}, z, t, yc, yv,
                               mutable=["intermediates"])
        # route_fraction sown once per block: {block_i: {route_fraction: (f_e,)}}
        return {k: v["route_fraction"][0]
                for k, v in inter["intermediates"].items()}

    frac = jax.device_get(routes(params, z, bt, by_cat, by_cont))
    out = {"ckpt": args.ckpt, "n_experts": e,
           "conditions": int(bt.shape[0]), "blocks": {}}
    print(f"{args.ckpt}: {e} experts, {bt.shape[0]} (t, y) conditions")
    print(f"{'block':>8}  fractions{'':<{max(0, 7 * e - 9)}}  entropy  max-share")
    for name in sorted(frac, key=lambda s: int(s.split("_")[-1])):
        f = np.asarray(frac[name], np.float64)
        f = f / f.sum()
        ent = float(-(f * np.log(np.maximum(f, 1e-12))).sum() / np.log(e))
        print(f"{name:>8}  [{' '.join(f'{x:.3f}' for x in f)}]  "
              f"{ent:7.3f}  {f.max():9.3f}")
        out["blocks"][name] = {"fractions": [round(float(x), 4) for x in f],
                               "entropy_norm": round(ent, 4),
                               "max_share": round(float(f.max()), 4)}
    line = json.dumps(out)
    print(line)
    if args.json_out:
        Path(args.json_out).write_text(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
