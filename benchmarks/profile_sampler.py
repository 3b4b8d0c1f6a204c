#!/usr/bin/env python3
"""Op-level profile of the flagship reverse-SDE sampler step (TPU).

Captures an XPlane trace of the compiled sampling scan at the headline
config (base_ch=96, 64x64, bf16, CFG-doubled batch) and prints the HLO
op-category time breakdown — the evidence for WHERE the non-MXU fraction of
the 300-step sampler goes (benchmarks/NOTES.md "where the time goes"
section; VERDICT r1 weak #2 asked for op-level percentages, not just
end-to-end ablations).

A short scan (default 20 steps) is traced: every scan iteration executes the
same HLO loop body, so per-step percentages are exact for any step count
while keeping the trace small over the tunnel.

Usage: python benchmarks/profile_sampler.py [--steps 20] [--batch 256]
Writes the trace under /tmp/sampler_trace and prints a markdown table.
"""

from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _hlo_rows(trace_dir: str) -> list[dict]:
    """Parse the xplane's hlo_stats into a list of per-op dicts."""
    import json

    from xprof.convert import raw_to_tool_data as rttd

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not xplanes:
        raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
    data, _ = rttd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    obj = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in obj["cols"]]
    rows = []
    for r in obj["rows"]:
        vals = [(c or {}).get("v") if isinstance(c, dict) else c for c in r["c"]]
        rows.append(dict(zip(cols, vals)))
    return rows


def _print_breakdown(rows: list[dict], top_n: int = 18) -> None:
    by_cat: dict[str, float] = {}
    total = 0.0
    for r in rows:
        t = float(r.get("total_self_time") or 0.0)
        by_cat[r.get("category") or "?"] = by_cat.get(r.get("category") or "?", 0.0) + t
        total += t
    if total <= 0:
        print("no device HLO stats in trace (CPU backend traces carry none "
              "— run on TPU)", file=sys.stderr)
        return
    print("\n## Device self-time by HLO category\n")
    print("| category | self time (us) | % |")
    print("|---|---|---|")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"| {cat} | {t:,.0f} | {100 * t / total:.1f}% |")
    print(f"| **total** | {total:,.0f} | 100% |")

    print(f"\n## Top {top_n} ops by self time\n")
    print("| op | category | self % | bound by | GFLOP/s | mem GiB/s | DMA stall % |")
    print("|---|---|---|---|---|---|---|")
    key = lambda r: -float(r.get("total_self_time") or 0.0)
    for r in sorted(rows, key=key)[:top_n]:
        name = (r.get("hlo_op_name") or "?")[:60]
        print(
            f"| {name} | {r.get('category')} "
            f"| {float(r.get('total_self_time') or 0) / total * 100:.1f}% "
            f"| {r.get('bound_by') or '-'} "
            f"| {float(r.get('model_flop_rate') or 0):,.0f} "
            f"| {float(r.get('measured_memory_bw') or 0):,.0f} "
            f"| {float(r.get('dma_stall_percent') or 0):.0f}% |"
        )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--what", type=str, default="sample", choices=["sample", "train"],
                   help="sample = the 300-step reverse-SDE sampler scan (bf16, "
                        "CFG-doubled batch 256); train = the fused SDE train "
                        "step (f32 params, reference batch 128, EMA in-step).")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=None,
                   help="default: 256 for sample, 128 for train "
                        "(use ~8 at --img-size 256 to stay under the "
                        "tunnel's per-dispatch duration cap)")
    p.add_argument("--img-size", type=int, default=64)
    p.add_argument("--base-ch", type=int, default=96)
    p.add_argument("--trace-dir", type=str, default="/tmp/sampler_trace")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/toycrystals_jax_cache")

    from toycrystals_tpu.models import (
        CondUNetTiny,
        VPSDE,
        sample_reverse_sde_euler_maruyama,
    )
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions

    sde = VPSDE(0.1, 30.0)
    b = args.batch or (128 if args.what == "train" else 256)
    y_cat, y_cont = sample_grid_conditions(b, 4, 4)

    if args.what == "train":
        import optax

        from toycrystals_tpu.train import create_train_state, make_sde_train_step

        model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=args.base_ch,
                             emb_dim=128)
        params = model.init(
            jax.random.key(0), jnp.zeros((2, args.img_size, args.img_size, 1)), jnp.zeros((2,)),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)),
        )["params"]
        tx = optax.adam(1e-4)
        step = make_sde_train_step(model, tx, sde, 4, p_uncond=0.1,
                                   t_power=1.0, ema_decay=0.999)
        x0 = jax.random.uniform(jax.random.key(1), (b, args.img_size, args.img_size, 1))
        state = create_train_state(params, tx, ema=True)
        state, loss = step(state, x0, y_cat, y_cont, jax.random.key(2))  # warm
        jax.block_until_ready(loss)
        with jax.profiler.trace(args.trace_dir):
            state, loss = step(state, x0, y_cat, y_cont, jax.random.key(3))
            jax.block_until_ready(loss)
    else:
        model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=args.base_ch,
                             emb_dim=128, dtype=jnp.bfloat16)
        params = model.init(
            jax.random.key(0), jnp.zeros((2, args.img_size, args.img_size, 1)), jnp.zeros((2,)),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)),
        )["params"]
        apply_fn = lambda prm, xt, t, yc, yv: model.apply({"params": prm}, xt, t, yc, yv)

        def run(key):
            x = sample_reverse_sde_euler_maruyama(
                apply_fn, params, sde, y_cat, y_cont, (b, args.img_size, args.img_size, 1), key,
                n_steps=args.steps, guidance_scale=1.5, t_end=0.005,
            )
            return jnp.sum(x)

        jax.device_get(run(jax.random.key(0)))  # compile + warm
        with jax.profiler.trace(args.trace_dir):
            jax.device_get(run(jax.random.key(1)))

    print(f"trace: {args.trace_dir}", file=sys.stderr)
    _print_breakdown(_hlo_rows(args.trace_dir))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
