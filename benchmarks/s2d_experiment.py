#!/usr/bin/env python3
"""Space-to-depth stem experiment: does folding 2x2 patches into channels
lift the conv MFU cap?

The op-level sampler profile (benchmarks/NOTES.md "where the time goes")
attributes the conv fusions' ~58%-of-peak ceiling at 64x64/96ch to SHORT
CONTRACTION DIMS on the MXU: the stem conv contracts 17*9=153 elements.
The classic fix is a space-to-depth stem (fold 2x2 spatial into channels:
in_ch 17 -> 68, H 64 -> 32, contraction 612) with a depth-to-space head —
`CondUNetTiny(stem="s2d")`. This script measures both variants in the REAL
compiled 300-step reverse-SDE sampler (same harness as bench.py: batch 256,
cfg 1.5, bf16) and reports img/s + XLA-cost-analysis FLOPs + MFU per
variant, so the result lands as a NOTES.md row — a flag if it wins >=10%,
a documented negative otherwise.

Throughput is weight-independent, so random init params are used; quality
of an s2d-trained model is a separate (training) question.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--cfg", type=float, default=1.5)
    p.add_argument("--t-end", type=float, default=0.005)
    p.add_argument("--base-ch", type=int, default=96)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--peak-tflops", type=float, default=197.0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/toycrystals_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from toycrystals_tpu.models import (
        CondUNetTiny,
        VPSDE,
        sample_reverse_sde_euler_maruyama,
    )
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions

    sde = VPSDE(beta_min=0.1, beta_max=30.0)
    b = args.batch
    y_cat, y_cont = sample_grid_conditions(b, 4, 4)
    checksum = jax.jit(lambda x: jnp.sum(x))
    rows = {}

    for stem in ("none", "s2d", "s2dr"):
        model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=args.base_ch,
                             emb_dim=128, dtype=jnp.bfloat16, stem=stem)
        params = model.init(
            jax.random.key(0), jnp.zeros((2, 64, 64, 1)), jnp.zeros((2,)),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)),
        )["params"]
        apply_fn = lambda prm, xt, t, yc, yv: model.apply(  # noqa: E731
            {"params": prm}, xt, t, yc, yv)

        def run(key):
            return checksum(sample_reverse_sde_euler_maruyama(
                apply_fn, params, sde, y_cat, y_cont, (b, 64, 64, 1), key,
                n_steps=args.steps, guidance_scale=args.cfg, t_end=args.t_end,
            ))

        t0 = time.perf_counter()
        jax.device_get(run(jax.random.key(0)))
        print(f"[{stem}] compile+first: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        times = []
        for i in range(args.repeats):
            t0 = time.perf_counter()
            jax.device_get(run(jax.random.key(i + 1)))
            times.append(time.perf_counter() - t0)
            print(f"[{stem}] run {i}: {times[-1]:.3f}s "
                  f"({b / times[-1]:.1f} img/s)", file=sys.stderr)
        ips = b / min(times)

        # FLOPs of the CFG-doubled forward (the dispatch the sampler makes),
        # x one eval per step + the final x0 projection — bench.py's method
        be = 2 * b if args.cfg > 0 else b
        fwd = jax.jit(apply_fn).lower(
            params, jnp.zeros((be, 64, 64, 1)), jnp.zeros((be,)),
            jnp.zeros((be,), jnp.int32), jnp.zeros((be, 4)),
        )
        ca = fwd.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_sample = float(ca["flops"]) * (args.steps + 1) / b
        sol = args.peak_tflops * 1e12 / flops_per_sample
        rows[stem] = {
            "img_s": round(ips, 2),
            "tflops_per_sample": round(flops_per_sample / 1e12, 3),
            "speed_of_light_img_s": round(sol, 1),
            "mfu": round(ips / sol, 3),
        }

    rows["s2d_speedup"] = round(rows["s2d"]["img_s"] / rows["none"]["img_s"], 3)
    rows["s2dr_speedup"] = round(rows["s2dr"]["img_s"] / rows["none"]["img_s"], 3)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
