#!/usr/bin/env python3
"""Isolated SDPA micro-benchmark at the 256x256-stretch attention shape.

The 256x256 op-level profile (benchmarks/NOTES.md) showed the Pallas
flash-attention kernel holding ~50% of sampler device time at ~6.6 TFLOP/s
(~3% of bf16 peak). This script times the attention op alone — XLA SDPA vs
the flash kernel at several BlockSizes — at the exact mid-block shape the
CondUNetTiny stretch config runs (img 256 -> N=4096 tokens, ch=192, 4 heads
-> head_dim=48), so the block-size choice in `ops/attention.py` is a
measured decision, not a default.

Usage: python bench_attention.py [--batch 24] [--seq 4096] [--head-dim 48]
Prints a markdown table of per-call ms and achieved TFLOP/s.
"""

from __future__ import annotations

import argparse
import functools
import math
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24,
                   help="CFG-doubled sampler chunk (12 images x 2)")
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--seq", type=int, default=4096,
                   help="tokens at the mid block (img 256 -> 64*64)")
    p.add_argument("--head-dim", type=int, default=48,
                   help="mid ch 192 / 4 heads")
    p.add_argument("--dtype", type=str, default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    jax.config.update("jax_compilation_cache_dir", "/tmp/toycrystals_jax_cache")
    from toycrystals_tpu.utils import scan_timer

    b, h, n, d = args.batch, args.heads, args.seq, args.head_dim
    dt = jnp.dtype(args.dtype)
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    # kernel layout [B, H, N, D]
    q = jax.random.normal(kq, (b, h, n, d), dt)
    k = jax.random.normal(kk, (b, h, n, d), dt)
    v = jax.random.normal(kv, (b, h, n, d), dt)
    scale = 1.0 / math.sqrt(d)
    flops = 4.0 * b * h * n * n * d  # QK^T + PV, 2 FLOP per MAC

    def xla_sdpa(q):
        # jax.nn layout is [B, N, H, D]
        o = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3))
        return o.transpose(0, 2, 1, 3)

    def flash(q, blocks=None):
        return flash_attention(q, k, v, causal=False, sm_scale=scale,
                               block_sizes=blocks)

    def bs(bq, bkM, bk, bb):
        return BlockSizes(block_q=bq, block_k_major=bkM, block_k=bk, block_b=bb)

    cands: list[tuple[str, object]] = [("xla", xla_sdpa),
                                       ("flash default (128/128/128 b1)", flash)]
    for bq, bkM, bk, bb in [
        (512, 512, 512, 1),
        (1024, 1024, 512, 1),
        (2048, 2048, 512, 1),
        (4096, 4096, 512, 1),
        (1024, 2048, 512, 1),
        (2048, 4096, 1024, 1),
        (512, 512, 512, 2),
        (1024, 1024, 512, 2),
    ]:
        if bq > n or bkM > n:
            continue
        cands.append((f"flash q{bq} kM{bkM} k{bk} b{bb}",
                      functools.partial(flash, blocks=bs(bq, bkM, bk, bb))))

    print(f"shape: B={b} H={h} N={n} D={d} {args.dtype}; "
          f"{flops / 1e9:.1f} GFLOP/call\n")
    print("| impl | ms/call | TFLOP/s |")
    print("|---|---|---|")
    for name, fn in cands:
        try:
            sec = scan_timer(fn, q, n_lo=4, n_hi=16, repeats=3)
        except Exception as e:  # noqa: BLE001 — report and keep scanning
            print(f"| {name} | FAILED: {type(e).__name__}: {str(e)[:80]} | - |")
            continue
        print(f"| {name} | {sec * 1e3:.2f} | {flops / sec / 1e12:.1f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
