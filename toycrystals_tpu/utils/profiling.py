"""Timing utilities that survive high-latency (tunneled) TPU links.

A single dispatch to a remote TPU can cost ~1 s of round-trip latency, which
drowns per-op timings. `scan_timer` times a body looped inside ONE compiled
`lax.scan` program at two different lengths and differences them, so both the
tunnel round-trip and any fixed per-call overhead cancel exactly.

The reference has no profiling subsystem at all (SURVEY.md §5 — tqdm bars
only); this module is new TPU-native scope used by `benchmarks/`.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp


def _time_once(fn: Callable[[], Any]) -> float:
    t0 = time.perf_counter()
    jax.device_get(fn())
    return time.perf_counter() - t0


def scan_timer(
    body: Callable[[Any], Any],
    carry0: Any,
    n_lo: int = 20,
    n_hi: int = 120,
    repeats: int = 3,
) -> float:
    """Per-iteration seconds of `body(carry) -> carry` on the device.

    `body` must be shape-preserving on `carry0` (it becomes the scan carry).
    Returns (t_scan(n_hi) - t_scan(n_lo)) / (n_hi - n_lo), each a min over
    `repeats` runs — immune to dispatch latency and per-call fixed cost.
    """

    def make(n: int):
        @jax.jit
        def f(c):
            out, _ = jax.lax.scan(lambda c, _: (body(c), ()), c, None, length=n)
            # Reduce to ONE scalar on device: fetching the full carry (e.g. a
            # train state) over a tunneled link costs seconds and drowns the
            # timing signal. The sum depends on every leaf, so completion of
            # the whole scan is still forced.
            return jax.tree.reduce(
                lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
                out,
                jnp.float32(0),
            )

        return f

    f_lo, f_hi = make(n_lo), make(n_hi)
    carry0 = jax.tree.map(jnp.asarray, carry0)
    jax.device_get(f_lo(carry0))  # compile
    jax.device_get(f_hi(carry0))
    t_lo = min(_time_once(lambda: f_lo(carry0)) for _ in range(repeats))
    t_hi = min(_time_once(lambda: f_hi(carry0)) for _ in range(repeats))
    # Clamp to a tiny POSITIVE floor: on a noisy link min(t_hi) can dip below
    # min(t_lo), and callers divide by the result — never return 0.
    return max((t_hi - t_lo) / (n_hi - n_lo), 1e-9)


def dispatch_latency(repeats: int = 5) -> float:
    """Median seconds for a minimal round-trip dispatch (tunnel health check)."""
    x = jnp.zeros(())
    f = jax.jit(lambda x: x + 1.0)
    jax.device_get(f(x))
    times = sorted(_time_once(lambda: f(x)) for _ in range(repeats))
    return times[len(times) // 2]
