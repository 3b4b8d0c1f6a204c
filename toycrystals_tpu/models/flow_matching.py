"""Rectified-flow / flow-matching objective + sampler (new TPU scope).

No reference counterpart (`/root/reference` trains only the VP-SDE ε-model,
`src/toycrystals/models/sde_score_model.py:358-399`). This adds the third
training parameterization — `--param fm` on the SDE trainer — using the SAME
CondUNetTiny backbone, conditioning, CFG dropout, trainer, checkpoints, and
chunked-dispatch machinery:

- **forward process**: straight-line interpolation `x_t = (1-t)·x0 + t·ε`
  (Liu et al. 2022 "rectified flow"; Lipman et al. 2022 "flow matching",
  the SD3/Flux recipe) instead of the VP marginal `α(t)x0 + σ(t)ε`. t=0 is
  data, t=1 is N(0, I) — the same orientation as the VP samplers here.
- **target**: the constant conditional velocity `u = dx_t/dt = ε − x0`;
  the loss branch lives in `diffusion_loss_eps_given(parameterization="fm")`
  so the fused-epoch / grad-accum / sharding train machinery is shared
  verbatim (train/steps.py).
- **sampling**: integrate `dx/dt = v_θ(x, t, y)` from t=1 down to t_end as
  ONE `lax.scan` (`sample_rectified_flow`) with Euler or Heun steps on a
  uniform grid, fused-CFG on the velocity (guidance combines affinely, like
  ε), and a final x0 projection `x0 = x − t·v`. The straight-path prior
  makes few-step Euler sampling natural — the training-time analogue of
  what progressive distillation buys the ε/v models after the fact.

Why t_power still matters: `draw_diffusion_loss_noise`'s `u**t_power` draw
biases t toward 0 (data side). For fm the common practice is a mid-heavy
(logit-normal) density; `t_power=1` (uniform) is the faithful RF baseline
and the trainer default.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from toycrystals_tpu.models.sde_score_model import (
    VPSDE,
    _check_t_end,
    _make_pin,
    predict_eps_cfg,
)


def shift_t(t: jax.Array, shift: float) -> jax.Array:
    """SD3/Flux resolution timestep shift: t' = s·t / (1 + (s−1)·t).

    Monotone [0,1]→[0,1] with fixed endpoints; s>1 pushes mass towards t=1
    (the noise side). On the straight-line path logSNR(t) = 2·ln((1−t)/t),
    so shift s subtracts exactly 2·ln s of logSNR — the flow-matching
    analogue of the VP schedule's `logsnr_shift` (sde_score_model.py):
    s=4 ≈ the −2.77 shift the 256×256 VP runs use, i.e. s = img_size/64
    matches noise statistics across resolution. Applied to BOTH the training
    t-draw (`draw_diffusion_loss_noise(t_shift=...)`) and the sampler grid
    below; stored in the checkpoint config as `fm_shift`."""
    s = float(shift)
    if s == 1.0:
        return t
    return s * t / (1.0 + (s - 1.0) * t)


def _maybe_clip_x0_fm(v_hat, x, tb, clip_x0: bool):
    """Static x0-thresholding in flow space: the implied x0 = x − t·v is
    clipped to the data range [−1, 1] and the velocity re-derived
    v = (x − x0)/t. Same role as `_maybe_clip_eps` for the VP samplers —
    off by default, a stabiliser for stretch resolutions."""
    if not clip_x0:
        return v_hat
    x0 = jnp.clip(x - tb * v_hat, -1.0, 1.0)
    return (x - x0) / jnp.maximum(tb, 1e-6)


@partial(jax.jit, static_argnums=(0, 5, 7, 8, 9, 10, 11, 12, 13, 14))
def sample_rectified_flow(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE | None,
    y_cat: jax.Array,
    y_cont: jax.Array,
    img_shape: tuple[int, int, int, int],
    key: jax.Array,
    n_steps: int = 50,
    guidance_scale: float = 0.0,
    t_end: float = 1e-3,
    n_types: int = 4,
    clip_x0: bool = False,
    sharding=None,
    solver: str = "euler",
    t_shift: float = 1.0,
) -> jax.Array:
    """Integrate the learned velocity field from noise (t=1) to data (t_end)
    as one compiled `lax.scan`; returns images in [0, 1] NHWC.

    `sde` is accepted and UNUSED — the argument keeps the exact positional
    signature every sampler here shares, so `sample_chunked`, the sampler
    CLI, and the serving runtime drive this sampler through the same code
    path (models/sde_score_model.py:822-900). solver: "euler" (1 eval/step,
    the rectified-flow default — near-straight paths make it accurate) or
    "heun" (2 evals/step trapezoidal, for very low step counts).
    guidance_scale combines velocities exactly like ε (affine in the net
    output, shared (x, t) across the fused cond/uncond doubled batch).
    t_shift: evaluate the uniform grid through `shift_t` so inference spends
    its steps where a `--fm-shift`-trained model spent its capacity (pass the
    checkpoint's fm_shift; 1.0 = exact no-op)."""
    del sde
    if solver not in ("euler", "heun"):
        raise ValueError(f"solver must be euler|heun, got {solver}")
    t_end = _check_t_end(t_end)
    b, h, w, c = img_shape
    assert c == 1
    gs = float(guidance_scale)
    pin = _make_pin(sharding)

    ts = shift_t(jnp.linspace(1.0, t_end, n_steps + 1), t_shift)
    x = pin(jax.random.normal(key, (b, h, w, c), jnp.float32))

    def velocity(x, tb):
        v = predict_eps_cfg(apply_fn, params, x, tb, y_cat, y_cont, gs, n_types)
        return _maybe_clip_x0_fm(v, x, tb.reshape(b, 1, 1, 1), clip_x0)

    def body(x, step):
        t, t_next = step
        dt = t_next - t  # negative: integrating towards data
        v1 = velocity(x, jnp.full((b,), t))
        if solver == "euler":
            return pin(x + dt * v1), None
        x_euler = x + dt * v1
        v2 = velocity(x_euler, jnp.full((b,), t_next))
        return pin(x + 0.5 * dt * (v1 + v2)), None

    x, _ = jax.lax.scan(body, x, (ts[:-1], ts[1:]))

    # final x0 projection: x0 = x − t·v at t_end, then map [-1,1] -> [0,1]
    tb = jnp.full((b,), ts[-1])
    v = velocity(x, tb)
    x0 = x - ts[-1] * v
    return jnp.clip((x0 + 1.0) * 0.5, 0.0, 1.0)
