"""VP-SDE score model: conditional tiny U-Net + compiled samplers.

Capability parity with `/root/reference/src/toycrystals/models/sde_score_model.py`,
redesigned TPU-first:

- `timestep_embedding_continuous` — cos-first sinusoidal embedding for
  t in [0,1] (`sde_score_model.py:17-32`; deliberately different ordering from
  the discrete embedding in diffusion_prior.py).
- `ConditionEmbedding` — categorical embedding with index n_types reserved as
  the CFG null token; theta (y_cont[:, 1]) always rewritten to (sin, cos) at
  indices 1, 2 (`sde_score_model.py:35-82`).
- `CondUNetTiny` — eps-prediction U-Net with circular padding everywhere,
  GroupNorm conv blocks, bottleneck self-attention at H/4, bilinear+conv
  upsampling, and t/cond embeddings broadcast to per-pixel maps concatenated
  with x_t (`sde_score_model.py:170-266`). NHWC layout.
- `VPSDE` — linear-beta VP SDE marginals (`sde_score_model.py:273-298`).
- `diffusion_loss_eps` — eps-MSE with t = u^t_power biasing and CFG
  conditioning dropout to the null token (`sde_score_model.py:358-399`).
- `predict_eps_cfg` — CFG combine. cfg <= 0 is a SINGLE conditional pass (the
  reference's semantics, `sde_score_model.py:415-416`); cfg > 0 fuses the
  uncond+cond evaluations into ONE doubled-batch forward instead of the
  reference's two sequential passes (`sde_score_model.py:418-423`) — half the
  kernel launches, same math.
- Samplers — probability-flow ODE with Heun and reverse-SDE Euler-Maruyama on
  the quadratic time grid with final x0 projection
  (`sde_score_model.py:452-569`). Each compiles as ONE `jax.lax.scan` program
  (the reference runs eager Python loops of 2 x n_steps U-Net calls).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from toycrystals_tpu.ops.attention import SelfAttention2d, gn_groups
from toycrystals_tpu.ops.conv import CircularConv
from toycrystals_tpu.ops.groupnorm import GroupNormSiLU


def timestep_embedding_continuous(t: jax.Array, dim: int) -> jax.Array:
    """Continuous-time sinusoidal embedding, [cos, sin] ordering
    (`sde_score_model.py:17-32`). t: [B] in [0,1] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10_000.0) * jnp.arange(half, dtype=jnp.float32) / max(half - 1, 1)
    )
    args = (2.0 * math.pi) * t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ConditionEmbedding(nn.Module):
    """(y_cat, y_cont) -> conditioning vector with CFG null token
    (`sde_score_model.py:35-82`)."""

    n_types: int
    y_cont_dim: int
    emb_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y_cat: jax.Array, y_cont: jax.Array) -> jax.Array:
        if self.y_cont_dim < 3:
            raise ValueError("theta_sincos requires y_cont_dim >= 3 (needs indices 1 and 2).")
        y_cat = jnp.clip(y_cat, 0, self.n_types).astype(jnp.int32)
        y = y_cont.astype(jnp.float32)
        # theta at index 1 -> (sin, cos) at indices 1, 2 (`sde_score_model.py:73-78`).
        theta = y[:, 1]
        y = y.at[:, 1].set(jnp.sin(theta)).at[:, 2].set(jnp.cos(theta))

        e_cat = nn.Embed(self.n_types + 1, self.emb_dim, dtype=self.dtype, name="cat_emb")(y_cat)
        h = nn.Dense(self.emb_dim, dtype=self.dtype)(y.astype(self.dtype))
        e_cont = nn.Dense(self.emb_dim, dtype=self.dtype)(nn.silu(h))
        fused = nn.silu(jnp.concatenate([e_cat, e_cont], axis=1))
        return nn.Dense(self.emb_dim, dtype=self.dtype, name="out")(fused)


class _ConvBlock(nn.Module):
    """2x [circular Conv3x3 -> GroupNorm -> SiLU] (`sde_score_model.py:97-111`)."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "pad"
    gn_impl: str = "xla"  # "xla" | "pallas" (fused GN+SiLU+pad kernel, ops/groupnorm.py)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        g = gn_groups(self.out_ch)
        if self.gn_impl == "pallas":
            # Fused kernel path: gn0 emits the circular-padded activation
            # directly, so conv1 runs VALID with no separate wrap-pad copy.
            # Param tree (conv0/conv1 kernel+bias, gn0/gn1 scale+bias) is
            # identical to the xla path — checkpoints interchange.
            x = CircularConv(
                self.out_ch, (3, 3), dtype=self.dtype, impl=self.conv_impl, name="conv0"
            )(x)
            xp = GroupNormSiLU(num_groups=g, pad=True, name="gn0")(x)
            x = nn.Conv(
                self.out_ch, (3, 3), padding="VALID", dtype=self.dtype, name="conv1"
            )(xp.astype(self.dtype))
            return GroupNormSiLU(num_groups=g, pad=False, name="gn1")(x)
        for i in range(2):
            x = CircularConv(
                self.out_ch, (3, 3), dtype=self.dtype, impl=self.conv_impl, name=f"conv{i}"
            )(x)
            x = nn.GroupNorm(num_groups=g, dtype=self.dtype, name=f"gn{i}")(x)
            x = nn.silu(x)
        return x


def _space_to_depth2(x: jax.Array) -> jax.Array:
    """[B,H,W,C] -> [B,H/2,W/2,4C]: each 2x2 patch becomes 4 channels.
    Periodicity survives (the period halves with the grid), so circular
    convs on the folded grid stay consistent with the lattice wrap."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _depth_to_space2(x: jax.Array) -> jax.Array:
    """Inverse of _space_to_depth2: [B,H,W,4C] -> [B,2H,2W,C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 4)


def _bilinear_up2(x: jax.Array) -> jax.Array:
    """Bilinear 2x upsample, align_corners=False semantics
    (`sde_score_model.py:217,221`; jax.image.resize uses half-pixel centres)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="bilinear")


class CondUNetTiny(nn.Module):
    """Tiny conditional U-Net, eps_hat = eps_theta(x_t, t, c)
    (`sde_score_model.py:170-266`)."""

    n_types: int
    y_cont_dim: int
    base_ch: int = 32
    emb_dim: int = 128
    cond_ch: int = 8
    time_ch: int = 8
    dtype: jnp.dtype = jnp.float32
    conv_impl: str = "pad"  # see ops/conv.py: "pad" | "border" (measured slower on TPU)
    gn_impl: str = "xla"  # "xla" | "pallas" fused GN+SiLU(+pad) kernel in conv blocks
    # "auto" = flash kernel at >=2048 tokens: its memory footprint is what
    # makes 256x256 training compile, and with tuned block sizes it also
    # beats xla for forward-only 256x256 sampling (0.71 vs 0.53 img/s,
    # measured 12-img chunks x 300 steps) — benchmarks/NOTES.md.
    attn_impl: str = "auto"  # "auto" | "xla" | "flash"
    # "s2d": space-to-depth stem — fold 2x2 patches into channels at input
    # (in_ch 17 -> 68, H -> H/2) and undo with depth-to-space at the head
    # (the out conv predicts 4 channels on the half grid). The MXU-shape
    # experiment for the conv contraction-depth shortfall diagnosed in the
    # op-level profile (benchmarks/NOTES.md): the first convs see 4x the
    # contraction dim. Changes the architecture (skips/attention sit one
    # octave lower), so checkpoints are not interchangeable with stem="none".
    # "s2dr": s2d trunk + a full-resolution residual refinement head — the
    # depth-to-space output's 2x2 sub-pixel phases all come from the same
    # half-grid feature, which costs high-frequency detail (measured: theta
    # MAE 1.37->2.78 deg, fidelity 0.891->0.767 at the committed recipe —
    # benchmarks/NOTES.md "Space-to-depth stem"); two cheap full-res convs
    # (~1% of model FLOPs) see the raw x_t + t/cond maps and correct the
    # local phase: out + conv(silu(conv([out, x_full]))).
    stem: str = "none"  # "none" | "s2d" | "s2dr"

    @nn.compact
    def __call__(self, x_t: jax.Array, t: jax.Array, y_cat: jax.Array, y_cont: jax.Array):
        b, h, w, _ = x_t.shape
        bc = self.base_ch
        dt = self.dtype

        # Per-pixel time/cond maps (`sde_score_model.py:227-241`).
        t_emb = timestep_embedding_continuous(t, self.emb_dim).astype(dt)
        t_emb = nn.Dense(self.emb_dim, dtype=dt)(t_emb)
        t_emb = nn.Dense(self.emb_dim, dtype=dt)(nn.silu(t_emb))
        c_emb = ConditionEmbedding(self.n_types, self.y_cont_dim, self.emb_dim, dtype=dt)(
            y_cat, y_cont
        )
        t_map = nn.Dense(self.time_ch, dtype=dt, name="to_time_map")(t_emb)
        c_map = nn.Dense(self.cond_ch, dtype=dt, name="to_cond_map")(c_emb)
        maps = jnp.concatenate([t_map, c_map], axis=-1)[:, None, None, :]
        maps = jnp.broadcast_to(maps, (b, h, w, self.time_ch + self.cond_ch))
        x = jnp.concatenate([x_t.astype(dt), maps], axis=-1)
        x_full = x  # pre-fold full-res input, for the "s2dr" refinement head
        if self.stem in ("s2d", "s2dr"):
            x = _space_to_depth2(x)

        ci, gi = self.conv_impl, self.gn_impl

        def ds(x, ch, name):  # circular k4 s2 downsample (`sde_score_model.py:208,210`)
            return CircularConv(ch, (4, 4), strides=(2, 2), dtype=dt, impl=ci, name=name)(x)

        def us_conv(x, ch, name):  # bilinear x2 + circular k3 conv (`:217-222`)
            return CircularConv(ch, (3, 3), dtype=dt, impl=ci, name=name)(_bilinear_up2(x))

        def block(x, ch, name):
            return _ConvBlock(ch, dtype=dt, conv_impl=ci, gn_impl=gi, name=name)(x)

        h1 = block(x, bc, "down1")                               # [B, H, W, bc]
        hh = ds(h1, bc, "ds1")                                   # [B, H/2, W/2, bc]
        h2 = block(hh, bc * 2, "down2")                          # [B, H/2, W/2, 2bc]
        hh = ds(h2, bc * 2, "ds2")                               # [B, H/4, W/4, 2bc]

        hh = block(hh, bc * 2, "mid")
        hh = SelfAttention2d(num_heads=4, dtype=dt, attn_impl=self.attn_impl,
                             name="attn")(hh)

        hh = us_conv(hh, bc * 2, "us2_conv")
        hh = block(jnp.concatenate([hh, h2], axis=-1), bc, "up2")

        hh = us_conv(hh, bc, "us1_conv")
        hh = block(jnp.concatenate([hh, h1], axis=-1), bc, "up1")

        if self.stem in ("s2d", "s2dr"):
            out = CircularConv(4, (3, 3), dtype=dt, impl=ci, name="out")(hh)
            out = _depth_to_space2(out)
            if self.stem == "s2dr":
                r = jnp.concatenate([out.astype(dt), x_full], axis=-1)
                r = CircularConv(bc // 2, (3, 3), dtype=dt, impl=ci,
                                 name="refine1")(r)
                out = out + CircularConv(1, (3, 3), dtype=dt, impl=ci,
                                         name="refine2")(nn.silu(r))
        else:
            out = CircularConv(1, (3, 3), dtype=dt, impl=ci, name="out")(hh)
        return out.astype(jnp.float32)


@flax.struct.dataclass
class VPSDE:
    """VP SDE dx = -0.5 beta(t) x dt + sqrt(beta(t)) dW, linear beta on [0,1]
    (`sde_score_model.py:273-298`). Marginal x_t = alpha(t) x0 + sigma(t) eps.

    `logsnr_shift` shifts the log-SNR profile: lam'(t) = lam(t) + shift where
    lam = log(alpha^2/sigma^2). The shifted schedule is itself a valid VP SDE
    (alpha'(0)=1, alpha'(1)~0) with

        D(t)     = e^{-I(t)} e^shift + (1 - e^{-I(t)}),   I = int_beta
        alpha'^2 = e^{-I} e^shift / D,  sigma'^2 = (1 - e^{-I}) / D,
        beta'(t) = -d/dt log alpha'^2 = beta(t) / D(t),

    so every consumer (loss, drift, diffusion coefficient) flows through the
    same alpha/sigma/beta accessors. shift=0 reduces exactly to the base
    schedule. Use shift = 2*ln(base_res/new_res) to train at a higher
    resolution with the noise-to-structure behaviour of the base resolution
    (the reference's beta in [0.1, 30] is tuned for 64x64; at 256x256 the
    unshifted schedule under-trains global structure — benchmarks/NOTES.md)."""

    beta_min: float = 0.1
    beta_max: float = 20.0
    logsnr_shift: float = 0.0

    def _base_beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def int_beta(self, t):
        return self.beta_min * t + 0.5 * (self.beta_max - self.beta_min) * t**2

    def _d(self, t):
        neg_i = -self.int_beta(t)
        # -expm1(-I) = 1 - e^{-I}, stable for small I (t -> 0)
        return jnp.exp(neg_i + self.logsnr_shift) - jnp.expm1(neg_i)

    def beta(self, t):
        return self._base_beta(t) / self._d(t)

    def alpha(self, t):
        return jnp.sqrt(jnp.exp(-self.int_beta(t) + self.logsnr_shift) / self._d(t))

    def sigma(self, t):
        s2 = -jnp.expm1(-self.int_beta(t)) / self._d(t)
        return jnp.sqrt(jnp.clip(s2, min=1e-8))


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------


def diffusion_loss_eps(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
    x0: jax.Array,
    y_cat: jax.Array,
    y_cont: jax.Array,
    key: jax.Array,
    n_types: int,
    p_uncond: float = 0.1,
    t_power: float = 1.0,
    parameterization: str = "eps",
    t_shift: float = 1.0,
    min_snr_gamma: float = 0.0,
) -> jax.Array:
    """Denoising MSE with CFG conditioning dropout
    (`sde_score_model.py:358-399`). x0 in [0,1] NHWC; mapped to [-1,1].

    parameterization:
      "eps" — the reference's target: MSE(net, eps).
      "v"   — v-prediction (Salimans & Ho 2022): target v = alpha*eps -
      sigma*x0. NEW TPU scope: the eps-target is ill-conditioned at large t
      (the implied x0 divides by alpha ~ 1e-4 — see `_maybe_clip_eps`), while
      the v-target keeps both implied quantities (x0 = alpha*x_t - sigma*v,
      eps = sigma*x_t + alpha*v) bounded at every t. Wrap a v-model for the
      eps-based samplers with `eps_apply_from_v`.
      "fm"  — rectified-flow velocity matching on the straight-line path
      (models/flow_matching.py); sample with `sample_rectified_flow`.
    min_snr_gamma > 0 enables min-SNR-γ loss weighting (see
    `diffusion_loss_eps_given`).
    """
    t, eps, y_cat, y_cont = draw_diffusion_loss_noise(
        x0, y_cat, y_cont, key, n_types, p_uncond, t_power, t_shift)
    return diffusion_loss_eps_given(
        apply_fn, params, sde, x0, y_cat, y_cont, t, eps, parameterization,
        min_snr_gamma)


def draw_diffusion_loss_noise(
    x0: jax.Array,
    y_cat: jax.Array,
    y_cont: jax.Array,
    key: jax.Array,
    n_types: int,
    p_uncond: float = 0.1,
    t_power: float = 1.0,
    t_shift: float = 1.0,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """The randomness half of `diffusion_loss_eps`: per-sample timesteps,
    noise, and CFG-dropped conditioning, for the whole batch. Split out so
    gradient accumulation (train/steps.py) can draw ONCE for the full batch
    and scan chunks of (t, eps) — making `--grad-accum k` numerically
    identical to the unsplit step, not merely equal in distribution.

    t_shift != 1 applies the SD3 resolution timestep shift to the draw
    (models/flow_matching.py:shift_t; the fm analogue of the VP
    `logsnr_shift` — trainer flag `--fm-shift`)."""
    b = x0.shape[0]
    k_t, k_eps, k_drop = jax.random.split(key, 3)
    u = jax.random.uniform(k_t, (b,))
    t = u ** float(t_power)  # t_power > 1 biases towards small t
    if float(t_shift) != 1.0:
        from toycrystals_tpu.models.flow_matching import shift_t

        t = shift_t(t, t_shift)
    eps = jax.random.normal(k_eps, x0.shape, x0.dtype)
    if p_uncond > 0.0:
        drop = jax.random.uniform(k_drop, (b,)) < p_uncond
        y_cat = jnp.where(drop, n_types, y_cat)  # null token (`:390-396`)
        y_cont = jnp.where(drop[:, None], 0.0, y_cont)
    return t, eps, y_cat, y_cont


def diffusion_loss_eps_given(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
    x0: jax.Array,
    y_cat: jax.Array,
    y_cont: jax.Array,
    t: jax.Array,
    eps: jax.Array,
    parameterization: str = "eps",
    min_snr_gamma: float = 0.0,
) -> jax.Array:
    """The deterministic half of `diffusion_loss_eps`: perturb with the GIVEN
    (t, eps) and return the MSE. x0 raw in [0,1] (mapped to [-1,1] here);
    conditioning already CFG-dropped.

    "fm" swaps the VP marginal for the rectified-flow straight-line path
    x_t = (1-t)·x0 + t·eps with velocity target u = eps − x0 (see
    models/flow_matching.py); it lives here so the grad-accum / fused-epoch
    machinery (train/steps.py) is shared across all three objectives.

    min_snr_gamma > 0 enables min-SNR-γ per-sample loss weighting (Hang et
    al. 2023, trainer flag `--min-snr-gamma`): the per-sample pixel-mean MSE
    is scaled by min(SNR, γ)/SNR for "eps" and min(SNR, γ)/(SNR+1) for "v",
    SNR(t) = α²/σ² — capping the implicit up-weighting of low-noise steps so
    they stop dominating the gradient. γ→∞ recovers the unweighted loss
    exactly for "eps" (for "v" it recovers the SNR/(SNR+1)-weighted eps-loss
    the v-target itself encodes). Not defined for "fm" (raises)."""
    if parameterization not in ("eps", "v", "fm"):
        raise ValueError(f"parameterization must be eps|v|fm, got {parameterization}")
    b = x0.shape[0]
    x0 = x0 * 2.0 - 1.0
    if parameterization == "fm":
        if min_snr_gamma > 0.0:
            raise ValueError("min-SNR weighting targets the VP objectives "
                             "(eps|v); rectified flow (fm) weights timesteps "
                             "via --fm-shift instead")
        tb = t.reshape(b, 1, 1, 1)
        x_t = (1.0 - tb) * x0 + tb * eps
        pred = apply_fn(params, x_t, t, y_cat, y_cont)
        return jnp.mean((pred - (eps - x0)) ** 2)
    a = sde.alpha(t).reshape(b, 1, 1, 1)
    s = sde.sigma(t).reshape(b, 1, 1, 1)
    x_t = a * x0 + s * eps
    pred = apply_fn(params, x_t, t, y_cat, y_cont)
    target = eps if parameterization == "eps" else a * eps - s * x0
    se = (pred - target) ** 2
    if min_snr_gamma > 0.0:
        snr = (a / s) ** 2
        w = jnp.minimum(snr, min_snr_gamma) / (
            snr if parameterization == "eps" else snr + 1.0)
        return jnp.mean(w * se)
    return jnp.mean(se)


def eps_apply_from_v(sde: VPSDE, apply_fn: Callable[..., jax.Array]):
    """Adapt a v-prediction model into the eps-space apply_fn every sampler
    expects: eps = sigma*x_t + alpha*v (exact identity of the VP marginal).
    CFG combining commutes with this affine map (both passes share (x_t, t)),
    so wrapping before `predict_eps_cfg` equals combining in v-space."""

    def eps_apply(params, x_t, t, y_cat, y_cont):
        v = apply_fn(params, x_t, t, y_cat, y_cont)
        a = sde.alpha(t).reshape(-1, 1, 1, 1)
        s = sde.sigma(t).reshape(-1, 1, 1, 1)
        return s * x_t + a * v

    return eps_apply


# ---------------------------------------------------------------------------
# CFG + samplers (compiled)
# ---------------------------------------------------------------------------


def predict_eps_cfg(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    x_t: jax.Array,
    t: jax.Array,
    y_cat: jax.Array,
    y_cont: jax.Array,
    guidance_scale: float,
    n_types: int,
) -> jax.Array:
    """eps = eps_u + s (eps_c - eps_u); cfg <= 0 -> single conditional pass
    (`sde_score_model.py:402-423`). The cond/uncond passes are fused into one
    doubled-batch forward — same FLOPs, one kernel launch, better MXU
    utilisation at small batch."""
    if guidance_scale <= 0.0:
        return apply_fn(params, x_t, t, y_cat, y_cont)

    b = x_t.shape[0]
    x2 = jnp.concatenate([x_t, x_t], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    ycat2 = jnp.concatenate([jnp.full_like(y_cat, n_types), y_cat], axis=0)
    ycont2 = jnp.concatenate([jnp.zeros_like(y_cont), y_cont], axis=0)
    eps2 = apply_fn(params, x2, t2, ycat2, ycont2)
    eps_u, eps_c = eps2[:b], eps2[b:]
    return eps_u + guidance_scale * (eps_c - eps_u)


def _quadratic_grid(n_steps: int, t_end: float) -> jax.Array:
    """ts[0]=1 .. ts[-1]=t_end, concentrated near t_end
    (`sde_score_model.py:482-483,540-541`)."""
    u = jnp.linspace(0.0, 1.0, n_steps + 1)
    return t_end + (1.0 - t_end) * (1.0 - u) ** 2


def _check_t_end(t_end: float) -> float:
    t_end = float(t_end)
    if not (0.0 < t_end < 1.0):
        raise ValueError(f"t_end must be in (0,1), got {t_end}")
    return t_end


def _x0_projection(apply_fn, params, sde, x, t_final, y_cat, y_cont, gs, n_types, b):
    """Final x0 projection + map to [0,1] (`sde_score_model.py:495-504`)."""
    tb = jnp.full((b,), t_final)
    a = sde.alpha(tb).reshape(b, 1, 1, 1)
    s = sde.sigma(tb).reshape(b, 1, 1, 1)
    eps_hat = predict_eps_cfg(apply_fn, params, x, tb, y_cat, y_cont, gs, n_types)
    x0_hat = (x - s * eps_hat) / jnp.clip(a, min=1e-6)
    return jnp.clip((x0_hat + 1.0) * 0.5, 0.0, 1.0)


def _maybe_clip_eps(eps_hat, x, a, s, clip_x0: bool):
    """Static x0-thresholding (Imagen-style): clip the implied
    x0_hat = (x - s*eps_hat)/a to the data range [-1, 1] and re-derive
    eps_hat. The eps-parameterization is ill-conditioned at large t — a is
    ~1e-4 near t=1, so an O(0.003) eps error implies an O(20) x0 error whose
    systematic component integrates into a runaway (measured at 256x256:
    trajectories drift to x~-16 and saturate; with clipping they stay
    on-manifold and form lattices). No reference counterpart — the
    reference's 64x64 runs never leave the regime where this matters; off by
    default for parity, REQUIRED for the 256x256 stretch (`--clip-x0 1`)."""
    if not clip_x0:
        return eps_hat
    x0 = jnp.clip((x - s * eps_hat) / jnp.maximum(a, 1e-6), -1.0, 1.0)
    return (x - a * x0) / s


def _make_pin(sharding):
    """Identity, or a GSPMD sharding constraint pinning the sampler's scan
    carry to `sharding` each step. Pinning only the carry is enough: the SPMD
    partitioner propagates the image sharding through the whole U-Net forward
    (conv halo exchange, GN-stat psum, sequence-parallel attention inserted
    automatically) instead of resharding to whatever it would infer from the
    replicated params."""
    if sharding is None:
        return lambda v: v
    return lambda v: jax.lax.with_sharding_constraint(v, sharding)


@partial(jax.jit, static_argnums=(0, 5, 7, 8, 9, 10, 11, 12))
def sample_probability_flow_ode(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
    y_cat: jax.Array,
    y_cont: jax.Array,
    img_shape: tuple[int, int, int, int],
    key: jax.Array,
    n_steps: int = 200,
    guidance_scale: float = 0.0,
    t_end: float = 1e-3,
    n_types: int = 4,
    clip_x0: bool = False,
    sharding=None,
) -> jax.Array:
    """Probability-flow ODE with Heun (2nd order) as one lax.scan
    (`sde_score_model.py:452-504`). img_shape is NHWC with C == 1.
    clip_x0: see `_maybe_clip_eps`. sharding: optional NamedSharding pinning
    the solution through the scan (e.g. `parallel.image_sharding` for
    batch+height GSPMD spatial partitioning — see parallel/spatial.py)."""
    t_end = _check_t_end(t_end)
    b, h, w, c = img_shape
    assert c == 1
    gs = float(guidance_scale)
    pin = _make_pin(sharding)

    ts = _quadratic_grid(n_steps, t_end)
    x = pin(jax.random.normal(key, (b, h, w, c), jnp.float32))  # [-1,1]-space prior

    def drift(x, tb):
        """-0.5 beta x - 0.5 beta score, score = -eps_hat / sigma (`:426-449`)."""
        beta_t = sde.beta(tb).reshape(b, 1, 1, 1)
        sigma_t = sde.sigma(tb).reshape(b, 1, 1, 1)
        alpha_t = sde.alpha(tb).reshape(b, 1, 1, 1)
        eps_hat = predict_eps_cfg(apply_fn, params, x, tb, y_cat, y_cont, gs, n_types)
        eps_hat = _maybe_clip_eps(eps_hat, x, alpha_t, sigma_t, clip_x0)
        score = -eps_hat / sigma_t
        return -0.5 * beta_t * x - 0.5 * beta_t * score

    def body(x, step):
        t, t_next = step
        tb = jnp.full((b,), t)
        tb_next = jnp.full((b,), t_next)
        dt = t_next - t  # negative
        d1 = drift(x, tb)
        x_euler = x + d1 * dt
        d2 = drift(x_euler, tb_next)
        return pin(x + 0.5 * (d1 + d2) * dt), None

    x, _ = jax.lax.scan(body, x, (ts[:-1], ts[1:]))
    return _x0_projection(apply_fn, params, sde, x, ts[-1], y_cat, y_cont, gs, n_types, b)


@partial(jax.jit, static_argnums=(0, 5, 7, 8, 9, 10, 11, 12))
def sample_reverse_sde_euler_maruyama(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
    y_cat: jax.Array,
    y_cont: jax.Array,
    img_shape: tuple[int, int, int, int],
    key: jax.Array,
    n_steps: int = 200,
    guidance_scale: float = 0.0,
    t_end: float = 1e-3,
    n_types: int = 4,
    clip_x0: bool = False,
    sharding=None,
) -> jax.Array:
    """Reverse-time SDE via Euler-Maruyama as one lax.scan
    (`sde_score_model.py:507-569`): dx = [f - g^2 score] dt + g dW,
    f = -0.5 beta x, g = sqrt(beta). Integrates t: 1 -> t_end (dt < 0).
    clip_x0: see `_maybe_clip_eps`. sharding: see `_make_pin`."""
    t_end = _check_t_end(t_end)
    b, h, w, c = img_shape
    assert c == 1
    gs = float(guidance_scale)
    pin = _make_pin(sharding)

    ts = _quadratic_grid(n_steps, t_end)
    k_init, k_noise = jax.random.split(key)
    x = pin(jax.random.normal(k_init, (b, h, w, c), jnp.float32))

    def body(x, step):
        t, t_next, i = step
        tb = jnp.full((b,), t)
        dt = t_next - t  # negative

        beta_t = sde.beta(tb).reshape(b, 1, 1, 1)
        sigma_t = sde.sigma(tb).reshape(b, 1, 1, 1)
        alpha_t = sde.alpha(tb).reshape(b, 1, 1, 1)
        g = jnp.sqrt(beta_t)

        eps_hat = predict_eps_cfg(apply_fn, params, x, tb, y_cat, y_cont, gs, n_types)
        eps_hat = _maybe_clip_eps(eps_hat, x, alpha_t, sigma_t, clip_x0)
        score = -eps_hat / sigma_t
        drift = (-0.5 * beta_t * x) - (beta_t * score)

        z = jax.random.normal(jax.random.fold_in(k_noise, i), x.shape, x.dtype)
        x = x + drift * dt + g * jnp.sqrt(jnp.abs(dt)) * z
        return pin(x), None

    steps = (ts[:-1], ts[1:], jnp.arange(n_steps))
    x, _ = jax.lax.scan(body, x, steps)
    return _x0_projection(apply_fn, params, sde, x, ts[-1], y_cat, y_cont, gs, n_types, b)


@partial(jax.jit, static_argnums=(0, 5, 7, 8, 9, 10, 11, 12))
def sample_dpmpp_2m(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
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
) -> jax.Array:
    """DPM-Solver++(2M): second-order multistep ODE solver in log-SNR time
    with data (x0) prediction — NEW TPU scope, no reference counterpart
    (the reference only ships 300-step Heun/Euler-Maruyama,
    `sde_score_model.py:452-569`). Solves the same probability-flow ODE with
    second-order accuracy at low step counts (tests/test_dpm_solver.py checks
    convergence against a dense solution on an analytic-Gaussian score),
    sharing the CFG fusion, conditioning grid, and final x0-projection
    conventions of the other samplers. Deterministic given the init key.
    One `lax.scan`, like everything else here.

    Update rule (Lu et al. 2022, "DPM-Solver++", algorithm 2M):
        h_i   = lam_i - lam_{i-1},  r_i = h_{i-1} / h_i
        D_i   = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}   (first step: x0_i)
        x_i   = (sigma_i/sigma_{i-1}) x_{i-1} - alpha_i expm1(-h_i) D_i
    on a uniform-lambda grid from t=1 to t_end (inverted numerically from the
    schedule, so logsnr_shift flows through unchanged).
    """
    t_end = _check_t_end(t_end)
    b, h, w, c = img_shape
    assert c == 1
    gs = float(guidance_scale)
    pin = _make_pin(sharding)

    def lam(t):
        a = sde.alpha(t)
        s = sde.sigma(t)
        return 0.5 * (jnp.log(jnp.clip(a * a, min=1e-20)) - jnp.log(s * s))

    # uniform-lambda timestep grid, numerically inverted from the schedule
    ts_dense = jnp.linspace(t_end, 1.0, 4097)
    lam_dense = lam(ts_dense)  # descending in t -> ascending when reversed
    lam_grid = jnp.linspace(lam(jnp.array(1.0)), lam(jnp.array(t_end)), n_steps + 1)
    ts = jnp.interp(lam_grid, lam_dense[::-1], ts_dense[::-1])
    ts = ts.at[0].set(1.0).at[-1].set(t_end)

    x = pin(jax.random.normal(key, (b, h, w, c), jnp.float32))

    def x0_pred(x, t):
        tb = jnp.full((b,), t)
        a = sde.alpha(tb).reshape(b, 1, 1, 1)
        s = sde.sigma(tb).reshape(b, 1, 1, 1)
        eps = predict_eps_cfg(apply_fn, params, x, tb, y_cat, y_cont, gs, n_types)
        x0 = (x - s * eps) / jnp.clip(a, min=1e-6)
        # the solver works in x0 form, so thresholding is a direct clip here
        return jnp.clip(x0, -1.0, 1.0) if clip_x0 else x0

    lam_prevv = jnp.concatenate([lam_grid[:1], lam_grid[:-1]])  # lam_{i-1} per step

    def body(carry, step):
        x, m_prev = carry
        t_cur, t_next, l_cur, l_next, l_pp, i = step
        m = x0_pred(x, t_cur)
        h_step = l_next - l_cur
        r = jnp.where(i == 0, 1.0, (l_cur - l_pp) / h_step)
        d = jnp.where(i == 0, m, (1.0 + 1.0 / (2.0 * r)) * m - (1.0 / (2.0 * r)) * m_prev)
        a_next = sde.alpha(t_next)
        x = (sde.sigma(t_next) / sde.sigma(t_cur)) * x - a_next * jnp.expm1(-h_step) * d
        return (pin(x), pin(m)), None

    steps = (ts[:-1], ts[1:], lam_grid[:-1], lam_grid[1:], lam_prevv[:-1],
             jnp.arange(n_steps))
    (x, _), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), steps)
    return _x0_projection(apply_fn, params, sde, x, ts[-1], y_cat, y_cont, gs, n_types, b)


@partial(jax.jit, static_argnums=(0, 5, 7, 8, 9, 10, 11, 12, 13))
def sample_ddim(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
    y_cat: jax.Array,
    y_cont: jax.Array,
    img_shape: tuple[int, int, int, int],
    key: jax.Array,
    n_steps: int = 4,
    guidance_scale: float = 0.0,
    t_end: float = 1e-3,
    n_types: int = 4,
    clip_x0: bool = False,
    sharding=None,
    prediction: str = "eps",
) -> jax.Array:
    """Deterministic DDIM on the quadratic grid — exactly `n_steps` model
    evaluations (NEW TPU scope, no reference counterpart: the reference's
    continuous-time samplers are 300-step Heun/Euler-Maruyama,
    `sde_score_model.py:452-569`; its only DDIM lives on the discrete latent
    prior). This is the few-step sampler for progressive-distilled students
    (train/distill.py): the student's one-step map IS this update rule, so
    sampling an N-step student runs N single-pass evals — no CFG doubling
    when guidance_scale <= 0 (distilled students bake the guidance in).

    Each step evaluates the net at ts[i] and jumps x to ts[i+1] via the exact
    marginal decomposition x_s = alpha_s*x0_hat + sigma_s*eps_hat; the FINAL
    eval returns x0_hat directly instead of stepping to t_end (the standard
    few-step convention — saves the extra projection eval the other samplers
    spend, which matters at n_steps 1-4).

    prediction: how to read the net output.
      "eps" — x advances via the alpha-ratio form (never divides by alpha;
              the final x0_hat divides by clip(alpha, 1e-6) like
              `_x0_projection`).
      "v"   — x0_hat = alpha*x - sigma*v and eps_hat = sigma*x + alpha*v are
              exact and well-conditioned at EVERY t, including t=1 where the
              eps-form x0 recovery cancels in f32 (measured ~7000x the v
              route's rounding error; tests/test_distill.py). Distilled
              students train in v.
    CFG combining works on the raw net output for either parameterization
    (the combine is affine and both passes share (x_t, t))."""
    t_end = _check_t_end(t_end)
    if prediction not in ("eps", "v"):
        raise ValueError(f"prediction must be eps|v, got {prediction}")
    b, h, w, c = img_shape
    assert c == 1
    gs = float(guidance_scale)
    pin = _make_pin(sharding)

    ts = _quadratic_grid(n_steps, t_end)
    x = pin(jax.random.normal(key, (b, h, w, c), jnp.float32))

    def x0_eps(x, tb):
        a = sde.alpha(tb).reshape(b, 1, 1, 1)
        s = sde.sigma(tb).reshape(b, 1, 1, 1)
        raw = predict_eps_cfg(apply_fn, params, x, tb, y_cat, y_cont, gs, n_types)
        if prediction == "v":
            x0 = a * x - s * raw
            eps = s * x + a * raw
        else:
            eps = raw
            x0 = (x - s * eps) / jnp.clip(a, min=1e-6)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (x - a * x0) / s
        return x0, eps

    def body(x, step):
        t, t_next = step
        tb = jnp.full((b,), t)
        x0, eps = x0_eps(x, tb)
        a_n = sde.alpha(jnp.full((b,), t_next)).reshape(b, 1, 1, 1)
        s_n = sde.sigma(jnp.full((b,), t_next)).reshape(b, 1, 1, 1)
        if prediction == "v" or clip_x0:
            x = a_n * x0 + s_n * eps
        else:
            # alpha-ratio form: equal to a_n*x0 + s_n*eps without the
            # ill-conditioned x0 division at large t
            a_t = sde.alpha(tb).reshape(b, 1, 1, 1)
            s_t = sde.sigma(tb).reshape(b, 1, 1, 1)
            x = (a_n / jnp.clip(a_t, min=1e-6)) * (x - s_t * eps) + s_n * eps
        return pin(x), None

    if n_steps > 1:
        x, _ = jax.lax.scan(body, x, (ts[:-2], ts[1:-1]))
    x0, _ = x0_eps(x, jnp.full((b,), ts[-2]))
    return jnp.clip((x0 + 1.0) * 0.5, 0.0, 1.0)


@partial(jax.jit, static_argnums=(0, 5, 7, 8, 9, 10, 11, 12, 13))
def sample_inpaint_reverse_sde(
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
    y_cat: jax.Array,
    y_cont: jax.Array,
    img_shape: tuple[int, int, int, int],
    key: jax.Array,
    n_steps: int = 300,
    guidance_scale: float = 0.0,
    t_end: float = 1e-3,
    n_types: int = 4,
    resample: int = 1,
    clip_x0: bool = False,
    sharding=None,
    *,
    x_known: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Mask-conditioned generation (inpainting) via the reverse SDE — one
    lax.scan (NEW TPU scope; the reference has no conditional-completion
    path, only full-image samplers, `sde_score_model.py:452-569`).

    The base update is identical to `sample_reverse_sde_euler_maruyama`;
    after each Euler-Maruyama step the KNOWN region is overwritten with an
    exact VP-SDE forward-marginal sample of `x_known` at the new time
    (the replacement method of Song et al. 2021's controllable-generation
    appendix). With `resample > 1` each step additionally runs RePaint-style
    harmonisation (Lugmayr et al. 2022): diffuse the merged image one step
    back (exact q(x_t | x_{t_next}) bridge) and redo the reverse step
    `resample` times, which lets the generated region adapt to the known
    boundary instead of merely abutting it — at `resample`x the model evals.

    x_known: (b, h, w, 1) in DATA space [0, 1] (as loaded/produced by the
      dataset or a sampler grid); mapped to the model's [-1, 1] internally.
    mask:    (b, h, w, 1); 1 = keep pixel from x_known, 0 = generate.
      Any float in between soft-blends, but {0, 1} is the intended use.
    The returned image satisfies out == clip(x_known) exactly where mask==1.
    """
    t_end = _check_t_end(t_end)
    if resample < 1:
        raise ValueError(f"resample must be >= 1, got {resample}")
    b, h, w, c = img_shape
    assert c == 1
    gs = float(guidance_scale)
    pin = _make_pin(sharding)

    x_known = jnp.clip(x_known.astype(jnp.float32), 0.0, 1.0)
    x0k = x_known * 2.0 - 1.0  # data [0,1] -> model [-1,1] (`:377-379` scale)
    mask = mask.astype(jnp.float32)

    ts = _quadratic_grid(n_steps, t_end)
    k_init, k_noise = jax.random.split(key)
    x = pin(jax.random.normal(k_init, (b, h, w, c), jnp.float32))

    def body(x, step):
        t, t_next, i = step
        tb = jnp.full((b,), t)
        tn = jnp.full((b,), t_next)
        dt = t_next - t  # negative
        beta_t = sde.beta(tb).reshape(b, 1, 1, 1)
        a_t = sde.alpha(tb).reshape(b, 1, 1, 1)
        s_t = sde.sigma(tb).reshape(b, 1, 1, 1)
        a_n = sde.alpha(tn).reshape(b, 1, 1, 1)
        s_n = sde.sigma(tn).reshape(b, 1, 1, 1)
        ki = jax.random.fold_in(k_noise, i)

        def inner(r, x):
            kr = jax.random.fold_in(ki, r)
            # reverse EM update t -> t_next (same math as the plain sampler)
            eps_hat = predict_eps_cfg(apply_fn, params, x, tb, y_cat, y_cont, gs, n_types)
            eps_hat = _maybe_clip_eps(eps_hat, x, a_t, s_t, clip_x0)
            score = -eps_hat / s_t
            drift = (-0.5 * beta_t * x) - (beta_t * score)
            z = jax.random.normal(jax.random.fold_in(kr, 0), x.shape, x.dtype)
            x = x + drift * dt + jnp.sqrt(beta_t) * jnp.sqrt(jnp.abs(dt)) * z
            # known region: exact forward marginal of x_known at t_next
            zk = jax.random.normal(jax.random.fold_in(kr, 1), x.shape, x.dtype)
            x = mask * (a_n * x0k + s_n * zk) + (1.0 - mask) * x
            if resample > 1:
                # RePaint jump: exact forward bridge q(x_t | x_{t_next}) for
                # the VP-SDE — x_t = (a_t/a_n) x_{t_next} + sqrt(s_t^2 -
                # (a_t/a_n)^2 s_n^2) z — except after the final repeat
                ratio = a_t / jnp.clip(a_n, min=1e-6)
                sig = jnp.sqrt(jnp.clip(s_t**2 - ratio**2 * s_n**2, min=0.0))
                z2 = jax.random.normal(jax.random.fold_in(kr, 2), x.shape, x.dtype)
                x = jnp.where(r < resample - 1, ratio * x + sig * z2, x)
            return pin(x)

        if resample > 1:
            x = jax.lax.fori_loop(0, resample, inner, x)
        else:
            x = inner(0, x)
        return x, None

    steps = (ts[:-1], ts[1:], jnp.arange(n_steps))
    x, _ = jax.lax.scan(body, x, steps)
    x0 = _x0_projection(apply_fn, params, sde, x, ts[-1], y_cat, y_cont, gs, n_types, b)
    return mask * x_known + (1.0 - mask) * x0


def auto_chunk(img_size: int, n_steps: int, sampler: str = "sde") -> int:
    """Largest per-dispatch sample batch that keeps one compiled sampling
    scan under the tunneled-TPU per-dispatch duration cap (~1-2 min;
    CLAUDE.md). Calibrated at the flagship base_ch=96: 12 images at
    256x256/300 steps is measured safe (benchmarks/NOTES.md), and dispatch
    cost scales with model-evals * pixels. Heun ("ode") runs 2 model evals
    per step; "sde"/"dpm"/"ddim"/"rf" (Euler default) run 1."""
    evals = n_steps * (2 if sampler == "ode" else 1)
    budget = 12 * 300 * (256 // 64) ** 2  # images * evals * (px/64)^2, measured safe
    scale = max(1, (img_size + 63) // 64) ** 2
    return max(1, budget // max(1, evals * scale))


def sample_chunked(
    sampler_fn: Callable[..., jax.Array],
    apply_fn: Callable[..., jax.Array],
    params: Any,
    sde: VPSDE,
    y_cat: jax.Array,
    y_cont: jax.Array,
    img_shape: tuple[int, int, int, int],
    key: jax.Array,
    *,
    chunk: int,
    mesh=None,
    batch_kw: dict[str, jax.Array] | None = None,
    **kw,
):
    """Split one big sampling batch into fixed-size compiled dispatches.

    Two environment realities make a single monolithic dispatch wrong at
    scale: the tunneled-TPU backend kills any single dispatch over ~1-2 min
    (CLAUDE.md), and GSPMD batch sharding needs the batch to divide over the
    mesh. One pad-and-trim fixes both: every dispatch runs at exactly `chunk`
    images (the chunk is first rounded up to a mesh multiple; the final short
    chunk is padded by repeating its last condition row and trimmed after),
    so ONE executable is compiled and reused for every chunk, and the
    reference's canonical n=36 grid (`sde_score_model.py:301-355`) shards
    cleanly over an 8-chip mesh.

    Each chunk folds its start index into `key` (results are statistically
    identical to, but differ bitwise from, a single unchunked dispatch).
    Chunks are pulled to the host as they finish; returns an np.ndarray.

    batch_kw: extra per-item arrays (leading dim == n) passed to sampler_fn
    by keyword, sliced/padded/placed per chunk exactly like the condition
    rows — e.g. `x_known`/`mask` for `sample_inpaint_reverse_sde`."""
    import numpy as np

    n, h, w, c = img_shape
    # Batch only shards over the 'data' axis — on a 2-D (data, space) mesh
    # the 'space' factor constrains H, not the batch (parallel/spatial.py).
    m = int(dict(mesh.shape).get("data", mesh.devices.size)) if mesh is not None else 1
    chunk = max(1, min(int(chunk), n))
    chunk = -(-chunk // m) * m  # round up to a mesh multiple

    if mesh is not None:
        from toycrystals_tpu.parallel import data_sharding, shard_params

        # Full replication on data/spatial meshes; channel-sharded over
        # 'model' on a tensor-parallel mesh (parallel/tensor.py).
        params = shard_params(mesh, params)
    else:
        # Checkpoint-loaded params are HOST numpy; pin them once so each
        # chunk dispatch doesn't re-upload the full model over the tunnel
        # (measured ~300 ms per re-upload at base_ch=96; benchmarks/NOTES.md).
        params = jax.device_put(params)

    def pad(a, k):
        return a if k == 0 else jnp.concatenate(
            [a, jnp.repeat(a[-1:], k, axis=0)], axis=0
        )

    outs = []
    for i0 in range(0, n, chunk):
        take = min(chunk, n - i0)
        yc = pad(y_cat[i0:i0 + take], chunk - take)
        yv = pad(y_cont[i0:i0 + take], chunk - take)
        bkw = {k: pad(v[i0:i0 + take], chunk - take)
               for k, v in (batch_kw or {}).items()}
        if mesh is not None:
            yc = jax.device_put(yc, data_sharding(mesh, yc.ndim))
            yv = jax.device_put(yv, data_sharding(mesh, yv.ndim))
            bkw = {k: jax.device_put(v, data_sharding(mesh, v.ndim))
                   for k, v in bkw.items()}
        x = sampler_fn(
            apply_fn, params, sde, yc, yv, (chunk, h, w, c),
            jax.random.fold_in(key, i0), **kw, **bkw,
        )
        if not getattr(x, "is_fully_addressable", True):
            # Multi-process mesh: the chunk is batch-sharded across hosts
            # and device_get would raise on the non-addressable shards.
            # process_allgather on a global non-addressable jax.Array
            # returns the FULL value, replicated to every process (for
            # global arrays the `tiled` argument is ignored — no re-tiling
            # happens; the global shape comes back as-is), so every process
            # returns the complete grid and the callers' process-0 write
            # gating needs no further gather.
            from jax.experimental import multihost_utils

            xh = multihost_utils.process_allgather(x, tiled=True)
        else:
            xh = jax.device_get(x)
        outs.append(np.asarray(xh)[:take])
    return np.concatenate(outs, axis=0)


def sample_grid_conditions(
    n: int, n_types: int, y_cont_dim: int, theta_max: float = math.pi / 3.0
) -> tuple[jax.Array, jax.Array]:
    """The 6x6 figure-grid condition convention used in four places in the
    reference (`sde_score_model.py:317-321`, `train_vae.py:92-98`,
    `train_diffusion_prior.py:81-86`): cycle lattice types, sweep theta."""
    y_cat = jnp.arange(n, dtype=jnp.int32) % n_types
    thetas = jnp.linspace(0.0, theta_max, n)
    y_cont = jnp.zeros((n, y_cont_dim), jnp.float32).at[:, 1].set(thetas)
    return y_cat, y_cont
