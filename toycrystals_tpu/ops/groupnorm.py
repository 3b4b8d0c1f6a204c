"""Fused GroupNorm + SiLU (+ optional wrap-pad) Pallas TPU kernel.

Every conv block in the score U-Net is `circular Conv3x3 -> GroupNorm -> SiLU`
(`/root/reference/src/toycrystals/models/sde_score_model.py:97-111`). Under
XLA the GroupNorm lowers to a reduction pass plus a normalise pass over the
activation, and the following conv's circular padding materialises one more
full copy (benchmarks/NOTES.md: GN ~13% and pad ~20% of the flagship sampler
step). This kernel does the whole post-conv tail in ONE pass over VMEM:

    read x[b] once -> per-group mean/var (f32, fast-variance, clipped at 0,
    matching flax.linen.GroupNorm) -> normalise -> scale/bias -> SiLU
    -> optionally write the [H+2, W+2] circular-padded output directly,

so the next conv can run VALID on the kernel's output with no separate
`jnp.pad(mode="wrap")` materialisation. HBM traffic: 1 read + 1 write
(vs 2 reads + 1 write for XLA's GN, + 1 read + 1 write for the pad).

Grid is one program per batch item; a [H, W, C] slab (<= ~1.6 MB at the
flagship 64x64x96 f32) fits VMEM comfortably. Gradients: `gn_silu` carries a
custom VJP whose backward differentiates the reference jnp implementation —
exact, and only the forward runs the kernel (sampling is forward-only; the
training step keeps its XLA fusions by default).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def gn_silu_reference(
    x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int, eps: float = 1e-6
) -> jax.Array:
    """jnp reference: flax GroupNorm (fast variance, f32 stats) + SiLU.

    x: [B, H, W, C]; scale/bias: [C]. Returns x.dtype.
    """
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.clip(jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean, min=0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _kernel(x_ref, scale_ref, bias_ref, avg_ref, out_ref, *, eps: float, pad: bool):
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    x = x_ref[0]  # [H, W, C], input dtype
    xr = x.reshape(h * w, c)

    # Both stat reductions run on the MXU with f32 accumulation: sum(x) via a
    # ones-vector matmul, sum(x^2) as the diagonal of xr^T xr (masked by eye).
    # The only VPU passes over the slab are the final normalise+SiLU.
    ones = jnp.ones((1, h * w), x.dtype)
    s1 = jnp.dot(ones, xr, preferred_element_type=jnp.float32)  # [1, C]
    gram = jax.lax.dot_general(
        xr, xr, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [C, C]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(jnp.float32)
    s2 = jnp.sum(gram * eye, axis=0, keepdims=True)  # [1, C]

    # [1,C]@[C,C] with the block-diagonal group-averaging matrix folds
    # channels into their group mean (Mosaic has no lane-splitting reshape,
    # so no [C]->[G,C/G] here).
    m1 = jnp.dot(s1, avg_ref[:], preferred_element_type=jnp.float32)
    m2 = jnp.dot(s2, avg_ref[:], preferred_element_type=jnp.float32)
    var = jnp.clip(m2 - m1 * m1, min=0.0)
    inv = jax.lax.rsqrt(var + eps)

    a = (inv * scale_ref[:].astype(jnp.float32)).reshape(1, 1, c)
    b = (
        bias_ref[:].astype(jnp.float32) - m1 * inv * scale_ref[:].astype(jnp.float32)
    ).reshape(1, 1, c)
    y = x.astype(jnp.float32) * a + b
    y = y * jax.nn.sigmoid(y)
    y = y.astype(out_ref.dtype)

    if not pad:
        out_ref[0] = y
        return
    # Circular halo of 1: centre, wrapped edge columns, then full wrapped rows
    # (rows include the corners once the columns of y are known).
    out_ref[0, 1 : h + 1, 1 : w + 1] = y
    out_ref[0, 1 : h + 1, 0] = y[:, w - 1]
    out_ref[0, 1 : h + 1, w + 1] = y[:, 0]
    out_ref[0, 0, 1 : w + 1] = y[h - 1]
    out_ref[0, h + 1, 1 : w + 1] = y[0]
    out_ref[0, 0, 0] = y[h - 1, w - 1]
    out_ref[0, 0, w + 1] = y[h - 1, 0]
    out_ref[0, h + 1, 0] = y[0, w - 1]
    out_ref[0, h + 1, w + 1] = y[0, 0]


def _group_avg_matrix(c: int, groups: int, n_spatial: int) -> jax.Array:
    """[C, C] f32: A[i, j] = 1/(n_spatial * C/G) iff i, j share a group, so
    sums_per_channel @ A = that channel's group mean."""
    gid = jnp.arange(c) // (c // groups)
    same = (gid[:, None] == gid[None, :]).astype(jnp.float32)
    return same / (n_spatial * (c // groups))


def _gn_silu_pallas(x, scale, bias, groups: int, eps: float, pad: bool):
    b, h, w, c = x.shape
    out_h, out_w = (h + 2, w + 2) if pad else (h, w)
    avg = _group_avg_matrix(c, groups, h * w)
    return pl.pallas_call(
        partial(_kernel, eps=eps, pad=pad),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, out_h, out_w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w, c), x.dtype),
        # CPU (tests / virtual meshes) runs the kernel in interpreter mode.
        interpret=jax.default_backend() != "tpu",
    )(x, scale.reshape(1, c), bias.reshape(1, c), avg)


def _wrap_pad_hw(y: jax.Array) -> jax.Array:
    return jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gn_silu(x, scale, bias, groups: int, eps: float = 1e-6, pad: bool = False):
    """Fused GroupNorm+SiLU; `pad=True` returns the circular-padded output
    ([B, H+2, W+2, C]) ready for a VALID conv. Forward runs the Pallas kernel;
    backward differentiates the exact jnp reference."""
    return _gn_silu_pallas(x, scale, bias, groups, eps, pad)


def _ref_full(x, scale, bias, groups, eps, pad):
    y = gn_silu_reference(x, scale, bias, groups, eps)
    return _wrap_pad_hw(y) if pad else y


def _gn_silu_fwd(x, scale, bias, groups, eps, pad):
    return _gn_silu_pallas(x, scale, bias, groups, eps, pad), (x, scale, bias)


def _gn_silu_bwd(groups, eps, pad, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda *a: _ref_full(*a, groups, eps, pad), x, scale, bias)
    return vjp(g)


gn_silu.defvjp(_gn_silu_fwd, _gn_silu_bwd)


class GroupNormSiLU(nn.Module):
    """Flax wrapper over the fused kernel. Param tree ("scale", "bias")
    matches `nn.GroupNorm`, so a module named gn0/gn1 is checkpoint-
    interchangeable with the unfused GroupNorm it replaces."""

    num_groups: int
    pad: bool = False
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,))
        bias = self.param("bias", nn.initializers.zeros_init(), (c,))
        return gn_silu(x, scale, bias, self.num_groups, self.epsilon, self.pad)
