"""Circular (periodic) convolution without materialising the padded array.

The reference applies `padding_mode="circular"` to every conv
(`/root/reference/src/toycrystals/models/sde_score_model.py:102-105,208-225`).
The straightforward TPU composition — `jnp.pad(mode="wrap")` + VALID conv —
is numerically exact but materialises a full padded activation copy per conv:
at the flagship sampler config that is ~10 padded [B, 66, 66, C] copies per
U-Net forward, ~20% of step time in pure HBM traffic (benchmarks/NOTES.md
ablation: zero-pad SAME saves 9.7 ms of a 47 ms step).

`impl="border"` gets the same result without the copy:

1. run the conv with XLA's *implicit* zero padding (`padding=((1,1),(1,1))`),
   which streams the unpadded input straight from HBM — only border outputs
   are wrong (they saw zeros where wrap values belong);
2. recompute exactly the affected border rows/cols from thin wrap strips
   (k rows/cols each — O(k/H) of the conv FLOPs) and write them in place
   with `.at[].set` (an in-place dynamic-update-slice under jit).

Both reference conv geometries use pad=1 per side (k3/s1/p1 and k4/s2/p1), so
only the first/last output row and column touch the wrap. Parameter tree is
identical to `flax.linen.Conv` (`kernel` [kh,kw,cin,cout] lecun-normal,
`bias` zeros) — checkpoints and `torch_like_init` are interchangeable between
the two implementations.

**Measured verdict (benchmarks/NOTES.md): "border" LOSES on TPU** — 72.8 vs
40.5 ms/step in the flagship sampler. The ~44 extra thin-strip convs + slice
updates per U-Net forward cost far more in kernel launches and layout work
than the ~10 padded-copy materialisations they avoid. `impl="pad"` (the
materialised wrap-pad + VALID conv) is therefore the default; "border" stays
as a tested, numerically-exact alternative and a record of the experiment.

`impl="int8"` is the quantized inference path: v5e's int8 MXU runs these
conv shapes at ~2.2× the bf16 rate at the op level, which buys a measured
1.21× end-to-end on the headline sampler (23.5 vs 19.4 img/s — the dynamic
scale/cast work is HBM-bound and eats the Amdahl ideal; micro + e2e numbers
and the honest analysis live in benchmarks/NOTES.md "int8 quantized
sampling"). Weights quantize per-output-channel
and activations per-tensor with DYNAMIC scales computed in the pass itself —
no calibration step, no param-tree surgery, any float checkpoint serves
quantized with `--quantize int8` (serving/eval/export). Training always runs
float; this is post-training quantization for the serving path.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def _conv(x: jax.Array, w: jax.Array, strides: tuple[int, int], padding) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding, dimension_numbers=_DIMS
    )


def _wrap_idx(start: int, k: int, size: int) -> list[int]:
    return [(start + r) % size for r in range(k)]


class CircularConv(nn.Module):
    """Conv with circular padding of 1 on each spatial side (NHWC).

    Matches torch `Conv2d(k, stride=s, padding=1, padding_mode="circular")`
    for the two geometries the reference uses: (k=3, s=1) and (k=4, s=2).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32
    # "pad" (materialised wrap-pad) | "border" (no copy; measured slower) |
    # "int8" (dynamic-quantized int8 MXU conv — inference only)
    impl: str = "pad"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        sh, sw = self.strides
        if (kh - sh, kw - sw) != (2, 2):
            raise ValueError(
                f"CircularConv supports pad-1 geometries (k - s == 2), got "
                f"kernel {self.kernel_size} strides {self.strides}"
            )
        b, h, w_sz, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)

        if self.impl == "int8":
            # Dynamic symmetric quantization: per-tensor activation scale,
            # per-output-channel weight scale (both f32), int8 conv on the
            # MXU's 2x-rate path, dequantize into the bias add. The
            # round/clip/cast fuses into the wrap-pad pass; the only extra
            # full pass is the |x| max-reduce.
            sx = jnp.maximum(jnp.max(jnp.abs(x)).astype(jnp.float32), 1e-12) / 127.0
            sw_c = jnp.maximum(
                jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            wq = jnp.clip(jnp.round(kernel / sw_c), -127, 127).astype(jnp.int8)
            xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
            y = lax.conv_general_dilated(
                xp, wq, window_strides=(sh, sw), padding="VALID",
                dimension_numbers=_DIMS, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (sx * sw_c) + bias
            return y.astype(self.dtype)

        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)

        if self.impl == "pad":
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
            y = _conv(xp, kernel, (sh, sw), "VALID")
            return y + bias.astype(y.dtype)

        # Main pass: implicit zero pad — no activation copy. Border outputs
        # (first/last row and column) are then recomputed exactly.
        y = _conv(x, kernel, (sh, sw), ((1, 1), (1, 1)))
        ho, wo = y.shape[1], y.shape[2]

        def row_fix(start: int) -> jax.Array:
            # [B, kh, W, C] strip of the rows feeding one output row (wrapped),
            # with the column wrap applied so its corners come out right too.
            strip = x[:, jnp.array(_wrap_idx(start, kh, h))]
            strip = jnp.pad(strip, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="wrap")
            return _conv(strip, kernel, (1, sw), "VALID")[:, 0]  # [B, Wo, C]

        def col_fix(start: int) -> jax.Array:
            strip = x[:, :, jnp.array(_wrap_idx(start, kw, w_sz))]
            strip = jnp.pad(strip, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="wrap")
            return _conv(strip, kernel, (sh, 1), "VALID")[:, :, 0]  # [B, Ho, C]

        y = y.at[:, 0].set(row_fix(-1))
        y = y.at[:, ho - 1].set(row_fix((ho - 1) * sh - 1))
        y = y.at[:, :, 0].set(col_fix(-1))
        y = y.at[:, :, wo - 1].set(col_fix((wo - 1) * sw - 1))
        return y + bias.astype(y.dtype)
