"""Spatial self-attention over NHWC feature maps.

Mirrors the capability of the reference's SelfAttention2d
(`/root/reference/src/toycrystals/models/sde_score_model.py:114-167`):
GroupNorm -> 1x1 QKV -> multi-head SDPA -> 1x1 proj -> residual. In NHWC a
1x1 conv is a Dense over the channel axis, and the SDPA goes through
`jax.nn.dot_product_attention`, which XLA lowers to a fused TPU attention
(flash-style) kernel. Used once at the 16x16 U-Net bottleneck (256 tokens).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def gn_groups(ch: int) -> int:
    """First of 8/4/2 dividing ch, else 1 (`sde_score_model.py:89-94`)."""
    for g in (8, 4, 2):
        if ch % g == 0:
            return g
    return 1


class SelfAttention2d(nn.Module):
    """Multi-head self-attention over the H*W spatial tokens of [B,H,W,C]."""

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if c % self.num_heads != 0:
            raise ValueError(f"ch ({c}) must be divisible by num_heads ({self.num_heads})")
        head_dim = c // self.num_heads
        n = h * w

        y = nn.GroupNorm(num_groups=gn_groups(c), dtype=self.dtype)(x)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(y)  # 1x1 conv == Dense on C
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]      # [B, N, heads, hd]

        o = jax.nn.dot_product_attention(q, k, v)                # fused SDPA
        o = o.reshape(b, h, w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        return x + o
