"""Spatial self-attention over NHWC feature maps.

Mirrors the capability of the reference's SelfAttention2d
(`/root/reference/src/toycrystals/models/sde_score_model.py:114-167`):
GroupNorm -> 1x1 QKV -> multi-head SDPA -> 1x1 proj -> residual. In NHWC a
1x1 conv is a Dense over the channel axis.

Two SDPA backends, selected by `attn_impl`:
- "xla" — `jax.nn.dot_product_attention`: XLA materialises the [B, H, N, N]
  logits. Fine at the 64x64-image bottleneck (N=256 tokens), but at the
  256x256 stretch config (N=4096) the logits buffer is B x 134 MB and caps
  per-chip training batch at ~16 (benchmarks/NOTES.md).
- "flash" — the Pallas TPU flash-attention kernel
  (`jax.experimental.pallas.ops.tpu.flash_attention`, blockwise online
  softmax, custom VJP): never materialises the logits, removing that cap.
  The kernel handles head_dim < 128 natively (verified fwd+bwd on v5e) and
  requires seq_len % 128 == 0.
- "auto" — flash on TPU when N >= 2048 (where the logits buffer starts to
  matter) and the kernel's constraints hold, else xla.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def gn_groups(ch: int) -> int:
    """First of 8/4/2 dividing ch, else 1 (`sde_score_model.py:89-94`)."""
    for g in (8, 4, 2):
        if ch % g == 0:
            return g
    return 1


_FLASH_MAX_HEAD_DIM = 128  # the kernel supports head_dim <= one 128-lane tile


def _largest_block(n: int, target: int) -> int:
    """Largest power-of-two block <= target that divides the sequence length."""
    b = target
    while b > 128 and (b > n or n % b != 0):
        b //= 2
    return b


def _flash_block_sizes(n: int):
    """Measured block sizes for the non-causal spatial-attention shapes.

    The library default (128x128 tiles, block_b=1) runs the 256x256-stretch
    mid-block shape (B=24, H=4, N=4096, D=48) at 6.6 TFLOP/s — the grid
    degenerates into ~10^5 tiny kernel steps whose DMA setup dominates.
    Measured on v5e (benchmarks/bench_attention.py): 1024-wide q/k-major
    tiles with 512-deep k minor blocks reach 47.9 TFLOP/s forward (7.3x).
    Blocks are shrunk to divide shorter sequences.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = _largest_block(n, 1024)
    bk_major = _largest_block(n, 1024)
    bk = min(_largest_block(n, 512), bk_major)
    bq_dkv = min(_largest_block(n, 512), bq)
    return BlockSizes(
        block_q=bq, block_k_major=bk_major, block_k=bk, block_b=1,
        block_q_major_dkv=bq_dkv, block_q_dkv=bq_dkv,
        block_k_major_dkv=bk_major, block_k_dkv=bk,
        block_q_dq=bq, block_k_major_dq=bk_major, block_k_dq=bk,
    )


def _flash_sdpa(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Blockwise (flash) SDPA on [B, N, H, D] tensors, exact math."""
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    d = q.shape[-1]
    if d > _FLASH_MAX_HEAD_DIM:
        raise ValueError(f"flash path supports head_dim <= 128, got {d}; use xla")
    # kernel layout is [B, H, N, D]
    q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    o = flash_attention(q, k, v, causal=False, sm_scale=1.0 / math.sqrt(d),
                        block_sizes=_flash_block_sizes(q.shape[2]))
    return o.transpose(0, 2, 1, 3)


class SelfAttention2d(nn.Module):
    """Multi-head self-attention over the H*W spatial tokens of [B,H,W,C]."""

    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"  # auto | xla | flash

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

        impl = self.attn_impl
        if impl == "auto":
            # flash only where it helps AND the kernel's block constraint
            # holds (kv_seq_len % 128 == 0) — e.g. img_size 224 gives
            # 56x56 = 3136 tokens, which must stay on the xla path.
            impl = (
                "flash"
                if (
                    n >= 2048
                    and n % 128 == 0
                    and head_dim <= _FLASH_MAX_HEAD_DIM
                    and jax.default_backend() == "tpu"
                )
                else "xla"
            )
        if impl == "flash":
            o = _flash_sdpa(q, k, v)
        else:
            o = jax.nn.dot_product_attention(q, k, v)            # fused XLA SDPA
        o = o.reshape(b, h, w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj")(o)
        return x + o
