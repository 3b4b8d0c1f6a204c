"""Flash-attention backend parity (kernel runs TPU only — the Pallas kernel
has no CPU interpret path wired here; the CPU suite covers the xla backend)
plus CPU-safe tests of the measured block-size selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.ops.attention import (
    SelfAttention2d,
    _flash_block_sizes,
    _largest_block,
)

tpu_only = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas flash kernel needs a TPU"
)


def test_largest_block_divides():
    """Blocks shrink to divide the sequence and never drop below 128."""
    assert _largest_block(4096, 1024) == 1024
    assert _largest_block(2048, 1024) == 1024
    assert _largest_block(256, 1024) == 256
    assert _largest_block(128, 1024) == 128
    # 3200 = 128 * 25: 1024/512/256 don't divide it, 128 does
    assert _largest_block(3200, 1024) == 128


@pytest.mark.parametrize("n", [128, 256, 2048, 4096, 3200])
def test_flash_block_sizes_valid(n):
    """Selected sizes satisfy the kernel's divisibility + major/minor rules
    and carry the full backward set (required for differentiation)."""
    bs = _flash_block_sizes(n)  # BlockSizes.__post_init__ checks major/minor
    assert bs.has_backward_blocks
    for b in (bs.block_q, bs.block_k_major, bs.block_k,
              bs.block_q_major_dkv, bs.block_k_major_dkv,
              bs.block_q_dq, bs.block_k_major_dq):
        assert n % b == 0 and b >= 128


@tpu_only
@pytest.mark.parametrize("hw", [16, 64])
def test_flash_matches_xla(hw):
    """flash (blockwise, tuned block sizes) == xla SDPA."""
    c = 192
    x = jax.random.normal(jax.random.key(0), (2, hw, hw, c), jnp.float32)
    xla_attn = SelfAttention2d(num_heads=4, attn_impl="xla")
    params = xla_attn.init(jax.random.key(1), x)
    flash_attn = SelfAttention2d(num_heads=4, attn_impl="flash")

    y_xla = xla_attn.apply(params, x)
    y_flash = flash_attn.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_flash), np.asarray(y_xla), rtol=2e-2, atol=2e-3
    )


@tpu_only
def test_flash_gradients_match():
    c, hw = 192, 16
    x = jax.random.normal(jax.random.key(0), (2, hw, hw, c), jnp.float32)
    params = SelfAttention2d(num_heads=4, attn_impl="xla").init(jax.random.key(1), x)

    def loss(p, impl):
        m = SelfAttention2d(num_heads=4, attn_impl=impl)
        return jnp.mean(m.apply(p, x) ** 2)

    g_xla = jax.grad(loss)(params, "xla")
    g_flash = jax.grad(loss)(params, "flash")
    for a, b in zip(jax.tree.leaves(g_xla), jax.tree.leaves(g_flash)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-2, atol=5e-3)
