"""Flash-attention backend parity (TPU only — the Pallas kernel has no CPU
interpret path wired here; the CPU suite covers the xla backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.ops.attention import SelfAttention2d

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas flash kernel needs a TPU"
)


@pytest.mark.parametrize("hw", [16, 64])
def test_flash_matches_xla(hw):
    """flash (blockwise, head_dim zero-padded to 128) == xla SDPA."""
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
