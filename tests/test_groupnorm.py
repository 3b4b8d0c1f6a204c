"""Fused GroupNorm+SiLU(+wrap-pad) kernel: numerical parity with the flax
GroupNorm -> SiLU chain it can replace, on every platform (interpret mode off
TPU). Perf verdict on the real chip lives in benchmarks/NOTES.md: XLA's own
fusions win at the flagship shapes, so the kernel is opt-in (gn_impl).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models.sde_score_model import CondUNetTiny
from toycrystals_tpu.ops.groupnorm import gn_silu, gn_silu_reference, _wrap_pad_hw


@pytest.mark.parametrize("groups", [8, 4, 1])
def test_kernel_matches_reference(groups):
    x = jax.random.normal(jax.random.key(0), (3, 8, 8, 16))
    scale = jax.random.normal(jax.random.key(1), (16,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (16,)) * 0.1
    ref = gn_silu_reference(x, scale, bias, groups)
    np.testing.assert_allclose(
        np.asarray(gn_silu(x, scale, bias, groups)), np.asarray(ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gn_silu(x, scale, bias, groups, 1e-6, True)),
        np.asarray(_wrap_pad_hw(ref)),
        atol=1e-5,
    )


def test_reference_matches_flax_groupnorm_silu():
    x = jax.random.normal(jax.random.key(3), (2, 6, 6, 12))
    gn = nn.GroupNorm(num_groups=4)
    v = gn.init(jax.random.key(4), x)
    want = nn.silu(gn.apply(v, x))
    got = gn_silu_reference(x, v["params"]["scale"], v["params"]["bias"], 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_kernel_grads_match_reference():
    x = jax.random.normal(jax.random.key(5), (2, 8, 8, 8))
    scale = jnp.ones((8,))
    bias = jnp.zeros((8,))
    f_k = lambda x, s, b: jnp.sum(gn_silu(x, s, b, 4, 1e-6, True) ** 2)
    f_r = lambda x, s, b: jnp.sum(_wrap_pad_hw(gn_silu_reference(x, s, b, 4)) ** 2)
    gk = jax.grad(f_k, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_unet_gn_impls_agree():
    """Whole U-Net forward identical under either gn_impl with shared params
    (checkpoint compatibility across the two block layouts)."""
    kw = dict(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jax.random.normal(jax.random.key(6), (2, 16, 16, 1))
    t = jnp.array([0.3, 0.7])
    y_cat = jnp.array([1, 3], jnp.int32)
    y_cont = jnp.zeros((2, 4))
    m_xla = CondUNetTiny(gn_impl="xla", **kw)
    m_pallas = CondUNetTiny(gn_impl="pallas", **kw)
    v = m_xla.init(jax.random.key(7), x, t, y_cat, y_cont)
    y_xla = m_xla.apply(v, x, t, y_cat, y_cont)
    y_pallas = m_pallas.apply(v, x, t, y_cat, y_cont)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_xla), atol=2e-4)
