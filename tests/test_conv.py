"""CircularConv: the border-fix implementation must match the materialised
wrap-pad path bit-for-bit-ish (same conv algorithm, different padding route),
and both must match torch's `padding_mode="circular"` semantics
(`/root/reference/src/toycrystals/models/sde_score_model.py:102-105,208-225`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from toycrystals_tpu.models.sde_score_model import CondUNetTiny
from toycrystals_tpu.ops.conv import CircularConv


@pytest.mark.parametrize("k,s", [((3, 3), (1, 1)), ((4, 4), (2, 2))])
@pytest.mark.parametrize("hw", [(16, 16), (8, 8), (6, 10)])
def test_border_matches_pad(k, s, hw):
    x = jax.random.normal(jax.random.key(0), (2, hw[0], hw[1], 5))
    m_border = CircularConv(7, k, s, impl="border")
    m_pad = CircularConv(7, k, s, impl="pad")
    params = m_border.init(jax.random.key(1), x)
    y_border = m_border.apply(params, x)
    y_pad = m_pad.apply(params, x)
    assert y_border.shape == (2, hw[0] // s[0], hw[1] // s[1], 7)
    np.testing.assert_allclose(np.asarray(y_border), np.asarray(y_pad), atol=1e-5)


def test_border_grads_match_pad():
    x = jax.random.normal(jax.random.key(2), (2, 8, 8, 3))
    m_border = CircularConv(4, (3, 3), impl="border")
    m_pad = CircularConv(4, (3, 3), impl="pad")
    params = m_border.init(jax.random.key(3), x)

    def loss(m):
        return lambda p, x: jnp.sum(m.apply(p, x) ** 2)

    g_border = jax.grad(loss(m_border), argnums=(0, 1))(params, x)
    g_pad = jax.grad(loss(m_pad), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_border), jax.tree.leaves(g_pad)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_shift_equivariance():
    """Circular conv commutes with torus rolls — the property the reference
    buys with padding_mode="circular" for periodic lattices."""
    x = jax.random.normal(jax.random.key(4), (1, 12, 12, 3))
    m = CircularConv(5, (3, 3), impl="border")
    params = m.init(jax.random.key(5), x)
    y = m.apply(params, x)
    y_rolled = m.apply(params, jnp.roll(x, (3, -2), axis=(1, 2)))
    np.testing.assert_allclose(
        np.asarray(jnp.roll(y, (3, -2), axis=(1, 2))), np.asarray(y_rolled), atol=1e-5
    )


def test_matches_torch_circular_conv():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 3, 10, 10)).astype(np.float32)
    conv = torch.nn.Conv2d(3, 6, 3, padding=1, padding_mode="circular")
    with torch.no_grad():
        y_t = conv(torch.from_numpy(x)).numpy()
    w = conv.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
    b = conv.bias.detach().numpy()
    m = CircularConv(6, (3, 3), impl="border")
    y_j = m.apply({"params": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}},
                  jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2), y_t, atol=1e-4)


def test_unsupported_geometry_raises():
    with pytest.raises(ValueError):
        CircularConv(4, (5, 5), (1, 1)).init(
            jax.random.key(0), jnp.zeros((1, 8, 8, 2))
        )


@pytest.mark.parametrize("k,s", [((3, 3), (1, 1)), ((4, 4), (2, 2))])
def test_int8_close_to_float(k, s):
    """Dynamic int8 quantization: same param tree (any float checkpoint loads),
    bounded error vs the float path, and exact shift-equivariance preserved
    (quantization is pointwise, the conv is still circular)."""
    x = jax.random.normal(jax.random.key(8), (2, 16, 16, 24))
    m_f = CircularConv(32, k, s, impl="pad")
    m_q = CircularConv(32, k, s, impl="int8")
    params = m_f.init(jax.random.key(9), x)
    y_f = m_f.apply(params, x)
    y_q = m_q.apply(params, x)
    assert y_q.shape == y_f.shape
    rel = float(jnp.linalg.norm(y_f - y_q) / jnp.linalg.norm(y_f))
    assert rel < 0.03, rel
    # equivariance survives quantization (per-tensor scale is roll-invariant);
    # a strided conv only commutes with stride-multiple rolls, so roll by s.
    y_r = m_q.apply(params, jnp.roll(x, (3 * s[0], -2 * s[1]), axis=(1, 2)))
    np.testing.assert_allclose(
        np.asarray(jnp.roll(y_q, (3, -2), axis=(1, 2))), np.asarray(y_r), atol=1e-5
    )


def test_unet_int8_close_to_float():
    """Whole-U-Net int8 path loads float params unchanged and stays within a
    few percent of the float forward — the serving-path contract behind
    --quantize int8."""
    kw = dict(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jax.random.normal(jax.random.key(10), (2, 16, 16, 1))
    t = jnp.array([0.3, 0.7])
    y_cat = jnp.array([0, 2], jnp.int32)
    y_cont = jnp.zeros((2, 4))
    m_f = CondUNetTiny(**kw)
    m_q = CondUNetTiny(conv_impl="int8", **kw)
    v = m_f.init(jax.random.key(11), x, t, y_cat, y_cont)
    y_f = m_f.apply(v, x, t, y_cat, y_cont)
    y_q = m_q.apply(v, x, t, y_cat, y_cont)
    rel = float(jnp.linalg.norm(y_f - y_q) / jnp.linalg.norm(y_f))
    assert rel < 0.15, rel


def test_unet_conv_impls_agree():
    """The whole U-Net forward must be identical under either conv impl, and
    the param trees interchangeable (checkpoint compatibility)."""
    kw = dict(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    x = jax.random.normal(jax.random.key(6), (2, 16, 16, 1))
    t = jnp.array([0.3, 0.7])
    y_cat = jnp.array([0, 2], jnp.int32)
    y_cont = jnp.zeros((2, 4))

    m_border = CondUNetTiny(conv_impl="border", **kw)
    m_pad = CondUNetTiny(conv_impl="pad", **kw)
    v = m_border.init(jax.random.key(7), x, t, y_cat, y_cont)
    y_border = m_border.apply(v, x, t, y_cat, y_cont)
    y_pad = m_pad.apply(v, x, t, y_cat, y_cont)  # same params, other impl
    np.testing.assert_allclose(np.asarray(y_border), np.asarray(y_pad), atol=1e-4)
