"""Coverage for the thinner corners of the model/data API surface:
the plain-MLP DiffusionPrior variant (`/root/reference/src/toycrystals/models/
diffusion_prior.py:130-164` — kept for API parity though unused by scripts),
`y_vec`, and the HBM-resident disk dataset used by the trainers."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from _common import ResidentDiskDataset  # noqa: E402
from toycrystals_tpu.models.diffusion_prior import (  # noqa: E402
    DiffusionPrior,
    y_vec,
)

K = jax.random.key(0)


def test_plain_mlp_prior_forward():
    model = DiffusionPrior(z_dim=8, n_types=4, y_cont_dim=4, width=32)
    b = 6
    z = jax.random.normal(K, (b, 8))
    t = jnp.arange(b, dtype=jnp.int32) * 10
    ycat = jnp.arange(b, dtype=jnp.int32) % 4
    ycont = jnp.ones((b, 4))
    params = model.init(K, z, t, ycat, ycont)["params"]
    eps = model.apply({"params": params}, z, t, ycat, ycont)
    assert eps.shape == (b, 8)
    assert eps.dtype == jnp.float32
    assert np.isfinite(np.asarray(eps)).all()
    # per-sample: permuting the batch permutes the output identically
    perm = jnp.array([3, 1, 0, 5, 4, 2])
    eps_p = model.apply({"params": params}, z[perm], t[perm], ycat[perm], ycont[perm])
    np.testing.assert_allclose(np.asarray(eps_p), np.asarray(eps)[perm], rtol=2e-5, atol=1e-6)


def test_y_vec_one_hot_concat():
    """cond = one_hot(y_cat, n_types) ++ y_cont (`diffusion_prior.py:28-36`)."""
    ycat = jnp.array([0, 2], jnp.int32)
    ycont = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    v = np.asarray(y_vec(ycat, ycont, n_types=3))
    np.testing.assert_allclose(v, [[1, 0, 0, 1, 2], [0, 0, 1, 3, 4]])


def test_resident_disk_dataset_gather(tmp_path):
    n, hw = 20, 8
    x_u8 = np.random.default_rng(0).integers(0, 256, (n, hw, hw, 1), dtype=np.uint8)
    y_cat = np.arange(n, dtype=np.int64) % 4
    y_cont = np.random.default_rng(1).normal(size=(n, 4)).astype(np.float32)
    path = tmp_path / "ds.npz"
    np.savez(path, x_u8=x_u8, y_cat=y_cat, y_cont=y_cont)

    ds = ResidentDiskDataset(path)
    assert len(ds) == n
    idx = jnp.array([3, 0, 19])
    x, yc, yv = ds.gather(idx)
    assert x.shape == (3, hw, hw, 1) and x.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(x), x_u8[[3, 0, 19]].astype(np.float32) / 255.0)
    np.testing.assert_array_equal(np.asarray(yc), y_cat[[3, 0, 19]])
    np.testing.assert_allclose(np.asarray(yv), y_cont[[3, 0, 19]])


def test_torch_like_init_statistics():
    """Kernels U(+-1/sqrt(fan_in)), embeddings N(0,1), norm params untouched."""
    import jax.numpy as jnp

    from toycrystals_tpu.models import CondUNetTiny
    from toycrystals_tpu.models.torch_init import torch_like_init

    model = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=16, emb_dim=32)
    params = model.init(K, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,)),
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
    new = torch_like_init(jax.random.key(1), params)

    flat = jax.tree_util.tree_flatten_with_path(new)[0]
    checked_kernel = checked_emb = checked_norm = False
    for path, leaf in flat:
        names = tuple(getattr(p, "key", str(p)) for p in path)
        arr = np.asarray(leaf)
        if names[-1] == "kernel" and arr.ndim == 4 and arr.size > 4000:
            fan_in = arr.shape[0] * arr.shape[1] * arr.shape[2]
            bound = 1.0 / np.sqrt(fan_in)
            assert np.abs(arr).max() <= bound + 1e-7
            assert np.std(arr) == pytest.approx(bound / np.sqrt(3.0), rel=0.1)
            checked_kernel = True
        if names[-1] == "embedding":
            assert np.std(arr) == pytest.approx(1.0, rel=0.25)
            checked_emb = True
        if names[-1] == "scale":  # GroupNorm scale stays at 1
            assert np.all(arr == 1.0)
            checked_norm = True
    assert checked_kernel and checked_emb and checked_norm



def test_attn_impl_threads_through_unet():
    """attn_impl is a compute-backend knob: the SAME checkpoint params run
    under either backend and "xla" matches the default bitwise on CPU."""
    import jax.numpy as jnp

    from toycrystals_tpu.models import CondUNetTiny

    kw = dict(n_types=4, y_cont_dim=4, base_ch=16, emb_dim=32)
    x = jax.random.normal(K, (2, 16, 16, 1))
    t = jnp.array([0.2, 0.8])
    yc = jnp.array([0, 1], jnp.int32)
    yv = jax.random.normal(jax.random.key(1), (2, 4))

    m_auto = CondUNetTiny(**kw)
    params = m_auto.init(K, x, t, yc, yv)["params"]
    m_xla = CondUNetTiny(**kw, attn_impl="xla")
    # identical param tree -> checkpoints are interchangeable across impls
    assert jax.tree_util.tree_structure(
        m_xla.init(K, x, t, yc, yv)["params"]
    ) == jax.tree_util.tree_structure(params)
    out_auto = m_auto.apply({"params": params}, x, t, yc, yv)
    out_xla = m_xla.apply({"params": params}, x, t, yc, yv)
    np.testing.assert_array_equal(np.asarray(out_xla), np.asarray(out_auto))


def test_s2d_stem_shapes_and_roundtrip():
    """stem="s2d" (the MXU contraction-depth experiment,
    benchmarks/s2d_experiment.py): space-to-depth/depth-to-space invert
    each other, the folded U-Net keeps the output contract, and gradients
    flow to the stem conv."""
    import jax.numpy as jnp

    from toycrystals_tpu.models import CondUNetTiny
    from toycrystals_tpu.models.sde_score_model import (
        _depth_to_space2,
        _space_to_depth2,
    )

    x = jax.random.normal(K, (2, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(_depth_to_space2(_space_to_depth2(x))), np.asarray(x))
    # s2d is a pure permutation: every input element appears exactly once
    folded = _space_to_depth2(x)
    assert folded.shape == (2, 4, 4, 12)
    np.testing.assert_allclose(np.sort(np.asarray(folded).ravel()),
                               np.sort(np.asarray(x).ravel()))

    m = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=16, emb_dim=32,
                     stem="s2d")
    xi = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    t = jnp.array([0.2, 0.8])
    yc = jnp.array([0, 1], jnp.int32)
    yv = jax.random.normal(jax.random.key(2), (2, 4))
    params = m.init(K, xi, t, yc, yv)["params"]
    out = m.apply({"params": params}, xi, t, yc, yv)
    assert out.shape == (2, 32, 32, 1)
    assert out.dtype == jnp.float32
    # the folded stem conv contracts 4x the channels of the plain stem
    assert params["down1"]["conv0"]["kernel"].shape[2] == 4 * (1 + 8 + 8)

    g = jax.grad(lambda p: jnp.sum(
        m.apply({"params": p}, xi, t, yc, yv) ** 2))(params)
    gn = np.asarray(jnp.linalg.norm(g["down1"]["conv0"]["kernel"]))
    assert np.isfinite(gn) and gn > 0


def test_s2dr_stem_refinement_head():
    """stem="s2dr": the s2d trunk plus a full-res residual refinement head —
    same output contract, refine convs exist at full resolution (refine1
    sees depth-to-space output + the 17-ch pre-fold input), gradients flow
    through BOTH the trunk and the refinement path, and the refined output
    differs from the plain-s2d path of the same trunk params."""
    import jax.numpy as jnp

    from toycrystals_tpu.models import CondUNetTiny

    m = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=16, emb_dim=32,
                     stem="s2dr")
    xi = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    t = jnp.array([0.2, 0.8])
    yc = jnp.array([0, 1], jnp.int32)
    yv = jax.random.normal(jax.random.key(2), (2, 4))
    params = m.init(K, xi, t, yc, yv)["params"]
    out = m.apply({"params": params}, xi, t, yc, yv)
    assert out.shape == (2, 32, 32, 1)
    assert out.dtype == jnp.float32
    # refine1 contracts [eps(1) + x_t(1) + time(8) + cond(8)] = 18 channels
    assert params["refine1"]["kernel"].shape[2] == 18
    assert params["refine2"]["kernel"].shape[3] == 1

    g = jax.grad(lambda p: jnp.sum(
        m.apply({"params": p}, xi, t, yc, yv) ** 2))(params)
    for name in ("down1", "refine1", "refine2"):
        gn = np.asarray(jnp.linalg.norm(
            jax.tree.leaves(g[name])[0].astype(jnp.float32)))
        assert np.isfinite(gn) and gn > 0, name

    # residual head actually changes the prediction vs zeroing it out
    import jax as _jax
    p0 = _jax.tree.map(lambda a: a, params)
    p0["refine2"] = _jax.tree.map(jnp.zeros_like, p0["refine2"])
    out0 = m.apply({"params": p0}, xi, t, yc, yv)
    assert float(jnp.abs(out - out0).max()) > 0
