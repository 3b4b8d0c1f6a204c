"""Torch `.pt` checkpoint interop (utils/torch_interop.py).

Validates the weight mapping three ways: exact roundtrip, tree-structure
equality with a fresh flax init (catches any naming/shape drift), and
numerical parity of the risky layout conversions against torch's own ops
(circular conv, and the attention block's qkv chunk/head-split ordering,
reference `sde_score_model.py:136-167`). Ends with the CLI consuming a real
torch-saved `.pt` end-to-end.
"""

import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from toycrystals_tpu.models import CondUNetTiny  # noqa: E402
from toycrystals_tpu.utils.torch_interop import (  # noqa: E402
    flax_params_from_torch_state_dict,
    load_torch_score_checkpoint,
    torch_state_dict_from_flax_params,
)

K = jax.random.key(0)


def _init_params(base_ch=8, emb_dim=16):
    m = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=base_ch, emb_dim=emb_dim)
    p = m.init(K, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,)),
               jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
    return m, p


def test_roundtrip_and_structure():
    m, p = _init_params()
    sd = torch_state_dict_from_flax_params(p)
    p2 = flax_params_from_torch_state_dict(sd)
    # identical tree structure as a fresh init (apply would reject drift)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p2)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p), jax.tree_util.tree_leaves_with_path(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), b, err_msg=str(path))


def test_circular_conv_matches_torch():
    """Conv kernel transpose + wrap-pad semantics == torch circular Conv2d."""
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)  # torch [out,in,kh,kw]
    b = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(2, 3, 10, 10)).astype(np.float32)  # NCHW

    xt = F.pad(torch.tensor(x), (1, 1, 1, 1), mode="circular")
    ref = F.conv2d(xt, torch.tensor(w), torch.tensor(b)).numpy()

    from toycrystals_tpu.ops.conv import CircularConv

    conv = CircularConv(8, (3, 3))
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    ours = conv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-5)


def test_attention_block_matches_torch():
    """The 1x1-conv->Dense mapping AND the head-split ordering: torch chunks
    3C into q,k,v then views C as (heads, head_dim); our Dense + reshape
    (3, heads, head_dim) must be the same channel-major split."""
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    C, heads = 16, 4
    w_qkv = rng.normal(size=(3 * C, C, 1, 1)).astype(np.float32) * 0.2
    b_qkv = rng.normal(size=(3 * C,)).astype(np.float32) * 0.1
    w_proj = rng.normal(size=(C, C, 1, 1)).astype(np.float32) * 0.2
    b_proj = rng.normal(size=(C,)).astype(np.float32) * 0.1
    gnw = rng.normal(size=(C,)).astype(np.float32)
    gnb = rng.normal(size=(C,)).astype(np.float32)
    x = rng.normal(size=(2, C, 4, 4)).astype(np.float32)

    # torch reference math (`sde_score_model.py:136-167`), eps matched to flax
    B, _, H, W = x.shape
    N = H * W
    hd = C // heads
    xt = torch.tensor(x)
    y = F.group_norm(xt, 8, torch.tensor(gnw), torch.tensor(gnb), eps=1e-6)
    qkv = F.conv2d(y, torch.tensor(w_qkv), torch.tensor(b_qkv))
    q, k, v = torch.chunk(qkv, 3, dim=1)
    q, k, v = (z.view(B, heads, hd, N).transpose(2, 3) for z in (q, k, v))
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(2, 3).reshape(B, C, H, W)
    ref = (xt + F.conv2d(o, torch.tensor(w_proj), torch.tensor(b_proj))).numpy()

    from toycrystals_tpu.ops.attention import SelfAttention2d

    params = {
        "GroupNorm_0": {"scale": jnp.asarray(gnw), "bias": jnp.asarray(gnb)},
        "qkv": {"kernel": jnp.asarray(w_qkv[:, :, 0, 0].T), "bias": jnp.asarray(b_qkv)},
        "proj": {"kernel": jnp.asarray(w_proj[:, :, 0, 0].T), "bias": jnp.asarray(b_proj)},
    }
    ours = SelfAttention2d(num_heads=heads).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=2e-4, atol=2e-5)


def test_load_pt_checkpoint_and_cli(tmp_path):
    """A torch-saved reference-schema .pt loads, converts, and samples
    through the CLI end-to-end."""
    _, p = _init_params()
    sd = {k: torch.tensor(v) for k, v in torch_state_dict_from_flax_params(p).items()}
    ckpt = {
        "epoch_next": 3,
        "model": sd,
        "opt": {},
        "loss_hist": [0.5, 0.4],
        "config": {"img_ch": 1, "n_types": 4, "y_cont_dim": 4, "base_ch": 8,
                   "emb_dim": 16, "cond_ch": 8, "time_ch": 8,
                   "beta_min": 0.1, "beta_max": 30.0, "t_power": 1.0,
                   "p_uncond": 0.1},
    }
    pt_path = tmp_path / "sde_ref.pt"
    torch.save(ckpt, pt_path)

    payload = load_torch_score_checkpoint(str(pt_path))
    assert payload["epoch_next"] == 3
    assert payload["state"]["ema_params"] is None
    m, _ = _init_params()
    out = m.apply({"params": payload["state"]["params"]},
                  jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,)),
                  jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))
    assert np.isfinite(np.asarray(out)).all()

    scripts = Path(__file__).resolve().parent.parent / "scripts"
    r = subprocess.run(
        [sys.executable, str(scripts / "sample_sde_score_model.py"),
         "--device", "cpu", "--out-dir", str(tmp_path), "--ckpt", str(pt_path),
         "--steps", "2", "--n", "4", "--sampler", "sde", "--seed", "0"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert list((tmp_path / "results").glob("samples_ckpt-*.png"))


def test_rejects_non_score_pt(tmp_path):
    pt_path = tmp_path / "junk.pt"
    torch.save({"something": 1}, pt_path)
    with pytest.raises(ValueError, match="not a reference score-model checkpoint"):
        load_torch_score_checkpoint(str(pt_path))
