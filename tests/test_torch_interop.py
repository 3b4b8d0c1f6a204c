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


# ---------------------------------------------------------------------------
# VAE + FiLM-prior interop (round-2 scope: migrate every reference checkpoint)
# ---------------------------------------------------------------------------


def test_vae_state_dict_matches_torch_forward():
    """A synthetic reference-layout CondVAE state_dict converts onto our flax
    CondVAE and reproduces the torch forward exactly (encode mu/logvar and
    decode output). The torch side is composed from functional ops following
    `/root/reference/src/toycrystals/models/vae.py:50-70` — this validates
    the flatten-order permutes and the ConvTranspose kernel flip."""
    import torch.nn.functional as F

    from toycrystals_tpu.models.vae import CondVAE
    from toycrystals_tpu.utils.torch_interop import flax_vae_params_from_torch_state_dict

    rng = np.random.default_rng(0)
    z_dim, n_types, y_cont_dim = 6, 4, 4
    y_dim = n_types + y_cont_dim
    enc_ch = [(1, 32), (32, 64), (64, 128), (128, 256)]
    dec_ch = [(256, 128), (128, 64), (64, 32), (32, 1)]

    def t(*shape, scale=0.05):
        return rng.normal(size=shape).astype(np.float32) * scale

    sd = {}
    for i, (ci, co) in zip((0, 2, 4, 6), enc_ch):
        sd[f"enc.{i}.weight"], sd[f"enc.{i}.bias"] = t(co, ci, 4, 4), t(co)
    sd["enc_fc.weight"], sd["enc_fc.bias"] = t(256, 256 * 16 + y_dim), t(256)
    sd["mu.weight"], sd["mu.bias"] = t(z_dim, 256), t(z_dim)
    sd["logvar.weight"], sd["logvar.bias"] = t(z_dim, 256), t(z_dim)
    sd["dec_fc.weight"], sd["dec_fc.bias"] = t(256 * 16, z_dim + y_dim), t(256 * 16)
    for i, (ci, co) in zip((0, 2, 4, 6), dec_ch):
        sd[f"dec.{i}.weight"], sd[f"dec.{i}.bias"] = t(ci, co, 4, 4), t(co)

    x = rng.uniform(size=(3, 1, 64, 64)).astype(np.float32)
    y_cat = np.array([0, 1, 2])
    y_cont = rng.normal(size=(3, y_cont_dim)).astype(np.float32)
    z = rng.normal(size=(3, z_dim)).astype(np.float32)

    # torch functional forward (reference math, `vae.py:50-70`)
    T = torch.tensor
    y = torch.cat([F.one_hot(T(y_cat), n_types).float(), T(y_cont)], dim=1)
    h = T(x)
    for i in (0, 2, 4, 6):
        h = F.relu(F.conv2d(h, T(sd[f"enc.{i}.weight"]), T(sd[f"enc.{i}.bias"]),
                            stride=2, padding=1))
    h = torch.cat([h.flatten(1), y], dim=1)
    h = F.relu(F.linear(h, T(sd["enc_fc.weight"]), T(sd["enc_fc.bias"])))
    mu_ref = F.linear(h, T(sd["mu.weight"]), T(sd["mu.bias"])).numpy()
    lv_ref = F.linear(h, T(sd["logvar.weight"]), T(sd["logvar.bias"])).numpy()
    d = F.linear(torch.cat([T(z), y], dim=1), T(sd["dec_fc.weight"]),
                 T(sd["dec_fc.bias"])).view(-1, 256, 4, 4)
    for i in (0, 2, 4, 6):
        d = F.conv_transpose2d(d, T(sd[f"dec.{i}.weight"]), T(sd[f"dec.{i}.bias"]),
                               stride=2, padding=1)
        d = torch.sigmoid(d) if i == 6 else F.relu(d)
    xhat_ref = d.numpy()

    # ours, with converted params
    vae = CondVAE(z_dim=z_dim, n_types=n_types, y_cont_dim=y_cont_dim, cond_drop=0.0)
    params = flax_vae_params_from_torch_state_dict(sd)
    mu, lv = vae.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(y_cat), jnp.asarray(y_cont), method="encode")
    np.testing.assert_allclose(np.asarray(mu), mu_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv), lv_ref, rtol=1e-4, atol=1e-5)
    xhat = vae.apply({"params": params}, jnp.asarray(z), jnp.asarray(y_cat),
                     jnp.asarray(y_cont), method="decode")
    np.testing.assert_allclose(np.asarray(xhat).transpose(0, 3, 1, 2), xhat_ref,
                               rtol=1e-4, atol=1e-5)


def test_prior_state_dict_matches_torch_forward():
    """A synthetic reference-layout DiffusionPriorFiLM state_dict converts
    onto our flax module and reproduces the torch forward (functional
    composition of `diffusion_prior.py:112-127`; LayerNorm eps matched to
    flax's 1e-6)."""
    import torch.nn.functional as F

    from toycrystals_tpu.models import DiffusionPriorFiLM
    from toycrystals_tpu.utils.torch_interop import flax_prior_params_from_torch_state_dict

    rng = np.random.default_rng(1)
    z_dim, n_types, ycd, ted, width, nb, yce = 6, 4, 4, 16, 24, 3, 8

    def t(*shape, scale=0.1):
        return rng.normal(size=shape).astype(np.float32) * scale

    sd = {
        "y_cat_emb.weight": t(n_types, yce),
        "y_cont_mlp.0.weight": t(yce, ycd), "y_cont_mlp.0.bias": t(yce),
        "y_cont_mlp.2.weight": t(yce, yce), "y_cont_mlp.2.bias": t(yce),
        "y_fuse.0.weight": t(width, 2 * yce), "y_fuse.0.bias": t(width),
        "y_fuse.2.weight": t(width, width), "y_fuse.2.bias": t(width),
        "t_mlp.0.weight": t(width, ted), "t_mlp.0.bias": t(width),
        "t_mlp.2.weight": t(width, width), "t_mlp.2.bias": t(width),
        "in_proj.weight": t(width, z_dim), "in_proj.bias": t(width),
        "out_norm.weight": 1 + t(width), "out_norm.bias": t(width),
        "out_proj.weight": t(z_dim, width), "out_proj.bias": t(z_dim),
    }
    for i in range(nb):
        sd[f"blocks.{i}.norm.weight"] = 1 + t(width)
        sd[f"blocks.{i}.norm.bias"] = t(width)
        sd[f"blocks.{i}.fc1.weight"] = t(4 * width, width)
        sd[f"blocks.{i}.fc1.bias"] = t(4 * width)
        sd[f"blocks.{i}.fc2.weight"] = t(width, 4 * width)
        sd[f"blocks.{i}.fc2.bias"] = t(width)
        sd[f"blocks.{i}.cond.weight"] = t(2 * width, 2 * width)
        sd[f"blocks.{i}.cond.bias"] = t(2 * width)

    zt = rng.normal(size=(3, z_dim)).astype(np.float32)
    tt = np.array([0, 7, 13])
    y_cat = np.array([0, 1, 3])
    y_cont = rng.normal(size=(3, ycd)).astype(np.float32)

    # torch functional forward (`diffusion_prior.py:112-127`)
    T = torch.tensor
    lin = lambda h, p: F.linear(h, T(sd[f"{p}.weight"]), T(sd[f"{p}.bias"]))
    half = ted // 2
    freqs = torch.exp(-torch.linspace(0.0, float(np.log(10_000.0)), half))
    args_ = T(tt).float()[:, None] * freqs[None, :]
    te = torch.cat([torch.sin(args_), torch.cos(args_)], dim=1)
    t_feat = lin(F.silu(lin(te, "t_mlp.0")), "t_mlp.2")
    ycf = T(sd["y_cat_emb.weight"])[T(y_cat)]
    yvf = lin(F.silu(lin(T(y_cont), "y_cont_mlp.0")), "y_cont_mlp.2")
    y_feat = lin(F.silu(lin(torch.cat([ycf, yvf], dim=-1), "y_fuse.0")), "y_fuse.2")
    cond = torch.cat([t_feat, y_feat], dim=-1)
    h = lin(T(zt), "in_proj")
    for i in range(nb):
        hn = F.layer_norm(h, (width,), T(sd[f"blocks.{i}.norm.weight"]),
                          T(sd[f"blocks.{i}.norm.bias"]), eps=1e-6)
        gamma, beta = lin(cond, f"blocks.{i}.cond").chunk(2, dim=-1)
        hn = hn * (1.0 + gamma) + beta
        h = h + lin(F.silu(lin(hn, f"blocks.{i}.fc1")), f"blocks.{i}.fc2")
    h = F.layer_norm(h, (width,), T(sd["out_norm.weight"]), T(sd["out_norm.bias"]),
                     eps=1e-6)
    ref = lin(h, "out_proj").numpy()

    prior = DiffusionPriorFiLM(z_dim=z_dim, n_types=n_types, y_cont_dim=ycd,
                               t_emb_dim=ted, width=width, n_blocks=nb,
                               y_cat_emb_dim=yce)
    params = flax_prior_params_from_torch_state_dict(sd)
    ours = prior.apply({"params": params}, jnp.asarray(zt), jnp.asarray(tt),
                       jnp.asarray(y_cat), jnp.asarray(y_cont))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)


def test_prior_trainer_consumes_pt_vae_and_prior(tmp_path, monkeypatch):
    """End-to-end migration path: the prior trainer's --vae-ckpt and
    --prior-ckpt accept reference .pt files (CLI hook)."""
    import runpy

    from toycrystals_tpu.models import CondVAE, DiffusionPriorFiLM
    from toycrystals_tpu.utils.torch_interop import (
        flax_prior_params_from_torch_state_dict,
        flax_vae_params_from_torch_state_dict,
    )

    monkeypatch.chdir(tmp_path)
    scripts = str(Path(__file__).resolve().parent.parent / "scripts")
    monkeypatch.syspath_prepend(scripts)

    rng = np.random.default_rng(2)
    z_dim, y_dim = 8, 8

    def t(*shape, scale=0.05):
        return rng.normal(size=shape).astype(np.float32) * scale

    sd = {}
    for i, (ci, co) in zip((0, 2, 4, 6), [(1, 32), (32, 64), (64, 128), (128, 256)]):
        sd[f"enc.{i}.weight"], sd[f"enc.{i}.bias"] = t(co, ci, 4, 4), t(co)
    sd["enc_fc.weight"], sd["enc_fc.bias"] = t(256, 256 * 16 + y_dim), t(256)
    sd["mu.weight"], sd["mu.bias"] = t(z_dim, 256), t(z_dim)
    sd["logvar.weight"], sd["logvar.bias"] = t(z_dim, 256), t(z_dim)
    sd["dec_fc.weight"], sd["dec_fc.bias"] = t(256 * 16, z_dim + y_dim), t(256 * 16)
    for i, (ci, co) in zip((0, 2, 4, 6), [(256, 128), (128, 64), (64, 32), (32, 1)]):
        sd[f"dec.{i}.weight"], sd[f"dec.{i}.bias"] = t(ci, co, 4, 4), t(co)
    # conversion sanity before the CLI consumes it
    flax_vae_params_from_torch_state_dict(sd)
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, tmp_path / "vae_ref.pt")

    def run(*flags):
        monkeypatch.setattr(sys, "argv",
                            ["train_diffusion_prior.py", "--device", "cpu", *map(str, flags)])
        try:
            runpy.run_path(f"{scripts}/train_diffusion_prior.py", run_name="__main__")
        except SystemExit as e:
            assert (e.code or 0) == 0

    run("--procedural", "--max-items", 32, "--epochs", 1, "--width", 32,
        "--z-dim", z_dim, "--T", 8, "--batch-size", 16, "--ddim-steps", 2,
        "--latent-cache", "data/l.npz", "--vae-ckpt", str(tmp_path / "vae_ref.pt"))
    assert (tmp_path / "checkpoints/diffusion_prior_last.msgpack").exists()

    # reference-layout FiLM prior .pt consumed by --sample-only (note: the
    # trainer hardcodes n_blocks=8 / y_cat_emb_dim=64 like the reference)
    w = 32
    psd = {
        "y_cat_emb.weight": t(4, 64),
        "y_cont_mlp.0.weight": t(64, 4), "y_cont_mlp.0.bias": t(64),
        "y_cont_mlp.2.weight": t(64, 64), "y_cont_mlp.2.bias": t(64),
        "y_fuse.0.weight": t(w, 128), "y_fuse.0.bias": t(w),
        "y_fuse.2.weight": t(w, w), "y_fuse.2.bias": t(w),
        "t_mlp.0.weight": t(w, 64), "t_mlp.0.bias": t(w),
        "t_mlp.2.weight": t(w, w), "t_mlp.2.bias": t(w),
        "in_proj.weight": t(w, z_dim), "in_proj.bias": t(w),
        "out_norm.weight": 1 + t(w), "out_norm.bias": t(w),
        "out_proj.weight": t(z_dim, w), "out_proj.bias": t(z_dim),
    }
    for i in range(8):
        psd[f"blocks.{i}.norm.weight"] = 1 + t(w)
        psd[f"blocks.{i}.norm.bias"] = t(w)
        psd[f"blocks.{i}.fc1.weight"] = t(4 * w, w)
        psd[f"blocks.{i}.fc1.bias"] = t(4 * w)
        psd[f"blocks.{i}.fc2.weight"] = t(w, 4 * w)
        psd[f"blocks.{i}.fc2.bias"] = t(w)
        psd[f"blocks.{i}.cond.weight"] = t(2 * w, 2 * w)
        psd[f"blocks.{i}.cond.bias"] = t(2 * w)
    flax_prior_params_from_torch_state_dict(psd)
    torch.save({k: torch.tensor(v) for k, v in psd.items()}, tmp_path / "prior_ref.pt")

    run("--procedural", "--max-items", 32, "--width", w, "--z-dim", z_dim,
        "--T", 8, "--ddim-steps", 2, "--latent-cache", "data/l.npz",
        "--vae-ckpt", str(tmp_path / "vae_ref.pt"), "--sample-only",
        "--prior-ckpt", str(tmp_path / "prior_ref.pt"))
    assert (tmp_path / "results/diffusion_samples.png").exists()


def test_vae_loader_rejects_wrong_pt(tmp_path):
    from toycrystals_tpu.utils.torch_interop import (
        load_torch_prior_checkpoint,
        load_torch_vae_checkpoint,
    )

    p = tmp_path / "x.pt"
    torch.save({"nope": torch.zeros(1)}, p)
    with pytest.raises(ValueError, match="not a reference VAE checkpoint"):
        load_torch_vae_checkpoint(str(p))
    with pytest.raises(ValueError, match="not a reference FiLM-prior checkpoint"):
        load_torch_prior_checkpoint(str(p))


def test_export_cli_roundtrip(tmp_path):
    """export_torch_checkpoint.py writes a reference-layout .pt that
    re-ingests bitwise-identically (msgpack -> .pt -> flax params)."""
    from toycrystals_tpu.train import create_train_state
    from toycrystals_tpu.utils import save_checkpoint
    import optax

    _, p = _init_params()
    state = create_train_state(p, optax.adam(1e-4), ema=True)
    ck = tmp_path / "m.msgpack"
    save_checkpoint(str(ck), {
        "epoch_next": 5, "state": state, "loss_hist": [0.3],
        "config": {"base_ch": 8, "emb_dim": 16, "n_types": 4, "y_cont_dim": 4},
    })
    out = tmp_path / "m.pt"
    scripts = Path(__file__).resolve().parent.parent / "scripts"
    r = subprocess.run(
        [sys.executable, str(scripts / "export_torch_checkpoint.py"),
         "--ckpt", str(ck), "--out", str(out)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    back = load_torch_score_checkpoint(str(out))
    assert back["epoch_next"] == 5
    assert back["config"]["base_ch"] == 8
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p),
        jax.tree_util.tree_leaves_with_path(back["state"]["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), b, err_msg=str(path))
    assert back["state"]["ema_params"] is not None
