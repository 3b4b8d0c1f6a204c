"""Torch `.pt` checkpoint interop for the SDE score model.

The reference trains `CondUNetTiny` in PyTorch and checkpoints
`{"epoch_next", "model": state_dict, "opt", "loss_hist", "config", ["ema"]}`
(`/root/reference/scripts/train_sde_score_model.py:35-54`). This module maps
those weights onto our flax `CondUNetTiny` param tree (and back), so a user
can point `sample_sde_score_model.py` at a reference `.pt` and sample with
the exact trained weights — which is also the strongest possible figure-parity
check (same weights, two frameworks).

Layout conversions (torch -> flax):
- Conv2d  [out, in, kh, kw] -> [kh, kw, in, out]
- Linear  [out, in]         -> [in, out]
- 1x1 Conv2d used as a linear on channels (attention qkv/proj) -> Dense [in, out]
- GroupNorm weight/bias     -> scale/bias
- Embedding weight          -> embedding (unchanged)

The attention head split is layout-compatible by construction: torch chunks
the 3C qkv channels into q,k,v then views C as (heads, head_dim)
(`sde_score_model.py:146-151`); our Dense emits the same 3C ordering and
reshapes to (3, heads, head_dim) — identical channel-major split, so the 1x1
weights map with no permutation. The optimiser state is NOT converted (Adam
moment layouts differ; sampling and warm-start fine-tuning need weights only).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import numpy as np

# (torch module prefix, flax block name) for the five double-conv blocks
_BLOCKS = [("down1", "down1"), ("down2", "down2"), ("mid", "mid"),
           ("up2", "up2"), ("up1", "up1")]
# torch Sequential index -> (flax sublayer, kind)
_BLOCK_LAYERS = [("0", "conv0", "conv"), ("1", "gn0", "gn"),
                 ("3", "conv1", "conv"), ("4", "gn1", "gn")]
# standalone convs
_CONVS = ["ds1", "ds2", "us2_conv", "us1_conv", "out"]
# torch linear prefix -> flax path
_LINEARS = [
    ("time_mlp.0", ("Dense_0",)),
    ("time_mlp.2", ("Dense_1",)),
    ("cond_emb.cont_mlp.0", ("ConditionEmbedding_0", "Dense_0")),
    ("cond_emb.cont_mlp.2", ("ConditionEmbedding_0", "Dense_1")),
    ("cond_emb.out.1", ("ConditionEmbedding_0", "out")),
    ("to_time_map", ("to_time_map",)),
    ("to_cond_map", ("to_cond_map",)),
]


def _spec() -> list[tuple[str, tuple[str, ...], str]]:
    """(torch prefix, flax path, kind) for every parameterised layer."""
    spec: list[tuple[str, tuple[str, ...], str]] = []
    for tname, fname in _BLOCKS:
        for tidx, fsub, kind in _BLOCK_LAYERS:
            spec.append((f"{tname}.net.{tidx}", (fname, fsub), kind))
    for name in _CONVS:
        spec.append((name, (name,), "conv"))
    for tname, fpath in _LINEARS:
        spec.append((tname, fpath, "linear"))
    spec.append(("attn.norm", ("attn", "GroupNorm_0"), "gn"))
    spec.append(("attn.qkv", ("attn", "qkv"), "conv1x1"))
    spec.append(("attn.proj", ("attn", "proj"), "conv1x1"))
    spec.append(("cond_emb.cat_emb", ("ConditionEmbedding_0", "cat_emb"), "embed"))
    return spec


def _set(tree: dict, path: tuple[str, ...], leaf: str, value: np.ndarray) -> None:
    for k in path:
        tree = tree.setdefault(k, {})
    tree[leaf] = value


def flax_params_from_torch_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference CondUNetTiny state_dict -> flax param tree (numpy leaves).

    Raises KeyError with the missing torch key if the state_dict is not a
    CondUNetTiny (e.g. a VAE checkpoint passed by mistake)."""
    arr: Callable[[Any], np.ndarray] = lambda t: np.asarray(
        t.detach().cpu().numpy() if hasattr(t, "detach") else t, dtype=np.float32
    )
    params: dict = {}
    for tprefix, fpath, kind in _spec():
        if kind == "embed":
            _set(params, fpath, "embedding", arr(sd[f"{tprefix}.weight"]))
            continue
        w, b = arr(sd[f"{tprefix}.weight"]), arr(sd[f"{tprefix}.bias"])
        if kind == "conv":
            _set(params, fpath, "kernel", w.transpose(2, 3, 1, 0))
            _set(params, fpath, "bias", b)
        elif kind == "conv1x1":
            _set(params, fpath, "kernel", w[:, :, 0, 0].T)
            _set(params, fpath, "bias", b)
        elif kind == "linear":
            _set(params, fpath, "kernel", w.T)
            _set(params, fpath, "bias", b)
        else:  # gn
            _set(params, fpath, "scale", w)
            _set(params, fpath, "bias", b)
    return params


def torch_state_dict_from_flax_params(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Flax CondUNetTiny param tree -> reference-layout state_dict (numpy
    values; wrap in torch.tensor to torch.save). Exact inverse of
    `flax_params_from_torch_state_dict`."""

    def get(path: tuple[str, ...], leaf: str) -> np.ndarray:
        node: Any = params
        for k in path:
            node = node[k]
        return np.asarray(node[leaf], dtype=np.float32)

    sd: dict[str, np.ndarray] = {}
    for tprefix, fpath, kind in _spec():
        if kind == "embed":
            sd[f"{tprefix}.weight"] = get(fpath, "embedding")
            continue
        if kind == "conv":
            sd[f"{tprefix}.weight"] = get(fpath, "kernel").transpose(3, 2, 0, 1)
            sd[f"{tprefix}.bias"] = get(fpath, "bias")
        elif kind == "conv1x1":
            sd[f"{tprefix}.weight"] = get(fpath, "kernel").T[:, :, None, None]
            sd[f"{tprefix}.bias"] = get(fpath, "bias")
        elif kind == "linear":
            sd[f"{tprefix}.weight"] = get(fpath, "kernel").T
            sd[f"{tprefix}.bias"] = get(fpath, "bias")
        else:  # gn
            sd[f"{tprefix}.weight"] = get(fpath, "scale")
            sd[f"{tprefix}.bias"] = get(fpath, "bias")
    return sd


def _torch_load(path: str):
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is in the image
        raise RuntimeError(
            f"loading a .pt checkpoint ({path}) requires torch; install it or "
            "convert the checkpoint to msgpack first"
        ) from e
    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)


def load_torch_score_checkpoint(path: str) -> dict:
    """Load a reference `.pt` score-model checkpoint into our payload schema
    `{"epoch_next", "state": {"params", "ema_params"}, "loss_hist", "config"}`
    (what `sample_sde_score_model.py` consumes). Weights and config convert;
    the torch Adam state does not (see module docstring)."""
    obj = _torch_load(path)
    if not isinstance(obj, dict) or "model" not in obj:
        raise ValueError(
            f"{path} is not a reference score-model checkpoint "
            "(expected dict with a 'model' state_dict, "
            "/root/reference/scripts/train_sde_score_model.py:35-54)"
        )
    params = flax_params_from_torch_state_dict(obj["model"])
    ema = flax_params_from_torch_state_dict(obj["ema"]) if "ema" in obj else None
    return {
        "epoch_next": int(obj.get("epoch_next", 0)),
        "state": {"params": params, "ema_params": ema},
        "loss_hist": [float(v) for v in obj.get("loss_hist", [])],
        "config": dict(obj.get("config", {})),
    }


# ---------------------------------------------------------------------------
# VAE interop (`/root/reference/src/toycrystals/models/vae.py:8-134`; the
# trainer saves a RAW state_dict per epoch, `train_vae.py:336`)
# ---------------------------------------------------------------------------

# The reference encoder ends at a 4x4x256 feature map (64x64 input,
# `vae.py:18-27`); the flatten-order permutes below are specific to that.
_VAE_C, _VAE_HW = 256, 4


def _arr(t: Any) -> np.ndarray:
    return np.asarray(
        t.detach().cpu().numpy() if hasattr(t, "detach") else t, dtype=np.float32
    )


def flax_vae_params_from_torch_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference CondVAE / VAE state_dict -> our flax param tree.

    Beyond the usual layout transposes, two conversions are load-bearing:
    - torch flattens the encoder feature map channel-major (C,H,W) before
      `enc_fc` (`vae.py:51`) while our NHWC encoder flattens (H,W,C) — the
      first 4096 input columns of enc_fc permute accordingly (any trailing
      cond-vec columns pass through);
    - `dec_fc` output is viewed as [256,4,4] (`vae.py:69`) vs our
      [4,4,256] reshape — its output rows (and bias) permute;
    - torch ConvTranspose2d(k4,s2,p1) weights [in,out,kh,kw] map to our
      nn.ConvTranspose 'SAME' kernel as transpose(2,3,0,1) + spatial flip
      (verified numerically in tests/test_torch_interop.py).
    """
    C, HW = _VAE_C, _VAE_HW
    flat = C * HW * HW
    params: dict = {"encoder": {}, "decoder": {}}

    for i, t_idx in enumerate((0, 2, 4, 6)):
        w = _arr(sd[f"enc.{t_idx}.weight"])
        params["encoder"][f"Conv_{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0), "bias": _arr(sd[f"enc.{t_idx}.bias"])
        }

    w = _arr(sd["enc_fc.weight"])  # [256, flat + y_dim]
    wf = w[:, :flat].reshape(-1, C, HW, HW).transpose(0, 2, 3, 1).reshape(-1, flat)
    params["encoder"]["Dense_0"] = {
        "kernel": np.concatenate([wf, w[:, flat:]], axis=1).T,
        "bias": _arr(sd["enc_fc.bias"]),
    }
    for name in ("mu", "logvar"):
        params["encoder"][name] = {
            "kernel": _arr(sd[f"{name}.weight"]).T, "bias": _arr(sd[f"{name}.bias"])
        }

    w = _arr(sd["dec_fc.weight"])  # [flat, z(+y)]
    b = _arr(sd["dec_fc.bias"])
    w = w.reshape(C, HW, HW, -1).transpose(1, 2, 0, 3).reshape(flat, -1)
    params["decoder"]["Dense_0"] = {
        "kernel": w.T, "bias": b.reshape(C, HW, HW).transpose(1, 2, 0).reshape(flat)
    }
    for i, t_idx in enumerate((0, 2, 4, 6)):
        w = _arr(sd[f"dec.{t_idx}.weight"])  # [in, out, kh, kw]
        params["decoder"][f"ConvTranspose_{i}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1]),
            "bias": _arr(sd[f"dec.{t_idx}.bias"]),
        }
    return params


def load_torch_vae_checkpoint(path: str) -> dict:
    """Reference `vae_last.pt` (raw state_dict) -> `{"params": tree}`, the
    payload shape `train_diffusion_prior.py` consumes for the frozen VAE."""
    obj = _torch_load(path)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    if not isinstance(sd, Mapping) or "enc.0.weight" not in sd:
        raise ValueError(
            f"{path} is not a reference VAE checkpoint (expected a raw "
            "CondVAE/VAE state_dict, /root/reference/scripts/train_vae.py:336)"
        )
    return {"params": flax_vae_params_from_torch_state_dict(sd)}


# ---------------------------------------------------------------------------
# FiLM latent-prior interop (`diffusion_prior.py:57-127`; raw state_dict
# saved per epoch, `train_diffusion_prior.py:283`)
# ---------------------------------------------------------------------------


def flax_prior_params_from_torch_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference DiffusionPriorFiLM state_dict -> our flax param tree.
    Plain Linear/LayerNorm/Embedding layers — only the [out,in] -> [in,out]
    transpose applies; block count is inferred from the keys."""
    lin = lambda p: {"kernel": _arr(sd[f"{p}.weight"]).T, "bias": _arr(sd[f"{p}.bias"])}
    ln = lambda p: {"scale": _arr(sd[f"{p}.weight"]), "bias": _arr(sd[f"{p}.bias"])}
    params: dict = {
        "Dense_0": lin("t_mlp.0"),
        "Dense_1": lin("t_mlp.2"),
        "Embed_0": {"embedding": _arr(sd["y_cat_emb.weight"])},
        "Dense_2": lin("y_cont_mlp.0"),
        "Dense_3": lin("y_cont_mlp.2"),
        "Dense_4": lin("y_fuse.0"),
        "Dense_5": lin("y_fuse.2"),
        "in_proj": lin("in_proj"),
        "out_norm": ln("out_norm"),
        "out_proj": lin("out_proj"),
    }
    n_blocks = sum(1 for k in sd if k.endswith(".norm.weight") and k.startswith("blocks."))
    for i in range(n_blocks):
        params[f"block_{i}"] = {
            "LayerNorm_0": ln(f"blocks.{i}.norm"),
            "cond": lin(f"blocks.{i}.cond"),
            "fc1": lin(f"blocks.{i}.fc1"),
            "fc2": lin(f"blocks.{i}.fc2"),
        }
    return params


def load_torch_prior_checkpoint(path: str) -> dict:
    """Reference `diffusion_prior_last.pt` (raw state_dict) ->
    `{"params": tree}` for the prior trainer's --resume / --sample-only."""
    obj = _torch_load(path)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    if not isinstance(sd, Mapping) or "in_proj.weight" not in sd:
        raise ValueError(
            f"{path} is not a reference FiLM-prior checkpoint (expected a raw "
            "DiffusionPriorFiLM state_dict, "
            "/root/reference/scripts/train_diffusion_prior.py:283)"
        )
    return {"params": flax_prior_params_from_torch_state_dict(sd)}
