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


def load_torch_score_checkpoint(path: str) -> dict:
    """Load a reference `.pt` score-model checkpoint into our payload schema
    `{"epoch_next", "state": {"params", "ema_params"}, "loss_hist", "config"}`
    (what `sample_sde_score_model.py` consumes). Weights and config convert;
    the torch Adam state does not (see module docstring)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is in the image
        raise RuntimeError(
            f"loading a .pt checkpoint ({path}) requires torch; install it or "
            "convert the checkpoint to msgpack first"
        ) from e

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
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
