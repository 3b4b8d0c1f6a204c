"""AOT model export: serialize a checkpoint's compiled sampler via jax.export.

The reference has no deployment story beyond "ship the .pt and the source
tree" (`/root/reference/scripts/sample_sde_score_model.py:19-135` rebuilds
the model from code on every use). The XLA-native shape of "package this
model" is an **exported StableHLO artifact**: `jax.export` lowers the jitted
sampling function ONCE — weights baked in as constants, sampler/steps/CFG
frozen — into a serialized MLIR module with stability guarantees across JAX
releases. The artifact is self-contained: loading it needs jax but NOT this
package, the model code, or the checkpoint.

What gets exported is exactly the serving dispatch
(`serve.ScoreModelService.sampler_callable`):

    f(y_cat int32[batch], y_cont float32[batch, D], seed int32[])
      -> float32[batch, H, W, 1] in [0, 1]

so an exported artifact reproduces the service it came from at the same
(seed, batch layout): same program, same PRNG draws (bitwise on TPU;
constant-folding over the baked weights may re-fuse float ops on other
backends, measured <=5e-5 on CPU). Cross-platform export (`platforms=["tpu","cpu"]`)
lowers one module that runs on either backend — lower on a CPU dev box,
deploy on TPU serving hosts. (Caveat: configs that auto-select the Pallas
flash-attention kernel — 256×256 models — embed a TPU custom call and can
only be exported for "tpu".)

File format (`save_exported` / `load_exported`): a magic line, a
length-prefixed JSON meta block (sampler settings, shapes, platforms — for
humans and tooling; the module itself is authoritative), then the
`jax.export` payload bytes.

CLI: `scripts/export_sde_score_model.py`.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any

MAGIC = b"TOYCRYSTALS-TPU-EXPORT-V1\n"


def export_service(service, batch: int, platforms: list[str] | None = None):
    """Export `service`'s compiled sampler at one static batch shape.

    Returns a `jax.export.Exported`. `platforms=None` exports for the
    default backend; pass e.g. ["tpu", "cpu"] for a multi-platform module.
    """
    import jax
    import jax.numpy as jnp

    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    run = service.sampler_callable(int(batch))
    params = service.params

    def run_baked(yc, yv, seed):
        # params close over the trace and land in the module as constants:
        # the artifact carries its own weights
        return run(params, yc, yv, seed)

    args = (
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch, service.y_cont_dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jax.export.export(jax.jit(run_baked), **kw)(*args)


def export_meta(service, batch: int, exported) -> dict[str, Any]:
    """The JSON meta block written next to the module bytes."""
    import jax

    return {
        "format": "toycrystals-tpu-export",
        "version": 1,
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "batch": int(batch),
        "img_size": service.img_size,
        "n_types": service.n_types,
        "y_cont_dim": service.y_cont_dim,
        "sampler": service.sampler_name,
        "steps": service.steps,
        "guidance_scale": service.guidance_scale,
        "t_end": service.t_end,
        "param": str(service.config.get("param", "eps")),
        "distilled": bool(service.config.get("distilled")),
        "ckpt": service.ckpt_path,
        "calling_convention": (
            "f(y_cat int32[batch], y_cont float32[batch,y_cont_dim], "
            "seed int32[]) -> float32[batch,img_size,img_size,1]"),
    }


def save_exported(path: str | Path, exported, meta: dict[str, Any]) -> None:
    """Write MAGIC + u64 meta length + meta JSON + jax.export bytes,
    atomically (tmp + rename, same contract as utils/checkpoint.py)."""
    blob = exported.serialize()
    head = json.dumps(meta, sort_keys=True).encode()
    p = Path(path)
    tmp = p.with_name(p.name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack(">Q", len(head)))
        f.write(head)
        f.write(blob)
    tmp.replace(p)


def load_exported(path: str | Path):
    """Read an artifact -> (jax.export.Exported, meta dict).

    Call the model with `exported.call(y_cat, y_cont, seed)` (wrap in
    `jax.jit` for a cached executable in long-lived processes)."""
    import jax

    raw = Path(path).read_bytes()
    if not raw.startswith(MAGIC):
        raise ValueError(f"{path} is not a toycrystals-tpu export "
                         f"(bad magic; expected {MAGIC!r})")
    off = len(MAGIC)
    (hlen,) = struct.unpack(">Q", raw[off:off + 8])
    off += 8
    meta = json.loads(raw[off:off + hlen].decode())
    return jax.export.deserialize(raw[off + hlen:]), meta


def export_checkpoint(
    ckpt_path: str,
    out_path: str | Path,
    *,
    batch: int = 36,
    platforms: list[str] | None = None,
    **service_kw,
) -> dict[str, Any]:
    """One-shot: checkpoint -> exported artifact on disk. Returns the meta.

    `service_kw` are `serve.ScoreModelService` options (sampler, steps,
    guidance_scale, t_end, use_ema, dtype, ...): anything left None resolves
    from the checkpoint exactly like serving does.
    """
    from toycrystals_tpu.serve import ScoreModelService

    service = ScoreModelService(ckpt_path, **service_kw)
    exported = export_service(service, batch, platforms)
    meta = export_meta(service, batch, exported)
    save_exported(out_path, exported, meta)
    return meta
