"""Shared CLI plumbing for the scripts/ entry points.

Keeps the reference's argparse `main() -> int` style (SURVEY.md §1 L2) while
adding the TPU-native bits: platform selection (--device tpu|cpu, with the
same graceful fallback the reference has for CUDA, `train_vae.py:250-254`)
and resident-on-device disk datasets (the whole archive lives in HBM as u8;
batches are on-device gathers, no host loop per step).
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np


def select_device(device: str) -> str:
    """'tpu' | 'cpu' | 'auto'. Falls back to cpu when no TPU is available.

    Also installs the persistent compilation cache for every CLI: the
    remote-TPU compile of a fused epoch / 300-step sampling scan is minutes
    cold and instant warm (CLAUDE.md).
    """
    jax.config.update("jax_compilation_cache_dir", "/tmp/toycrystals_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if device == "auto":
        device = "tpu" if any(d.platform == "tpu" for d in jax.devices()) else "cpu"
        return device
    if device == "tpu":
        try:
            if not any(d.platform == "tpu" for d in jax.devices()):
                raise RuntimeError
        except Exception:
            print("TPU not available; using cpu")
            jax.config.update("jax_platforms", "cpu")
            return "cpu"
        return "tpu"
    jax.config.update("jax_platforms", device)
    return device


def infer_score_ckpt_path(out_dir: str, ckpt: str) -> str:
    """Resolve a score-model --ckpt argument shared by the sampler / inpaint
    / eval CLIs: an explicit path (.msgpack / reference .pt / --ckpt-format
    orbax directory) passes through; 'last'/'best' resolve under
    <out_dir>/checkpoints, preferring msgpack and falling back to an orbax
    run's step-managed directory."""
    import os

    if ckpt.endswith((".msgpack", ".pt", ".orbax")) or os.path.isdir(ckpt):
        return ckpt
    if ckpt in ("last", "best"):
        base = os.path.join(out_dir, "checkpoints", f"sde_score_model_{ckpt}")
        if not os.path.exists(base + ".msgpack") and os.path.isdir(base + ".orbax"):
            return base + ".orbax"
        return base + ".msgpack"
    raise ValueError("ckpt must be a .msgpack/.orbax/.pt path or one of: last, best")


def add_dist_flags(p) -> None:
    """--coordinator/--num-processes/--process-id: join a multi-process
    JAX cluster (parallel/multihost.py). On a TPU pod, launching the same
    command on every host with these flags (or `--coordinator auto` — the
    TPU runtime advertises the coordinator) turns every `--shard*` mesh
    into a global one; exactly one process writes ckpts/figures/metrics."""
    p.add_argument(
        "--coordinator", type=str, default=None,
        help="host:port of process 0 for jax.distributed (multi-host "
             "runs), or 'auto' to let jax.distributed.initialize() "
             "discover the cluster from the environment (TPU pod / SLURM). "
             "Omit everywhere for single-process (the default).")
    p.add_argument(
        "--num-processes", type=int, default=None,
        help="Total number of processes in the cluster.")
    p.add_argument(
        "--process-id", type=int, default=None,
        help="This process's rank in [0, --num-processes).")


def init_distributed(args) -> bool:
    """Join the cluster BEFORE the first device query (select_device calls
    jax.devices(), which pins backends). Returns True when multi-process."""
    from toycrystals_tpu.parallel.multihost import maybe_initialize

    multi = maybe_initialize(
        coordinator=getattr(args, "coordinator", None),
        num_processes=getattr(args, "num_processes", None),
        process_id=getattr(args, "process_id", None),
    )
    if multi:
        print(f"jax.distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices")
    return multi


def add_shard_flag(p, space: bool = False, train: bool = True) -> None:
    """--shard N: GSPMD data parallelism over the first N devices."""
    p.add_argument(
        "--shard", type=int, default=0,
        help="Shard the batch over the first N devices (1-D 'data' mesh; "
             "params replicated, gradient all-reduce over ICI inserted by "
             "GSPMD). 0/1 = single device. Requires the batch size to "
             "divide by N. The reference has no distributed story "
             "(SURVEY.md §2 parallelism audit) — this is new TPU scope.",
    )
    if space:
        p.add_argument(
            "--shard-space", type=int, default=0,
            help="Also shard the image HEIGHT over N devices (2-D "
                 "('data','space') mesh; GSPMD spatial partitioning inserts "
                 "conv halo exchange / GN-stat psum / sequence-parallel "
                 "attention over ICI — parallel/spatial.py). For hi-res "
                 "sampling where activations, not the batch, are what "
                 "outgrow one chip. Total devices = max(1,--shard) * N; "
                 "H/4 must divide by N. 0/1 = no spatial sharding.",
        )
    p.add_argument(
        "--shard-model", type=int, default=0,
        help="Tensor parallelism: shard the weights' channel dimension "
             "over N devices (2-D ('data','model') mesh; conv output "
             "channels / dense columns / Adam moments each live 1/N per "
             "chip, GSPMD inserts the channel all-gathers over ICI — "
             "parallel/tensor.py). For scaling the model (base_ch / "
             "--width) past one chip's HBM. Composes with --shard and "
             "--shard-space (3-D ('data','space','model') mesh). Total "
             "devices = max(1,--shard) * max(1,--shard-space) * N; channel "
             "counts should divide by N. 0/1 = no tensor parallelism.",
    )
    if train:
        p.add_argument(
            "--fsdp", action="store_true",
            help="ZeRO-3 placement: with --shard N, also shard every "
                 "weight (and its Adam moments / EMA) 1/N over the 'data' "
                 "axis — each chip holds 1/N of the train state and GSPMD "
                 "inserts the just-in-time weight all-gathers / gradient "
                 "reduce-scatters over ICI (parallel/fsdp.py). Composes "
                 "with --shard-model (2-D weight sharding). No effect "
                 "without --shard >= 2.",
        )


def setup_mesh(shard: int, *batch_sizes: int,
               shard_space: int = 0, shard_model: int = 0,
               img_size: int | None = None):
    """Resolve --shard [+ --shard-space, --shard-model] into a Mesh
    (None = single-device).

    Validates device availability and that every batch size divides over
    the 'data' axis so each device gets equal shards; with shard_space > 1
    adds the 'space' axis (and checks H divisibility), with shard_model > 1
    the 'model' axis; both together build the full 3-D
    ('data','space','model') mesh — dp x sp x tp composed.
    """
    if shard < 0:
        raise SystemExit(f"--shard must be >= 0, got {shard}")
    n_data = max(1, shard)
    n_dev = len(jax.devices())
    for b in batch_sizes:
        if b % n_data:
            raise SystemExit(f"batch size {b} not divisible by --shard {shard}")
    if shard_space > 1 and shard_model > 1:
        from toycrystals_tpu.parallel import check_spatial_divisibility, make_mesh_3d

        need = n_data * shard_space * shard_model
        if need > n_dev:
            raise SystemExit(
                f"--shard {shard} x --shard-space {shard_space} x "
                f"--shard-model {shard_model} needs {need} devices, "
                f"have {n_dev}")
        if img_size is not None:
            try:
                check_spatial_divisibility(img_size, shard_space)
            except ValueError as e:
                raise SystemExit(str(e))
        print(f"3-D mesh: {n_data} data x {shard_space} space x "
              f"{shard_model} model devices")
        return make_mesh_3d(n_data, shard_space, shard_model)
    if shard_model > 1:
        from toycrystals_tpu.parallel import make_mesh_tp

        if n_data * shard_model > n_dev:
            raise SystemExit(
                f"--shard {shard} x --shard-model {shard_model} needs "
                f"{n_data * shard_model} devices, have {n_dev}")
        print(f"2-D mesh: {n_data} data x {shard_model} model devices")
        return make_mesh_tp(n_data, shard_model)
    if shard_space > 1:
        from toycrystals_tpu.parallel import check_spatial_divisibility, make_mesh_2d

        if n_data * shard_space > n_dev:
            raise SystemExit(
                f"--shard {shard} x --shard-space {shard_space} needs "
                f"{n_data * shard_space} devices, have {n_dev}")
        if img_size is not None:
            try:
                check_spatial_divisibility(img_size, shard_space)
            except ValueError as e:
                raise SystemExit(str(e))
        print(f"2-D mesh: {n_data} data x {shard_space} space devices")
        return make_mesh_2d(n_data, shard_space)
    if shard in (0, 1):
        return None
    if shard > n_dev:
        raise SystemExit(f"--shard {shard} but only {n_dev} devices visible")
    from toycrystals_tpu.parallel import make_mesh

    print(f"data-parallel mesh: {shard} devices")
    return make_mesh(shard)


def place_state(mesh, state, fsdp: bool = False, what: str = "channel counts"):
    """Mesh-aware train-state placement shared by the three trainers.

    - mesh=None: passthrough;
    - data / spatial meshes: full replication — unless `fsdp`, which shards
      every weight + Adam moment + EMA 1/N over 'data' (parallel/fsdp.py,
      ZeRO-3);
    - ('data','model') meshes: channel sharding over 'model'
      (parallel/tensor.py), composed with the fsdp rule when both are on.

    Prints the sharded-element coverage for tp/fsdp so an indivisible config
    (pure replication overhead) is visible instead of a silent no-op.
    """
    from toycrystals_tpu.parallel import (
        fsdp_coverage,
        shard_params,
        shard_params_fsdp,
        tp_coverage,
    )

    if mesh is None:
        return state
    if fsdp and "data" in mesh.axis_names and dict(mesh.shape)["data"] > 1:
        state = shard_params_fsdp(mesh, state)
        print(f"fsdp: {fsdp_coverage(mesh, state.params):.0%} of param "
              "elements sharded over 'data'")
    else:
        state = shard_params(mesh, state)
    if "model" in mesh.axis_names:
        cov = tp_coverage(mesh, state.params)
        print(f"tensor parallelism: {cov:.0%} of param elements sharded"
              + (f" — check {what} divide --shard-model" if cov < 0.5 else ""))
    return state


class ResidentDiskDataset:
    """Disk archive resident in device memory: u8 images + labels.

    `gather(idx)` returns a batch as (x f32 [B,H,W,1] in [0,1], y_cat, y_cont)
    entirely on device — the TPU-equivalent of the reference's DataLoader over
    `ToyCrystalsDiskDataset` (`disk_data.py:27-31`). Accepts our .npz or the
    reference's .pt archive (`data/datasets.py:load_archive`).
    """

    def __init__(self, path: str | Path) -> None:
        from toycrystals_tpu.data.datasets import load_archive

        x_u8, y_cat, y_cont = load_archive(path)
        self.x_u8 = jnp.asarray(x_u8)
        self.y_cat = jnp.asarray(y_cat)
        self.y_cont = jnp.asarray(y_cont)
        self.n = int(self.x_u8.shape[0])

    def __len__(self) -> int:
        return self.n

    def gather(self, idx) -> tuple[jax.Array, jax.Array, jax.Array]:
        idx = jnp.asarray(idx)
        x = self.x_u8[idx].astype(jnp.float32) / 255.0
        return x, self.y_cat[idx], self.y_cont[idx]
