"""Multi-host (multi-process) support: parallel/multihost.py + the
trainer's --coordinator/--num-processes/--process-id entry path.

The reference is single-process (SURVEY.md §2 parallelism audit); this is
the framework's own scale-out past one host. Proven without hardware by a
real 2-process CPU `jax.distributed` cluster — each process simulates 4
host devices, forming the same 8-device global mesh the rest of the suite
uses — and asserting loss parity with the single-process 8-device run of
the identical config (same seed, same global program: GSPMD compiles the
same collectives whether the 8 devices live in one process or two).

The workers run in subprocesses (a process can only join one cluster, and
the suite's own jax is already initialized single-process); each worker
drives the REAL trainer CLI via runpy, so the whole entry path —
init_distributed before device queries, global mesh from setup_mesh,
process-0 gating of msgpack/metrics/figure writes — is what is tested.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=4"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# share compiled executables across workers / launches (both processes of a
# cluster trace the SAME global program, and the single-process parity run
# re-traces it) — on the 1-vCPU CI box compile time dominates these tests
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TOYCRYSTALS_TEST_CACHE",
                                     "/tmp/toycrystals_cpu_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass
import runpy
sys.argv = [sys.argv[1]] + sys.argv[2:]
sys.path.insert(0, os.path.dirname(sys.argv[0]))  # scripts/ for _common
try:
    runpy.run_path(sys.argv[0], run_name="__main__")
except SystemExit as e:
    if isinstance(e.code, int):
        code = e.code
    elif e.code is None:
        code = 0
    else:
        print(e.code, file=sys.stderr)  # SystemExit("message") contract
        code = 1
    sys.stdout.flush(); sys.stderr.flush()
    os._exit(code)
sys.stdout.flush(); sys.stderr.flush()
os._exit(0)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _train_args(out_dir: str, extra: list[str]) -> list[str]:
    # base_ch 16: the default 96-ch U-Net costs minutes of CPU compile per
    # worker and proves nothing extra about the multi-process path
    return [
        str(REPO / "scripts" / "train_sde_score_model.py"),
        "--device", "cpu", "--procedural", "--img-size", "16",
        "--n-samples", "64", "--batch-size", "16", "--epochs", "2",
        "--base-ch", "16", "--emb-dim", "32",
        "--shard", "8", "--sample-every", "0", "--seed", "3",
        "--ema-decay", "0.999", "--out-dir", out_dir,
    ] + extra


def _run_cluster(tmp_path, out_dir: str, extra: list[str], n_proc: int = 2,
                 expect_rc: int = 0):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        cmd = [sys.executable, str(worker)] + _train_args(out_dir, extra + [
            "--coordinator", f"localhost:{port}",
            "--num-processes", str(n_proc), "--process-id", str(pid),
        ])
        procs.append(subprocess.Popen(
            cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    # drain every worker's pipe concurrently: a sequential communicate()
    # would deadlock if a LATER worker fills its 64KB pipe buffer (it blocks
    # on write, the first worker blocks on it in a collective, and the
    # timeout fires as a 600s hang instead of a clean failure)
    outs: list[str | None] = [None] * len(procs)

    def _drain(i, pr):
        try:
            outs[i], _ = pr.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            pr.kill()
            outs[i], _ = pr.communicate()

    threads = [threading.Thread(target=_drain, args=(i, pr))
               for i, pr in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for pr, out in zip(procs, outs):
        assert pr.returncode == expect_rc, \
            f"worker rc={pr.returncode} (expected {expect_rc})\n{(out or '')[-4000:]}"
    return outs


def _run_single(tmp_path, out_dir: str, extra: list[str]) -> str:
    worker = tmp_path / "worker1.py"
    worker.write_text(WORKER.replace("device_count=4", "device_count=8"))
    cmd = [sys.executable, str(worker)] + _train_args(out_dir, extra)
    res = subprocess.run(cmd, cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, timeout=600)
    assert res.returncode == 0, res.stdout[-4000:]
    return res.stdout


def _losses(out_dir: Path) -> list[float]:
    rows = [json.loads(l) for l in
            (out_dir / "metrics.jsonl").read_text().splitlines() if l.strip()]
    return [r["loss"] for r in rows]


@pytest.mark.slow
def test_two_process_cluster_end_to_end(tmp_path):
    """ONE shared config through three launches (each worker pays a full
    jax import + compile on this 1-vCPU box, so the former
    parity/resume/grid tests are folded into one flow without losing any
    assertion):

    1. 2-process x 4-device cluster, fresh-data, in-training grid at epoch
       2 — cluster join, process-0 write gating, sharded-sampler allgather;
    2. --resume of the same run to epoch 3 — restore on every process,
       metrics continued not doubled;
    3. 1-process x 8-device run of the identical config — per-epoch loss
       parity (GSPMD compiles the same global program either way)."""
    multi_dir = tmp_path / "multi"
    cfg = ["--fresh-data", "--sample-every", "2", "--sample-steps", "2"]
    outs = _run_cluster(tmp_path, str(multi_dir), cfg)

    # the cluster joined: both workers reported global device counts
    assert any("4 local / 8 global devices" in o for o in outs)
    # process-0 gating: exactly one checkpoint + metrics writer (the run
    # dir is shared; a second writer would have duplicated jsonl rows)
    ckpt = multi_dir / "checkpoints" / "sde_score_model_last.msgpack"
    assert ckpt.exists()
    p0 = next(o for o in outs if "process 0/2" in o)
    p1 = next(o for o in outs if "process 1/2" in o)
    assert "epoch 001/2" in p0
    assert "epoch 001/2" not in p1  # non-primary stays quiet

    # in-training grid: the sampler output is batch-sharded across
    # processes, sample_chunked must allgather (a naive device_get raises
    # on non-addressable shards) and only process 0 writes the png
    pngs = sorted((multi_dir / "results").glob("sde_samples_epoch_*.png"))
    assert pngs, "primary wrote no in-training grid"
    # the 6x6 grid figure is square (figsize=(ncols, nrows)); the pre-fix
    # double-gather bug produced a doubled 72-tile layout, which renders
    # non-square — check the pixels, not just existence
    import matplotlib.pyplot as plt
    img = plt.imread(pngs[-1])
    assert img.shape[0] == img.shape[1], \
        f"grid png is {img.shape[1]}x{img.shape[0]} — not the square 6x6 layout"
    losses_a = _losses(multi_dir)
    assert len(losses_a) == 2

    # --resume across the cluster: restores on every process and continues
    # with fresh-data offsets intact
    _run_cluster(tmp_path, str(multi_dir),
                 cfg + ["--resume", "--epochs", "3", "--sample-every", "0"])
    losses_b = _losses(multi_dir)
    assert len(losses_b) == 3
    assert losses_b[:2] == losses_a  # metrics truncated/continued, not doubled

    # single-process parity: same seed, same config, same global program
    single_dir = tmp_path / "single"
    _run_single(tmp_path, str(single_dir), cfg)
    l_single = _losses(single_dir)
    assert len(l_single) == 2
    np.testing.assert_allclose(losses_a, l_single, rtol=2e-5)


@pytest.mark.slow
def test_two_process_fsdp_orbax_checkpoint(tmp_path):
    """Multi-host ZeRO-3: each process writes its own weight shards into ONE
    cooperative Orbax checkpoint (no gather of non-addressable arrays) —
    the path the trainer's msgpack guard points users to."""
    out = tmp_path / "fsdp_orbax"
    _run_cluster(tmp_path, str(out),
                 ["--fsdp", "--ckpt-format", "orbax", "--base-ch", "32"])
    ck = out / "checkpoints" / "sde_score_model_last.orbax"
    assert (ck / "2" / "state").exists()  # per-epoch steps committed
    assert len(_losses(out)) == 2


@pytest.mark.slow
def test_two_process_fsdp_msgpack_refused(tmp_path):
    """Multi-host --fsdp with the default msgpack format must refuse up
    front (a save would gather non-addressable arrays) with the orbax hint."""
    outs = _run_cluster(tmp_path, str(tmp_path / "refused"),
                        ["--fsdp", "--base-ch", "32"], expect_rc=1)
    assert any("--ckpt-format orbax" in o for o in outs)


def test_maybe_initialize_noop_without_flags():
    """No flags -> single-process no-op (the default for every CLI)."""
    from toycrystals_tpu.parallel.multihost import is_primary, maybe_initialize

    assert maybe_initialize() is False
    assert is_primary()


def test_global_batch_single_process_falls_back():
    """global_batch == shard_batch placement when there is one process."""
    import jax
    from toycrystals_tpu.parallel import global_batch, make_mesh

    mesh = make_mesh(8)
    x = np.arange(32, dtype=np.float32).reshape(16, 2)
    g = global_batch(mesh, (x, np.float32(2.0)))
    assert isinstance(g, tuple)
    np.testing.assert_array_equal(np.asarray(g[0]), x)
    assert g[0].sharding.spec == jax.sharding.PartitionSpec("data", None)
