"""End-to-end CLI integration tests at tiny scale (SURVEY.md §4).

Each script runs as a subprocess on CPU and must produce its artefact
contract: archives, checkpoints, metrics.jsonl, figure pngs.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

# every test here drives a CLI end-to-end in a subprocess
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"

ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    XLA_FLAGS="--xla_force_host_platform_device_count=1",
)


def run(script, *flags, cwd):
    cmd = [sys.executable, str(SCRIPTS / script), "--device", "cpu", *flags]
    r = subprocess.run(cmd, cwd=cwd, env=ENV, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


def test_01_build_dataset(workdir):
    run(
        "build_dataset.py", "--n-samples", "64", "--img-size", "32",
        "--out", "data/train.npz", "--batch-size", "64", cwd=workdir,
    )
    assert (workdir / "data/train.npz").exists()
    import numpy as np

    obj = np.load(workdir / "data/train.npz")
    assert obj["x_u8"].shape == (64, 32, 32, 1)
    assert obj["x_u8"].dtype == np.uint8
    assert obj["y_cat"].shape == (64,)
    assert obj["y_cont"].shape == (64, 4)


def test_01b_build_dataset_pt_writeback(workdir):
    """--format pt (or a .pt --out) writes the REFERENCE's torch archive
    schema (`/root/reference/scripts/build_dataset.py:28-41`): a dataset
    built here feeds the reference's trainers unmodified — the write-back
    half of the .pt interop whose load half is load_archive."""
    run(
        "build_dataset.py", "--n-samples", "64", "--img-size", "32",
        "--out", "data/train.pt", "--batch-size", "64", cwd=workdir,
    )
    import numpy as np
    import torch

    # torch-side load: exactly what the reference's ToyCrystalsDiskDataset
    # does (`/root/reference/src/toycrystals/disk_data.py:8-16`)
    obj = torch.load(workdir / "data/train.pt", map_location="cpu")
    assert set(obj) == {"x_u8", "y_cat", "y_cont"}
    assert obj["x_u8"].shape == (64, 1, 32, 32) and obj["x_u8"].dtype == torch.uint8
    assert obj["y_cat"].dtype == torch.int64
    assert obj["y_cont"].shape == (64, 4) and obj["y_cont"].dtype == torch.float32

    # our-side round trip + bit-identical to the npz built by test_01
    from toycrystals_tpu.data.datasets import load_archive

    xa, ca, va = load_archive(workdir / "data/train.pt")
    ref = np.load(workdir / "data/train.npz")
    np.testing.assert_array_equal(xa, ref["x_u8"])
    np.testing.assert_array_equal(ca, ref["y_cat"].astype(np.int32))
    np.testing.assert_array_equal(va, ref["y_cont"])


def test_02_preview(workdir):
    run("preview_data.py", "--img-size", "32", cwd=workdir)
    assert (workdir / "results/preview_toycrystals.png").exists()


def test_03_train_vae(workdir):
    run(
        "train_vae.py", "--procedural", "--n-samples", "128", "--epochs", "1",
        "--batch-size", "32", "--z-dim", "8", cwd=workdir,
    )
    assert (workdir / "checkpoints/vae_last.msgpack").exists()
    for f in ("vae_recon.png", "vae_samples_prior.png", "vae_samples_mop.png", "vae_loss.png"):
        assert (workdir / "results" / f).exists(), f


def test_04_train_diffusion_prior(workdir):
    run(
        "train_diffusion_prior.py", "--procedural", "--max-items", "128",
        "--epochs", "1", "--width", "64", "--z-dim", "8",
        "--latent-cache", "data/latents.npz", "--ddim-steps", "5",
        "--batch-size", "32", cwd=workdir,
    )
    assert (workdir / "checkpoints/diffusion_prior_last.msgpack").exists()
    assert (workdir / "data/latents.npz").exists()
    assert (workdir / "results/diffusion_samples.png").exists()
    assert (workdir / "results/diffusion_loss.png").exists()
    # cache reuse + sample-only path
    run(
        "train_diffusion_prior.py", "--procedural", "--max-items", "128",
        "--width", "64", "--z-dim", "8", "--latent-cache", "data/latents.npz",
        "--ddim-steps", "5", "--sample-only", "--resume", cwd=workdir,
    )


def test_05_train_sde_and_sample(workdir):
    run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "128",
        "--epochs", "2", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--ema-decay", "0.999", "--sample-steps", "3",
        "--save-best", "1", "--out-dir", "runs/t", cwd=workdir,
    )
    ckpt = workdir / "runs/t/checkpoints/sde_score_model_last.msgpack"
    assert ckpt.exists()
    # --save-best writes the 'best' checkpoint the reference's sampler
    # resolves but its trainer never produces
    assert (workdir / "runs/t/checkpoints/sde_score_model_best.msgpack").exists()
    metrics = (workdir / "runs/t/metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) == 2
    rec = json.loads(metrics[-1])
    assert rec["epoch"] == 2 and "loss" in rec
    assert (workdir / "runs/t/results/sde_loss.png").exists()
    assert (workdir / "runs/t/results/sde_samples_epoch_002.png").exists()

    # resume continues epoch numbering; --sample-every 0 disables in-training
    # grids (regression: used to ZeroDivisionError); --attn-impl threads an
    # explicit backend through the CLI
    r = run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "128",
        "--epochs", "3", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--ema-decay", "0.999", "--sample-steps", "3",
        "--sample-every", "0", "--attn-impl", "xla",
        "--out-dir", "runs/t", "--resume", cwd=workdir,
    )
    assert "resumed from" in r.stdout
    metrics = (workdir / "runs/t/metrics.jsonl").read_text().strip().splitlines()
    assert json.loads(metrics[-1])["epoch"] == 3

    # standalone sampler: all three samplers (incl. the DPM fast path), EMA on
    for sampler in ("ode", "sde", "dpm"):
        run(
            "sample_sde_score_model.py", "--out-dir", "runs/t", "--ckpt", "last",
            "--steps", "3", "--cfg", "1.5", "--sampler", sampler, "--use-ema", "1",
            "--n", "4", cwd=workdir,
        )
    run(
        "sample_sde_score_model.py", "--out-dir", "runs/t", "--ckpt", "best",
        "--steps", "3", "--sampler", "ode", "--n", "4", cwd=workdir,
    )
    results = list((workdir / "runs/t/results").glob("samples_ckpt-*"))
    assert len(results) == 4


def test_06_sampler_chunking_and_schedule_resume(workdir):
    """--chunk splits a batch into fixed-size dispatches (odd n -> one
    padded+trimmed chunk); --resume restores the SDE schedule from the
    checkpoint config instead of silently reverting to shift=0."""
    run(
        "sample_sde_score_model.py", "--out-dir", "runs/t", "--ckpt", "last",
        "--steps", "3", "--sampler", "sde", "--n", "5", "--chunk", "2",
        "--out-path", "runs/t/results/chunked.png", cwd=workdir,
    )
    assert (workdir / "runs/t/results/chunked.png").exists()

    run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "1", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--logsnr-shift", "-1.0", "--sample-steps", "3",
        "--out-dir", "runs/shift", cwd=workdir,
    )
    run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "2", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--sample-steps", "3",
        "--out-dir", "runs/shift", "--resume", cwd=workdir,
    )
    from toycrystals_tpu.utils import load_checkpoint

    ckpt = workdir / "runs/shift/checkpoints/sde_score_model_last.msgpack"
    assert float(load_checkpoint(str(ckpt))["config"]["logsnr_shift"]) == -1.0


def test_07_vae_resume(workdir):
    """VAE --resume (new scope: the reference has none) restores params,
    optimiser state and epoch from the per-epoch checkpoint."""
    r = run(
        "train_vae.py", "--procedural", "--n-samples", "128", "--epochs", "2",
        "--batch-size", "32", "--z-dim", "8", "--resume", cwd=workdir,
    )
    assert "resumed from" in r.stdout
    assert "epoch 02/2" in r.stdout and "epoch 01" not in r.stdout


def test_08_divergence_guard(workdir):
    """A diverging run (absurd lr -> non-finite loss) halts with a clear
    error instead of training on and overwriting checkpoints with NaNs
    (new failure-detection scope; the reference trains on silently)."""
    cmd = [sys.executable, str(SCRIPTS / "train_sde_score_model.py"),
           "--device", "cpu", "--procedural", "--n-samples", "32",
           "--epochs", "3", "--batch-size", "16", "--base-ch", "8",
           "--emb-dim", "16", "--lr", "1e12", "--sample-every", "99",
           "--out-dir", "runs/diverge"]
    r = subprocess.run(cmd, cwd=workdir, env=ENV, capture_output=True,
                       text=True, timeout=900)
    assert r.returncode != 0
    assert "diverged" in (r.stdout + r.stderr)


def test_09_lr_schedule_and_grad_accum(workdir):
    """--lr-schedule cosine + --warmup-steps + --grad-accum run end-to-end
    and resume continues under the schedule (it reads the opt_state count,
    so restart is exact)."""
    r = run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "1", "--batch-size", "16", "--base-ch", "8",
        "--emb-dim", "16", "--sample-every", "99",
        "--lr-schedule", "cosine", "--warmup-steps", "2", "--grad-accum", "2",
        "--skip-nonfinite", "2", "--out-dir", "runs/lrs", cwd=workdir,
    )
    assert "lr schedule: cosine" in r.stdout
    assert "non-finite-gradient guard" in r.stdout
    r = run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "2", "--batch-size", "16", "--base-ch", "8",
        "--emb-dim", "16", "--sample-every", "99",
        "--lr-schedule", "cosine", "--warmup-steps", "2", "--grad-accum", "2",
        "--skip-nonfinite", "2", "--out-dir", "runs/lrs", "--resume", cwd=workdir,
    )
    assert "resumed from" in r.stdout and "epoch 002/2" in r.stdout


def test_10_eval_cli(workdir):
    """Standalone evaluator: samples a canonical-conditions batch through the
    serving runtime and reports the lattice-fidelity scalars as one JSON
    line, plus an optional saved grid and full per-sample JSON; grid-png
    mode re-scores a committed figure."""
    r = run(
        "eval_sde_score_model.py", "--ckpt",
        "runs/t/checkpoints/sde_score_model_last.msgpack",
        "--sampler", "sde", "--steps", "2", "--cfg", "0", "--n", "9",
        "--save-grid", "runs/t/results/eval_grid.png",
        "--json-out", "runs/t/results/eval.json", cwd=workdir,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    for k in ("cond_fidelity", "type_acc", "type_acc_merged01",
              "theta_mae_deg"):
        assert k in rec, rec
    assert 0.0 <= rec["cond_fidelity"] <= 1.0
    assert (workdir / "runs/t/results/eval_grid.png").exists()
    full = json.loads((workdir / "runs/t/results/eval.json").read_text())
    assert len(full["pred_type"]) == 9
    # grid-png mode on the just-saved 3x3 figure (tile recovery + scoring)
    r = run(
        "eval_sde_score_model.py", "--grid", "runs/t/results/eval_grid.png",
        "--grid-rows", "3", "--grid-cols", "3", cwd=workdir,
    )
    rec = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert rec["grid"].endswith("eval_grid.png")
    assert 0.0 <= rec["cond_fidelity"] <= 1.0


def test_11_orbax_ckpt_train_resume_sample(workdir):
    """--ckpt-format orbax end-to-end: the trainer writes a step-managed
    per-shard checkpoint directory, --resume restores from it (arrays land
    straight in the new run's shardings), and the standalone sampler reads
    the directory through the same last/best resolution as msgpack."""
    run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "1", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--sample-every", "0", "--save-best", "1",
        "--ckpt-format", "orbax", "--out-dir", "runs/ox", cwd=workdir,
    )
    last = workdir / "runs/ox/checkpoints/sde_score_model_last.orbax"
    best = workdir / "runs/ox/checkpoints/sde_score_model_best.orbax"
    assert (last / "1").is_dir(), "step-managed layout expected"
    assert best.is_dir()
    assert not list((workdir / "runs/ox/checkpoints").glob("*.msgpack"))

    r = run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "2", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--sample-every", "0", "--save-best", "1",
        "--ckpt-format", "orbax", "--out-dir", "runs/ox", "--resume",
        cwd=workdir,
    )
    assert "resumed from" in r.stdout
    metrics = (workdir / "runs/ox/metrics.jsonl").read_text().strip().splitlines()
    assert json.loads(metrics[-1])["epoch"] == 2

    run(
        "sample_sde_score_model.py", "--out-dir", "runs/ox", "--ckpt", "last",
        "--steps", "3", "--sampler", "ode", "--n", "4", cwd=workdir,
    )
    assert list((workdir / "runs/ox/results").glob("samples_ckpt-*"))


def test_12_flow_matching_train_and_sample(workdir):
    """--param fm end-to-end: the trainer optimizes the rectified-flow
    velocity objective (in-training grids via the rf sampler), the sampler
    CLI auto-switches to rf for fm checkpoints, and incompatible sampler
    choices fail with a clear message."""
    run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "1", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--param", "fm", "--fm-shift", "2.0",
        "--sample-steps", "3",
        "--sample-every", "1", "--cfg", "1.5", "--out-dir", "runs/fm",
        cwd=workdir,
    )
    ckpt = workdir / "runs/fm/checkpoints/sde_score_model_last.msgpack"
    assert ckpt.exists()
    # the resolution timestep shift is self-described in the checkpoint, so
    # the sampler/serving integrate on the grid the model trained for
    from toycrystals_tpu.utils.checkpoint import load_checkpoint

    assert float(load_checkpoint(str(ckpt))["config"]["fm_shift"]) == 2.0
    # the in-training grid ran through the rf sampler
    assert (workdir / "runs/fm/results/sde_samples_epoch_001.png").exists()

    r = run(
        "sample_sde_score_model.py", "--out-dir", "runs/fm", "--ckpt", "last",
        "--steps", "4", "--cfg", "1.5", "--n", "4", cwd=workdir,
    )
    assert "defaulting to rf" in r.stdout

    # 2nd-order rf integrator (--rf-solver heun, 2 evals/step) drives the
    # same path end-to-end
    run(
        "sample_sde_score_model.py", "--out-dir", "runs/fm", "--ckpt", "last",
        "--steps", "2", "--cfg", "1.5", "--n", "4", "--rf-solver", "heun",
        "--out-path", "runs/fm/results/heun.png", cwd=workdir,
    )
    assert (workdir / "runs/fm/results/heun.png").exists()

    # explicit VP sampler on an fm checkpoint must fail loudly
    import subprocess
    bad = subprocess.run(
        [sys.executable, str(SCRIPTS / "sample_sde_score_model.py"),
         "--device", "cpu", "--out-dir", "runs/fm", "--ckpt", "last",
         "--steps", "4", "--sampler", "sde", "--n", "4"],
        cwd=workdir, env=ENV, capture_output=True, text=True, timeout=900,
    )
    assert bad.returncode != 0
    assert "--sampler rf" in (bad.stdout + bad.stderr)

    # the serving service layer (eval CLI drives it) auto-selects rf too
    r = run(
        "eval_sde_score_model.py", "--ckpt",
        "runs/fm/checkpoints/sde_score_model_last.msgpack",
        "--n", "4", "--steps", "3", cwd=workdir,
    )
    rec = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert rec["sampler"] == "rf"


def test_13_min_snr_and_grad_clip(workdir):
    """--min-snr-gamma + --clip-grad-norm train end-to-end, self-describe in
    the checkpoint config, and --resume WITHOUT the flags falls back to the
    stored values (the clip chain changes the opt_state layout, so the
    fallback is what keeps the restore structural)."""
    r = run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "1", "--batch-size", "16", "--base-ch", "8",
        "--emb-dim", "16", "--sample-every", "99",
        "--min-snr-gamma", "5.0", "--clip-grad-norm", "1.0",
        "--out-dir", "runs/msnr", cwd=workdir,
    )
    assert "gradient clipping: global norm <= 1" in r.stdout
    from toycrystals_tpu.utils.checkpoint import load_checkpoint

    cfg = load_checkpoint(
        str(workdir / "runs/msnr/checkpoints/sde_score_model_last.msgpack")
    )["config"]
    assert float(cfg["min_snr_gamma"]) == 5.0
    assert float(cfg["clip_grad_norm"]) == 1.0

    r = run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "2", "--batch-size", "16", "--base-ch", "8",
        "--emb-dim", "16", "--sample-every", "99",
        "--out-dir", "runs/msnr", "--resume", cwd=workdir,
    )
    assert "resumed from" in r.stdout and "epoch 002/2" in r.stdout
    assert "gradient clipping: global norm <= 1" in r.stdout

    # weighting is undefined for rectified flow: fail loudly, don't train
    import subprocess
    bad = subprocess.run(
        [sys.executable, str(SCRIPTS / "train_sde_score_model.py"),
         "--procedural", "--n-samples", "64", "--epochs", "1",
         "--batch-size", "16", "--base-ch", "8", "--emb-dim", "16",
         "--param", "fm", "--min-snr-gamma", "5.0", "--out-dir", "runs/bad"],
        cwd=workdir, env=ENV, capture_output=True, text=True, timeout=900,
    )
    assert bad.returncode != 0
    assert "--min-snr-gamma" in (bad.stdout + bad.stderr)


def test_16_s2d_stem_train_and_sample(workdir):
    """--stem s2d end-to-end: the trainer builds the folded-stem U-Net and
    self-describes it in the checkpoint; the sampler CLI rebuilds the s2d
    architecture from that config byte; the torch exporter refuses (the
    reference has no s2d layout)."""
    run(
        "train_sde_score_model.py", "--procedural", "--n-samples", "64",
        "--epochs", "1", "--batch-size", "32", "--base-ch", "8",
        "--emb-dim", "16", "--stem", "s2d", "--sample-every", "0",
        "--out-dir", "runs/s2d", cwd=workdir,
    )
    ckpt = workdir / "runs/s2d/checkpoints/sde_score_model_last.msgpack"
    from toycrystals_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(str(ckpt))
    assert payload["config"]["stem"] == "s2d"
    # s2d head predicts 4 channels on the half grid (depth-to-space output)
    assert payload["state"]["params"]["out"]["kernel"].shape[-1] == 4
    run(
        "sample_sde_score_model.py", "--out-dir", "runs/s2d", "--ckpt", "last",
        "--steps", "3", "--sampler", "sde", "--n", "4", cwd=workdir,
    )
    assert list((workdir / "runs/s2d/results").glob("samples_ckpt-*"))

    import subprocess
    bad = subprocess.run(
        [sys.executable, str(SCRIPTS / "export_torch_checkpoint.py"),
         "--ckpt", str(ckpt), "--out", str(workdir / "s2d.pt")],
        cwd=workdir, env=ENV, capture_output=True, text=True, timeout=300,
    )
    assert bad.returncode != 0 and "no space-to-depth stem" in bad.stderr
