"""Serving runtime tests (toycrystals_tpu/serve.py + scripts/serve_sde_score_model.py).

New TPU scope — the reference has no serving story (its sampler CLI reloads
weights and recompiles per invocation). Contracts verified:
- setting resolution: explicit > distilled-checkpoint > reference defaults;
- bucket ladder: clamped to the tunnel-safe cap, rounded to mesh multiples,
  requests padded to the nearest bucket and trimmed (any n works);
- determinism of the direct path given (ckpt, settings, seed);
- MicroBatcher coalesces concurrent requests into shared dispatches and
  splits results back per caller, validating conditions eagerly;
- the HTTP front-end serves /healthz, /stats, /sample (JSON + PNG, POST +
  GET-query forms) with 400/404 on bad input.
"""

import json
import sys
import threading
import urllib.error
import urllib.request
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from toycrystals_tpu.models import CondUNetTiny
from toycrystals_tpu.serve import MicroBatcher, ScoreModelService, grid_png_bytes
from toycrystals_tpu.train import create_train_state
from toycrystals_tpu.utils import save_checkpoint

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

K = jax.random.key(0)

CFG = {
    "img_ch": 1, "img_size": 16, "n_types": 4, "y_cont_dim": 4,
    "base_ch": 8, "emb_dim": 16, "cond_ch": 8, "time_ch": 8,
    "beta_min": 0.1, "beta_max": 30.0, "logsnr_shift": 0.0,
    "t_power": 1.0, "p_uncond": 0.1, "dtype": "float32", "param": "eps",
}


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """One plain and one distilled-style tiny checkpoint."""
    d = tmp_path_factory.mktemp("serve_ckpts")
    u = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16)
    params = u.init(K, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,)),
                    jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
    state = create_train_state(params, optax.adam(1e-3), ema=True)
    plain = d / "plain.msgpack"
    save_checkpoint(plain, {"epoch_next": 1, "state": state,
                            "loss_hist": [0.1], "config": CFG})
    dcfg = dict(CFG, param="v", distilled=True, distill_steps=2,
                distill_t_end=0.005, distill_cfg=1.5)
    dist = d / "distilled.msgpack"
    save_checkpoint(dist, {"epoch_next": 1, "state": state,
                           "loss_hist": [0.1], "config": dcfg})
    return str(plain), str(dist)


def test_defaults_plain_vs_distilled(ckpts):
    plain, dist = ckpts
    svc = ScoreModelService(plain, buckets=(2,))
    # reference committed settings (sample_sde_score_model.py usage)
    assert (svc.sampler_name, svc.steps) == ("sde", 300)
    assert (svc.guidance_scale, svc.t_end) == (1.5, 0.005)
    sd = ScoreModelService(dist, buckets=(2,))
    # student serves its trained few-step DDIM map with baked-in guidance
    assert (sd.sampler_name, sd.steps, sd.guidance_scale) == ("ddim", 2, 0.0)
    assert sd._extra_kw == {"prediction": "v"}
    # explicit settings win over both
    sx = ScoreModelService(dist, sampler="sde", steps=7, guidance_scale=2.0,
                           buckets=(2,))
    assert (sx.sampler_name, sx.steps, sx.guidance_scale) == ("sde", 7, 2.0)


def test_sample_pads_trims_and_is_deterministic(ckpts):
    plain, _ = ckpts
    svc = ScoreModelService(plain, steps=2, buckets=(2, 4))
    x = svc.sample_conditions([0, 1, 2], thetas=[0.0, 0.1, 0.2], seed=7)
    assert x.shape == (3, 16, 16, 1) and x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    x2 = svc.sample_conditions([0, 1, 2], thetas=[0.0, 0.1, 0.2], seed=7)
    np.testing.assert_array_equal(x, x2)
    x3 = svc.sample_conditions([0, 1, 2], thetas=[0.0, 0.1, 0.2], seed=8)
    assert np.abs(x - x3).max() > 0
    # beyond the top bucket -> several top-bucket chunks, exact n back
    before = svc.stats["dispatches"]
    y = svc.sample_conditions([0] * 6, seed=1)
    assert y.shape == (6, 16, 16, 1)
    assert svc.stats["dispatches"] - before == 2


def test_quantized_serving(ckpts):
    """quantize="int8" serves any float checkpoint: same param tree, valid
    samples, close to the float path at few steps, and reported in stats."""
    plain, _ = ckpts
    svc_f = ScoreModelService(plain, steps=2, buckets=(2,))
    svc_q = ScoreModelService(plain, steps=2, buckets=(2,), quantize="int8")
    assert svc_q.stats["quantize"] == "int8"
    xf = svc_f.sample_conditions([0, 1], thetas=[0.0, 0.2], seed=3)
    xq = svc_q.sample_conditions([0, 1], thetas=[0.0, 0.2], seed=3)
    assert xq.shape == xf.shape
    assert 0.0 <= xq.min() and xq.max() <= 1.0
    # few-step trajectories stay close under ~1% per-conv quantization noise
    assert float(np.abs(xf - xq).mean()) < 0.1
    with pytest.raises(ValueError):
        ScoreModelService(plain, quantize="int4")


def test_uint8_output_serving(ckpts):
    """out_dtype="uint8" quantizes INSIDE the compiled program: the service
    returns uint8 [0,255] that is exactly the png_raw rounding of the f32
    service's samples (same seed), stats report it, and every encoder
    accepts the u8 array (png_raw bit-identical to the f32 path's png)."""
    import io

    from toycrystals_tpu.serve import grid_png_bytes, npy_bytes, raw_png_bytes

    plain, _ = ckpts
    svc_f = ScoreModelService(plain, steps=2, buckets=(2,))
    svc_u = ScoreModelService(plain, steps=2, buckets=(2,), out_dtype="uint8")
    assert svc_u.stats["out_dtype"] == "uint8"
    xf = svc_f.sample_conditions([0, 1], thetas=[0.0, 0.2], seed=3)
    xu = svc_u.sample_conditions([0, 1], thetas=[0.0, 0.2], seed=3)
    assert xu.dtype == np.uint8 and xu.shape == xf.shape
    want = np.clip(xf * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
    np.testing.assert_array_equal(xu, want)

    assert raw_png_bytes(xu) == raw_png_bytes(xf)
    back = np.load(io.BytesIO(npy_bytes(xu)))
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, xu)
    assert grid_png_bytes(xu)[:8] == b"\x89PNG\r\n\x1a\n"

    with pytest.raises(ValueError):
        ScoreModelService(plain, out_dtype="int16")


def test_bucket_ladder_mesh_rounding(ckpts):
    plain, _ = ckpts
    from toycrystals_tpu.parallel import make_mesh

    mesh = make_mesh(4)
    svc = ScoreModelService(plain, steps=2, buckets=(1, 2, 4, 8), mesh=mesh)
    assert svc.buckets == (4, 8)  # rounded up to the data-axis multiple
    x = svc.sample_conditions([0, 1, 2], seed=0)  # n=3 pads to bucket 4
    assert x.shape == (3, 16, 16, 1)


def test_weights_device_resident_and_no_eager_shaping(ckpts):
    """Serving-latency regression guards (benchmarks/NOTES.md):
    (1) checkpoint weights must be pinned on device at construction — host
    numpy params re-upload the full model on EVERY request over a tunnel;
    (2) request shaping must be pure host numpy — eager jnp ops serialize
    behind in-flight dispatches and collapse MicroBatcher coalescing."""
    plain, _ = ckpts
    svc = ScoreModelService(plain, steps=2, buckets=(2,))
    assert all(isinstance(leaf, jax.Array)
               for leaf in jax.tree.leaves(svc.params))
    y_cat, y_cont = svc.conditions([0, 1], thetas=0.2)
    assert isinstance(y_cat, np.ndarray) and isinstance(y_cont, np.ndarray)


def test_conditions_validation(ckpts):
    plain, _ = ckpts
    svc = ScoreModelService(plain, steps=2, buckets=(2,))
    y_cat, y_cont = svc.conditions([1, 2], thetas=0.3)  # scalar broadcasts
    assert y_cat.shape == (2,) and y_cont.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(y_cont[:, 1]), 0.3)
    with pytest.raises(ValueError, match="out of range"):
        svc.conditions([9])
    with pytest.raises(ValueError, match="broadcast"):
        svc.conditions([0, 1, 2], thetas=[0.0, 0.1])
    with pytest.raises(ValueError, match="empty request"):
        svc.conditions([])  # n=0 must 400 at validation, not 500 in the jit
    with pytest.raises(ValueError, match="seed"):
        svc.sample_conditions([0], seed=2**31)  # both paths share one range
    with pytest.raises(ValueError, match="seed"):
        svc.sample_conditions([0], seed=-1)


def test_microbatcher_coalesces_and_splits(ckpts):
    plain, _ = ckpts
    svc = ScoreModelService(plain, steps=2, buckets=(2, 4))
    mb = MicroBatcher(svc, window_ms=50)
    try:
        futs = [mb.submit([i % 4], thetas=[0.1 * i]) for i in range(5)]
        outs = [f.result(timeout=300) for f in futs]
        assert all(o.shape == (1, 16, 16, 1) for o in outs)
        assert mb.stats["coalesced_requests"] == 5
        assert mb.stats["batched_dispatches"] < 5  # some coalescing happened
        with pytest.raises(ValueError):  # validation is eager, pre-queue
            mb.submit([99])
    finally:
        mb.close()


def test_submit_after_close_raises(ckpts):
    plain, _ = ckpts
    svc = ScoreModelService(plain, steps=2, buckets=(2,))
    mb = MicroBatcher(svc, window_ms=1)
    mb.close()
    with pytest.raises(RuntimeError):  # no worker left: a Future would hang
        mb.submit([0])
    mb.close()  # idempotent


def test_stats_readable_while_dispatch_lock_held(ckpts):
    # GET /stats must never block behind an in-flight sampling dispatch,
    # which holds the service dispatch lock for the whole (possibly
    # minutes-long chunked) call — counters live under their own lock.
    plain, _ = ckpts
    svc = ScoreModelService(plain, steps=2, buckets=(2,))
    got = {}
    with svc._lock:  # simulate a dispatch in flight
        t = threading.Thread(target=lambda: got.update(svc.stats))
        t.start()
        t.join(timeout=10)
        assert not t.is_alive(), "stats blocked on the dispatch lock"
    assert got["requests"] == 0 and got["buckets"] == [2]


def test_grid_png_bytes(ckpts):
    plain, _ = ckpts
    svc = ScoreModelService(plain, steps=2, buckets=(2,))
    x = svc.sample_conditions([0, 1], seed=0)
    png = grid_png_bytes(x, title="t")
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_raw_png_and_npy_roundtrip():
    """raw_png_bytes: a valid grayscale PNG whose tiles decode back to the
    u8 quantisation of the input (no matplotlib resampling); npy_bytes:
    bit-exact float32 round-trip."""
    import io

    import matplotlib.pyplot as plt

    from toycrystals_tpu.serve import npy_bytes, raw_png_bytes

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(5, 8, 8, 1)).astype(np.float32)
    png = raw_png_bytes(x, pad=2)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    img = plt.imread(io.BytesIO(png))  # -> float in [0,1] (or u8 rgb)
    if img.ndim == 3:
        img = img[..., 0]
    # 5 tiles on a ceil(sqrt(5))=3-wide grid, 2px white padding
    assert img.shape == (2 * 10 + 2, 3 * 10 + 2)
    tile0 = img[2:10, 2:10]
    want = np.clip(x[0, ..., 0] * 255 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(
        (tile0 * 255 + 0.5).astype(np.uint8), want)
    # padding is white
    assert img[0].min() >= 0.99

    blob = npy_bytes(x)
    back = np.load(io.BytesIO(blob))
    np.testing.assert_array_equal(back, x)


@pytest.fixture(scope="module")
def server(ckpts):
    import serve_sde_score_model as ssm

    _, dist = ckpts
    svc = ScoreModelService(dist, buckets=(2, 4))
    srv = ssm.make_server(svc, port=0, window_ms=20)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    srv.shutdown()
    srv.batcher.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(url, obj):
    req = urllib.request.Request(url, data=json.dumps(obj).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_http_healthz_and_stats(server):
    code, ctype, body = _get(server + "/healthz")
    assert code == 200 and ctype == "application/json"
    obj = json.loads(body)
    assert obj["ok"] and obj["model"]["distilled"]
    code, _, body = _get(server + "/stats")
    assert code == 200 and "service" in json.loads(body)


def test_http_sample_json_and_png(server):
    code, ctype, body = _post(server + "/sample",
                              {"types": [0, 1], "thetas": [0.0, 0.2]})
    assert code == 200 and ctype == "application/json"
    obj = json.loads(body)
    assert obj["shape"] == [2, 16, 16, 1]
    assert np.asarray(obj["images"]).shape == (2, 16, 16)
    code, ctype, body = _post(server + "/sample",
                              {"types": [0], "format": "png", "seed": 3})
    assert code == 200 and ctype == "image/png" and body[:4] == b"\x89PNG"
    # query-string fallback on POST: ?format=png without a body "format" key
    code, ctype, body = _post(server + "/sample?format=png&seed=3",
                              {"types": [0]})
    assert code == 200 and ctype == "image/png" and body[:4] == b"\x89PNG"
    # the body still wins over the query string
    code, ctype, _ = _post(server + "/sample?format=png",
                           {"types": [0], "format": "json"})
    assert code == 200 and ctype == "application/json"
    # fast formats: direct-pixel png and raw npy
    code, ctype, body = _post(server + "/sample",
                              {"types": [0, 1], "format": "png_raw", "seed": 3})
    assert code == 200 and ctype == "image/png" and body[:4] == b"\x89PNG"
    code, ctype, body = _post(server + "/sample",
                              {"types": [0, 1], "format": "npy", "seed": 3})
    assert code == 200 and ctype == "application/octet-stream"
    import io as _io

    arr = np.load(_io.BytesIO(body))
    assert arr.shape == (2, 16, 16, 1) and arr.dtype == np.float32
    try:
        _post(server + "/sample", {"types": [0], "format": "bmp"})
        raise AssertionError("expected HTTP 400 for an unknown format")
    except urllib.error.HTTPError as e:
        assert e.code == 400 and "format" in json.loads(e.read())["error"]


def test_http_sample_get_query(server):
    code, ctype, body = _get(server + "/sample?type=1&theta=0.3&n=2&seed=5")
    assert code == 200
    assert json.loads(body)["shape"] == [2, 16, 16, 1]
    # same seed + layout -> identical bytes (reproducible direct path)
    _, _, body2 = _get(server + "/sample?type=1&theta=0.3&n=2&seed=5")
    assert body == body2


def test_http_sigterm_drains_clean(ckpts):
    """A SIGTERM'd serving process (pod scale-down) must drain and exit 0."""
    import os
    import signal as _signal
    import subprocess
    import time

    _, dist = ckpts
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    proc = subprocess.Popen(
        [sys.executable, "-u",
         str(Path(__file__).resolve().parent.parent
             / "scripts" / "serve_sde_score_model.py"),
         dist, "--device", "cpu", "--port", "0", "--steps", "2"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        url = None
        deadline = time.time() + 300
        while time.time() < deadline:
            line = proc.stdout.readline()
            if line.startswith("listening on "):
                url = line.split()[2]
                break
            if proc.poll() is not None:
                pytest.fail(f"server died early:\n{proc.stdout.read()}")
        assert url, "server never reported its address"
        code, _, _ = _get(url + "/healthz")
        assert code == 200
        proc.send_signal(_signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out
    assert "draining" in out and "serving stopped" in out, out


def test_http_errors(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/sample", {"thetas": [0.0]})
    assert e.value.code == 400 and "types" in e.value.read().decode()
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server + "/sample", {"types": [0], "format": "gif"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server + "/nope")
    assert e.value.code == 404


def test_s2d_stem_checkpoint_roundtrip(tmp_path):
    """A checkpoint whose config carries stem="s2d" (trainer --stem s2d)
    rebuilds the s2d architecture in every config-driven consumer: the
    service must apply the folded-stem model (param tree differs from
    stem="none" — out conv predicts 4 channels on the half grid) and return
    full-resolution samples."""
    u = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=8, emb_dim=16,
                     stem="s2d")
    params = u.init(K, jnp.zeros((2, 16, 16, 1)), jnp.zeros((2,)),
                    jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
    assert params["out"]["kernel"].shape[-1] == 4  # s2d head, not the 1-ch one
    state = create_train_state(params, optax.adam(1e-3), ema=True)
    path = tmp_path / "s2d.msgpack"
    save_checkpoint(path, {"epoch_next": 1, "state": state, "loss_hist": [0.1],
                           "config": dict(CFG, stem="s2d")})
    svc = ScoreModelService(str(path), steps=2, buckets=(2,))
    assert svc.model.stem == "s2d"
    x = svc.sample_conditions([1, 2], thetas=[0.1, 0.2], seed=0)
    assert x.shape == (2, 16, 16, 1) and np.isfinite(np.asarray(x)).all()
    # a stem=none service built from the same weights must refuse (shape
    # mismatch), proving the config byte actually drives the architecture
    bad = tmp_path / "bad.msgpack"
    save_checkpoint(bad, {"epoch_next": 1, "state": state, "loss_hist": [0.1],
                          "config": dict(CFG)})
    with pytest.raises(Exception):
        ScoreModelService(str(bad), steps=2,
                          buckets=(2,)).sample_conditions([0], seed=0)
