"""Serving runtime for trained score-model checkpoints.

The reference has no serving story: every batch of samples re-runs the
sampler CLI end to end, re-loading weights and re-building the model per
invocation (`/root/reference/scripts/sample_sde_score_model.py:19-135`).
The TPU-native shape of "serve this model" is a *resident service*:

- **Load once.** Checkpoint (ours or a reference ``.pt``) is read once and
  the params stay device-resident.
- **Compile once per shape.** XLA specialises one executable per static
  batch shape, so the service pins a small ladder of batch *buckets*
  (default 1/4/16/64) and pads every request up to the nearest bucket,
  trimming after the dispatch — zero recompiles in steady state.
- **Coalesce concurrent callers.** :class:`MicroBatcher` queues requests
  for a few milliseconds and fuses them into one dispatch, the standard
  dynamic-batching recipe for static-shape accelerators.

With a progressive-distilled student (``scripts/distill_sde_score_model.py``)
the per-dispatch cost is 1-16 single-pass U-Net evals, i.e. low-ms latency
and >8k img/s *compiled-dispatch* throughput on one v5e chip (``bench.py``
distilled fields). End-to-end HTTP throughput is host/link-bound on top of
that: `benchmarks/run.py --only serving_sustained` measures it under
sustained concurrent load, with the attribution (bucket ladder exonerated;
this dev box's 1 vCPU + 20 MB/s tunneled D2H are the caps) in
``benchmarks/NOTES.md`` "Sustained serving under load".

``scripts/serve_sde_score_model.py`` exposes this over HTTP.
"""

from __future__ import annotations

import math
import queue
import threading
from concurrent.futures import Future
from typing import Any, Sequence

import numpy as np

DEFAULT_BUCKETS = (1, 4, 16, 64)

# The reference's committed sampling settings (README + figure grids:
# `/root/reference/scripts/sample_sde_score_model.py` usage) — the serving
# defaults for a non-distilled checkpoint.
_REFERENCE_SERVE = {"sampler": "sde", "steps": 300,
                    "guidance_scale": 1.5, "t_end": 0.005}


def load_score_payload(ckpt_path: str) -> dict[str, Any]:
    """Read a score-model checkpoint: our msgpack, a `--ckpt-format orbax`
    step-managed directory, or a reference ``.pt`` (utils/checkpoint.py)."""
    from toycrystals_tpu.utils import load_score_payload as _load

    return _load(ckpt_path)


class ScoreModelService:
    """Checkpoint-resident sampling service with fixed compiled batch buckets.

    Parameters left ``None`` resolve from the checkpoint: a distilled student
    serves with the DDIM sampler at its trained step count / t_end with its
    baked-in guidance; any other checkpoint serves the reference's committed
    settings (reverse-SDE, 300 steps, CFG 1.5, t_end 0.005).

    ``buckets`` are clamped to the tunnel-safe per-dispatch cap
    (``auto_chunk``) and, under a mesh, rounded up to the data-axis size so
    every dispatch shards cleanly. Requests larger than the top bucket are
    served in top-bucket chunks (``sample_chunked`` pad-and-trim semantics).
    """

    def __init__(
        self,
        ckpt_path: str,
        *,
        use_ema: bool = True,
        sampler: str | None = None,
        steps: int | None = None,
        guidance_scale: float | None = None,
        t_end: float | None = None,
        clip_x0: bool = False,
        dtype: str = "auto",
        attn_impl: str = "auto",
        quantize: str = "none",
        out_dtype: str = "float32",
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        mesh=None,
    ):
        import jax.numpy as jnp

        from toycrystals_tpu.models import (
            CondUNetTiny,
            VPSDE,
            auto_chunk,
            eps_apply_from_v,
            sample_ddim,
            sample_dpmpp_2m,
            sample_probability_flow_ode,
            sample_rectified_flow,
            sample_reverse_sde_euler_maruyama,
        )

        payload = load_score_payload(ckpt_path)
        cfg = payload.get("config")
        if not cfg:
            raise ValueError(
                f"{ckpt_path} has no embedded config; serving needs a "
                "self-describing checkpoint (any trainer/distill output, or "
                "a reference .pt)")
        self.ckpt_path = str(ckpt_path)
        self.config = dict(cfg)

        state = payload["state"]
        params = state["params"]
        if use_ema and state.get("ema_params") is not None:
            params = state["ema_params"]

        # --- serving settings: explicit > checkpoint (distilled/fm) > reference
        distilled = bool(cfg.get("distilled"))
        flow = str(cfg.get("param", "eps")) == "fm"
        if sampler is None:
            sampler = ("ddim" if distilled else
                       "rf" if flow else _REFERENCE_SERVE["sampler"])
        if flow and sampler != "rf":
            raise ValueError(
                f"sampler {sampler!r} expects a VP eps/v model; {ckpt_path} "
                "was trained with --param fm (rectified flow) — serve with "
                "sampler='rf'")
        if not flow and sampler == "rf":
            raise ValueError(
                "sampler 'rf' integrates a rectified-flow velocity field; "
                f"{ckpt_path} was trained with --param "
                f"{cfg.get('param', 'eps')}")
        if steps is None:
            steps = (int(cfg["distill_steps"]) if distilled else
                     50 if flow else _REFERENCE_SERVE["steps"])
        if t_end is None:
            t_end = float(cfg["distill_t_end"]) if distilled else _REFERENCE_SERVE["t_end"]
        if guidance_scale is None:
            # distilled students bake their guidance in; extra CFG on top
            # distorts the trained map
            guidance_scale = 0.0 if distilled else _REFERENCE_SERVE["guidance_scale"]
        self.sampler_name = str(sampler)
        self.steps = int(steps)
        self.guidance_scale = float(guidance_scale)
        self.t_end = float(t_end)
        self.clip_x0 = bool(clip_x0)

        dtype_name = str(cfg.get("dtype", "float32")) if dtype == "auto" else dtype
        if quantize not in ("none", "int8"):
            raise ValueError(f"quantize must be 'none' or 'int8', got {quantize!r}")
        self.quantize = str(quantize)
        self.model = CondUNetTiny(
            n_types=int(cfg["n_types"]), y_cont_dim=int(cfg["y_cont_dim"]),
            base_ch=int(cfg["base_ch"]), emb_dim=int(cfg["emb_dim"]),
            cond_ch=int(cfg["cond_ch"]), time_ch=int(cfg["time_ch"]),
            dtype=jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32,
            conv_impl="int8" if quantize == "int8" else "pad",
            attn_impl=attn_impl, stem=str(cfg.get("stem", "none")),
        )
        self.sde = VPSDE(
            beta_min=float(cfg.get("beta_min", 0.1)),
            beta_max=float(cfg.get("beta_max", 30.0)),
            logsnr_shift=float(cfg.get("logsnr_shift", 0.0)),
        )
        # Checkpoints restore as HOST numpy pytrees; pin the weights on device
        # ONCE here. Passing numpy params into the per-request dispatch would
        # re-upload the full model every call — measured ~300 ms/request over
        # the tunnel, the entire serving-latency floor (benchmarks/NOTES.md).
        import jax

        if mesh is not None:
            from toycrystals_tpu.parallel import shard_params

            params = shard_params(mesh, params)
        else:
            params = jax.device_put(params)
        self.params = params
        self.img_size = int(cfg.get("img_size", 64))
        self.n_types = int(cfg["n_types"])
        self.y_cont_dim = int(cfg["y_cont_dim"])
        self.mesh = mesh

        model = self.model
        apply_fn = lambda prm, xt, t, yc, yv: model.apply(  # noqa: E731
            {"params": prm}, xt, t, yc, yv)
        self._extra_kw: dict[str, Any] = {}
        if self.sampler_name == "ddim":
            # ddim consumes the raw net output; the v path is the only
            # well-conditioned route at the t=1 evals a few-step student makes
            self._extra_kw["prediction"] = str(cfg.get("param", "eps"))
        elif self.sampler_name == "rf":
            # fm checkpoints sample on the shifted grid they trained for
            if float(cfg.get("fm_shift", 1.0)) != 1.0:
                self._extra_kw["t_shift"] = float(cfg["fm_shift"])
        elif str(cfg.get("param", "eps")) == "v":
            apply_fn = eps_apply_from_v(self.sde, apply_fn)
        self._apply_fn = apply_fn
        self._sampler_fn = {
            "ode": sample_probability_flow_ode,
            "sde": sample_reverse_sde_euler_maruyama,
            "dpm": sample_dpmpp_2m,
            "ddim": sample_ddim,
            "rf": sample_rectified_flow,
        }[self.sampler_name]

        if out_dtype not in ("float32", "uint8"):
            raise ValueError(
                f"out_dtype must be 'float32' or 'uint8', got {out_dtype!r}")
        self.out_dtype = str(out_dtype)
        if out_dtype == "uint8":
            # Quantize INSIDE the compiled program: the D2H pull (and any
            # image-format HTTP body) shrinks 4x — on the tunneled link the
            # f32 pull is the measured end-to-end cap for image-returning
            # paths (benchmarks/NOTES.md "Sustained serving under load":
            # 4.2 MB/dispatch at the 1024 bucket bounds ~1,200 img/s; u8
            # lifts the link ceiling ~4x). Same rounding as the png_raw
            # encoder, which is already the scoring-proven lossless path.
            inner = self._sampler_fn

            def _quantized(apply_fn, params, sde, yc, yv, shape, key, **kw):
                x = inner(apply_fn, params, sde, yc, yv, shape, key, **kw)
                return jnp.clip(x * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)

            self._sampler_fn = _quantized

        cap = auto_chunk(self.img_size, self.steps, self.sampler_name)
        mult = int(dict(mesh.shape).get("data", mesh.devices.size)) if mesh is not None else 1
        ladder = sorted({max(1, min(int(b), cap)) for b in buckets})
        self.buckets = tuple(sorted({-(-b // mult) * mult for b in ladder}))

        self._lock = threading.Lock()  # one dispatch at a time per chip
        # counters get their own lock: the dispatch lock is held for the
        # whole sampling call (minutes for a chunked 300-step request) and
        # a monitoring GET /stats must never block on it
        self._stats_lock = threading.Lock()
        self._stats = {"requests": 0, "images": 0, "dispatches": 0}
        self._exec_cache: dict[int, Any] = {}

    # --- introspection -----------------------------------------------------
    @property
    def stats(self) -> dict[str, Any]:
        with self._stats_lock:
            s = dict(self._stats)
        s.update(buckets=list(self.buckets), sampler=self.sampler_name,
                 steps=self.steps, guidance_scale=self.guidance_scale,
                 t_end=self.t_end, img_size=self.img_size,
                 distilled=bool(self.config.get("distilled")),
                 quantize=self.quantize, out_dtype=self.out_dtype,
                 ckpt=self.ckpt_path)
        return s

    def describe(self) -> dict[str, Any]:
        keep = ("n_types", "y_cont_dim", "base_ch", "emb_dim", "param",
                "dtype", "img_size", "distilled", "distill_steps")
        return {k: self.config[k] for k in keep if k in self.config}

    # --- request shaping ---------------------------------------------------
    def _pick_bucket(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        return self.buckets[-1]

    def conditions(self, types, thetas=None):
        """Build (y_cat, y_cont) rows from lattice types + rotation angles.

        Scalars broadcast; theta lands at index 1 of y_cont, the
        ConditionEmbedding contract (models/sde_score_model.py).

        Pure numpy on purpose: on a tunneled TPU every eager device op costs
        a dispatch round-trip (~25 ms warm) and a *blocking* one serializes
        callers behind whatever dispatch is in flight — which is exactly when
        MicroBatcher.submit runs. Request shaping must never touch the
        device (measured: jnp here put ~0.5 s on every request and reduced
        the batcher to one request per dispatch; benchmarks/NOTES.md)."""
        y_cat = np.atleast_1d(np.asarray(types, np.int32))
        if thetas is None:
            thetas = np.zeros((y_cat.shape[0],), np.float32)
        th = np.atleast_1d(np.asarray(thetas, np.float32))
        n = max(y_cat.shape[0], th.shape[0])
        if y_cat.shape[0] == 1:
            y_cat = np.repeat(y_cat, n, axis=0)
        if th.shape[0] == 1:
            th = np.repeat(th, n, axis=0)
        if y_cat.shape[0] != th.shape[0]:
            raise ValueError(f"types ({y_cat.shape[0]}) and thetas "
                             f"({th.shape[0]}) do not broadcast")
        if n == 0:
            raise ValueError("empty request: need at least one lattice type")
        if int(y_cat.max()) >= self.n_types or int(y_cat.min()) < 0:
            raise ValueError(f"lattice type out of range [0, {self.n_types})")
        y_cont = np.zeros((n, self.y_cont_dim), np.float32)
        y_cont[:, 1] = th
        return y_cat, y_cont

    # --- sampling ----------------------------------------------------------
    def _bucket_executable(self, bucket: int):
        """One jitted executor per bucket with ZERO eager device ops around it.

        On a tunneled TPU every eager dispatch is a blocking round-trip, so
        key construction moves *inside* the jit (the seed rides in as a
        scalar argument with the dispatch) and padding stays host-side numpy.
        A batch-1 request is then exactly one compiled dispatch plus one
        result pull: with the weights device-pinned (see __init__), p50
        latency is ~42 ms vs a ~31 ms raw dispatch
        (benchmarks/results.json "serving")."""
        fn = self._exec_cache.get(bucket)
        if fn is None:
            import jax

            fn = self._exec_cache[bucket] = jax.jit(self.sampler_callable(bucket))
        return fn

    def sampler_callable(self, batch: int):
        """The pure per-shape sampling function the service compiles:
        ``run(params, y_cat[batch], y_cont[batch,D], seed[]) -> [batch,H,W,1]``
        with the service's resolved sampler/steps/CFG/t_end baked in and the
        PRNG key built *inside* (the seed rides with the dispatch — see
        `_bucket_executable`). Also the export surface: `toycrystals_tpu.export`
        serialises exactly this function (params baked) via jax.export."""
        import jax

        sampler_fn, apply_fn, sde = self._sampler_fn, self._apply_fn, self.sde
        shape = (batch, self.img_size, self.img_size, 1)
        kw = dict(n_steps=self.steps, guidance_scale=self.guidance_scale,
                  t_end=self.t_end, n_types=self.n_types,
                  clip_x0=self.clip_x0, **self._extra_kw)

        def run(params, yc, yv, seed):
            return sampler_fn(apply_fn, params, sde, yc, yv, shape,
                              jax.random.key(seed), **kw)

        return run

    def sample(self, y_cat, y_cont, *, seed: int = 0) -> np.ndarray:
        """Sample one image per condition row; returns (n, H, W, 1) —
        float32 in [0,1], or uint8 in [0,255] when the service was built
        with ``out_dtype="uint8"`` (quantized on device; divide by 255).

        The request is padded to the nearest bucket (trimmed after); requests
        beyond the top bucket run in top-bucket chunks. Deterministic given
        (checkpoint, settings, seed, batch layout)."""
        seed = int(seed)
        if not 0 <= seed < 2**31:
            # one validated range for BOTH paths: silently truncating (or
            # letting jax.random.key canonicalize differently on the chunked
            # path) would make distinct seeds collide on a "reproducible" API
            raise ValueError(f"seed must satisfy 0 <= seed < 2**31, got {seed}")
        n = int(y_cat.shape[0])
        bucket = self._pick_bucket(n)
        if self.mesh is None and n <= self.buckets[-1]:
            # fast path: host-side pad, single dispatch, single pull
            pad = bucket - n
            yc = np.asarray(y_cat, np.int32)
            yv = np.asarray(y_cont, np.float32)
            if pad:
                yc = np.concatenate([yc, np.repeat(yc[-1:], pad, axis=0)])
                yv = np.concatenate([yv, np.repeat(yv[-1:], pad, axis=0)])
            with self._lock:
                x = self._bucket_executable(bucket)(
                    self.params, yc, yv, np.uint32(seed))
            self._count(n, 1)
            x = np.asarray(x)
            if x.dtype != np.uint8:  # bf16-model outputs still serve as f32
                x = x.astype(np.float32, copy=False)
            return x[:n]

        import jax

        from toycrystals_tpu.models import sample_chunked

        sp_kw = {}
        if self.mesh is not None and "space" in self.mesh.axis_names:
            from toycrystals_tpu.parallel import image_sharding

            sp_kw["sharding"] = image_sharding(self.mesh)
        with self._lock:
            x = sample_chunked(
                self._sampler_fn, self._apply_fn, self.params, self.sde,
                y_cat, y_cont, (n, self.img_size, self.img_size, 1),
                jax.random.key(seed), chunk=bucket, mesh=self.mesh,
                n_steps=self.steps, guidance_scale=self.guidance_scale,
                t_end=self.t_end, n_types=self.n_types, clip_x0=self.clip_x0,
                **sp_kw, **self._extra_kw,
            )
        self._count(n, -(-n // bucket))
        x = np.asarray(x)
        if x.dtype != np.uint8:
            x = x.astype(np.float32, copy=False)
        return x

    def _count(self, images: int, dispatches: int) -> None:
        with self._stats_lock:
            self._stats["requests"] += 1
            self._stats["images"] += images
            self._stats["dispatches"] += dispatches

    def sample_conditions(self, types, thetas=None, *, seed: int = 0) -> np.ndarray:
        y_cat, y_cont = self.conditions(types, thetas)
        return self.sample(y_cat, y_cont, seed=seed)

    def warmup(self) -> None:
        """Compile every bucket executable up front (first request stays ms)."""
        for b in self.buckets:
            self.sample_conditions([0] * b, seed=0)


class MicroBatcher:
    """Dynamic batching: coalesce concurrent requests into shared dispatches.

    Requests submitted within ``window_ms`` of each other (up to the
    service's top bucket) are stacked into ONE sampler dispatch and the
    results are split back per caller — the standard serving recipe for
    static-shape accelerators. Each dispatch folds a running counter into
    the service seed, so results are i.i.d. across dispatches but NOT
    bitwise-reproducible across different coalescing layouts (documented
    serving semantics; use :meth:`ScoreModelService.sample` directly for
    reproducibility)."""

    def __init__(self, service: ScoreModelService, *, window_ms: float = 5.0,
                 max_batch: int | None = None, base_seed: int = 0):
        self.service = service
        self.window_s = float(window_ms) / 1e3
        self.max_batch = int(max_batch or service.buckets[-1])
        self._q: queue.Queue = queue.Queue()
        self._dispatches = 0
        self._coalesced = 0
        self._base_seed = int(base_seed)
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, types, thetas=None) -> Future:
        """Enqueue a request; the Future resolves to (n, H, W, 1) float32."""
        if self._closed:
            # after close() no worker will ever drain the queue — a silently
            # enqueued Future would hang its caller's .result() forever
            raise RuntimeError("MicroBatcher is closed")
        y_cat, y_cont = self.service.conditions(types, thetas)  # validate now
        fut: Future = Future()
        self._q.put((np.asarray(y_cat), np.asarray(y_cont), fut))
        return fut

    def close(self, timeout: float | None = None) -> None:
        """Drain the queue and stop the worker; later submits raise.

        Blocks until every already-submitted request has been dispatched and
        its Future resolved (the drain contract callers rely on at shutdown);
        pass a timeout only when abandoning in-flight work is acceptable."""
        if not self._closed:
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=timeout)

    @property
    def stats(self) -> dict[str, Any]:
        return {"batched_dispatches": self._dispatches,
                "coalesced_requests": self._coalesced,
                "window_ms": self.window_s * 1e3, "max_batch": self.max_batch}

    def _run(self) -> None:
        import time

        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            rows = item[0].shape[0]
            deadline = time.monotonic() + self.window_s
            while rows < self.max_batch:
                try:
                    nxt = self._q.get(timeout=max(0.0, deadline - time.monotonic()))
                except queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(batch)
                    return
                batch.append(nxt)
                rows += nxt[0].shape[0]
            self._dispatch(batch)

    def _dispatch(self, batch) -> None:
        self._dispatches += 1
        self._coalesced += len(batch)
        seed = self._base_seed + self._dispatches
        try:
            # host-side concat: no device op may run before the lock is held
            # (see ScoreModelService.conditions)
            y_cat = np.concatenate([b[0] for b in batch], axis=0)
            y_cont = np.concatenate([b[1] for b in batch], axis=0)
            x = self.service.sample(y_cat, y_cont, seed=seed)
        except Exception as e:  # noqa: BLE001 — fan the failure out to callers
            for _, _, fut in batch:
                fut.set_exception(e)
            return
        i = 0
        for yc, _, fut in batch:
            n = yc.shape[0]
            fut.set_result(x[i:i + n])
            i += n


def grid_png_bytes(x: np.ndarray, title: str | None = None) -> bytes:
    """Render samples as a square grid PNG (the committed figure convention)."""
    import io

    from toycrystals_tpu.utils.figures import save_image_grid

    x = np.asarray(x)
    if x.dtype == np.uint8:  # device-quantized service output
        x = x.astype(np.float32) / 255.0
    side = int(math.ceil(math.sqrt(x.shape[0])))
    buf = io.BytesIO()
    save_image_grid(x, buf, nrows=side, ncols=side, suptitle=title)
    return buf.getvalue()


def raw_png_bytes(x: np.ndarray, ncols: int | None = None, pad: int = 2,
                  pad_value: float = 1.0) -> bytes:
    """Tile samples into ONE grayscale 8-bit PNG with no figure machinery.

    The serving-latency image path: `grid_png_bytes` goes through a
    matplotlib figure (axes layout, anti-aliased resampling, Agg render —
    hundreds of ms for a 36-tile grid, comparable to the whole distilled
    sampling dispatch it wraps). This writes the pixels directly — tile
    the batch on a white canvas, quantise to u8, emit IHDR/IDAT/IEND with
    stdlib zlib — a few ms, no matplotlib import in the hot path, and the
    tiles are bit-exact quantisations of the samples (no resampling), so
    the output is also the better input for downstream scoring
    (`utils/fidelity.py` recovers tiles losslessly from it)."""
    import struct
    import zlib

    x = np.asarray(x)
    u8_in = x.dtype == np.uint8
    if not u8_in:
        x = np.asarray(x, np.float32)
    if x.ndim == 4:
        x = x[..., 0]
    if x.ndim == 2:
        x = x[None]
    n, h, w = x.shape
    nc = int(ncols) if ncols else int(math.ceil(math.sqrt(n)))
    nr = -(-n // nc)
    canvas = np.full((nr * (h + pad) + pad, nc * (w + pad) + pad),
                     np.uint8(round(pad_value * 255.0)) if u8_in else pad_value,
                     np.uint8 if u8_in else np.float32)
    for i in range(n):
        r, c = divmod(i, nc)
        canvas[pad + r * (h + pad):pad + r * (h + pad) + h,
               pad + c * (w + pad):pad + c * (w + pad) + w] = x[i]
    # a uint8 input (out_dtype="uint8" service) used the SAME rounding on
    # device, so the pixels pass through untouched — bit-identical png to
    # the f32 path's
    u8 = canvas if u8_in else np.clip(
        canvas * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
    hh, ww = u8.shape
    # one filter byte (0 = None) per scanline, then the row
    scan = np.concatenate([np.zeros((hh, 1), np.uint8), u8], axis=1).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", ww, hh, 8, 0, 0, 0, 0)  # 8-bit grayscale
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scan, 6)) + chunk(b"IEND", b""))


def npy_bytes(x: np.ndarray) -> bytes:
    """Samples as a raw ``.npy`` blob — the zero-parse path for programmatic
    consumers (`np.load(io.BytesIO(body))` gives the (n, H, W, 1) array back
    bit-exact; the JSON format decimal-prints every pixel). A float32
    service serves float32 in [0,1]; an ``out_dtype="uint8"`` service
    serves uint8 in [0,255] (divide by 255) — 4x fewer bytes end to end."""
    import io

    x = np.asarray(x)
    if x.dtype != np.uint8:
        x = np.asarray(x, np.float32)
    buf = io.BytesIO()
    np.save(buf, x)
    return buf.getvalue()
