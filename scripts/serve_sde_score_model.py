"""Serve a trained score model over HTTP.

The reference's only sampling entry point is a batch CLI that pays model
construction + checkpoint load + XLA compile on every invocation
(`/root/reference/scripts/sample_sde_score_model.py:19-135`). This serves the
same checkpoints as a resident service (toycrystals_tpu/serve.py): weights
stay on device, one executable per batch bucket compiles once, and concurrent
requests are coalesced into shared dispatches by a MicroBatcher. With a
progressive-distilled student checkpoint the round trip is a handful of
single-pass U-Net evals — low-ms latency at >8k img/s on one chip.

Endpoints (JSON in, JSON or PNG out):
  GET  /healthz            liveness + model description
  GET  /stats              service + batcher counters
  POST /sample             {"types": [...], "thetas": [...],
                            "format": "json"|"png"|"png_raw"|"npy",
                            "seed": optional int}
                           png = matplotlib figure grid (committed-figure
                           convention); png_raw = direct-pixel grid, ms
                           instead of hundreds of ms; npy = raw array blob
                           for programmatic consumers (float32 [0,1], or
                           uint8 [0,255] under --out-dtype uint8)
  GET  /sample?type=0&theta=0.0&n=36&format=png      convenience form

Requests WITHOUT an explicit seed go through the MicroBatcher (coalesced,
i.i.d. across dispatches); an explicit "seed" bypasses batching and runs a
reproducible dispatch (ScoreModelService.sample semantics).

Example:
  python scripts/serve_sde_score_model.py runs/.../distilled_4step.msgpack \
      --port 8700 --warmup
  curl -s localhost:8700/sample -d '{"types":[0,1,2,3],"format":"png"}' > grid.png
"""

from __future__ import annotations

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from _common import add_shard_flag, select_device, setup_mesh


def _parse_request(handler) -> dict:
    """Pull a sample-request dict from a POST body or GET query string."""
    if handler.command == "POST":
        n = int(handler.headers.get("Content-Length") or 0)
        raw = handler.rfile.read(n) if n else b"{}"
        try:
            req = json.loads(raw or b"{}")
        except json.JSONDecodeError as e:
            raise ValueError(f"bad JSON body: {e}") from e
        if not isinstance(req, dict):
            raise ValueError("body must be a JSON object")
        # query-string params ("POST /sample?format=png") act as fallbacks
        # under the body — otherwise they'd be silently ignored
        q = parse_qs(urlparse(handler.path).query)
        if "format" in q:
            req.setdefault("format", q["format"][0])
        if "seed" in q:
            req.setdefault("seed", int(q["seed"][0]))
        return req
    q = parse_qs(urlparse(handler.path).query)
    req: dict = {}
    n = int(q["n"][0]) if "n" in q else 1
    if "type" in q:
        t = [int(v) for v in q["type"][0].split(",")]
        req["types"] = t * n if len(t) == 1 else t
    else:
        req["types"] = [0] * n
    if "theta" in q:
        th = [float(v) for v in q["theta"][0].split(",")]
        req["thetas"] = th * n if len(th) == 1 else th
    if "seed" in q:
        req["seed"] = int(q["seed"][0])
    if "format" in q:
        req["format"] = q["format"][0]
    return req


def make_handler(service, batcher):
    """Build the request-handler class closed over the service + batcher."""

    class Handler(BaseHTTPRequestHandler):
        # served from threads; keep the default per-request logging quiet
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler contract
            path = urlparse(self.path).path
            if path == "/healthz":
                self._send_json(200, {"ok": True, "model": service.describe()})
            elif path == "/stats":
                self._send_json(200, {"service": service.stats,
                                      "batcher": batcher.stats})
            elif path == "/sample":
                self._sample()
            else:
                self._send_json(404, {"error": f"no route {path}"})

        def do_POST(self):  # noqa: N802
            if urlparse(self.path).path == "/sample":
                self._sample()
            else:
                self._send_json(404, {"error": f"no route {self.path}"})

        def _sample(self) -> None:
            try:
                req = _parse_request(self)
                types = req.get("types")
                if types is None:
                    raise ValueError('"types" is required (list of lattice-type ints)')
                thetas = req.get("thetas")
                fmt = str(req.get("format", "json"))
                if fmt not in ("json", "png", "png_raw", "npy"):
                    raise ValueError(
                        f'format must be json|png|png_raw|npy, got "{fmt}"')
                if "seed" in req:  # reproducible path: one dedicated dispatch
                    x = service.sample_conditions(
                        types, thetas, seed=int(req["seed"]))
                else:  # serving path: coalesce with concurrent callers
                    x = batcher.submit(types, thetas).result()
            except ValueError as e:
                self._send_json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — report, don't kill the thread
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                # serialization failures (huge PNG grids / .tolist JSON) must
                # answer like every other error, not reset the connection
                if fmt == "png":
                    from toycrystals_tpu.serve import grid_png_bytes

                    body, ctype = grid_png_bytes(x), "image/png"
                elif fmt == "png_raw":
                    # direct-pixel grid, no matplotlib in the hot path — ms
                    # instead of hundreds of ms for a 36-tile grid
                    from toycrystals_tpu.serve import raw_png_bytes

                    body, ctype = raw_png_bytes(x), "image/png"
                elif fmt == "npy":
                    from toycrystals_tpu.serve import npy_bytes

                    body, ctype = npy_bytes(x), "application/octet-stream"
                else:
                    body = json.dumps({"shape": list(x.shape),
                                       "images": x[..., 0].tolist()}).encode()
                    ctype = "application/json"
            except Exception as e:  # noqa: BLE001
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send(200, body, ctype)

    return Handler


def make_server(service, host: str = "127.0.0.1", port: int = 0,
                window_ms: float = 5.0):
    """ThreadingHTTPServer wired to the service; port 0 picks a free port.

    The returned server carries `.batcher` — call `server.batcher.close()`
    after `shutdown()`.
    """
    from toycrystals_tpu.serve import MicroBatcher

    batcher = MicroBatcher(service, window_ms=window_ms)
    srv = ThreadingHTTPServer((host, port), make_handler(service, batcher))
    # drain contract: handler threads must be JOINED at server_close() —
    # stdlib default daemon_threads=True would let interpreter exit kill a
    # thread mid-dispatch/mid-write after "graceful" shutdown
    srv.daemon_threads = False
    srv.batcher = batcher
    return srv


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("ckpt", help="score-model checkpoint (.msgpack or reference .pt)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--device", default="auto", choices=["auto", "tpu", "cpu"])
    p.add_argument("--sampler", default=None,
                   choices=["ode", "sde", "dpm", "ddim", "rf"],
                   help="default: ddim for distilled ckpts, rf for --param fm "
                        "ckpts, else sde")
    p.add_argument("--steps", type=int, default=None,
                   help="default: the student's trained step count, else 300")
    p.add_argument("--guidance-scale", type=float, default=None,
                   help="default: 0 for distilled (guidance baked in), else 1.5")
    p.add_argument("--t-end", type=float, default=None)
    p.add_argument("--clip-x0", action="store_true")
    p.add_argument("--dtype", default="auto", choices=["auto", "float32", "bfloat16"])
    p.add_argument("--attn-impl", default="auto", choices=["auto", "xla", "flash"])
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8: dynamic-quantized convs on the MXU's 2x-rate "
                        "int8 path (post-training; any float ckpt serves)")
    p.add_argument("--out-dtype", default="float32",
                   choices=["float32", "uint8"],
                   help="uint8: quantize samples to u8 INSIDE the compiled "
                        "program (png_raw-identical rounding) — 4x smaller "
                        "device pulls and npy/json bodies; npy consumers "
                        "get uint8 [0,255] back (divide by 255)")
    p.add_argument("--no-ema", action="store_true", help="serve raw params")
    p.add_argument("--buckets", default="1,4,16,64",
                   help="compiled batch-shape ladder (comma-separated)")
    p.add_argument("--window-ms", type=float, default=5.0,
                   help="micro-batching coalesce window")
    p.add_argument("--warmup", action="store_true",
                   help="compile every bucket before accepting traffic")
    add_shard_flag(p, space=True, train=False)
    args = p.parse_args(argv)

    select_device(args.device)
    mesh = setup_mesh(args.shard, shard_space=args.shard_space,
                      shard_model=args.shard_model)

    from toycrystals_tpu.serve import ScoreModelService

    service = ScoreModelService(
        args.ckpt, use_ema=not args.no_ema, sampler=args.sampler,
        steps=args.steps, guidance_scale=args.guidance_scale,
        t_end=args.t_end, clip_x0=args.clip_x0, dtype=args.dtype,
        attn_impl=args.attn_impl, quantize=args.quantize,
        out_dtype=args.out_dtype,
        buckets=[int(b) for b in args.buckets.split(",")], mesh=mesh)
    print(f"model: {service.describe()}")
    print(f"serving: sampler={service.sampler_name} steps={service.steps} "
          f"cfg={service.guidance_scale} buckets={list(service.buckets)}")
    if args.warmup:
        print(f"warmup: compiling buckets {list(service.buckets)} ...")
        service.warmup()

    srv = make_server(service, args.host, args.port, window_ms=args.window_ms)
    print(f"listening on http://{srv.server_address[0]}:{srv.server_address[1]}"
          f"  (POST /sample, GET /healthz, GET /stats)")

    # Graceful drain on SIGTERM (pod scale-down/preemption): stop accepting,
    # finish in-flight dispatches, exit 0. shutdown() must run off the main
    # thread — it blocks until serve_forever (running HERE) returns.
    import os
    import signal
    import threading

    def _drain(signum, frame):
        # os.write, not print(): the handler may interrupt the main thread
        # mid-print and a buffered-writer re-entry would raise instead of
        # draining (same hazard utils/preempt.py documents)
        os.write(2, (f"\n{signal.Signals(signum).name} received — draining "
                     "and shutting down\n").encode())
        threading.Thread(target=srv.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        # join handler threads (daemon_threads=False) BEFORE closing the
        # batcher: handlers blocked on Future.result() resolve as the still-
        # running batcher worker dispatches them; only then drain the worker
        srv.server_close()
        srv.batcher.close()
    print("serving stopped (in-flight requests completed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
