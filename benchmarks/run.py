#!/usr/bin/env python3
"""Full benchmark harness: fills the reference's empty perf table (BASELINE.md).

Measures, on the current backend:
  - sde_sampling:  64x64 samples/sec/chip, 300-step reverse-SDE + CFG 1.5 (the
    north-star metric; also reported by /root/repo/bench.py for the driver)
  - ode_sampling:  probability-flow ODE Heun, 300 steps + CFG
  - vae_train:     images/sec, conditional VAE batch 128 (secondary metric)
  - sde_train:     images/sec, U-Net eps-loss train step batch 128
  - datagen:       on-device procedural dataset images/sec (Pallas/XLA raster)
  - ddim_prior:    latent DDIM-50 z/sec through the FiLM prior (width 1024)
  - (--stretch)    datagen_256, sde_sampling_256, sde_train_256, and the
    sharded / spatially-sharded configs when >1 device is visible

Writes JSON to benchmarks/results.json and prints the table.
All timings force completion via jax.device_get (block_until_ready does not
reliably block on tunneled-TPU platforms).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def save_distilled_serve_ckpt(path: str, uparams) -> None:
    """Write the synthetic 4-step distilled-student checkpoint that BOTH
    serving sections (latency + sustained) serve — one definition so the
    two benchmarks always measure the same model config."""
    import optax

    from toycrystals_tpu.train import create_train_state
    from toycrystals_tpu.utils import save_checkpoint

    cfg = {"img_ch": 1, "img_size": 64, "n_types": 4, "y_cont_dim": 4,
           "base_ch": 96, "emb_dim": 128, "cond_ch": 8, "time_ch": 8,
           "beta_min": 0.1, "beta_max": 30.0, "logsnr_shift": 0.0,
           "t_power": 1.0, "p_uncond": 0.1, "dtype": "bfloat16",
           "param": "v", "distilled": True, "distill_steps": 4,
           "distill_t_end": 0.005, "distill_cfg": 1.5}
    save_checkpoint(path, {"epoch_next": 0, "loss_hist": [],
                           "state": create_train_state(uparams, optax.adam(1e-4)),
                           "config": cfg})


def timeit(fn, *args, repeats=3):
    """min wall seconds per call of fn, forcing completion each call.

    The result is reduced to ONE scalar on device before jax.device_get: on a
    tunneled TPU, pulling a full result array back to the host costs far more
    than the compute being measured (e.g. a 33 MB datagen batch ~1.3 s over
    the link), and block_until_ready does not reliably block there. The sum
    depends on every element, so completion is still forced.
    """
    import jax
    import jax.numpy as jnp

    reduce_all = jax.jit(lambda t: jax.tree.reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))), t, jnp.float32(0)))

    jax.device_get(reduce_all(fn(*args)))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(reduce_all(fn(*args)))
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default=str(REPO / "benchmarks/results.json"))
    p.add_argument("--sample-batch", type=int, default=256)
    p.add_argument("--train-batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--stretch", action="store_true",
                   help="also run the BASELINE.md stretch configs: 256x256 "
                        "lattices + 256x256 score-model sampling, and (when "
                        ">1 device is visible) the sharded large-batch run")
    p.add_argument("--sharded-batch", type=int, default=4096,
                   help="batch for the sharded stretch run (v5e-8 config)")
    p.add_argument("--only", type=str, default="",
                   help="comma list of sections to run (default all): "
                        "sde,ode,dpm,rf,fewstep,serving,serving_sustained,"
                        "vae,sde_train,datagen,ddim,fidelity")
    p.add_argument("--sustained-secs", type=float, default=30.0,
                   help="serving_sustained: timed-load duration (after a 5 s "
                        "warm phase)")
    p.add_argument("--sustained-clients", type=int, default=512,
                   help="serving_sustained: concurrent HTTP client threads, "
                        "each looping 1-4-image requests")
    p.add_argument("--sustained-buckets", type=str, default="1,256,1024",
                   help="serving_sustained: compiled batch-bucket ladder "
                        "(comma list; shrink on CPU)")
    p.add_argument("--sustained-dtype", default="float32",
                   choices=["float32", "uint8"],
                   help="serving_sustained: service output dtype — uint8 "
                        "quantizes on device (4x smaller D2H pulls + npy "
                        "bodies); result stored as serving_sustained_u8")
    args = p.parse_args()
    only = {s for s in args.only.split(",") if s}
    sections = {"sde", "ode", "dpm", "rf", "fewstep", "serving",
                "serving_sustained", "vae", "sde_train", "datagen", "ddim",
                "fidelity"}
    if unknown := only - sections:
        p.error(f"unknown --only section(s) {sorted(unknown)}; choose from {sorted(sections)}")

    def want(section: str) -> bool:
        return not only or section in only

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/toycrystals_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if only == {"fidelity"}:
        # quality scoring needs no accelerator — keep the TPU free (and never
        # contend with a training run on the single tunneled chip)
        jax.config.update("jax_platforms", "cpu")

    from toycrystals_tpu.data import LatticeConfig, generate_batch
    from toycrystals_tpu.models import (
        CondUNetTiny,
        CondVAE,
        DiffusionPriorFiLM,
        DiffusionSchedule,
        VPSDE,
        sample_ddim,
        sample_dpmpp_2m,
        sample_probability_flow_ode,
        sample_reverse_sde_euler_maruyama,
    )
    from toycrystals_tpu.models.diffusion_prior import ddim_sample
    from toycrystals_tpu.models.sde_score_model import sample_grid_conditions
    from toycrystals_tpu.train import (
        create_train_state,
        make_sde_train_step,
        make_vae_train_step,
    )
    from toycrystals_tpu.utils import scan_timer

    key = jax.random.key(0)
    results: dict[str, dict] = {"backend": jax.default_backend()}

    # --- SDE / ODE sampling (bf16 compute) ---
    b = args.sample_batch
    sde = VPSDE(0.1, 30.0)
    if (want("sde") or want("ode") or want("dpm") or want("rf")
            or want("fewstep") or want("serving") or want("serving_sustained")
            or args.stretch):
        unet = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=96, emb_dim=128,
                            dtype=jnp.bfloat16)
        uparams = unet.init(key, jnp.zeros((2, 64, 64, 1)), jnp.zeros((2,)),
                            jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
        uapply = lambda prm, xt, t, yc, yv: unet.apply({"params": prm}, xt, t, yc, yv)
        y_cat, y_cont = sample_grid_conditions(b, 4, 4)

    if want("sde"):
        dt = timeit(lambda k: sample_reverse_sde_euler_maruyama(
            uapply, uparams, sde, y_cat, y_cont, (b, 64, 64, 1), k,
            n_steps=args.steps, guidance_scale=1.5, t_end=0.005), key, repeats=2)
        results["sde_sampling"] = {"images_per_sec": round(b / dt, 2),
                                   "batch": b, "steps": args.steps, "cfg": 1.5}
        # same sampler on the int8 dynamic-quantized conv path (--quantize
        # int8 on the CLIs): the one single-chip lever the op-level profile
        # leaves open (convs = 72.4% of step time; int8 MXU ~2.2x bf16 micro
        # rate, ops/conv.py). Identical weights, dynamic scales in-pass.
        unet_q = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=96,
                              emb_dim=128, dtype=jnp.bfloat16,
                              conv_impl="int8")
        uapply_q = lambda prm, xt, t, yc, yv: unet_q.apply(
            {"params": prm}, xt, t, yc, yv)
        dt = timeit(lambda k: sample_reverse_sde_euler_maruyama(
            uapply_q, uparams, sde, y_cat, y_cont, (b, 64, 64, 1), k,
            n_steps=args.steps, guidance_scale=1.5, t_end=0.005), key,
            repeats=2)
        results["sde_sampling_int8"] = {"images_per_sec": round(b / dt, 2),
                                        "batch": b, "steps": args.steps,
                                        "cfg": 1.5, "quantize": "int8"}

    if want("ode"):
        dt = timeit(lambda k: sample_probability_flow_ode(
            uapply, uparams, sde, y_cat, y_cont, (b, 64, 64, 1), k,
            n_steps=args.steps, guidance_scale=1.5, t_end=0.005), key, repeats=2)
        results["ode_sampling"] = {"images_per_sec": round(b / dt, 2),
                                   "batch": b, "steps": args.steps, "cfg": 1.5,
                                   "note": "Heun is 2 model evals/step — "
                                           "~half the SDE sampler's img/s at "
                                           "equal steps by construction"}

    if want("dpm"):
        # DPM-Solver++(2M), 50 steps: the fast-sampler path (new TPU scope;
        # the reference's committed grids use 300-step EM above).
        dt = timeit(lambda k: sample_dpmpp_2m(
            uapply, uparams, sde, y_cat, y_cont, (b, 64, 64, 1), k,
            n_steps=50, guidance_scale=1.5, t_end=0.005), key, repeats=2)
        results["dpm_sampling"] = {"images_per_sec": round(b / dt, 2),
                                   "batch": b, "steps": 50, "cfg": 1.5}

    if want("rf"):
        # Rectified-flow Euler at the fm serving default (50 steps, CFG):
        # throughput of the `--param fm` family (models/flow_matching.py);
        # weight-independent like every sampler row here.
        from toycrystals_tpu.models import sample_rectified_flow

        dt = timeit(lambda k: sample_rectified_flow(
            uapply, uparams, sde, y_cat, y_cont, (b, 64, 64, 1), k,
            n_steps=50, guidance_scale=1.5, t_end=0.005), key, repeats=2)
        results["rf_sampling"] = {"images_per_sec": round(b / dt, 2),
                                  "batch": b, "steps": 50, "cfg": 1.5}
        # few-step serving shape: rf-4 holds reference-grid fidelity with no
        # distillation (assets/FIGURES.md); like the distilled rows, a
        # millisecond dispatch wants a big batch to amortise per-dispatch cost
        rb = max(b, 1024)
        ry_cat, ry_cont = sample_grid_conditions(rb, 4, 4)
        dt = timeit(lambda k: sample_rectified_flow(
            uapply, uparams, sde, ry_cat, ry_cont, (rb, 64, 64, 1), k,
            n_steps=4, guidance_scale=1.5, t_end=0.005), key, repeats=2)
        results["rf_fewstep_sampling"] = {"images_per_sec": round(rb / dt, 2),
                                          "batch": rb, "steps": 4, "cfg": 1.5}

    if want("fewstep"):
        # Progressive-distilled serving path (scripts/distill_sde_score_model
        # .py): N single-pass DDIM evals per image with the guidance baked in
        # — no CFG batch doubling. Throughput is weight-independent; quality
        # per step count is the committed fidelity table (see the
        # ours_distill* fidelity rows + assets/FIGURES.md).
        # Few-step dispatches are ms-long, so per-dispatch overhead dominates
        # at the 300-step batch — serve at >=1024 (1-step: 5.0k img/s at
        # b=256 -> 8.5k at b=1024 on v5e).
        sb = max(b, 1024)
        sy_cat, sy_cont = sample_grid_conditions(sb, 4, 4)
        for n_steps in (8, 4, 2, 1):
            dt = timeit(lambda k, ns=n_steps: sample_ddim(
                uapply, uparams, sde, sy_cat, sy_cont, (sb, 64, 64, 1), k,
                n_steps=ns, guidance_scale=0.0, t_end=0.005, prediction="v"),
                key, repeats=3)
            results[f"ddim_distilled_{n_steps}step"] = {
                "images_per_sec": round(sb / dt, 2), "batch": sb,
                "steps": n_steps, "cfg": "baked"}

    if want("serving"):
        # Serving stack end-to-end (toycrystals_tpu/serve.py): request wall
        # latency through the checkpoint-resident service at a 4-step
        # distilled config, vs the raw compiled dispatch underneath — the
        # delta is the serving layer's own cost (bucket pad/trim, lock,
        # host conversion). On the tunneled chip both include the warm
        # ~25-30 ms dispatch round-trip (measured, benchmarks/NOTES.md
        # "Serving latency"); production TPU has no tunnel, so the overhead
        # delta is the portable number.
        import tempfile

        from toycrystals_tpu.serve import MicroBatcher, ScoreModelService

        with tempfile.TemporaryDirectory() as td:
            sp = str(Path(td) / "serve_bench.msgpack")
            save_distilled_serve_ckpt(sp, uparams)
            svc = ScoreModelService(sp, buckets=(1, 16, 64))
            svc.warmup()
            # batch-1 request latency (reproducible direct path)
            lats = []
            for i in range(12):
                t0 = time.perf_counter()
                svc.sample_conditions([i % 4], thetas=[0.1 * i], seed=i)
                lats.append(time.perf_counter() - t0)
            lats.sort()
            # raw dispatch underneath (same executable shape, no service)
            raw = timeit(lambda k: sample_ddim(
                uapply, uparams, sde, y_cat[:1], y_cont[:1], (1, 64, 64, 1),
                k, n_steps=4, guidance_scale=0.0, t_end=0.005,
                prediction="v"), key, repeats=6)
            # micro-batched concurrent throughput: 64 callers, 1 image each
            mb = MicroBatcher(svc, window_ms=8)
            try:
                t0 = time.perf_counter()
                futs = [mb.submit([i % 4]) for i in range(64)]
                for f in futs:
                    f.result(timeout=600)
                mb_dt = time.perf_counter() - t0
                mb_stats = dict(mb.stats)
            finally:
                mb.close()
            results["serving"] = {
                "p50_latency_ms_b1": round(lats[len(lats) // 2] * 1e3, 1),
                "p90_latency_ms_b1": round(lats[-2] * 1e3, 1),
                "raw_dispatch_ms_b1": round(raw * 1e3, 1),
                "service_overhead_ms": round(
                    (lats[len(lats) // 2] - raw) * 1e3, 1),
                "concurrent_64x1_img_per_sec": round(64 / mb_dt, 1),
                "batched_dispatches": mb_stats["batched_dispatches"],
                "steps": 4, "buckets": list(svc.buckets),
            }

    if want("serving_sustained"):
        # Sustained concurrent load through the FULL HTTP + MicroBatcher
        # stack at THROUGHPUT buckets (VERDICT r3 weak #3: the 64x1 burst at
        # buckets (1,16,64) measured 426 img/s while the same student runs
        # 2,627 img/s offline at batch 1024 — the ladder, not the stack, was
        # the suspected cap). Here: buckets (1, 256, 1024), N client threads
        # each looping 1-4-image POST /sample requests (no seed -> coalesced
        # by the MicroBatcher) for a 5 s warm phase + --sustained-secs timed
        # window. Reported: steady-state img/s, p50/p99 request wall
        # latency, mean dispatch batch, peak queue depth — next to the
        # offline top-bucket number measured through the same executable.
        import http.client
        import tempfile
        import threading

        from toycrystals_tpu.serve import ScoreModelService

        sys.path.insert(0, str(REPO / "scripts"))
        from serve_sde_score_model import make_server  # noqa: E402

        with tempfile.TemporaryDirectory() as td:
            sp = str(Path(td) / "serve_sustained.msgpack")
            save_distilled_serve_ckpt(sp, uparams)
            svc = ScoreModelService(
                sp, out_dtype=args.sustained_dtype, buckets=tuple(
                    int(v) for v in args.sustained_buckets.split(",")))
            svc.warmup()

            # offline ceiling through the SAME compiled top-bucket
            # executable (what bench.py's distilled_4step field measures)
            top = svc.buckets[-1]
            yc_t, yv_t = svc.conditions([0] * top)
            import numpy as _np

            run_top = svc._bucket_executable(top)
            jax.device_get(jnp.sum(run_top(svc.params, yc_t, yv_t,
                                           _np.uint32(0))))
            t0 = time.perf_counter()
            jax.device_get(jnp.sum(run_top(svc.params, yc_t, yv_t,
                                           _np.uint32(1))))
            offline_img_s = top / (time.perf_counter() - t0)

            srv = make_server(svc, port=0, window_ms=8)
            batcher = srv.batcher
            port = srv.server_address[1]
            srv_thread = threading.Thread(target=srv.serve_forever,
                                          daemon=True)
            srv_thread.start()

            warm_s = 5.0
            stop_at = time.monotonic() + warm_s + args.sustained_secs
            warm_until = time.monotonic() + warm_s
            lock = threading.Lock()
            lat: list[float] = []      # timed-window request latencies (s)
            done_imgs = [0]            # timed-window completed images
            qdepth: list[int] = []

            def client(cid: int) -> None:
                rng = __import__("random").Random(cid)
                conn = http.client.HTTPConnection("127.0.0.1", port,
                                                  timeout=120)
                try:
                    while time.monotonic() < stop_at:
                        n = rng.randint(1, 4)
                        body = json.dumps({
                            "types": [rng.randrange(4) for _ in range(n)],
                            "thetas": [rng.random() for _ in range(n)],
                            "format": "npy"}).encode()
                        t0 = time.monotonic()
                        try:
                            conn.request("POST", "/sample", body=body)
                            resp = conn.getresponse()
                            resp.read()
                            ok = resp.status == 200
                        except Exception:
                            conn.close()
                            conn = http.client.HTTPConnection(
                                "127.0.0.1", port, timeout=120)
                            continue
                        t1 = time.monotonic()
                        if ok and t0 >= warm_until:
                            with lock:
                                lat.append(t1 - t0)
                                done_imgs[0] += n
                finally:
                    conn.close()

            def monitor() -> None:
                while time.monotonic() < stop_at:
                    qdepth.append(batcher._q.qsize())
                    time.sleep(0.05)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(args.sustained_clients)]
            mon = threading.Thread(target=monitor, daemon=True)
            for t in threads:
                t.start()
            mon.start()
            # snapshot service counters at the start of the timed window
            while time.monotonic() < warm_until:
                time.sleep(0.05)
            stats0 = svc.stats
            window_t0 = time.monotonic()
            for t in threads:
                t.join()
            window_dt = time.monotonic() - window_t0
            stats1 = svc.stats
            srv.shutdown()
            srv.server_close()
            batcher.close(timeout=120)

            lat.sort()
            d_disp = stats1["dispatches"] - stats0["dispatches"]
            d_imgs = stats1["images"] - stats0["images"]
            sus_key = ("serving_sustained" if args.sustained_dtype == "float32"
                       else "serving_sustained_u8")
            results[sus_key] = {
                "out_dtype": args.sustained_dtype,
                "clients": args.sustained_clients,
                "window_s": round(window_dt, 1),
                "img_per_sec": round(done_imgs[0] / window_dt, 1),
                "offline_top_bucket_img_per_sec": round(offline_img_s, 1),
                "http_fraction_of_offline": round(
                    done_imgs[0] / window_dt / offline_img_s, 3),
                "p50_latency_ms": round(lat[len(lat) // 2] * 1e3, 1)
                if lat else None,
                "p99_latency_ms": round(lat[int(len(lat) * 0.99)] * 1e3, 1)
                if lat else None,
                "requests": len(lat),
                "mean_dispatch_batch": round(d_imgs / max(d_disp, 1), 1),
                "queue_depth_mean": round(sum(qdepth) / max(len(qdepth), 1), 1),
                "queue_depth_max": max(qdepth) if qdepth else 0,
                "buckets": list(svc.buckets), "steps": 4,
            }

    # --- VAE train step ---
    tb = args.train_batch
    x = jax.random.uniform(key, (tb, 64, 64, 1))
    yc = jnp.arange(tb, dtype=jnp.int32) % 4
    yv = jnp.zeros((tb, 4))

    if want("vae"):
        vae = CondVAE(z_dim=32, n_types=4, y_cont_dim=4)
        vparams = vae.init({"params": key, "reparam": key}, x, yc, yv)["params"]
        vtx = optax.adam(2e-3)
        vstate = create_train_state(vparams, vtx)
        vstep = make_vae_train_step(vae, vtx, free_bits=0.05)

        # steps/sec via an on-device scan loop (per-dispatch tunnel RTT would
        # otherwise dominate a ~20 ms step); the carry IS the train state, so
        # this times the real donated training loop.
        def vae_body(carry):
            state, i = carry
            state, _ = vstep(state, x, yc, yv, jnp.float32(3e-4),
                             jax.random.fold_in(key, i))
            return (state, i + 1)

        # ~1-2 ms/step: needs hundreds of iters for the scan delta to rise
        # above the tunnel's per-call noise.
        dt = scan_timer(vae_body, (vstate, jnp.int32(0)), n_lo=10, n_hi=510)
        results["vae_train"] = {"images_per_sec": round(tb / dt, 2), "batch": tb}

    # --- SDE train step (f32, training config) ---
    if want("sde_train"):
        unet32 = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=96, emb_dim=128)
        u32params = unet32.init(key, jnp.zeros((2, 64, 64, 1)), jnp.zeros((2,)),
                                jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
        stx = optax.adam(1e-4)
        sstate = create_train_state(u32params, stx, ema=True)
        sstep = make_sde_train_step(unet32, stx, sde, 4, 0.1, 1.0, 0.999)

        def sde_body(carry):
            state, i = carry
            state, _ = sstep(state, x, yc, yv, jax.random.fold_in(key, i))
            return (state, i + 1)

        dt = scan_timer(sde_body, (sstate, jnp.int32(0)), n_lo=5, n_hi=25)
        results["sde_train"] = {"images_per_sec": round(tb / dt, 2), "batch": tb,
                                "ema": True}

    # --- on-device datagen ---
    if want("datagen"):
        cfg = LatticeConfig(rot_only=True)
        gb = 2048

        def gen_body(carry):
            acc, i = carry
            xg = generate_batch(cfg, 0, jnp.arange(gb) + i * gb)[0]
            return (acc + jnp.sum(xg), i + 1)

        dt = scan_timer(gen_body, (jnp.float32(0), jnp.int32(0)), n_lo=10, n_hi=510)
        results["datagen"] = {"images_per_sec": round(gb / dt, 2), "batch": gb}

    # --- latent prior DDIM ---
    if want("ddim"):
        prior = DiffusionPriorFiLM(z_dim=32, n_types=4, y_cont_dim=4, width=1024,
                                   n_blocks=8, y_cat_emb_dim=64)
        pz = jnp.zeros((2, 32))
        pparams = prior.init(key, pz, jnp.zeros((2,), jnp.int32),
                             jnp.zeros((2,), jnp.int32), jnp.zeros((2, 4)))["params"]
        papply = lambda prm, z, t, a, c: prior.apply({"params": prm}, z, t, a, c)
        sched = DiffusionSchedule.linear(1000, 1e-4, 0.05)
        pb = 4096
        pyc, pyv = sample_grid_conditions(pb, 4, 4)

        dt = timeit(lambda k: ddim_sample(papply, pparams, sched, pyc, pyv, 50, 32, k),
                    key)
        results["ddim_prior"] = {"z_per_sec": round(pb / dt, 2), "batch": pb, "steps": 50}

    # --- sample-quality fidelity on the committed figure grids ---
    if want("fidelity"):
        from toycrystals_tpu.utils.fidelity import score_grid_png

        grids = {
            "ours_sde300": (REPO / "assets/score_based_diffusion/"
                            "score_based_diffusion_samples.png", 64),
            "reference_sde300": (Path("/root/reference/assets/score_based_diffusion/"
                                      "score_based_diffusion_samples.png"), 64),
            "ours_256_vparam_sde300": (REPO / "assets/score_based_diffusion_256/"
                                       "samples_256_vparam_sde300_cfg1.5_ema.png", 256),
            "ours_256_vparam_dpm50": (REPO / "assets/score_based_diffusion_256/"
                                      "samples_256_vparam_dpm50_cfg1.5_ema.png", 256),
            # SDE-300 grid from the SAME checkpoint as the DPM grids below, so
            # the fast-sampler comparison holds weights fixed.
            "ours_sde300_repro64": (REPO / "assets/score_based_diffusion/"
                                    "repro64_sde300_samples.png", 64),
            # SDE-300 grid from the v-param teacher the distill_* grids below
            # descend from, so quality-vs-steps holds the pretraining fixed.
            "ours_sde300_v64": (REPO / "assets/score_based_diffusion/"
                                "v64_sde300_samples.png", 64),
        }
        # DPM fast-path grids, once committed (round-2 item #3)
        for steps in (30, 50):
            p_dpm = REPO / f"assets/score_based_diffusion/dpm{steps}_samples.png"
            if p_dpm.exists():
                grids[f"ours_dpm{steps}"] = (p_dpm, 64)
        # progressive-distilled few-step grids, once committed
        for steps in (64, 32, 16, 8, 4, 2, 1):
            p_d = REPO / f"assets/score_based_diffusion/distill_{steps}step.png"
            if p_d.exists():
                grids[f"ours_distill{steps}"] = (p_d, 64)
        # rectified-flow (--param fm) few-step Euler grids, once committed
        for steps in (50, 20, 8, 4, 2, 1):
            p_rf = REPO / f"assets/score_based_diffusion/fm64_rf{steps}_samples.png"
            if p_rf.exists():
                grids[f"ours_fm_rf{steps}"] = (p_rf, 64)
        # pipeline-A (VAE) sample grids, ours AND the reference's committed
        # pngs — the reference's only quality story for these was eyeballing
        # (`/root/reference/README.md:21-47`); the scorer handles any 6x6
        # type/theta grid, so pipeline-A parity is a number like pipeline B's.
        for nm, sub in (
            ("vae_prior", "vae_standard_prior/vae_standard_prior_sampling.png"),
            ("vae_mop", "vae_standard_prior/vae_mop_sampling.png"),
            ("vae_ldm_prior",
             "vae_latent_diffusion_prior/vae_latent_diffusion_prior_sampling.png"),
        ):
            for side, root in (("ours", REPO / "assets"),
                               ("reference", Path("/root/reference/assets"))):
                p_vae = root / sub
                if p_vae.exists():
                    grids[f"{side}_{nm}"] = (p_vae, 64)
        # float-vs-int8 serving quality: same checkpoint, same seed (the
        # quantized path's quality evidence — NOTES.md "int8 quantized")
        for q in ("float", "int8"):
            p_q = (REPO / "assets/score_based_diffusion/"
                   f"repro64r3_{q}_sde300.png")
            if p_q.exists():
                grids[f"ours_repro64r3_{q}"] = (p_q, 64)
        # fm-shift flow matching at 256 (the high-res few-step recipe)
        for steps in (50, 4):
            p_fm = (REPO / "assets/score_based_diffusion_256/"
                    f"fm256_rf{steps}_samples.png")
            if p_fm.exists():
                grids[f"ours_256_fm_rf{steps}"] = (p_fm, 256)
        # base_ch=128 v-param at 256 (the capacity/MXU-alignment lever)
        p_bc = (REPO / "assets/score_based_diffusion_256/"
                "samples_256_bc128_vparam_sde300_cfg1.5_ema.png")
        if p_bc.exists():
            grids["ours_256_bc128_vparam_sde300"] = (p_bc, 256)
        # higher-step DPM at 256 (does more solver steps close the gap?)
        for steps in (100,):
            p_dpm = (REPO / "assets/score_based_diffusion_256/"
                     f"samples_256_vparam_dpm{steps}_cfg1.5_ema.png")
            if p_dpm.exists():
                grids[f"ours_256_vparam_dpm{steps}"] = (p_dpm, 256)
        fid = {}
        for name, (path, size) in grids.items():
            if not path.exists():
                continue
            r = score_grid_png(path, out_size=size)
            fid[name] = {
                "type_acc": round(r["type_acc"], 3),
                "type_acc_merged01": round(r["type_acc_merged01"], 3),
                "theta_mae_deg": round(r["theta_mae_deg"], 2),
                "cond_fidelity": round(r["cond_fidelity"], 3),
            }

        # Latent-FID (utils/fid.py) on the same committed 64x64 grids: the
        # diversity axis the per-sample FFT scores are blind to. Uses the
        # committed unconditional-VAE feature extractor so the numbers are
        # reproducible across machines; every score is read against the
        # same-N real-vs-real noise floor (36-tile grids are a small sample).
        fvae = REPO / "assets/eval/feature_vae_z16.msgpack"
        if fvae.exists():
            from toycrystals_tpu.utils.fid import (
                compute_fid,
                fid_floor,
                load_feature_extractor,
                reference_stats,
            )
            from toycrystals_tpu.utils.fidelity import extract_grid_tiles

            fmodel, fparams, _fcfg = load_feature_extractor(fvae)
            ref_st = reference_stats(fmodel, fparams)
            floors: dict[int, float] = {}
            for name, (path, size) in grids.items():
                if size != 64 or name not in fid:
                    continue
                tiles = extract_grid_tiles(path, out_size=64)
                n = int(tiles.shape[0])
                if n not in floors:
                    floors[n] = round(fid_floor(fmodel, fparams, n, ref_st), 2)
                fid[name]["latent_fid"] = round(
                    compute_fid(tiles, fmodel, fparams, ref_stats=ref_st), 2)
                fid[name]["latent_fid_floor"] = floors[n]
        results["fidelity"] = fid

    # --- stretch configs (BASELINE.md): 256x256 lattices + hi-res sampling ---
    if args.stretch:
        cfg256 = LatticeConfig(img_size=256, rot_only=True)
        gb256 = min(256, 2 * args.sample_batch)

        def gen256_body(carry):
            acc, i = carry
            xg = generate_batch(cfg256, 0, jnp.arange(gb256) + i * gb256)[0]
            return (acc + jnp.sum(xg), i + 1)

        dt = scan_timer(gen256_body, (jnp.float32(0), jnp.int32(0)), n_lo=3, n_hi=15)
        results["datagen_256"] = {"images_per_sec": round(gb256 / dt, 2), "batch": gb256,
                                  "img_size": 256}

        b256 = max(args.sample_batch // 16, 4)
        yc256, yv256 = sample_grid_conditions(b256, 4, 4)
        dt = timeit(lambda k: sample_reverse_sde_euler_maruyama(
            uapply, uparams, sde, yc256, yv256, (b256, 256, 256, 1), k,
            n_steps=args.steps, guidance_scale=1.5, t_end=0.005), key, repeats=2)
        results["sde_sampling_256"] = {"images_per_sec": round(b256 / dt, 2),
                                       "batch": b256, "steps": args.steps,
                                       "img_size": 256, "cfg": 1.5}

        # 256x256 train step (stretch training config: batch 32, f32 params,
        # bf16 compute, flash-attention fwd+bwd — the config the XLA SDPA
        # path cannot compile at all, benchmarks/NOTES.md)
        unet256 = CondUNetTiny(n_types=4, y_cont_dim=4, base_ch=96,
                               emb_dim=128, dtype=jnp.bfloat16)
        u256params = unet256.init(key, jnp.zeros((2, 256, 256, 1)),
                                  jnp.zeros((2,)), jnp.zeros((2,), jnp.int32),
                                  jnp.zeros((2, 4)))["params"]
        t256 = optax.adam(1e-4)
        s256 = create_train_state(u256params, t256, ema=True)
        step256 = make_sde_train_step(unet256, t256, sde, 4, 0.1, 1.0, 0.999)
        tb256 = 32
        x256 = jax.random.uniform(key, (tb256, 256, 256, 1))
        yc256t, yv256t = sample_grid_conditions(tb256, 4, 4)

        def train256_body(carry):
            state, i = carry
            state, _ = step256(state, x256, yc256t, yv256t,
                               jax.random.fold_in(key, i))
            return (state, i + 1)

        dt = scan_timer(train256_body, (s256, jnp.int32(0)), n_lo=3, n_hi=9)
        results["sde_train_256"] = {"images_per_sec": round(tb256 / dt, 2),
                                    "batch": tb256, "img_size": 256,
                                    "ema": True}

        # Sharded 4096-sample batch over every visible chip (v5e-8 config).
        if len(jax.devices()) > 1:
            from toycrystals_tpu.parallel import data_sharding, make_mesh

            mesh = make_mesh(len(jax.devices()))
            sb = args.sharded_batch
            syc, syv = sample_grid_conditions(sb, 4, 4)
            syc = jax.device_put(syc, data_sharding(mesh, 1))
            syv = jax.device_put(syv, data_sharding(mesh, 2))
            dt = timeit(lambda k: sample_reverse_sde_euler_maruyama(
                uapply, uparams, sde, syc, syv, (sb, 64, 64, 1), k,
                n_steps=args.steps, guidance_scale=1.5, t_end=0.005), key, repeats=2)
            results["sde_sampling_sharded"] = {
                "images_per_sec": round(sb / dt, 2), "batch": sb,
                "n_devices": len(jax.devices()), "steps": args.steps, "cfg": 1.5,
            }

            # Spatially-sharded hi-res sampling: 256x256 activations split by
            # height over a ('data','space') mesh (parallel/spatial.py) — the
            # config where activations, not batch, outgrow one chip.
            from toycrystals_tpu.parallel import image_sharding, make_mesh_2d, replicate

            n_sp = min(4, len(jax.devices()))
            mesh2 = make_mesh_2d(len(jax.devices()) // n_sp, n_sp)
            nd = int(dict(mesh2.shape)["data"])
            bsp = max(nd, b256 - b256 % nd)
            syc, syv = sample_grid_conditions(bsp, 4, 4)
            syc = jax.device_put(syc, data_sharding(mesh2, 1))
            syv = jax.device_put(syv, data_sharding(mesh2, 2))
            pr2 = replicate(mesh2, uparams)
            dt = timeit(lambda k: sample_reverse_sde_euler_maruyama(
                uapply, pr2, sde, syc, syv, (bsp, 256, 256, 1), k,
                n_steps=args.steps, guidance_scale=1.5, t_end=0.005,
                sharding=image_sharding(mesh2)), key, repeats=2)
            results["sde_sampling_256_spatial"] = {
                "images_per_sec": round(bsp / dt, 2), "batch": bsp,
                "mesh": f"{nd}x{n_sp}", "steps": args.steps,
                "img_size": 256, "cfg": 1.5,
            }

    # Merge into any existing results file so a partial --only rerun updates
    # its sections instead of wiping the full table.
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    merged = {}
    if out.exists():
        try:
            merged = json.loads(out.read_text())
        except (json.JSONDecodeError, OSError):
            merged = {}
    merged.update(results)
    out.write_text(json.dumps(merged, indent=2))
    print(json.dumps(merged, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
