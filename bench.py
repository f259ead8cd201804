#!/usr/bin/env python
"""Headline benchmark: full analytics pipeline points/s on one TPU chip.

Protocol (BASELINE.md — the reference publishes no numbers, so the baseline
is the measured CPU reference path):
  - TPU:   full jitted pipeline (preprocess -> clustering -> density ->
           flow -> bottlenecks) on a 1M-point synthetic venue, steady-state.
  - CPU:   the faithful NumPy/sklearn oracle on a 100K-point venue of the
           same recipe (the CPU path is O(n log n)+ and would take minutes
           at 1M; measuring at 100K and using its points/s is *generous* to
           the CPU baseline since its per-point cost grows with n).
  - vs_baseline = tpu_points_per_sec / cpu_points_per_sec.

Also asserts correctness alongside speed: density-grid MAE vs the oracle on
the 100K venue must be ~0 (exact radius-count parity).

Un-zeroable by design (round-3 postmortem: a probe-only gate declared the
chip down after 370 s, printed value=0 without attempting the workload,
then aborted rc 134 unwinding through the wedged runtime). Now:
  - there is NO gating probe — every device stage is attempted directly,
    each inside a daemon-thread watchdog so a wedged tunnel costs one
    stage's budget, never the record;
  - a failed/hung first device stage triggers ONE backend re-init and a
    retry before the stage is declared lost;
  - whatever was measured (CPU baseline, per-stage errors, partial sizes)
    is always emitted in the JSON detail;
  - after printing the record the process leaves via os._exit(0), so a
    hung device thread can never turn a degraded record into a crash.
tests/test_bench_degraded.py drives the wedged path end-to-end.

Prints exactly one JSON line.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# Per-stage watchdog budgets (seconds). First device touch through the
# remote tunnel pays 60-200 s warmup, and venue-scale compiles through
# the remote AOT helper run 300-900 s (measured r4: 5M full-pipeline
# compile 660 s). Failures fail fast (HTTP 500 within ~a minute); only
# true hangs burn a full budget. Overridable for tests.
STAGE_TIMEOUT_S = float(os.environ.get("LIDAR_BENCH_STAGE_TIMEOUT", 900))


TIMED_OUT = []  # labels of stages abandoned mid-flight (thread lives on)


def run_guarded(fn, label, detail, timeout_s=None):
    """Run ``fn`` in a daemon thread with a deadline. Returns its value,
    or None after recording the error/timeout under detail.stage_errors.
    Daemon thread (not a pool): a worker wedged inside a device call must
    not block interpreter exit.

    A TIMED-OUT stage's thread keeps running against the device, so any
    later device stage may race it: the caller re-inits the backend and
    the record marks such results under detail.measured_after_timeout."""
    timeout_s = STAGE_TIMEOUT_S if timeout_s is None else timeout_s
    box = {}

    def run():
        try:
            box["val"] = fn()
        except BaseException as e:  # device aborts raise SystemError etc.
            box["err"] = repr(e)[:300]

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if "val" in box:
        if TIMED_OUT:
            detail.setdefault("measured_after_timeout", {})[label] = (
                list(TIMED_OUT))
        return box["val"]
    err = box.get("err", "timeout after %.0fs" % timeout_s)
    if "err" not in box:
        TIMED_OUT.append(label)
    detail.setdefault("stage_errors", {})[label] = err
    print("bench stage %r failed: %s" % (label, err), file=sys.stderr)
    return None


def reinit_backend():
    """Best-effort JAX backend teardown so a transient tunnel error does
    not condemn every later stage. Private API, version-guarded."""
    import jax
    try:
        jax.clear_caches()
    except Exception:
        pass
    try:
        from jax._src import xla_bridge
        xla_bridge._clear_backends()
        return True
    except Exception:
        return False


def emit(record):
    """Print the one-line record and leave WITHOUT unwinding: a daemon
    thread wedged inside the TPU runtime aborts the interpreter during
    normal exit (observed rc 134, round 3)."""
    print(json.dumps(record))
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


def main():
    from lidar_ai_recommendation_software_tpu.config import MONOLITH_CONFIG
    from lidar_ai_recommendation_software_tpu.pipeline import Pipeline
    from lidar_ai_recommendation_software_tpu.synthetic import scaled_venue
    from lidar_ai_recommendation_software_tpu.types import PointCloud

    n_tpu = int(os.environ.get("LIDAR_BENCH_POINTS", 1_000_000))
    n_cpu = int(os.environ.get("LIDAR_BENCH_CPU_POINTS", 100_000))
    simulate_wedge = os.environ.get("LIDAR_BENCH_SIMULATE_WEDGE") == "1"

    detail = {"tpu_points": n_tpu, "cpu_points": n_cpu}
    record = {"metric": "full_pipeline_points_per_sec_1chip",
              "value": 0, "unit": "points/s", "vs_baseline": 0.0,
              "detail": detail}

    pts_small = scaled_venue(n_cpu)

    # ---- CPU reference baseline (measured; host-only, always runs) ----
    from lidar_ai_recommendation_software_tpu.oracle import reference as ref
    t0 = time.time()
    oracle_small = ref.analyze(pts_small, variant="monolith")
    cpu_pps = n_cpu / (time.time() - t0)
    detail["cpu_points_per_sec"] = round(cpu_pps)

    pipe = Pipeline(MONOLITH_CONFIG)

    def wedge():
        time.sleep(3600)

    # ---- stage 1: correctness at 100K vs oracle (first device touch:
    # pays tunnel warmup + compile; biggest budget, one re-init retry) ----
    def correctness():
        if simulate_wedge:
            wedge()
        out = pipe.analyze(pts_small)
        g = out["density"]["density_grid"]
        og = oracle_small["density"]["density_grid"]
        mae = (float(np.abs(g - og).mean()) if g.shape == og.shape
               else float("nan"))
        people_ok = (out["density"]["total_people"]
                     == oracle_small["density"]["total_people"])
        return mae, people_ok

    res = run_guarded(correctness, "correctness_100k", detail)
    if res is None and not simulate_wedge:
        detail["backend_reinit"] = reinit_backend()
        res = run_guarded(correctness, "correctness_100k_retry", detail)
    if res is not None:
        detail["density_mae_vs_oracle_100k"] = res[0]
        detail["people_parity_100k"] = bool(res[1])
    else:
        # device never produced a result; skip further device stages
        # (each would burn a full budget on the same wedged tunnel)
        detail["error"] = "device stages failed; see stage_errors"
        emit(record)

    # Steady-state timing on device. Distinct input clouds per call
    # and a value pull at the end: through the remote-device tunnel,
    # block_until_ready returns at enqueue time, so only a host read of
    # the final result gives honest wall-clock (device execution
    # serialises, so the pull fences the whole run).
    state = {"pipe": pipe, "seen_timeouts": 0}

    def fresh_after_timeout():
        """After any stage timeout the abandoned thread may still hold
        the backend: re-init it and route later stages through a fresh
        Pipeline (ADVICE r4) so their timings aren't silently shared."""
        if len(TIMED_OUT) > state["seen_timeouts"]:
            state["seen_timeouts"] = len(TIMED_OUT)
            detail.setdefault("backend_reinit_after_timeout", []).append(
                reinit_backend())
            state["pipe"] = Pipeline(MONOLITH_CONFIG)

    def measure(pts, iters):
        pipe = state["pipe"]
        cfg = pipe.fit_capacity(pts)
        clouds = [PointCloud.from_numpy(pts + i * 1e-4,
                                        cfg.capacity.max_points)
                  for i in range(iters)]
        r = pipe.analyze_device(clouds[0], cfg)
        _ = float(r[2].density.max_density)  # warmup + fence
        # two timed loops, keep the faster mean: transient host/tunnel
        # contention inflates a single loop 10-100x (observed: a
        # concurrent pytest run turned a 185 ms step into 4.2 s)
        best = float("inf")
        for _rep in range(2):
            t0 = time.time()
            for c in clouds:
                r = pipe.analyze_device(c, cfg)
            _ = float(r[2].density.max_density)
            best = min(best, (time.time() - t0) / iters)
        sec = best
        return len(pts) / sec, sec

    # ---- stage 2: headline 1M throughput ----
    fresh_after_timeout()
    pts_big = scaled_venue(n_tpu)
    res = run_guarded(lambda: measure(pts_big, iters=4),
                      "throughput_1m", detail)
    if res is not None:
        tpu_pps, tpu_s = res
        record["value"] = round(tpu_pps)
        record["vs_baseline"] = round(tpu_pps / cpu_pps, 2)
        detail["tpu_step_ms"] = round(tpu_s * 1000, 2)

    # ---- stage 3: venue-scale tail (BASELINE configs 4-5 name 1M AND
    # 10M+ scans); skipped when the headline size was overridden ----
    if (n_tpu == 1_000_000
            and os.environ.get("LIDAR_BENCH_10M", "1") == "1"):
        fresh_after_timeout()

        def tail():
            pts_10m = scaled_venue(10_000_000)
            return measure(pts_10m, iters=2)

        res = run_guarded(tail, "throughput_10m", detail,
                          timeout_s=STAGE_TIMEOUT_S * 2)
        if res is not None:
            detail["points_per_sec_10m"] = round(res[0])
            detail["step_ms_10m"] = round(res[1] * 1000, 1)

    # ---- stage 3.5: per-stage roofline accounting (VERDICT r4 item 3:
    # the record must say how far each dominant stage sits from
    # speed-of-light, not just points/s) ----
    if (record["value"] and os.environ.get("LIDAR_BENCH_ROOFLINE", "1")
            == "1"):
        def stage_roofline():
            import functools

            import jax
            import jax.numpy as jnp

            from lidar_ai_recommendation_software_tpu import (
                preprocess as pp)
            from lidar_ai_recommendation_software_tpu.models import (
                density as dm)
            from lidar_ai_recommendation_software_tpu.ops import (
                clustering)
            from lidar_ai_recommendation_software_tpu.utils import (
                profiling)

            pipe_l = state["pipe"]
            cfg = pipe_l.fit_capacity(pts_big)
            cap = cfg.capacity
            pc = cfg.preprocess
            clouds = [PointCloud.from_numpy(pts_big + i * 1e-4,
                                            cap.max_points)
                      for i in range(3)]
            pre = jax.jit(functools.partial(pp.preprocess, config=cfg))
            processed = jax.block_until_ready(pre(clouds[0]))
            people = jax.block_until_ready(jax.jit(functools.partial(
                dm.extract_people, config=cfg))(processed))

            def cluster_only(cloud):
                return clustering.dbscan_labels(
                    cloud.points, cloud.mask, pc.dbscan_eps,
                    pc.dbscan_min_samples, ncx=cap.cluster_cells_x,
                    ncy=cap.cluster_cells_y,
                    column_cap=cap.cluster_column_cap,
                    max_iters=cap.max_cc_iters)[1]

            stages = {
                "clustering": (cluster_only,
                               lambda i: (clouds[i % 3],), lambda r: r),
                "extract_people": (
                    functools.partial(dm.extract_people, config=cfg),
                    lambda i: (processed,), lambda r: r.mask),
                "density": (
                    functools.partial(dm.analyze_density, config=cfg),
                    lambda i: (processed, people),
                    lambda r: r.max_density),
            }
            from lidar_ai_recommendation_software_tpu.ops import ccl
            pyp = ccl._round_up(cap.cluster_cells_y + 2, 128)
            slots = ((cap.cluster_cells_x + 2) * cap.cluster_column_cap
                     * pyp)
            costs = profiling.pipeline_stage_costs(
                n_points=cap.max_points, n_people=cap.max_people,
                table_slots=slots, column_cap=cap.cluster_column_cap,
                pyp=pyp,
                grid_cells=cap.grid_cells_x * cap.grid_cells_y,
                bucket_cap=64)
            out = {}
            for name, (f, argfn, pull) in stages.items():
                from lidar_ai_recommendation_software_tpu.utils.\
                    profiling import device_timer
                sec = device_timer(jax.jit(f), argfn, pull, iters=2)
                r = profiling.roofline(costs[name]["flops"],
                                       costs[name]["bytes"], sec)
                r = {k: (round(v, 3) if isinstance(v, float) else v)
                     for k, v in r.items()}
                r["ms"] = round(sec * 1000, 2)
                r["modeled_flops"] = costs[name]["flops"]
                r["modeled_bytes"] = costs[name]["bytes"]
                out[name] = r
            return out

        res = run_guarded(stage_roofline, "stage_roofline", detail)
        if res is not None:
            detail["stage_roofline"] = res

    # ---- stage 4: fused SA layer (BASELINE.json north star: FPS + ball
    # query + SA kernels) ----
    if os.environ.get("LIDAR_BENCH_SA", "1") == "1":
        fresh_after_timeout()

        def sa_stage():
            import jax
            import jax.numpy as jnp

            from lidar_ai_recommendation_software_tpu.ops.grouping import (
                ball_group, group_features)
            from lidar_ai_recommendation_software_tpu.ops.pallas import (
                kernels as pk)
            from lidar_ai_recommendation_software_tpu.utils.profiling \
                import device_timer

            n_sa, m_sa, k_sa = 100_000, 4096, 32
            sa_pts = jnp.asarray(pts_small[:n_sa], jnp.float32)
            sa_mask = jnp.ones(n_sa, bool)
            rng = np.random.RandomState(0)
            dims = [3, 32, 32, 64]
            w = [(jnp.asarray(rng.randn(a, b) * 0.1, jnp.float32),
                  jnp.zeros(b, jnp.float32))
                 for a, b in zip(dims[:-1], dims[1:])]

            def sa(p):
                idx = pk.fps(p, sa_mask, m_sa)
                cents = p[idx]
                gidx, gvalid = ball_group(cents, sa_mask[idx], p,
                                          sa_mask, 0.6, k_sa)
                g = group_features(p, None, cents, gidx, gvalid)
                return pk.sa_mlp_pool(g, gvalid, w,
                                      compute_dtype=jnp.bfloat16)

            f = jax.jit(sa)
            sec = device_timer(f, lambda i: (sa_pts + i * 1e-4,),
                               lambda r: r[0, 0], iters=2)
            return sec, n_sa

        res = run_guarded(sa_stage, "sa_layer", detail)
        if res is not None:
            detail["sa_layer_fused_ms"] = round(res[0] * 1000, 2)
            detail["sa_layer_points_per_sec"] = round(res[1] / res[0])
            # roofline: FPS (4 flops/pt/sample) + ball query (8) +
            # grouped MLP; min bytes = points read + groups rw + out
            try:
                from lidar_ai_recommendation_software_tpu.utils import (
                    profiling)
                n_sa, m_sa, k_sa = 100_000, 4096, 32
                mlp = 2 * m_sa * k_sa * (3 * 32 + 32 * 32 + 32 * 64)
                flops = m_sa * n_sa * (4 + 8) + mlp
                bytes_ = (n_sa * 12 + 2 * m_sa * k_sa * 3 * 4
                          + m_sa * 64 * 4)
                r = profiling.roofline(flops, bytes_, res[0])
                detail["sa_layer_roofline"] = {
                    k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in r.items()}
            except Exception:
                pass

    def device_name():
        import jax
        return str(jax.devices()[0])

    res = run_guarded(device_name, "device_name", detail, timeout_s=30)
    if res is not None:
        detail["device"] = res

    emit(record)


if __name__ == "__main__":
    main()
