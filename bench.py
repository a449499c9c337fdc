"""Benchmark: Cityscapes-resolution FCN-8s train + infer throughput on TPU.

Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
All progress chatter goes to stderr.

Headline metric (BASELINE.json): train images/sec/chip at 1024x512, 20
Cityscapes trainId classes, full-width FCN-8s (VGG-16 encoder), Adam,
keep_prob 0.5 — the reference tutorial's training configuration.

vs_baseline compares against the TF-on-CPU reference-equivalent measured on
THIS machine by tools/tf_cpu_baseline.py (the reference publishes no
throughput numbers and runs on CPU absent a GPU — its own warning,
fcn8s_tensorflow.py:506-507). Measured 2026-08-16, TF 2.21, 1024x512 batch 1:
0.01926 train img/s (51.9 s/step), 0.1104 infer img/s.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_TF_CPU_TRAIN_IMGS_PER_SEC = 0.01926  # tools/tf_cpu_baseline.py
BASELINE_TF_CPU_INFER_IMGS_PER_SEC = 0.1104

H, W = 1024, 512
TRAIN_BATCH = 8
NUM_CLASSES = 20
WARMUP = 3
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DEVICE_INIT_TIMEOUT_S = 600.0
RUN_TIMEOUT_S = 2700.0  # whole-run ceiling; a healthy run is ~5-8 min


def _fail_json_and_exit(err):
    """Print the mandatory JSON line with value null + an error field (never
    a stale or fabricated number), then hard-exit NONZERO so shell callers
    (`python bench.py && record`) see the failure while JSON consumers still
    get the honest line. Hard exit because the hung thread is in native code."""
    print(json.dumps({
        "metric": "fcn8s_train_images_per_sec_per_chip_1024x512",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": err,
    }))
    sys.stdout.flush()
    import os

    os._exit(1)


def _arm_run_watchdog():
    """Whole-run watchdog: the axon tunnel has been observed to go dark not
    only at device init (2026-08-17 outage) but potentially mid-run (remote
    compiles, step execution). If main() hasn't finished in RUN_TIMEOUT_S,
    emit the honest null JSON and exit nonzero instead of hanging forever."""
    import threading

    t = threading.Timer(
        RUN_TIMEOUT_S,
        lambda: _fail_json_and_exit(
            f"bench run exceeded {RUN_TIMEOUT_S:.0f}s "
            f"(axon tunnel hang mid-run)"))
    t.daemon = True
    t.start()
    return t


def _devices_or_die():
    """jax.devices() with a tighter watchdog than the whole-run one, so a
    dark-at-init tunnel (the observed outage mode) fails in 10 min, not 45."""
    import threading

    import jax

    box = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as exc:  # noqa: BLE001 — report, don't raise
            box["error"] = str(exc)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(DEVICE_INIT_TIMEOUT_S)
    if "devices" in box:
        return box["devices"]
    _fail_json_and_exit(box.get(
        "error",
        f"TPU device init unresponsive after {DEVICE_INIT_TIMEOUT_S:.0f}s "
        f"(axon tunnel outage)"))


def main():
    import jax
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
    from fcn8s_tensorflow_tpu.parallel.mesh import create_mesh, shard_batch
    from fcn8s_tensorflow_tpu.parallel.steps import (
        compile_predict_step,
        compile_train_step,
        create_train_state,
        make_optimizer,
    )

    log(f"devices: {_devices_or_die()}")
    mesh = create_mesh()
    n_chips = mesh.devices.size
    rng = np.random.default_rng(0)

    params = jax.jit(lambda k: init_fcn8s(k, NUM_CLASSES))(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)

    # ---- train throughput @ 1024x512 ----
    step = compile_train_step(mesh, optimizer, NUM_CLASSES, example_state=state)
    im, lb, mk = shard_batch(
        mesh,
        rng.integers(0, 255, (TRAIN_BATCH, H, W, 3), np.uint8),
        rng.integers(0, NUM_CLASSES, (TRAIN_BATCH, H, W), np.uint8),
        np.ones((TRAIN_BATCH,), np.float32),
    )
    key = jax.random.key(1, impl="rbg")  # TPU hardware RNG path (engine default)
    for _ in range(WARMUP):
        state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
    float(loss)  # hard sync (block_until_ready is a no-op on the axon platform)
    t0 = time.time()
    for _ in range(ITERS):
        state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
    float(loss)
    train_dt = (time.time() - t0) / ITERS
    train_imgs_per_sec = TRAIN_BATCH / train_dt
    log(f"train: {train_dt * 1e3:.1f} ms/step -> {train_imgs_per_sec:.1f} img/s")

    # ---- measured MFU (VERDICT r3 #4) ----
    # Analytic step FLOPs from the model_summary MAC census: training is
    # fwd + dgrad + wgrad ~= 3x forward MACs, 2 FLOPs per MAC. Peak is the
    # per-chip bf16 matmul peak for the detected device kind; mfu is null
    # (never guessed) on unknown hardware.
    # Ordered substring match against jax device_kind. Real kind strings:
    # v5e reports "TPU v5 lite", v5p reports "TPU v5"/"TPU v5p" (release-
    # dependent) — so the lite entries MUST precede the bare "TPU v5" one,
    # which would otherwise shadow them.
    _PEAK_BF16_TFLOPS = (
        ("TPU v5 lite", 197.0),  # v5e datasheet bf16 peak per chip
        ("TPU v5e", 197.0),
        ("TPU v6 lite", 918.0),  # Trillium
        ("TPU v6e", 918.0),
        ("TPU v5p", 459.0),
        ("TPU v5", 459.0),       # v5p's historical device_kind
        ("TPU v4", 275.0),
    )

    def _mfu_extras():
        from fcn8s_tensorflow_tpu.utils.summary import model_summary_rows

        # only shapes are read — no D2H of the 134M params
        fwd_macs = sum(
            r["macs"] for r in model_summary_rows(
                state.params, input_hw=(H, W), batch=TRAIN_BATCH))
        step_tflops = 3 * 2 * fwd_macs / 1e12
        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in _PEAK_BF16_TFLOPS if k in kind), None)
        mfu = (step_tflops / (train_dt * n_chips)) / peak if peak else None
        log(f"mfu: {step_tflops:.2f} TFLOP/step analytic, device '{kind}' "
            f"peak {peak} TFLOPS -> {'%.3f' % mfu if mfu else 'n/a'}")
        return {
            "train_step_analytic_tflops": round(step_tflops, 2),
            "peak_bf16_tflops_per_chip": peak,
            "mfu": round(mfu, 3) if mfu is not None else None,
        }

    # ---- inference throughput + p50 latency (batch 1) ----
    # uint8 ids D2H — the facade predict() path (ids travel compact, int32
    # on host): at the tunnel's ~44 MB/s D2H this is 4x less payload than
    # int32 (0.5 vs 2.1 MB), measured -36 ms off batch-1 p50
    pred_fn = compile_predict_step(mesh, argmax=True, example_params=state.params,
                                   id_dtype=jnp.uint8)
    one = shard_batch(mesh, rng.integers(0, 255, (max(1, n_chips), H, W, 3), np.uint8))
    for _ in range(WARMUP):
        out = pred_fn(state.params, one)
    np.asarray(out)
    latencies = []
    for _ in range(ITERS):
        t0 = time.time()
        out = pred_fn(state.params, one)
        np.asarray(out)  # hard sync incl. D2H of the argmax map
        latencies.append(time.time() - t0)
    p50 = float(np.median(latencies))
    infer_imgs_per_sec = one.shape[0] / p50
    log(f"infer: p50 {p50 * 1e3:.1f} ms -> {infer_imgs_per_sec:.1f} img/s")

    # batch-1 decomposition is an extra too: guard it so probe
    # failures on a degraded tunnel can't block the JSON line
    try:
        # ---- batch-1 latency decomposition (VERDICT r2 #4) ----
        # The p50 above = dispatch + compute + D2H of the full argmax map (the
        # input is device-resident; H2D is NOT in p50, reported separately).
        # Probes publish RAW wall medians; derived estimates subtract the
        # scalar-sync floor. On this tunneled transport the per-RPC cost also
        # scales with program/payload, so the estimates sum BELOW total_p50 —
        # the residual is reported as unattributed_transport_ms rather than
        # hidden. The checkable claims: compute <= compute_sync_ms (small), and
        # D2H payload scales with bytes at the measured bandwidth.
        def _median_time(fn, iters=ITERS):
            ts = []
            for _ in range(iters):
                t = time.time()
                fn()
                ts.append(time.time() - t)
            return float(np.median(ts))

        # NB: a jax.Array caches its fetched host value, so every probe must
        # produce a FRESH device array (x + 0 under jit) or the repeat reads 0 ms.
        tiny = jax.device_put(np.zeros((), np.float32))
        fresh = jax.jit(lambda x: x + 0)
        np.asarray(fresh(tiny))  # compile
        rt_ms = _median_time(lambda: np.asarray(fresh(tiny))) * 1e3

        resident_out = pred_fn(state.params, one)
        payload_bytes = int(np.asarray(resident_out).nbytes)
        fresh_out = jax.jit(lambda x: x + 0)
        np.asarray(fresh_out(resident_out))  # compile
        d2h_raw_ms = _median_time(lambda: np.asarray(fresh_out(resident_out))) * 1e3

        first_px = jax.jit(lambda x: x.reshape(-1)[:1] + 0)
        np.asarray(first_px(resident_out))  # compile
        compute_raw_ms = _median_time(
            lambda: np.asarray(first_px(pred_fn(state.params, one)))) * 1e3

        host_img = np.asarray(one)
        h2d_raw_ms = _median_time(
            lambda: np.asarray(first_px(jax.device_put(host_img)))) * 1e3

        compute_est = max(compute_raw_ms - rt_ms, 0.0)
        d2h_est = max(d2h_raw_ms - rt_ms, 0.0)
        d2h_bandwidth = payload_bytes / 1e6 / max(d2h_est / 1e3, 1e-9)
        total_ms = p50 * 1e3
        batch1_breakdown = {
            "total_p50_ms": round(total_ms, 1),
            "scalar_sync_floor_ms": round(rt_ms, 1),
            "compute_sync_ms": round(compute_raw_ms, 1),
            "resident_output_d2h_ms": round(d2h_raw_ms, 1),
            "h2d_input_sync_ms_not_in_p50": round(h2d_raw_ms, 1),
            "compute_ms_est": round(compute_est, 1),
            "d2h_payload_ms_est": round(d2h_est, 1),
            "payload_bytes": payload_bytes,
            "d2h_bandwidth_MB_per_s": round(d2h_bandwidth, 1),
            "unattributed_transport_ms": round(
                max(total_ms - rt_ms - compute_est - d2h_est, 0.0), 1),
        }
        log(f"batch-1 breakdown: sync floor {rt_ms:.1f} ms, compute est "
            f"{compute_est:.1f} ms, D2H est {d2h_est:.1f} ms "
            f"({payload_bytes / 1e6:.2f} MB @ {d2h_bandwidth:.1f} MB/s), "
            f"H2D (not in p50) {h2d_raw_ms:.1f} ms, unattributed transport "
            f"{batch1_breakdown['unattributed_transport_ms']:.1f} ms")
    except Exception as exc:  # noqa: BLE001
        log(f"SKIPPED batch-1 breakdown: {type(exc).__name__}: {exc}")
        batch1_breakdown = None

    # ---- batched pipelined inference (the serving path) ----
    # Double-buffered dispatch: batch i+1 is in flight while batch i's
    # (compact uint8) argmax map D2Hs — engine.predict_and_save's pipeline.
    # Every section below is an EXTRA: each is individually guarded so a
    # degraded tunnel (compiles have been observed taking 10+ min under
    # load) can never prevent the mandatory one-line JSON from printing.
    from collections import deque

    INFER_BATCH = 8 * max(1, n_chips)
    INFER_REPS = 3  # repeat every D2H-bound row: the tunnel swings 30-60%
    b8 = shard_batch(mesh, rng.integers(0, 255, (INFER_BATCH, H, W, 3), np.uint8))

    def setup_row(fn, params_):
        """Warm a serving row strictly OUTSIDE every timed window (compiles,
        lazily-dispatched param computation), and take its compute-only
        measurement: output stays device-resident, hard sync via a
        1-element D2H (`block_until_ready` is a no-op on this platform) —
        so "the chip got slower" and "the tunnel got slower" are
        distinguishable in the artifact."""
        for _ in range(WARMUP):
            np.asarray(fn(params_, b8))
        first_px = jax.jit(lambda x: x.reshape(-1)[:1] + 0)
        np.asarray(first_px(fn(params_, b8)))  # compile the probe
        compute_ms = []
        for _ in range(ITERS):
            t0 = time.time()
            np.asarray(first_px(fn(params_, b8)))
            compute_ms.append((time.time() - t0) * 1e3)
        return float(np.median(compute_ms))

    def pipelined_once(fn, params_):
        """One timed pipelined (double-buffered dispatch) loop -> img/s."""
        t0 = time.time()
        pending = deque()
        for _ in range(ITERS):
            pending.append(fn(params_, b8))
            if len(pending) >= 2:
                np.asarray(pending.popleft())
        while pending:
            np.asarray(pending.popleft())
        return INFER_BATCH / ((time.time() - t0) / ITERS)

    def row_stats(tag, rates, compute_sync_ms):
        med = float(np.median(rates))
        stats = {
            "images_per_sec_per_chip": round(med / n_chips, 2),
            "images_per_sec_per_chip_min": round(min(rates) / n_chips, 2),
            "images_per_sec_per_chip_max": round(max(rates) / n_chips, 2),
            "spread_pct": round(100.0 * (max(rates) - min(rates)) / med, 1),
            "reps": len(rates),
            "compute_sync_ms": round(compute_sync_ms, 1),
            "interleaved_reps": True,
        }
        log(f"infer {tag}: median {INFER_BATCH / med * 1e3:.1f} ms/batch{INFER_BATCH} "
            f"-> {med:.1f} img/s (min {min(rates):.1f}, max {max(rates):.1f}, "
            f"spread {stats['spread_pct']:.0f}%), compute-sync "
            f"{compute_sync_ms:.1f} ms")
        return stats

    def guarded(section, fn):
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — extras must not kill the JSON
            log(f"SKIPPED {section}: {type(exc).__name__}: {exc}")
            return None

    def _batched():
        pred8 = compile_predict_step(
            mesh, argmax=True, example_params=state.params, id_dtype=jnp.uint8)
        return pred8, state.params

    def _int8():
        # calibrated-static activation scales: measured 30.0 vs 35.6 ms/batch8
        # compute vs dynamic quantization (ops/quantize.py)
        from fcn8s_tensorflow_tpu.ops.quantize import (
            collect_activation_absmax,
            quantize_fcn8s_params,
        )

        absmax = jax.jit(collect_activation_absmax)(state.params, b8)
        qparams = jax.jit(quantize_fcn8s_params)(state.params, absmax)
        # hard-sync the quantized params so calibration/quantization compute
        # is STRICTLY outside every timed window below (dispatch is async
        # and block_until_ready is a no-op on this platform: fetch one
        # element of one output leaf — the executable runs as a unit)
        np.asarray(jax.tree.leaves(qparams)[0]).ravel()[:1]
        pred_q = compile_predict_step(
            mesh, argmax=True, example_params=qparams, id_dtype=jnp.uint8,
            quantized=True)
        return pred_q, qparams

    def _overlay():
        from fcn8s_tensorflow_tpu.labels import TRAINIDS_TO_RGBA_DICT

        lut = np.zeros((NUM_CLASSES, 4), np.float32)
        for cid, rgba in TRAINIDS_TO_RGBA_DICT.items():
            if 0 <= cid < NUM_CLASSES:
                lut[cid] = rgba
        pred_ov = compile_predict_step(
            mesh, argmax=True, example_params=state.params, overlay_lut=lut)
        return pred_ov, state.params

    mfu_extras = guarded("mfu", _mfu_extras) or {
        "train_step_analytic_tflops": None,
        "peak_bf16_tflops_per_chip": None,
        "mfu": None,
    }

    # Variance discipline for the D2H-bound serving rows (VERDICT r4 #1):
    # all setup (compiles, calibration, quantization) runs first; the timed
    # pipelined reps then run INTERLEAVED round-robin across the rows, so
    # every rep of every row shares the same tunnel weather and between-row
    # comparisons (bf16 vs int8 vs overlay) are fair. Round 4's 23-vs-45
    # img/s int8 "inversion" (and this round's mirror image, 28.8 bf16 vs
    # 63.2 int8 when measured minutes apart) was exactly non-interleaved
    # rows sampling different transport weather on the time-shared tunnel.
    rows = {}
    for tag, setup in (("batched", _batched), ("int8", _int8),
                       ("overlay", _overlay)):
        prepared = guarded(tag, setup)
        if prepared is not None:
            fn, pr = prepared
            cs = guarded(f"{tag} setup", lambda f=fn, p=pr: setup_row(f, p))
            if cs is not None:
                rows[tag] = (fn, pr, cs, [])
    for _ in range(INFER_REPS):
        for tag, (fn, pr, _cs, rates) in rows.items():
            r = guarded(f"{tag} rep", lambda f=fn, p=pr: pipelined_once(f, p))
            if r is not None:
                rates.append(r)
    stats_by_tag = {
        tag: row_stats(tag, rates, cs)
        for tag, (_f, _p, cs, rates) in rows.items() if rates
    }
    batched_stats = stats_by_tag.get("batched")
    quant_stats = stats_by_tag.get("int8")
    overlay_stats = stats_by_tag.get("overlay")

    def _median_rate(stats):
        return stats["images_per_sec_per_chip"] if stats else None

    result = {
        "metric": "fcn8s_train_images_per_sec_per_chip_1024x512",
        "value": round(train_imgs_per_sec / n_chips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(
            train_imgs_per_sec / n_chips / BASELINE_TF_CPU_TRAIN_IMGS_PER_SEC, 1
        ),
        "extras": {
            "train_batch": TRAIN_BATCH,
            "train_ms_per_step": round(train_dt * 1e3, 1),
            **mfu_extras,
            "infer_images_per_sec_per_chip": round(infer_imgs_per_sec / n_chips, 2),
            "infer_p50_latency_ms_batch1": round(p50 * 1e3, 1),
            "infer_batch1_latency_spread": {
                "min_ms": round(float(np.min(latencies)) * 1e3, 1),
                "max_ms": round(float(np.max(latencies)) * 1e3, 1),
                "iters": ITERS,
            },
            "infer_batch1_breakdown": batch1_breakdown,
            # medians kept under the legacy key names for cross-round
            # comparability; full repeat/min/max/spread + compute-sync stats
            # per row under *_stats (VERDICT r4: D2H-bound rows swing with
            # the time-shared tunnel — a single number is not comparable)
            "infer_batched_images_per_sec_per_chip": _median_rate(batched_stats),
            "infer_batched_batch": INFER_BATCH,
            "infer_batched_stats": batched_stats,
            "infer_overlay_images_per_sec_per_chip": _median_rate(overlay_stats),
            "infer_overlay_stats": overlay_stats,
            "infer_int8_images_per_sec_per_chip": _median_rate(quant_stats),
            "infer_int8_stats": quant_stats,
            "infer_vs_baseline": round(
                infer_imgs_per_sec / n_chips / BASELINE_TF_CPU_INFER_IMGS_PER_SEC, 1
            ),
            "n_chips": n_chips,
            "resolution": f"{H}x{W}",
            "baseline": "TF-CPU reference-equivalent on this host (tools/tf_cpu_baseline.py)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    _watchdog = _arm_run_watchdog()
    main()
    _watchdog.cancel()
