"""A/B: on-device overlay-compositing formulations for the serving path.

Round-5 bench trial measured the overlay serving row at 77.1 ms compute-sync
vs the plain-argmax row's 57.4 ms @8x1024x512 — a ~20 ms gap for what is
analytically a <1 ms LUT gather + alpha blend (~100 MB of HBM traffic).
Hypothesis: the `(C, 4) f32` row-gather materializes an (N, H, W, 4) f32
intermediate whose 4-wide minor dim lane-pads 4 -> 128 on TPU (32x HBM
inflation, ~2.1 GB), exactly the conv1-block padding story from TODO.md.

Candidates (all bit-identical to the shipped formulation — same f32 ops in
the same order, verified by full-output compare in this script):
  v0_gather4   the shipped (C,4) row gather (parallel/steps.py:449-455)
  v1_planar    four (C,) planar gathers; per-channel blend; stack at the end
  v2_packed32  one (C,) uint32 gather (RGBA byte-packed), VPU bit-unpack
  v3_selects   no gather: per-class compare+select accumulation (C compares,
               4C selects), fully fusible elementwise

Run on the real TPU:  python benchmarks/overlay_bench.py
Prints one JSON line; in-process A/B (the axon tunnel is time-shared, so
cross-process comparisons are meaningless — CLAUDE.md). Timing is
compute-sync style: outputs stay device-resident, hard sync via a
1-element D2H probe (block_until_ready is a no-op on this platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H = int(os.environ.get("OVERLAY_BENCH_H", 1024))
W = int(os.environ.get("OVERLAY_BENCH_W", 512))
BATCH = int(os.environ.get("OVERLAY_BENCH_BATCH", 8))
NUM_CLASSES = 20
WARMUP = int(os.environ.get("OVERLAY_BENCH_WARMUP", 3))
ITERS = int(os.environ.get("OVERLAY_BENCH_ITERS", 10))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    if os.environ.get("OVERLAY_BENCH_CPU"):  # correctness smoke off-TPU
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.labels import TRAINIDS_TO_RGBA_DICT
    from fcn8s_tensorflow_tpu.models.fcn8s import apply_fcn8s, init_fcn8s

    lut = np.zeros((NUM_CLASSES, 4), np.float32)
    for cid, rgba in TRAINIDS_TO_RGBA_DICT.items():
        if 0 <= cid < NUM_CLASSES:
            lut[cid] = rgba

    def pred_ids(params, images):
        logits = apply_fcn8s(params, images, deterministic=True,
                             compute_dtype=jnp.bfloat16, logits_dtype=jnp.bfloat16,
                             packed_final=True)
        pred = jnp.argmax(logits, axis=-1)  # (n, H/s, W/s, s, s)
        n, h, w, s, _ = pred.shape
        return jnp.transpose(pred, (0, 1, 3, 2, 4)).reshape(n, h * s, w * s)

    def argmax_row(params, images):
        return pred_ids(params, images).astype(jnp.uint8)

    def v0_gather4(params, images):
        pred = pred_ids(params, images)
        rgba = jnp.asarray(lut, jnp.float32)[pred]  # (N,H,W,4)
        alpha = rgba[..., 3:4] * (1.0 / 255.0)
        out = images.astype(jnp.float32) * (1.0 - alpha) + rgba[..., :3] * alpha
        return jnp.floor(out).astype(jnp.uint8)

    def _planar_blend(pred, images, chan):
        """Per-channel blend from four (C,) tables; same f32 ops/order as v0."""
        alpha = chan[3][pred] * (1.0 / 255.0)  # (N,H,W)
        outs = [
            images[..., c].astype(jnp.float32) * (1.0 - alpha) + chan[c][pred] * alpha
            for c in range(3)
        ]
        return jnp.floor(jnp.stack(outs, axis=-1)).astype(jnp.uint8)

    def v1_planar(params, images):
        pred = pred_ids(params, images)
        chan = [jnp.asarray(lut[:, c]) for c in range(4)]
        return _planar_blend(pred, images, chan)

    def v2_packed32(params, images):
        pred = pred_ids(params, images)
        packed = (lut.astype(np.uint32)[:, 0]
                  | (lut.astype(np.uint32)[:, 1] << 8)
                  | (lut.astype(np.uint32)[:, 2] << 16)
                  | (lut.astype(np.uint32)[:, 3] << 24))
        v = jnp.asarray(packed)[pred]  # (N,H,W) u32
        chan = [((v >> (8 * c)) & jnp.uint32(255)).astype(jnp.float32)
                for c in range(4)]
        alpha = chan[3] * (1.0 / 255.0)
        outs = [
            images[..., c].astype(jnp.float32) * (1.0 - alpha) + chan[c] * alpha
            for c in range(3)
        ]
        return jnp.floor(jnp.stack(outs, axis=-1)).astype(jnp.uint8)

    def v3_selects(params, images):
        pred = pred_ids(params, images)
        zero = jnp.zeros(pred.shape, jnp.float32)
        chan = [zero, zero, zero, zero]
        for cls in range(NUM_CLASSES):
            m = pred == cls
            for c in range(4):
                if lut[cls, c] != 0.0:
                    chan[c] = jnp.where(m, jnp.float32(lut[cls, c]), chan[c])
        alpha = chan[3] * (1.0 / 255.0)
        outs = [
            images[..., c].astype(jnp.float32) * (1.0 - alpha) + chan[c] * alpha
            for c in range(3)
        ]
        return jnp.floor(jnp.stack(outs, axis=-1)).astype(jnp.uint8)

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")
    params = jax.jit(lambda k: init_fcn8s(k, NUM_CLASSES))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (BATCH, H, W, 3), np.uint8))

    first_px = jax.jit(lambda x: x.reshape(-1)[:1] + 0)

    def sync_ms(fn):
        jfn = jax.jit(fn)
        for _ in range(WARMUP):
            np.asarray(first_px(jfn(params, images)))
        samples = []
        for _ in range(ITERS):
            t0 = time.time()
            np.asarray(first_px(jfn(params, images)))
            samples.append((time.time() - t0) * 1e3)
        return float(np.median(samples)), jfn

    rows = {}
    outputs = {}
    variants = [("argmax_u8", argmax_row), ("v0_gather4", v0_gather4),
                ("v1_planar", v1_planar), ("v2_packed32", v2_packed32),
                ("v3_selects", v3_selects)]
    for name, fn in variants:
        ms, jfn = sync_ms(fn)
        rows[name] = round(ms, 1)
        log(f"{name}: {ms:.1f} ms compute-sync /batch{BATCH}")
        if name != "argmax_u8":
            outputs[name] = np.asarray(jfn(params, images))

    ref = outputs["v0_gather4"]
    identical = {k: bool(np.array_equal(v, ref)) for k, v in outputs.items()}
    log(f"bit-identity vs v0: {identical}")

    print(json.dumps({
        "bench": "overlay_compositing_ab",
        "shape": [BATCH, H, W],
        "compute_sync_ms": rows,
        "bit_identical_vs_v0": identical,
        "device": dev.device_kind,
    }))
    if not all(identical.values()):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
