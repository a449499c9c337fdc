"""A/B: ignore_label training cost — masked fast path vs dense kernel, on TPU.

Round-3 finding (VERDICT r3 weak #2): `FCN8s(num_classes=19, ignore_label=255)`
trained at 129.3 ms/step vs the unmasked 110.1 — the per-pixel-weight masked
CE fell off the per-sample Pallas fast path. Round 4 adds a masked fast path
(`ops/pallas_kernels.py::masked_softmax_cross_entropy_pallas`): ignored
pixels' logit rows are blended to a neutral row whose CE contribution is
exactly 0.0, so the UNMASKED per-sample kernel runs unchanged (only the
normalization swaps in the valid-pixel count). Measured 113.5 ms/step vs
baseline 109.4 (+3.7%) and dense 160.7; two dedicated masked-kernel designs
that measured worse are documented in the function's docstring.

Three steps timed in ONE process (the axon tunnel is time-shared):
  baseline   19 classes, no ignore              (the unmasked fast path)
  masked     ignore_label=255                   (the NEW masked fast path)
  dense      ignore_label=255 + unit class_weights
             (identical per-pixel weights, but forced onto the dense
             per-pixel-weight kernel — round 3's only masked path)

Also cross-checks the masked/dense loss values agree on the same batch.

Run:  python benchmarks/ignore_label_bench.py        (real TPU, ~4 min)
Prints one JSON line on stdout; chatter on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 1024, 512
BATCH = 8
NUM_CLASSES = 19
IGNORE = 255
WARMUP = 3
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
    from fcn8s_tensorflow_tpu.parallel.mesh import create_mesh, shard_batch
    from fcn8s_tensorflow_tpu.parallel.steps import (
        compile_train_step,
        create_train_state,
        make_optimizer,
    )

    log(f"devices: {jax.devices()}")
    mesh = create_mesh()
    rng = np.random.default_rng(0)

    optimizer = make_optimizer()

    def fresh_state():
        # the train step donates its state buffers — each timed section
        # needs its own
        params = jax.jit(lambda k: init_fcn8s(k, NUM_CLASSES))(jax.random.PRNGKey(0))
        return create_train_state(params, optimizer)

    labels_np = rng.integers(0, NUM_CLASSES, (BATCH, H, W), dtype=np.uint8)
    labels_np[rng.random((BATCH, H, W)) < 0.25] = IGNORE  # ~25% ignored
    im, lb, mk = shard_batch(
        mesh,
        rng.integers(0, 255, (BATCH, H, W, 3), np.uint8),
        labels_np,
        np.ones((BATCH,), np.float32),
    )
    key = jax.random.key(1, impl="rbg")

    def timed(tag, **step_kwargs):
        state = fresh_state()
        step = compile_train_step(mesh, optimizer, NUM_CLASSES,
                                  example_state=state, **step_kwargs)
        for _ in range(WARMUP):
            state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
        first_loss = float(loss)  # hard sync (block_until_ready no-op on axon)
        t0 = time.time()
        for _ in range(ITERS):
            state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
        float(loss)
        dt = (time.time() - t0) / ITERS
        log(f"{tag}: {dt * 1e3:.1f} ms/step ({BATCH / dt:.1f} img/s), "
            f"loss@warm {first_loss:.6f}")
        return dt, first_loss

    dt_base, _ = timed("baseline (no ignore)")
    dt_masked, loss_masked = timed("masked fast path", ignore_label=IGNORE)
    dt_dense, loss_dense = timed("dense kernel (unit class_weights)",
                                 ignore_label=IGNORE,
                                 class_weights=(1.0,) * NUM_CLASSES)

    rel = abs(loss_masked - loss_dense) / max(abs(loss_dense), 1e-9)
    log(f"masked-vs-dense loss agreement: {loss_masked:.6f} vs "
        f"{loss_dense:.6f} (rel {rel:.2e})")

    print(json.dumps({
        "metric": "ignore_label_train_ms_per_step_1024x512",
        "unit": "ms/step",
        "shape": f"{BATCH}x{H}x{W}x{NUM_CLASSES}",
        "baseline_no_ignore_ms": round(dt_base * 1e3, 1),
        "masked_fast_ms": round(dt_masked * 1e3, 1),
        "dense_kernel_ms": round(dt_dense * 1e3, 1),
        "masked_overhead_vs_baseline_pct": round(100 * (dt_masked / dt_base - 1), 1),
        "dense_overhead_vs_baseline_pct": round(100 * (dt_dense / dt_base - 1), 1),
        "loss_rel_disagreement": float(f"{rel:.3e}"),
    }))


if __name__ == "__main__":
    main()
