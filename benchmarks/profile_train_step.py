"""Per-op profile of the compiled FCN-8s train step on the real TPU.

Captures a ``jax.profiler`` trace of a few steady-state steps, parses the
XPlane protobuf (via TensorFlow's bundled proto defs), and prints the ops
ranked by total device time. This is the tool behind the per-op findings
recorded in TODO.md ("Perf leads").

Usage::

    python benchmarks/profile_train_step.py [--steps N] [--top K]

The reference has no profiling story at all (SURVEY.md §5); this plus
``utils/profiling.py`` is the TPU-native replacement.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 1024, 512
BATCH = 8
NUM_CLASSES = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_xplane(trace_dir: str, top: int = 40):
    """Aggregate per-op durations from the newest xplane.pb under trace_dir.

    Returns ([(op_name, total_ms, count)], device_total_ms, n_steps) for
    ONE device plane (the first — per-chip numbers, not summed across
    chips). ``n_steps`` is read from the plane's own "Steps" line (0 if
    absent), so --parse-only reports per-step times for whatever step
    count the trace was captured with."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # TF 2.21 bundles this

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    # device planes are named "/device:TPU:N"; only the synchronous
    # "XLA Ops" line gives additive per-op times ("Async XLA Ops" are
    # overlapped DMA copy-starts; "XLA Modules" is the whole step).
    plane = next(
        (p for p in space.planes if p.name.lower().startswith("/device:")), None
    )
    if plane is None:
        raise ValueError(f"no device plane in {paths[-1]}")

    totals: dict[str, float] = defaultdict(float)
    counts: dict[str, int] = defaultdict(int)
    device_total_ps = 0
    n_steps = 0
    for line in plane.lines:
        if line.name == "Steps":
            n_steps = len(line.events)
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            name = meta.name.split(" = ")[0] if " = " in meta.name else meta.name
            totals[name] += ev.duration_ps / 1e9  # ps -> ms
            counts[name] += 1
            device_total_ps += ev.duration_ps
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    return ([(n, ms, counts[n]) for n, ms in ranked[:top]],
            device_total_ps / 1e9, n_steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--keep-trace", default=None, help="directory to keep the trace in")
    ap.add_argument("--parse-only", default=None,
                    help="skip the run; parse an existing trace directory")
    ap.add_argument("--ignore-label", type=int, default=None,
                    help="profile the masked (ignore_label) train step; GT "
                         "gets ~25%% ignored pixels")
    ap.add_argument("--augment", action="store_true",
                    help="profile the step with the full device-augment set "
                         "compiled in (flip+brightness+fused translate/scale"
                         "+label_noise) — attributes the geometric-resample "
                         "and augment fusions")
    ap.add_argument("--num-classes", type=int, default=NUM_CLASSES,
                    help="match ignore_label_bench.py's 19-class Cityscapes-"
                         "trainIds step with 19 (the masked-CE blend compiles "
                         "differently at 19 vs the flagship 20 — see TODO.md)")
    args = ap.parse_args()

    if args.parse_only:
        ranked, device_total_ms, n_steps = parse_xplane(args.parse_only, args.top)
        steps = n_steps or args.steps
        print(f"device total: {device_total_ms:.1f} ms over {steps} steps "
              f"({'from trace' if n_steps else 'assumed'})")
        for name, ms, cnt in ranked:
            print(f"{name[:60]:<60} {ms:9.2f} {ms / steps:8.2f} {cnt:6d}")
        return

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

    nc = args.num_classes
    params = jax.jit(lambda k: init_fcn8s(k, nc))(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    augment_fn = None
    if args.augment:
        from fcn8s_tensorflow_tpu.ops.augment_device import make_augment_fn

        augment_fn = make_augment_fn(
            flip=0.5, brightness=(0.8, 1.2, 0.5),
            translate=((0, 16), (0, 8), 0.5), scale=(0.8, 1.2, 0.5),
            label_noise=(0.05, 4, nc))
    step = compile_train_step(mesh, optimizer, nc, example_state=state,
                              ignore_label=args.ignore_label,
                              augment_fn=augment_fn)
    labels_np = rng.integers(0, nc, (args.batch, H, W), dtype=np.uint8)
    if args.ignore_label is not None:
        labels_np[rng.random(labels_np.shape) < 0.25] = args.ignore_label
    im, lb, mk = shard_batch(
        mesh,
        rng.integers(0, 255, (args.batch, H, W, 3), np.uint8),
        labels_np,
        np.ones((args.batch,), np.float32),
    )
    key = jax.random.key(1, impl="rbg")

    for _ in range(3):
        state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
    float(loss)  # hard sync

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="fcn8s_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.steps):
        state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
    float(loss)
    jax.profiler.stop_trace()
    log(f"trace in {trace_dir}")

    ranked, device_total_ms, n_steps = parse_xplane(trace_dir, args.top)
    steps = n_steps or args.steps
    per_step = device_total_ms / steps
    print(f"device total: {device_total_ms:.1f} ms over {steps} steps "
          f"({per_step:.1f} ms/step)")
    print(f"{'op':<60} {'total ms':>9} {'ms/step':>8} {'count':>6}")
    for name, ms, cnt in ranked:
        print(f"{name[:60]:<60} {ms:9.2f} {ms / steps:8.2f} {cnt:6d}")


if __name__ == "__main__":
    main()
