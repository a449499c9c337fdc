"""Convergence benchmark: full-width FCN-8s learning a synthetic multi-class
segmentation task on real hardware.

The reference's only quality number (38.2% Cityscapes val mIoU) needs the
Cityscapes dataset; this benchmark provides a dataset-free training-quality
check: a procedurally generated 6-class scene (sky band / road band /
randomly placed "car", "building", "person", "vegetation" rectangles with
class-correlated colors + noise) that a correct training stack must learn to
high mIoU within a few hundred steps.

Records per-eval mIoU/accuracy/loss into benchmarks/convergence_results.json.

    python benchmarks/convergence_synthetic.py [--steps 300] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CLASS_COLORS = {
    1: (128, 64, 128),   # road
    2: (70, 130, 180),   # sky
    3: (0, 0, 142),      # car
    4: (70, 70, 70),     # building
    5: (220, 20, 60),    # person
}
NUM_CLASSES = 6  # 0 = void/background


def synth_batch(rng, n, h, w):
    images = np.zeros((n, h, w, 3), np.int16)
    labels = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        horizon = rng.integers(h // 4, h // 2)
        labels[i, :horizon] = 2
        images[i, :horizon] = CLASS_COLORS[2]
        labels[i, horizon:] = 1
        images[i, horizon:] = CLASS_COLORS[1]
        for cls in (4, 3, 5):  # buildings, cars, people (draw order)
            for _ in range(rng.integers(1, 4)):
                bh = rng.integers(h // 8, h // 3)
                bw = rng.integers(w // 10, w // 4)
                y0 = rng.integers(0, h - bh)
                x0 = rng.integers(0, w - bw)
                labels[i, y0:y0 + bh, x0:x0 + bw] = cls
                images[i, y0:y0 + bh, x0:x0 + bw] = CLASS_COLORS[cls]
    images = np.clip(images + rng.integers(-30, 30, images.shape), 0, 255).astype(np.uint8)
    return images, labels


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--resolution", type=int, nargs=2, default=[256, 512])
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--variant", default="fcn8s",
                   choices=["fcn8s", "fcn16s", "fcn32s"])
    p.add_argument("--miou-floor", type=float, default=None,
                   help="override the pass threshold (default 0.5 for fcn8s, "
                        "0.35 for the coarser variants)")
    args = p.parse_args()
    if args.steps < args.eval_every:
        p.error(f"--steps ({args.steps}) must be >= --eval-every ({args.eval_every})")

    from fcn8s_tensorflow_tpu import FCN8s
    from fcn8s_tensorflow_tpu.engine.schedules import constant

    h, w = args.resolution
    rng = np.random.default_rng(0)

    def gen():
        while True:
            yield synth_batch(rng, args.batch, h, w)

    eval_rng = np.random.default_rng(999)
    eval_batches = [synth_batch(eval_rng, args.batch, h, w) for _ in range(4)]

    def eval_gen():
        while True:
            yield from eval_batches

    model = FCN8s(num_classes=NUM_CLASSES, variant=args.variant)
    history = []
    t0 = time.time()
    epochs = args.steps // args.eval_every
    for phase in range(epochs):
        model.train(
            gen(), epochs=1, steps_per_epoch=args.eval_every,
            learning_rate_schedule=constant(1e-4), keep_prob=0.5,
            record_summaries=False,
        )
        values = model.evaluate(eval_gen(), num_batches=4, dataset="val")
        values["step"] = int(model.state.step)
        values["wall_s"] = round(time.time() - t0, 1)
        history.append(values)
        print(f"step {values['step']}: mIoU={values['mean_iou']:.4f} "
              f"acc={values['accuracy']:.4f} loss={values['loss']:.4f}", flush=True)

    suffix = "" if args.variant == "fcn8s" else f"_{args.variant}"
    out = os.path.join(os.path.dirname(__file__),
                       f"convergence_results{suffix}.json")
    with open(out, "w") as f:
        json.dump({"config": vars(args), "history": history}, f, indent=2)
    print("wrote", out)
    final = history[-1]
    floor = args.miou_floor if args.miou_floor is not None else (
        0.5 if args.variant == "fcn8s" else 0.35)  # coarser variants segment coarser
    assert final["mean_iou"] > floor, f"convergence regression: final mIoU {final['mean_iou']}"
    print(f"PASS: final mIoU {final['mean_iou']:.3f} at step {final['step']}")


if __name__ == "__main__":
    main()
