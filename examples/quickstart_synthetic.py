"""Self-contained quickstart: no dataset required.

Generates a tiny synthetic Cityscapes-style dataset, trains FCN-8s for a few
steps, evaluates, renders overlays and a viewer gallery. Good as a smoke
test of the full stack on whatever accelerator is present.

    python examples/quickstart_synthetic.py [--steps 24] [--out /tmp/quickstart]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from fcn8s_tensorflow_tpu import FCN8s
from fcn8s_tensorflow_tpu.data.generator import BatchGenerator
from fcn8s_tensorflow_tpu.engine.schedules import constant
from fcn8s_tensorflow_tpu.labels import (
    IDS_TO_TRAINIDS_ARRAY,
    NUM_TRAIN_CLASSES,
    TRAINIDS_TO_RGBA_DICT,
)


def make_synthetic_dataset(root: str, n: int = 8, hw=(128, 256)) -> None:
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "leftImg8bit/train/synth")
    gt_dir = os.path.join(root, "gtFine/train/synth")
    os.makedirs(img_dir), os.makedirs(gt_dir)
    h, w = hw
    for i in range(n):
        lbl = np.zeros((h, w), np.uint8)
        lbl[:, : w // 3] = 7       # road
        lbl[:, w // 3 : 2 * w // 3] = 23  # sky
        lbl[:, 2 * w // 3 :] = 26  # car
        img = np.zeros((h, w, 3), int)
        img[:, : w // 3] = [120, 60, 120]
        img[:, w // 3 : 2 * w // 3] = [70, 130, 180]
        img[:, 2 * w // 3 :] = [10, 10, 140]
        img = np.clip(img + rng.integers(-25, 25, img.shape), 0, 255).astype(np.uint8)
        stem = f"synth_{i:06d}_000019"
        Image.fromarray(img).save(f"{img_dir}/{stem}_leftImg8bit.png")
        Image.fromarray(lbl).save(f"{gt_dir}/{stem}_gtFine_labelIds.png")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("--out", default=None)
    p.add_argument("--width-mult", type=float, default=None,
                   help="encoder width multiplier; default 1.0 on an "
                        "accelerator, 1/8 on CPU (a full-width step takes "
                        "~30 s/core on CPU and 8-virtual-device runs can "
                        "hit XLA's 40 s collective-rendezvous termination)")
    args = p.parse_args()
    out = args.out or tempfile.mkdtemp(prefix="fcn8s_quickstart_")

    import jax

    on_cpu = jax.default_backend() == "cpu"
    width_mult = args.width_mult if args.width_mult is not None else (
        1 / 8 if on_cpu else 1.0)
    model_kwargs = {} if width_mult == 1.0 else dict(
        width_mult=width_mult, fc_channels=max(32, int(4096 * width_mult ** 2)))

    data_root = os.path.join(out, "data")
    make_synthetic_dataset(data_root)

    gen = BatchGenerator(
        image_dirs=[os.path.join(data_root, "leftImg8bit/train")],
        ground_truth_dirs=[os.path.join(data_root, "gtFine/train")],
        image_name_split_separator="leftImg8bit",
        ground_truth_suffix="gtFine_labelIds",
        num_classes=NUM_TRAIN_CLASSES,
    )
    train_it = gen.generate(
        batch_size=4, convert_ids_to_ids=IDS_TO_TRAINIDS_ARRAY,
        convert_to_one_hot=False, flip=0.5, void_class_id=0, seed=1,
    )

    model = FCN8s(num_classes=NUM_TRAIN_CLASSES, **model_kwargs)
    print(model.summary(input_hw=(64, 128), batch=4))  # where FLOPs/HBM go
    model.train(
        train_generator=train_it,
        epochs=2,
        steps_per_epoch=args.steps // 2,
        learning_rate_schedule=constant(1e-4),
        keep_prob=0.5,
        metrics={"loss", "mean_iou", "accuracy"},
        eval_dataset="train",
        eval_frequency=2,
        record_summaries=False,
    )

    pred_dir = os.path.join(out, "predictions")
    model.predict_and_save(
        pred_dir, os.path.join(data_root, "leftImg8bit/train/synth"),
        TRAINIDS_TO_RGBA_DICT, include_unprocessed_image=True,
    )

    from fcn8s_tensorflow_tpu.viz.viewer import view_cityscapes_split

    index = view_cityscapes_split(data_root, "train", os.path.join(out, "viewer"),
                                  max_images=4, gt_type="gtFine")
    print("quickstart complete.")
    print("  predictions:", pred_dir)
    print("  gallery:    ", index)
    model.close()


if __name__ == "__main__":
    main()
