"""End-to-end Cityscapes training walkthrough.

Script equivalent of the reference's ``fcn8s_tutorial.ipynb`` (the de-facto
CLI — SURVEY.md §2 L7), with the canonical hyperparameters from its cells:
batch 4, keep_prob 0.5, L2 0.0, h-flip 0.5, step LR schedule
1e-4 -> 1e-5 -> 3e-6 -> 1e-6 at 10k/20k/40k steps, eval every 2 epochs,
save-best-only on loss.

Usage:
    python examples/train_cityscapes.py --dataset /data/cityscapes \
        [--vgg16-dir /ckpt/vgg16] [--epochs 60] [--batch-size 4] \
        [--resolution 256 512] [--device-augment]

Expects the standard layout (after offline preprocessing or with
``--resolution`` doing the resize online):
    <dataset>/leftImg8bit/{train,val}/<city>/*_leftImg8bit.png
    <dataset>/gtFine/{train,val}/<city>/*_gtFine_labelIds.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from math import ceil

from fcn8s_tensorflow_tpu import FCN8s
from fcn8s_tensorflow_tpu.data.generator import BatchGenerator
from fcn8s_tensorflow_tpu.engine.schedules import reference_tutorial_schedule
from fcn8s_tensorflow_tpu.labels import (
    IDS_TO_TRAINIDS_ARRAY,
    NUM_TRAIN_CLASSES,
    TRAINIDS_TO_RGBA_DICT,
)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True)
    p.add_argument("--vgg16-dir", help="pretrained encoder checkpoint (tools/import_vgg16.py)")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--resolution", type=int, nargs=2, default=None, metavar=("H", "W"))
    p.add_argument("--out", default="runs/cityscapes")
    p.add_argument("--device-augment", action="store_true",
                   help="run flip/brightness on-device inside the train step")
    p.add_argument("--tensor-parallel", action="store_true")
    p.add_argument("--variant", default="fcn8s",
                   choices=["fcn8s", "fcn16s", "fcn32s"],
                   help="FCN family member (the reference ships only fcn8s)")
    p.add_argument("--gradient-accumulation", type=int, default=1,
                   help="microbatches per optimizer step (exact; for "
                        "batch-16 at full resolution on one chip)")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the encoder blocks (activation HBM "
                        "for FLOPs — full-resolution training)")
    p.add_argument("--optimizer", default="adam",
                   choices=["adam", "adamw", "momentum", "sgd"],
                   help="adam = the reference's TF1-exact Adam")
    p.add_argument("--clip-norm", type=float, default=None,
                   help="global-norm gradient clipping")
    p.add_argument("--early-stopping", type=int, default=None, metavar="PATIENCE",
                   help="stop after PATIENCE observations without "
                        "improvement of the monitored loss")
    p.add_argument("--reduce-lr-on-plateau", type=int, default=None,
                   metavar="PATIENCE",
                   help="scale the LR x0.1 whenever the monitored loss "
                        "stalls PATIENCE observations")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="maintain an EMA of the weights; the script adopts "
                        "them after training, so the final eval/predictions "
                        "report the averaged model")
    p.add_argument("--shard", type=int, nargs=2, default=None,
                   metavar=("INDEX", "COUNT"),
                   help="multi-host input sharding: this host's disjoint "
                        "slice of every epoch (pair with jax.distributed)")
    args = p.parse_args()

    train_gen = BatchGenerator(
        image_dirs=[os.path.join(args.dataset, "leftImg8bit/train")],
        ground_truth_dirs=[os.path.join(args.dataset, "gtFine/train")],
        image_name_split_separator="leftImg8bit",
        ground_truth_suffix="gtFine_labelIds",
        num_classes=NUM_TRAIN_CLASSES,
    )
    val_gen = BatchGenerator(
        image_dirs=[os.path.join(args.dataset, "leftImg8bit/val")],
        ground_truth_dirs=[os.path.join(args.dataset, "gtFine/val")],
        image_name_split_separator="leftImg8bit",
        ground_truth_suffix="gtFine_labelIds",
        num_classes=NUM_TRAIN_CLASSES,
    )
    print(f"train: {train_gen.get_num_files()} images, val: {val_gen.get_num_files()}")

    # host pipeline: trainId remap + optional resize; ID maps (one-hot
    # expansion happens on device); flip on host unless --device-augment
    common = dict(
        convert_ids_to_ids=IDS_TO_TRAINIDS_ARRAY,
        convert_to_one_hot=False,
        void_class_id=0,
        resize=tuple(args.resolution) if args.resolution else False,
    )
    train_it = train_gen.generate(
        batch_size=args.batch_size,
        flip=False if args.device_augment else 0.5,
        seed=0,
        shard=tuple(args.shard) if args.shard else None,
        **common,
    )
    val_it = val_gen.generate(batch_size=args.batch_size, shuffle=False, seed=0, **common)

    # Sharded input: each host sees only ceil(n/count) images per epoch, so
    # an "epoch" of steps must shrink accordingly; and only one process may
    # own the shared output tree (checkpoints/TB/log) — concurrent writers
    # would race on the same files.
    n_train = train_gen.get_num_files()
    if args.shard:
        n_train = ceil(n_train / args.shard[1])
    try:
        import jax

        is_main = jax.process_index() == 0
    except Exception:
        is_main = True

    model = FCN8s(
        num_classes=NUM_TRAIN_CLASSES,
        vgg16_dir=args.vgg16_dir,
        tensor_parallel=args.tensor_parallel,
        variant=args.variant,
        remat=args.remat,
        optimizer=args.optimizer,
        clip_norm=args.clip_norm,
    )

    steps_per_epoch = ceil(n_train / args.batch_size)
    model.train(
        train_generator=train_it,
        epochs=args.epochs,
        steps_per_epoch=steps_per_epoch,
        learning_rate_schedule=reference_tutorial_schedule(),
        keep_prob=0.5,
        l2_regularization=0.0,
        eval_dataset="val",
        eval_frequency=2,
        val_generator=val_it,
        val_steps=ceil(val_gen.get_num_files() / args.batch_size),
        metrics={"loss", "mean_iou", "accuracy"},
        save_during_training=is_main,
        save_dir=os.path.join(args.out, "checkpoints"),
        save_best_only=True,
        monitor="loss",
        save_frequency=2,
        record_summaries=is_main,
        summaries_frequency=10,
        summaries_dir=os.path.join(args.out, "tensorboard") if is_main else None,
        summaries_name=args.variant,
        device_augment={"flip": 0.5, "brightness": (0.8, 1.2, 0.5),
                        "translate": ((0, 16), (0, 8), 0.5),
                        "scale": (0.8, 1.2, 0.5)} if args.device_augment else None,
        gradient_accumulation=args.gradient_accumulation,
        early_stopping=args.early_stopping,
        reduce_lr_on_plateau=args.reduce_lr_on_plateau,
        ema_decay=args.ema_decay,
        train_log=(os.path.join(args.out, "train_log.jsonl")
                   if is_main else None),
    )
    if args.ema_decay:
        # make the averaged weights the served weights: the final eval,
        # prediction PNGs, and video below all report the EMA model
        model.adopt_ema()

    # final evaluation + qualitative results (tutorial cells 19-26)
    model.evaluate(val_it, ceil(val_gen.get_num_files() / args.batch_size), dataset="val")
    sample_city = sorted(os.listdir(os.path.join(args.dataset, "leftImg8bit/val")))[0]
    model.predict_and_save(
        results_dir=os.path.join(args.out, "predictions"),
        images_dir=os.path.join(args.dataset, "leftImg8bit/val", sample_city),
        color_map=TRAINIDS_TO_RGBA_DICT,
        include_unprocessed_image=True,
        arrangement="vertical",
    )
    from fcn8s_tensorflow_tpu.viz.overlay import create_video_from_images

    video = create_video_from_images(
        os.path.join(args.out, "predictions_video"),
        os.path.join(args.out, "predictions"),
        frame_rate=15,
    )
    print("video:", video)
    model.close()


if __name__ == "__main__":
    main()
