"""End-to-end Cityscapes benchmark submission + self-scoring workflow.

The reference's submission story is manual: run ``predict`` per image,
convert trainIds back to labelIds yourself, save PNGs the evaluation
server's discovery expects, then run
``evalPixelLevelSemanticLabeling.py`` with ``CITYSCAPES_*`` env vars
(`/root/reference/cityscapesscripts/evaluation/evalPixelLevelSemanticLabeling.py:69-134`).
This example does the whole chain with this framework:

1. load a trained checkpoint;
2. ``predict_and_save(output_format='ids', id_map=TRAINIDS_TO_IDS_ARRAY)``
   — batched/double-buffered inference writing benchmark-format labelId
   PNGs named so the scorer's ``<city>_<seq>_<frame>*.png`` discovery
   matches;
3. score them against local GT with ``evaluation.pixel_eval`` (the same
   math as the benchmark server), printing per-class IoU / iIoU /
   category IoU and writing the JSON report.

    python examples/benchmark_submission.py --checkpoint out/ckpts \
        --dataset /data/cityscapes [--split val] [--results out/results]

The train->serve->score chain is verified end-to-end (exact agreement with
the streaming training-time confusion matrix) by
tests/test_offline_eval.py::test_closed_loop_scorer_consistency.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", required=True, help="Cityscapes root")
    ap.add_argument("--split", default="val")
    ap.add_argument("--results", default="benchmark_results")
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    from fcn8s_tensorflow_tpu.engine.model import FCN8s
    from fcn8s_tensorflow_tpu.evaluation import pixel_eval
    from fcn8s_tensorflow_tpu.labels import TRAINIDS_TO_IDS_ARRAY

    model = FCN8s(model_load_dir=args.checkpoint)

    img_root = os.path.join(args.dataset, "leftImg8bit", args.split)
    cities = sorted(os.listdir(img_root)) if os.path.isdir(img_root) else []
    if not cities:
        raise SystemExit(f"no cities under {img_root}")
    for city in cities:
        model.predict_and_save(
            results_dir=args.results,
            images_dir=os.path.join(img_root, city),
            output_format="ids",
            id_map=TRAINIDS_TO_IDS_ARRAY,
            batch_size=args.batch_size,
            overwrite_existing=(city == cities[0]),
        )

    from glob import glob

    os.environ["CITYSCAPES_DATASET"] = args.dataset
    os.environ["CITYSCAPES_RESULTS"] = args.results
    os.makedirs(os.path.join(args.results, "_report"), exist_ok=True)
    os.environ["CITYSCAPES_EXPORT_DIR"] = os.path.join(args.results, "_report")
    eval_args = pixel_eval.default_args()
    # default_args hardcodes the val split's GT glob; honor --split
    eval_args.ground_truth_search = os.path.join(
        args.dataset, "gtFine", args.split, "*", "*_gtFine_labelIds.png")
    ground_truth_list = glob(eval_args.ground_truth_search)
    if not ground_truth_list:
        raise SystemExit(f"no GT found: {eval_args.ground_truth_search}")
    prediction_list = [pixel_eval.get_prediction(eval_args, g)
                       for g in ground_truth_list]
    results = pixel_eval.evaluate_img_lists(prediction_list, ground_truth_list,
                                            eval_args)
    print(f"\nmIoU (classes): {results['averageScoreClasses']:.4f}")
    print(f"report JSON: {os.environ['CITYSCAPES_EXPORT_DIR']}")
    model.close()


if __name__ == "__main__":
    main()
