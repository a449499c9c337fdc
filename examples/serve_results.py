"""Serve an interactive browser viewer over a Cityscapes-style tree.

Replaces the reference's desktop GUI workflow (`cityscapesViewer.py`) for
headless TPU pods: build per-image overlay layers once, then browse them
from any machine over SSH port forwarding.

    python examples/serve_results.py --root /data/cityscapes [--results out/] \
        [--split val] [--max-images 50] [--port 8008]

then  ssh -L 8008:localhost:8008 <pod>  and open
http://localhost:8008/viewer.html — arrow keys navigate, 'g'/'p' toggle
GT/prediction overlays, the slider sets overlay alpha, wheel zooms.
"""

import argparse
import os
import sys
import tempfile
from glob import glob

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="Cityscapes root (leftImg8bit/...)")
    ap.add_argument("--results", default=None, help="predicted id-map PNG dir")
    ap.add_argument("--split", default="val")
    ap.add_argument("--gt-type", default="gtFine")
    ap.add_argument("--max-images", type=int, default=50)
    ap.add_argument("--port", type=int, default=8008)
    ap.add_argument("--out", default=None, help="layer output dir (default: temp)")
    args = ap.parse_args()

    from fcn8s_tensorflow_tpu.labels import IDS_TO_TRAINIDS_ARRAY
    from fcn8s_tensorflow_tpu.viz.serve import build_interactive_viewer, serve_viewer

    image_paths = sorted(glob(os.path.join(
        args.root, "leftImg8bit", args.split, "*", "*_leftImg8bit.png")))
    if not image_paths:
        raise SystemExit(f"no images under {args.root}/leftImg8bit/{args.split}")

    def gt_loader(path):
        base = path.replace("leftImg8bit", args.gt_type, 1).replace(
            "_leftImg8bit.png", "")
        for suffix, remap in ((f"_{args.gt_type}_labelTrainIds.png", False),
                              (f"_{args.gt_type}_labelIds.png", True)):
            p = base + suffix
            if os.path.isfile(p):
                ids = np.asarray(Image.open(p))
                return IDS_TO_TRAINIDS_ARRAY[ids] if remap else ids
        return None

    pred_loader = None
    if args.results:
        from fcn8s_tensorflow_tpu.viz.viewer import load_prediction

        def pred_loader(path):
            return load_prediction(path, args.results)

    out_dir = args.out or tempfile.mkdtemp(prefix="fcn8s_viewer_")
    build_interactive_viewer(
        out_dir, image_paths, gt_loader, pred_loader,
        max_images=args.max_images,
        title=f"Cityscapes {args.split}",
    )
    serve_viewer(out_dir, port=args.port)


if __name__ == "__main__":
    main()
