"""Visualization utilities tests."""

import os

import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.viz.overlay import (
    create_split_view,
    create_video_from_images,
    print_segmentation_onto_image,
)

CMAP = {0: (0, 0, 0, 0), 1: (255, 0, 0, 127), 2: (0, 255, 0, 255)}


def test_overlay_alpha_blend():
    image = np.full((8, 8, 3), 100, np.uint8)
    pred = np.zeros((8, 8), np.int32)
    pred[0, 0] = 1  # half-transparent red
    pred[1, 1] = 2  # opaque green
    out = print_segmentation_onto_image(image, pred, CMAP)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[4, 4], [100, 100, 100])  # alpha 0: untouched
    np.testing.assert_array_equal(out[1, 1], [0, 255, 0])      # alpha 255: replaced
    # alpha 127: blend of 100 and (255,0,0)
    expected = (100 * (1 - 127 / 255) + np.array([255, 0, 0]) * 127 / 255).astype(np.uint8)
    np.testing.assert_array_equal(out[0, 0], expected)


def test_overlay_accepts_scores_and_batch_dim(rng):
    image = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    scores = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    out = print_segmentation_onto_image(image, scores, CMAP)
    assert out.shape == (8, 8, 3)


def test_overlay_shape_mismatch():
    with pytest.raises(ValueError):
        print_segmentation_onto_image(np.zeros((8, 8, 3), np.uint8), np.zeros((4, 4)), CMAP)


def test_split_view_composes():
    a = np.full((10, 10, 3), 50, np.uint8)
    b = np.full((10, 10, 3), 200, np.uint8)
    out = create_split_view((20, 10), [a, b], [(0, 0), (10, 0)], [(10, 10), (10, 10)])
    assert out.shape == (20, 10, 3)
    assert out[5, 5, 0] == 50 and out[15, 5, 0] == 200


def test_video_export(tmp_path, rng):
    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(
            img_dir / f"frame_{i:03d}.png")
    out = create_video_from_images(str(tmp_path / "vid"), str(img_dir), frame_rate=5)
    assert out.endswith(".mp4")
    assert os.path.getsize(out) > 0


def test_video_no_frames(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError):
        create_video_from_images(str(tmp_path / "v"), str(tmp_path / "empty"))


@pytest.mark.slow
def test_segment_video_roundtrip(tmp_path, rng):
    """MP4 in -> segmented-overlay MP4 out, batched through the model."""
    import cv2
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.engine.model import FCN8s
    from fcn8s_tensorflow_tpu.viz.overlay import segment_video

    src = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 32))
    for _ in range(5):
        vw.write(rng.integers(0, 255, (32, 64, 3), dtype=np.uint8))
    vw.release()

    model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                  compute_dtype=jnp.float32)
    cmap = {0: (255, 0, 0, 127), 1: (0, 255, 0, 127), 2: (0, 0, 255, 127)}
    out = segment_video(model, src, str(tmp_path / "out"), cmap, batch_size=2)
    cap = cv2.VideoCapture(out)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        n += 1
        assert frame.shape == (32, 64, 3)
    cap.release()
    assert n == 5
    model.close()
    with pytest.raises(ValueError, match="could not open"):
        segment_video(model, str(tmp_path / "missing.mp4"),
                      str(tmp_path / "x"), cmap)
