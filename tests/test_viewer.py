"""Headless viewer/gallery tests."""

import os

import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.viz.viewer import (
    build_gallery,
    contact_sheet,
    render_panel,
    view_cityscapes_split,
)

CMAP = {0: (0, 0, 0, 0), 1: (255, 0, 0, 127)}


def test_render_panel_widths(rng):
    img = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
    gt = rng.integers(0, 2, (16, 24), dtype=np.uint8)
    assert render_panel(img, color_map=CMAP).shape == (16, 24, 3)
    assert render_panel(img, gt, color_map=CMAP).shape == (16, 48, 3)
    assert render_panel(img, gt, gt, color_map=CMAP).shape == (16, 72, 3)


def test_contact_sheet_grid(rng):
    panels = [rng.integers(0, 255, (10, 20, 3), dtype=np.uint8) for _ in range(5)]
    sheet = contact_sheet(panels, columns=2, pad=2)
    assert sheet.shape == (3 * 12 - 2, 2 * 22 - 2, 3)
    with pytest.raises(ValueError):
        contact_sheet([])


def test_build_gallery(tmp_path, rng):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"img_{i}.png")
        Image.fromarray(rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    gt = rng.integers(0, 2, (12, 16), dtype=np.uint8)
    index = build_gallery(str(tmp_path / "g"), paths, gt_loader=lambda p: gt,
                          color_map=CMAP, title="t<est>")  # html-escape probe
    assert os.path.isfile(index)
    html = open(index).read()
    assert "t&lt;est&gt;" in html
    assert html.count("<figure>") == 3
    assert os.path.isfile(str(tmp_path / "g" / "img_0_panel.png"))


def test_view_cityscapes_split(tmp_path, rng):
    img_dir = tmp_path / "leftImg8bit" / "val" / "c"
    gt_dir = tmp_path / "gtFine" / "val" / "c"
    img_dir.mkdir(parents=True), gt_dir.mkdir(parents=True)
    for i in range(2):
        stem = f"c_{i:06d}_000019"
        Image.fromarray(rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)).save(
            img_dir / f"{stem}_leftImg8bit.png")
        Image.fromarray(rng.integers(0, 34, (16, 24), dtype=np.uint8)).save(
            gt_dir / f"{stem}_gtFine_labelIds.png")  # labelIds fallback path
    index = view_cityscapes_split(str(tmp_path), "val", str(tmp_path / "out"), max_images=2)
    assert os.path.isfile(index)
    panel = np.asarray(Image.open(tmp_path / "out" / "c_000000_000019_leftImg8bit_panel.png"))
    assert panel.shape == (16, 48, 3)  # image + GT overlay
    with pytest.raises(ValueError, match="no images"):
        view_cityscapes_split(str(tmp_path), "train", str(tmp_path / "out2"))


def test_build_interactive_viewer(tmp_path, rng):
    from fcn8s_tensorflow_tpu.viz.serve import build_interactive_viewer

    paths = []
    for i in range(2):
        p = str(tmp_path / f"img_{i}.png")
        Image.fromarray(rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    gt = rng.integers(0, 2, (12, 16), dtype=np.uint8)
    out = build_interactive_viewer(
        str(tmp_path / "v"), paths, gt_loader=lambda p: gt,
        pred_loader=lambda p: gt, color_map=CMAP, title="t<est>",
    )
    assert os.path.isfile(out)
    html = open(out).read()
    assert "t&lt;est&gt;" in html
    assert '"gt": "img_0_gt.png"' in html and '"pred": "img_1_pred.png"' in html
    for layer in ["img", "gt", "pred"]:
        assert os.path.isfile(str(tmp_path / "v" / f"img_0_{layer}.png"))
    with pytest.raises(ValueError, match="no images"):
        build_interactive_viewer(str(tmp_path / "v2"), [])


def test_serve_viewer_http_roundtrip(tmp_path, rng):
    """Non-blocking stdlib server actually serves the built viewer."""
    import urllib.request

    from fcn8s_tensorflow_tpu.viz.serve import build_interactive_viewer, serve_viewer

    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(p)
    build_interactive_viewer(str(tmp_path / "v"), [p], color_map=CMAP)
    server = serve_viewer(str(tmp_path / "v"), port=0, blocking=False)
    try:
        host, port = server.server_address[:2]
        body = urllib.request.urlopen(
            f"http://{host}:{port}/viewer.html", timeout=10).read().decode()
        assert "ENTRIES" in body
        png = urllib.request.urlopen(
            f"http://{host}:{port}/img_img.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
    finally:
        server.shutdown()
        server.server_close()


# ---------------------------------------------------------------------------
# disparity browsing (VERDICT r3 #7; reference cityscapesViewer.py)
# ---------------------------------------------------------------------------


def test_disparity_to_rgb_formula():
    """Hand-computed fixture: raw 16-bit values // 128 -> plasma LUT on
    [3, 100] (cityscapesViewer.py:144-146,555-569)."""
    from fcn8s_tensorflow_tpu.viz.viewer import disparity_to_rgb
    import matplotlib.cm as cm
    import matplotlib.colors as mcolors

    disp = np.array([[0, 128, 12800], [65535, 384, 1]], dtype=np.uint16)
    out = disparity_to_rgb(disp)
    assert out.shape == (2, 3, 3) and out.dtype == np.uint8
    mp = cm.ScalarMappable(norm=mcolors.Normalize(vmin=3, vmax=100), cmap=cm.plasma)
    want = lambda g: tuple((np.asarray(mp.to_rgba(g))[:3] * 255).astype(np.uint8))
    assert tuple(out[0, 0]) == want(0)       # 0 // 128 = 0
    assert tuple(out[0, 1]) == want(1)       # 128 // 128 = 1
    assert tuple(out[0, 2]) == want(100)     # 12800 // 128 = 100
    assert tuple(out[1, 0]) == want(255)     # 65535 // 128 = 511 -> clipped 255
    assert tuple(out[1, 1]) == want(3)       # 384 // 128 = 3 (the norm floor)
    assert tuple(out[1, 2]) == want(0)       # 1 // 128 = 0

    gray = disparity_to_rgb(disp, colormapped=False)
    assert gray.shape == (2, 3, 3)
    assert tuple(gray[0, 2]) == (100, 100, 100)  # replicated grayscale
    assert tuple(gray[1, 0]) == (255, 255, 255)


def test_load_disparity_conventions(tmp_path, rng):
    from fcn8s_tensorflow_tpu.viz.viewer import load_disparity

    img_dir = tmp_path / "leftImg8bit" / "val" / "c"
    disp_dir = tmp_path / "disparity" / "val" / "c"
    img_dir.mkdir(parents=True), disp_dir.mkdir(parents=True)
    stem = "c_000000_000019"
    img_path = str(img_dir / f"{stem}_leftImg8bit.png")
    Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(img_path)
    disp = rng.integers(0, 30000, (8, 8)).astype(np.uint16)
    Image.fromarray(disp).save(disp_dir / f"{stem}_disparity.png")

    # default: swap the leftImg8bit path component
    np.testing.assert_array_equal(load_disparity(img_path), disp)
    # explicit root: core-name glob search
    np.testing.assert_array_equal(
        load_disparity(img_path, str(tmp_path / "disparity")), disp)
    # missing map -> None, not an error
    assert load_disparity(str(img_dir / "c_000001_000019_leftImg8bit.png")) is None
    assert load_disparity("/nope/not_a_cityscapes_name.png") is None


def test_gallery_and_interactive_viewer_with_disparity(tmp_path, rng):
    from fcn8s_tensorflow_tpu.viz.serve import build_interactive_viewer
    from fcn8s_tensorflow_tpu.viz.viewer import render_panel

    img = rng.integers(0, 255, (12, 16, 3), dtype=np.uint8)
    disp = rng.integers(0, 20000, (12, 16)).astype(np.uint16)
    assert render_panel(img, color_map=CMAP, disparity=disp).shape == (12, 32, 3)

    p = str(tmp_path / "img_0.png")
    Image.fromarray(img).save(p)
    index = build_gallery(str(tmp_path / "g"), [p], color_map=CMAP,
                          disp_loader=lambda _: disp)
    assert "disparity" in open(index).read()

    out = build_interactive_viewer(str(tmp_path / "v"), [p], color_map=CMAP,
                                   disp_loader=lambda _: disp)
    html = open(out).read()
    assert '"disp": "img_0_disp.png"' in html
    assert '"disp_gray": "img_0_dispgray.png"' in html
    for layer in ["disp", "dispgray"]:
        assert os.path.isfile(str(tmp_path / "v" / f"img_0_{layer}.png"))


def test_serve_viewer_disparity_http_roundtrip(tmp_path, rng):
    import urllib.request

    from fcn8s_tensorflow_tpu.viz.serve import build_interactive_viewer, serve_viewer

    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(p)
    disp = rng.integers(0, 20000, (8, 8)).astype(np.uint16)
    build_interactive_viewer(str(tmp_path / "v"), [p], color_map=CMAP,
                             disp_loader=lambda _: disp)
    server = serve_viewer(str(tmp_path / "v"), port=0, blocking=False)
    try:
        host, port = server.server_address[:2]
        body = urllib.request.urlopen(
            f"http://{host}:{port}/viewer.html", timeout=10).read().decode()
        # both the layer entry and the keyboard toggles are wired in
        assert '"disp": "img_disp.png"' in body and "'d'" in body and "'m'" in body
        for name in ["img_disp.png", "img_dispgray.png"]:
            png = urllib.request.urlopen(
                f"http://{host}:{port}/{name}", timeout=10).read()
            assert png[:4] == b"\x89PNG"
    finally:
        server.shutdown()
        server.server_close()


def test_viewer_slideshow_and_screenshot_machinery(tmp_path, rng):
    """Round 5 chrome (VERDICT r4 #6): the served viewer page ships the
    slideshow play loop and the composited-view PNG screenshot export, and
    the layers they composite are fetchable."""
    import urllib.request

    from fcn8s_tensorflow_tpu.viz.serve import build_interactive_viewer, serve_viewer

    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(p)
    build_interactive_viewer(
        str(tmp_path / "v"), [p], color_map=CMAP,
        gt_loader=lambda _: rng.integers(0, 3, (8, 8), dtype=np.uint8))
    server = serve_viewer(str(tmp_path / "v"), port=0, blocking=False)
    try:
        host, port = server.server_address[:2]
        body = urllib.request.urlopen(
            f"http://{host}:{port}/viewer.html", timeout=10).read().decode()
        for needle in ("togglePlay", 'id="play"', 'id="pint"', 'id="shot"',
                       "function screenshot", "_screenshot.png", "toDataURL"):
            assert needle in body, needle
        # the layers the screenshot composites are served
        for layer in ("img_img.png", "img_gt.png"):
            png = urllib.request.urlopen(
                f"http://{host}:{port}/{layer}", timeout=10).read()
            assert png[:4] == b"\x89PNG"
    finally:
        server.shutdown()
        server.server_close()
