"""Annotation model + polygon rasterization tests (SURVEY.md §4)."""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.labels.cityscapes import name2label
from fcn8s_tensorflow_tpu.prep.annotation import Annotation, CsObject, Point
from fcn8s_tensorflow_tpu.prep.create_gt_imgs import (
    create_train_id_instance_imgs,
    create_train_id_label_imgs,
)
from fcn8s_tensorflow_tpu.prep.rasterize import create_instance_image, create_label_image


def _annotation_json(objects, w=64, h=48):
    return json.dumps({"imgWidth": w, "imgHeight": h, "objects": objects})


ROAD_POLY = [[0, 24], [63, 24], [63, 47], [0, 47]]       # bottom half road
CAR_POLY = [[10, 30], [30, 30], [30, 45], [10, 45]]      # a car on the road


def test_annotation_json_roundtrip():
    ann = Annotation()
    ann.from_json_text(_annotation_json([
        {"label": "road", "polygon": ROAD_POLY},
        {"label": "car", "polygon": CAR_POLY, "deleted": 1},
    ]))
    assert ann.imgWidth == 64 and ann.imgHeight == 48
    assert len(ann.objects) == 2
    assert ann.objects[0].label == "road"
    assert ann.objects[1].deleted == 1 and not ann.objects[1].draw
    # round-trip
    ann2 = Annotation()
    ann2.from_json_text(ann.to_json())
    assert ann2.objects[0].polygon[0] == Point(0, 24)


def test_annotation_editing_operations(tmp_path):
    """Headless editing API (the label tool's capabilities): vertex edits,
    add/remove/soft-delete/relabel/reorder, persisted via JSON."""
    ann = Annotation()
    ann.from_json_text(_annotation_json([{"label": "road", "polygon": ROAD_POLY}]))

    # add a new object on top; rasterization must paint it
    car = ann.add_object("car", [(10, 30), (30, 30), (30, 45), (10, 45)], user="tester")
    assert car.id == 1 and car.date != ""
    img = np.array(create_label_image(ann, "ids"))
    assert img[40, 20] == name2label["car"].id

    # vertex edits: move the car's top edge up, grow and shrink the polygon
    car.move_vertex(0, 10, 20)
    car.move_vertex(1, 30, 20)
    assert np.array(create_label_image(ann, "ids"))[22, 20] == name2label["car"].id
    car.append_vertex(9, 45)
    car.insert_vertex(2, 31, 38)
    assert len(car.polygon) == 6
    car.delete_vertex(2)
    car.delete_vertex(-1)
    assert len(car.polygon) == 4

    # relabel
    car.relabel("truck")
    assert np.array(create_label_image(ann, "ids"))[40, 20] == name2label["truck"].id

    # soft delete hides it from rasterization; restore brings it back
    car.mark_deleted()
    assert np.array(create_label_image(ann, "ids"))[40, 20] == name2label["road"].id
    car.restore()
    assert np.array(create_label_image(ann, "ids"))[40, 20] == name2label["truck"].id

    # draw-order: move the truck below the road -> road wins the overlap
    ann.reorder_object(car.id, 0)
    assert np.array(create_label_image(ann, "ids"))[40, 20] == name2label["road"].id
    ann.reorder_object(car.id, len(ann.objects) - 1)

    # persistence round-trip with all edits applied
    path = str(tmp_path / "edited.json")
    ann.to_json_file(path)
    ann2 = Annotation()
    ann2.from_json_file(path)
    assert [o.label for o in ann2.objects] == ["road", "truck"]
    assert ann2.objects[1].polygon == car.polygon

    # hard remove
    ann2.remove_object(1)
    assert len(ann2.objects) == 1
    with pytest.raises(KeyError):
        ann2.get_object(1)


def test_create_label_image_ids():
    ann = Annotation()
    ann.from_json_text(_annotation_json([
        {"label": "road", "polygon": ROAD_POLY},
        {"label": "car", "polygon": CAR_POLY},
    ]))
    img = np.array(create_label_image(ann, "ids"))
    assert img.shape == (48, 64)
    assert img[0, 0] == name2label["unlabeled"].id   # background
    assert img[40, 50] == name2label["road"].id
    assert img[40, 20] == name2label["car"].id       # car drawn over road


def test_create_label_image_trainids_and_color():
    ann = Annotation()
    ann.from_json_text(_annotation_json([{"label": "road", "polygon": ROAD_POLY}]))
    train = np.array(create_label_image(ann, "trainIds"))
    assert train[40, 50] == name2label["road"].trainId
    color = np.array(create_label_image(ann, "color"))
    assert color.shape == (48, 64, 4)
    assert tuple(color[40, 50][:3]) == name2label["road"].color


def test_group_fallback_and_unknown():
    ann = Annotation()
    ann.from_json_text(_annotation_json([{"label": "cargroup", "polygon": CAR_POLY}]))
    img = np.array(create_label_image(ann, "ids"))
    assert img[40, 20] == name2label["car"].id
    ann2 = Annotation()
    ann2.from_json_text(_annotation_json([{"label": "hovercraft", "polygon": CAR_POLY}]))
    with pytest.raises(ValueError, match="not known"):
        create_label_image(ann2, "ids")


def test_deleted_objects_skipped():
    ann = Annotation()
    ann.from_json_text(_annotation_json([{"label": "car", "polygon": CAR_POLY, "deleted": 1}]))
    img = np.array(create_label_image(ann, "ids"))
    assert (img == name2label["car"].id).sum() == 0


def test_create_instance_image_encoding():
    ann = Annotation()
    ann.from_json_text(_annotation_json([
        {"label": "road", "polygon": ROAD_POLY},            # stuff: bare id
        {"label": "car", "polygon": CAR_POLY},               # instance 0
        {"label": "car", "polygon": [[40, 30], [60, 30], [60, 45], [40, 45]]},  # instance 1
        {"label": "cargroup", "polygon": [[0, 40], [5, 40], [5, 47], [0, 47]]},  # group: bare id
    ]))
    img = np.array(create_instance_image(ann, "ids"))
    car_id = name2label["car"].id
    assert img[40, 50] == car_id * 1000 + 1
    assert img[40, 20] == car_id * 1000 + 0
    assert img[44, 2] == car_id                      # group region: bare id
    assert img[30, 35] == name2label["road"].id      # stuff: bare id


def test_batch_driver(tmp_path):
    root = tmp_path / "gtFine" / "train" / "testcity"
    root.mkdir(parents=True)
    for i in range(2):
        with open(root / f"testcity_{i:06d}_000019_gtFine_polygons.json", "w") as f:
            f.write(_annotation_json([{"label": "road", "polygon": ROAD_POLY}]))
    n = create_train_id_label_imgs(str(tmp_path), quiet=True)
    assert n == 2
    out = np.array(Image.open(root / "testcity_000000_000019_gtFine_labelTrainIds.png"))
    assert out[40, 50] == name2label["road"].trainId
    n = create_train_id_instance_imgs(str(tmp_path), quiet=True)
    assert n == 2
    assert os.path.isfile(root / "testcity_000000_000019_gtFine_instanceTrainIds.png")


# ---------------------------------------------------------------------------
# browser label tool (prep/label_tool.py) — the annotate -> save -> rasterize
# chain over HTTP, closing the reference's cityscapesLabelTool capability
# ---------------------------------------------------------------------------
@pytest.fixture
def label_tool_server(tmp_path):
    import threading
    import urllib.request

    from fcn8s_tensorflow_tpu.prep.label_tool import AnnotationTool, make_server

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    arr = np.full((60, 80, 3), 40, np.uint8)
    Image.fromarray(arr).save(img_dir / "city_000000_000000_leftImg8bit.png")
    Image.fromarray(arr).save(img_dir / "city_000000_000001_leftImg8bit.png")

    tool = AnnotationTool(str(img_dir), annotation_dir=str(tmp_path / "ann"), user="tester")
    srv = make_server(tool, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", tool, tmp_path
    srv.shutdown()
    srv.server_close()


def _get_json(url):
    import json as _json
    import urllib.request

    with urllib.request.urlopen(url, timeout=30) as r:
        return _json.loads(r.read())


def test_label_tool_roundtrip_and_rasterize(label_tool_server):
    import json as _json
    import urllib.request

    from fcn8s_tensorflow_tpu.labels.cityscapes import name2label
    from fcn8s_tensorflow_tpu.prep.annotation import Annotation
    from fcn8s_tensorflow_tpu.prep.rasterize import create_label_image

    base, tool, tmp_path = label_tool_server

    images = _get_json(base + "/api/images")
    assert [i["annotated"] for i in images] == [False, False]
    labels = _get_json(base + "/api/labels")
    assert any(l["name"] == "car" for l in labels)
    blank = _get_json(base + "/api/annotation/0")
    assert blank == {"imgWidth": 80, "imgHeight": 60, "objects": []}

    # editor page and image bytes serve
    with urllib.request.urlopen(base + "/", timeout=30) as r:
        assert b"label tool" in r.read()
    with urllib.request.urlopen(base + "/api/image/0", timeout=30) as r:
        assert r.read()[:4] == b"\x89PNG"

    # save two polygons (one with the group-suffix fallback label)
    payload = {"imgWidth": 80, "imgHeight": 60, "objects": [
        {"label": "road", "polygon": [[0, 30], [79, 30], [79, 59], [0, 59]]},
        {"label": "cargroup", "polygon": [[10, 5], [30, 5], [30, 20], [10, 20]]},
    ]}
    req = urllib.request.Request(base + "/api/annotation/0",
                                 data=_json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        saved = _json.loads(r.read())
    # Cityscapes-compatible name: discoverable by create_gt_imgs's
    # `*_gt*_polygons.json` glob when annotation_dir sits in the gtFine tree
    assert saved["saved"] == "city_000000_000000_gtFine_polygons.json"

    # the file on disk is schema-exact Cityscapes JSON...
    ann = Annotation()
    ann.from_json_file(str(tmp_path / "ann" / saved["saved"]))
    assert ann.imgWidth == 80 and len(ann.objects) == 2
    assert ann.objects[0].user == "tester" and ann.objects[0].date

    # ...and rasterizes through the real GT path to the right trainIds
    raster = np.asarray(create_label_image(ann, "trainIds"))
    assert raster[45, 40] == name2label["road"].trainId
    assert raster[10, 20] == name2label["car"].trainId  # group fallback
    assert raster[0, 79] == name2label["unlabeled"].trainId

    # round-trip back through the editor payload
    edited = _get_json(base + "/api/annotation/0")
    assert [o["label"] for o in edited["objects"]] == ["road", "cargroup"]
    assert _get_json(base + "/api/images")[0]["annotated"] is True

    # preview endpoint rasterizes and composites
    with urllib.request.urlopen(base + "/api/preview/0", timeout=30) as r:
        png = r.read()
    overlay = np.asarray(Image.open(io.BytesIO(png)))
    assert overlay.shape == (60, 80, 3)
    # road region tinted toward the road color (purple-ish), background not
    assert abs(int(overlay[45, 40, 0]) - int(overlay[5, 70, 0])) > 20


def test_label_tool_rejects_bad_payloads(label_tool_server):
    import json as _json
    import urllib.error
    import urllib.request

    base, tool, _ = label_tool_server

    def post(payload):
        req = urllib.request.Request(base + "/api/annotation/1",
                                     data=_json.dumps(payload).encode(), method="POST")
        return urllib.request.urlopen(req, timeout=30)

    with pytest.raises(urllib.error.HTTPError) as e:
        post({"objects": [{"label": "not-a-label", "polygon": [[0, 0], [1, 0], [1, 1]]}]})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        post({"objects": [{"label": "car", "polygon": [[0, 0], [1, 0]]}]})  # < 3 vertices
    assert e.value.code == 400
    # nothing persisted
    assert not tool.list_images()[1]["annotated"]


def test_label_tool_undo_and_edge_insert_roundtrip(label_tool_server):
    """VERDICT r4 #9: UI undo + click-on-edge vertex insertion.

    The editor is client-side JS (no JS runtime in CI), so this test (a)
    asserts the served page ships the undo/edge-insert wiring, and (b)
    round-trips the exact edit the JS performs — an edge-projected vertex
    insert via a Python twin of the page's ``edgeHit`` — through the HTTP
    save path and the server-side ``CsObject.insert_vertex`` API, checking
    both agree on the resulting polygon."""
    import json as _json
    import urllib.request

    from fcn8s_tensorflow_tpu.prep.annotation import Annotation

    base, tool, tmp_path = label_tool_server

    page = urllib.request.urlopen(base + "/", timeout=30).read().decode()
    # undo wiring: history snapshots, the button, the 'z' key
    for token in ["function undo()", "function snap()", 'id="undo"',
                  'e.key==="z"', "history=[]"]:
        assert token in page, token
    # edge-insert wiring: projection hit-test + splice into the polygon
    for token in ["function edgeHit(", "poly.splice(hit.i+1,0,hit.pt)"]:
        assert token in page, token

    # python twin of the page's edgeHit (clamped projection onto segments)
    def edge_hit(p, poly, tol=7.0):
        best = None
        for i in range(len(poly)):
            a, b = poly[i], poly[(i + 1) % len(poly)]
            dx, dy = b[0] - a[0], b[1] - a[1]
            len2 = dx * dx + dy * dy or 1e-9
            t = max(0.0, min(1.0, ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / len2))
            qx, qy = a[0] + t * dx, a[1] + t * dy
            d = ((p[0] - qx) ** 2 + (p[1] - qy) ** 2) ** 0.5
            if d < tol and (best is None or d < best[1]):
                best = (i, d, [round(qx), round(qy)])
        return best

    square = [[10, 10], [50, 10], [50, 40], [10, 40]]
    payload = {"imgWidth": 80, "imgHeight": 60,
               "objects": [{"label": "car", "polygon": square}]}
    req = urllib.request.Request(base + "/api/annotation/0",
                                 data=_json.dumps(payload).encode(), method="POST")
    urllib.request.urlopen(req, timeout=30).read()

    # click near the middle of the top edge (slightly off the line)
    hit = edge_hit([30, 12], square)
    assert hit is not None
    i, _, pt = hit
    assert i == 0 and pt == [30, 10]  # projected ONTO the edge
    # clicking far from any edge must NOT insert
    assert edge_hit([30, 25], square) is None

    # the JS splices at hit.i+1; replay that through the save path
    edited = [o for o in _get_json(base + "/api/annotation/0")["objects"]]
    edited[0]["polygon"].insert(i + 1, pt)
    req = urllib.request.Request(base + "/api/annotation/0",
                                 data=_json.dumps({"objects": edited}).encode(),
                                 method="POST")
    urllib.request.urlopen(req, timeout=30).read()
    back = _get_json(base + "/api/annotation/0")["objects"][0]["polygon"]
    assert back == [[10, 10], [30, 10], [50, 10], [50, 40], [10, 40]]

    # the server-side editing API produces the identical polygon
    ann = Annotation()
    ann.from_json_file(tool.annotation_path(0))
    obj = ann.objects[0]
    obj.delete_vertex(1)                      # back to the square
    obj.insert_vertex(1, *pt)                 # the tool's insert
    assert [[p.x, p.y] for p in obj.polygon] == back


# ---------------------------------------------------------------------------
# correction layers (prep/corrections.py) — the reference label tool's
# review workflow (cityscapesLabelTool.py:149-234, 826-885, 2743-2768)
# ---------------------------------------------------------------------------
def test_correction_xml_reference_schema_roundtrip(tmp_path):
    """Parse a hand-written XML in the reference's exact layout, round-trip
    it through CorrectionSheet, and check the re-written file is
    schema-identical (tags, nesting, int formatting)."""
    import xml.etree.ElementTree as ET

    from fcn8s_tensorflow_tpu.prep.corrections import (
        QUESTION, RESOLVED, TO_CORRECT, CorrectionBox, CorrectionSheet)

    ref_xml = """<correction>
<filename>city_000000_000000_leftImg8bit.png</filename>
<folder>StereoDataset/city</folder>
<source>
<sourceImage>Label Cities</sourceImage>
<sourceAnnotation>mcLabelTool</sourceAnnotation>
</source>
<imagesize>
<nrows>60</nrows>
<ncols>80</ncols>
</imagesize>
<correction>
<type>1</type>
<annotation>rider mislabeled</annotation>
<bbox>
<x>10</x>
<y>20</y>
<width>30</width>
<height>15</height>
</bbox>
</correction>
<correction>
<type>4</type>
<annotation>is this a bridge?</annotation>
<bbox>
<x>40</x>
<y>5</y>
<width>12</width>
<height>8</height>
</bbox>
</correction>
</correction>
"""
    src = tmp_path / "ref.xml"
    src.write_text(ref_xml)
    sheet = CorrectionSheet.from_xml_file(str(src))
    assert sheet.filename == "city_000000_000000_leftImg8bit.png"
    assert sheet.folder == "StereoDataset/city"
    assert (sheet.nrows, sheet.ncols) == (60, 80)
    assert len(sheet.boxes) == 2
    b0, b1 = sheet.boxes
    assert (b0.x, b0.y, b0.width, b0.height) == (10, 20, 30, 15)
    assert b0.type == TO_CORRECT and b0.annotation == "rider mislabeled"
    assert b1.type == QUESTION and b1.annotation == "is this a bridge?"

    # re-write and compare element trees structurally (whitespace-free)
    out = tmp_path / "out.xml"
    sheet.to_xml_file(str(out))

    def normalize(el):
        return (el.tag, (el.text or "").strip(),
                [normalize(c) for c in el])

    assert normalize(ET.parse(str(out)).getroot()) == normalize(
        ET.parse(str(src)).getroot())

    # float coords round to int like the reference's appendToXMLNode
    fb = CorrectionBox(x=1.6, y=2.4, width=9.5, height=3.0, type=RESOLVED)
    assert (fb.x, fb.y, fb.width, fb.height) == (2, 2, 10, 3)
    with pytest.raises(ValueError, match="correction type"):
        CorrectionBox(x=0, y=0, width=1, height=1, type=7)


def test_label_tool_corrections_http_roundtrip(label_tool_server):
    """POST a correction sheet, read it back, check the on-disk XML is the
    reference schema, and that the served page ships the correction-mode
    wiring. An empty POST removes the file (all-resolved cleanup)."""
    import json as _json
    import urllib.request
    import xml.etree.ElementTree as ET

    from fcn8s_tensorflow_tpu.prep.corrections import TO_REVIEW

    base, tool, tmp_path = label_tool_server

    # blank sheet for an unannotated image
    blank = _get_json(base + "/api/corrections/0")
    assert blank == {"nrows": 60, "ncols": 80, "boxes": []}

    payload = {"boxes": [
        {"x": 5, "y": 6, "width": 20, "height": 10, "type": TO_REVIEW,
         "annotation": "check the pole"},
    ]}
    req = urllib.request.Request(base + "/api/corrections/0",
                                 data=_json.dumps(payload).encode(),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        saved = _json.loads(r.read())
    assert saved["saved"] == "city_000000_000000_leftImg8bit.xml"

    back = _get_json(base + "/api/corrections/0")
    assert back["boxes"] == [{"x": 5, "y": 6, "width": 20, "height": 10,
                              "type": TO_REVIEW,
                              "annotation": "check the pole"}]

    # on-disk: reference schema (root <correction>, LabelMe-style header)
    root = ET.parse(tool.correction_path(0)).getroot()
    assert root.tag == "correction"
    assert root.findtext("filename") == "city_000000_000000_leftImg8bit.png"
    assert root.findtext("folder") == "StereoDataset/city"
    assert root.find("source").findtext("sourceAnnotation") == "mcLabelTool"
    assert root.find("imagesize").findtext("ncols") == "80"  # real width
    assert root.find("correction").find("bbox").findtext("width") == "20"

    # bad type -> 400, not a server error
    bad = {"boxes": [{"x": 0, "y": 0, "width": 1, "height": 1, "type": 9}]}
    req = urllib.request.Request(base + "/api/corrections/0",
                                 data=_json.dumps(bad).encode(), method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400

    # the page ships correction mode
    page = urllib.request.urlopen(base + "/", timeout=30).read().decode()
    for token in ['id="correct"', "CORR_COLORS", "/api/corrections/",
                  'e.key==="t"', 'e.key==="c"']:
        assert token in page, token

    # empty sheet deletes the file
    req = urllib.request.Request(base + "/api/corrections/0",
                                 data=_json.dumps({"boxes": []}).encode(),
                                 method="POST")
    urllib.request.urlopen(req, timeout=30).read()
    assert not os.path.isfile(tool.correction_path(0))
    assert _get_json(base + "/api/corrections/0")["boxes"] == []


def test_label_tool_screenshot_and_magnifier(label_tool_server):
    """Round 5 chrome (VERDICT r4 #6): /api/screenshot returns the composited
    review PNG (annotation overlay + typed correction boxes), and the editor
    page ships the magnifier zoom-window."""
    import json as _json
    import urllib.request

    base, tool, tmp_path = label_tool_server

    # annotate + drop one to-correct box with a note
    ann = {"imgWidth": 80, "imgHeight": 60, "objects": [
        {"label": "road", "polygon": [[0, 30], [79, 30], [79, 59], [0, 59]]}]}
    req = urllib.request.Request(base + "/api/annotation/0",
                                 data=_json.dumps(ann).encode(), method="POST")
    urllib.request.urlopen(req, timeout=30).read()
    corr = {"boxes": [{"x": 8, "y": 6, "width": 24, "height": 16,
                       "type": 1, "annotation": "fix edge"}]}
    req = urllib.request.Request(base + "/api/corrections/0",
                                 data=_json.dumps(corr).encode(), method="POST")
    urllib.request.urlopen(req, timeout=30).read()

    png = urllib.request.urlopen(base + "/api/screenshot/0", timeout=30).read()
    assert png[:4] == b"\x89PNG"
    import io as _io

    arr = np.asarray(Image.open(_io.BytesIO(png)).convert("RGB"))
    assert arr.shape == (60, 80, 3)
    # the to-correct box outline is pure red somewhere on its top edge
    assert (arr[6, 8:32] == (255, 0, 0)).all(axis=-1).any()
    # the road overlay landed (annotation composite reached the screenshot):
    # road color (128, 64, 128) at alpha 0.5 over gray 40 -> (84, 52, 84)
    assert tuple(arr[45, 40]) == (84, 52, 84)

    # magnifier zoom-window machinery ships in the editor page
    body = urllib.request.urlopen(base + "/", timeout=30).read().decode()
    for needle in ('id="mag"', "drawMag", "magnifier (m)", "toggleMag",
                   "/api/screenshot/"):
        assert needle in body, needle
