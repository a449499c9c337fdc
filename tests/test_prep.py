"""Annotation model + polygon rasterization tests (SURVEY.md §4)."""

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
