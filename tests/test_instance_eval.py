"""Instance-level AP evaluator on synthetic data (SURVEY.md §4)."""

import os

import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.evaluation import instance_eval
from fcn8s_tensorflow_tpu.evaluation.instance import Instance, instances_to_dict


def test_instance_label_decoding():
    assert Instance.get_label_id(26001) == 26
    assert Instance.get_label_id(33999) == 33
    assert Instance.get_label_id(7) == 7  # stuff region keeps bare id


def test_instances_to_dict(tmp_path):
    img = np.zeros((50, 50), np.int32)
    img[:20, :20] = 26001   # car instance, 400 px
    img[30:, 30:] = 24001   # person instance, 400 px
    path = str(tmp_path / "x_000000_000000_gtFine_instanceIds.png")
    Image.fromarray(img, mode="I").save(path)
    d = instances_to_dict([path])
    entry = d[os.path.abspath(path)]
    cars = entry["car"]
    assert len(cars) == 1 and cars[0]["pixelCount"] == 400 and cars[0]["instID"] == 26001
    assert len(entry["person"]) == 1
    # background (id 0 < 1000) recorded under its label
    assert entry["unlabeled"][0]["pixelCount"] == 2500 - 800


def _write_instance_gt(tmp_path, name, inst_array):
    path = str(tmp_path / f"{name}_gtFine_instanceIds.png")
    Image.fromarray(inst_array.astype(np.int32), mode="I").save(path)
    return path


def _write_pred(pred_dir, base, masks):
    """masks: list of (mask_array, label_id, confidence). Writes the
    reference's prediction format: info txt + binary mask PNGs."""
    os.makedirs(pred_dir, exist_ok=True)
    txt_path = os.path.join(pred_dir, f"{base}.txt")
    lines = []
    for i, (mask, label_id, conf) in enumerate(masks):
        mask_name = f"{base}_mask{i}.png"
        Image.fromarray((mask * 255).astype(np.uint8)).save(os.path.join(pred_dir, mask_name))
        lines.append(f"{mask_name} {label_id} {conf}")
    with open(txt_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return txt_path


@pytest.fixture
def args(tmp_path):
    a = instance_eval.InstanceEvalArgs()
    a.quiet = True
    a.colorized = False
    a.json_output = True
    a.export_file = str(tmp_path / "out" / "result.json")
    a.gt_instances_file = str(tmp_path / "gtInstances.json")
    a.prediction_path = str(tmp_path / "pred")
    return a


def test_distance_gated_variants(args):
    """distance_available=True evaluates all three (minRegion, distTh,
    distConf) variants and reports AP_50m / AP_100m / AP_50%50m (reference
    `:549-576`). Two car GTs — near (30 m) and far (80 m) — with a perfect
    prediction on the near one only: the 100 m gate keeps both GTs (AP on
    1-of-2), the 50 m gate drops the far GT (AP = 1)."""
    import numpy as np

    from fcn8s_tensorflow_tpu.evaluation.instance_eval import (
        compute_averages,
        evaluate_matches,
        set_inst_labels,
    )

    args.distance_available = True
    set_inst_labels(args)

    def gt(inst_id, px, med_dist):
        return {"instID": inst_id, "pixelCount": px, "medDist": med_dist,
                "distConf": 0.9, "matchedPred": []}

    near, far = gt(26001, 2000, 30.0), gt(26002, 2000, 80.0)
    pred = {"confidence": 0.99, "pixelCount": 2000, "voidIntersection": 0,
            "matchedGt": [dict(near, intersection=2000)]}
    near["matchedPred"] = [dict(pred, intersection=2000)]

    matches = {"img0": {
        "groundTruth": {n: [] for n in args.inst_labels},
        "prediction": {n: [] for n in args.inst_labels},
    }}
    matches["img0"]["groundTruth"]["car"] = [near, far]
    matches["img0"]["prediction"]["car"] = [pred]

    aps = evaluate_matches(matches, args)
    assert aps.shape[0] == 3  # all three distance variants evaluated
    avg = compute_averages(aps, args)
    # far GT (80 m) passes the 100 m gate -> 1 of 2 GTs matched
    assert 0.0 < avg["classes"]["car"]["ap100m"] < 1.0
    assert avg["classes"]["car"]["ap100m"] == pytest.approx(avg["classes"]["car"]["ap"])
    # ...but fails the 50 m gate -> only the matched near GT remains
    assert avg["classes"]["car"]["ap50m"] == pytest.approx(1.0)
    assert avg["allAp50m"] == pytest.approx(1.0)
    assert avg["allAp50%50m"] == pytest.approx(1.0)
    assert np.isfinite(avg["allAp100m"])


def test_perfect_prediction_ap_one(tmp_path, args):
    inst = np.zeros((100, 100), np.int32)
    inst[10:40, 10:40] = 26000   # car instance (900 px >= minRegion 100)
    gt_path = _write_instance_gt(tmp_path, "c_000000_000000", inst)
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000000_000000",
                           [(inst == 26000, 26, 0.99)])
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    assert result["classes"]["car"]["ap"] == pytest.approx(1.0)
    assert result["allAp50%"] == pytest.approx(1.0)  # only car has GT; others NaN
    assert os.path.isfile(args.export_file)


def test_partial_overlap_counts_only_low_thresholds(tmp_path, args):
    inst = np.zeros((100, 100), np.int32)
    inst[0:30, 0:30] = 26000  # 900 px car
    gt_path = _write_instance_gt(tmp_path, "c_000001_000000", inst)
    # prediction covers 20x30 = 600 px of the instance, total 600 px
    mask = np.zeros((100, 100), bool)
    mask[0:20, 0:30] = True
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000001_000000", [(mask, 26, 0.9)])
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    # IoU = 600/900 = 0.667 -> matched at overlaps {0.5..0.65}, FN above.
    # AP = 1.0 for 4 of 10 overlaps, 0 for 6 -> mean 0.4
    assert result["classes"]["car"]["ap"] == pytest.approx(0.4)
    assert result["classes"]["car"]["ap50%"] == pytest.approx(1.0)


def test_false_positive_lowers_ap(tmp_path, args):
    # background is road (id 7, evaluated stuff) so the stray prediction is a
    # REAL false positive, not an ignorable void overlap
    inst = np.full((100, 100), 7, np.int32)
    inst[0:30, 0:30] = 26000
    gt_path = _write_instance_gt(tmp_path, "c_000002_000000", inst)
    good = inst == 26000
    fp = np.zeros((100, 100), bool)
    fp[60:90, 60:90] = True  # 900 px on road -> FP
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000002_000000",
                           [(good, 26, 0.9), (fp, 26, 0.95)])
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    # reference PR construction: points (p=0.5, r=1.0) at thr 0.9,
    # (p=0, r=0) at thr 0.95, artificial (p=1, r=0); step widths
    # [0.5, 0.5, 0] -> AP = 0.5*0.5 = 0.25
    assert result["classes"]["car"]["ap50%"] == pytest.approx(0.25)


def test_fp_on_void_is_ignored(tmp_path, args):
    inst = np.zeros((100, 100), np.int32)  # id 0 = unlabeled = void everywhere
    inst[0:30, 0:30] = 26000
    gt_path = _write_instance_gt(tmp_path, "c_000003_000000", inst)
    good = inst == 26000
    fp_on_void = np.zeros((100, 100), bool)
    fp_on_void[60:90, 60:90] = True  # entirely on void -> ignored, not FP
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000003_000000",
                           [(good, 26, 0.9), (fp_on_void, 26, 0.95)])
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    assert result["classes"]["car"]["ap50%"] == pytest.approx(1.0)


def test_small_gt_instances_filtered(tmp_path, args):
    inst = np.zeros((100, 100), np.int32)
    inst[0:5, 0:5] = 26000  # 25 px < minRegionSize 100 -> excluded from GT
    gt_path = _write_instance_gt(tmp_path, "c_000004_000000", inst)
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000004_000000", [])
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    # no valid GT at all -> NaN everywhere -> allAp is NaN
    assert np.isnan(result["classes"]["car"]["ap"])


def test_missed_gt_is_hard_fn(tmp_path, args):
    inst = np.zeros((100, 100), np.int32)
    inst[0:30, 0:30] = 26000
    inst[60:90, 60:90] = 26001  # second car, unmatched
    gt_path = _write_instance_gt(tmp_path, "c_000005_000000", inst)
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000005_000000",
                           [(inst == 26000, 26, 0.9)])
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    # one TP, one hard FN -> recall caps at 0.5; AP ~ 0.5
    assert result["classes"]["car"]["ap50%"] == pytest.approx(0.5)


def test_gt_instances_cached(tmp_path, args):
    inst = np.zeros((50, 50), np.int32)
    inst[0:20, 0:20] = 26000
    gt_path = _write_instance_gt(tmp_path, "c_000006_000000", inst)
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000006_000000", [(inst == 26000, 26, 0.9)])
    instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    assert os.path.isfile(args.gt_instances_file)
    # second run loads the cache (and still works)
    args.prediction_walk = None
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)
    assert result["classes"]["car"]["ap"] == pytest.approx(1.0)


def test_pred_info_validation(tmp_path, args):
    bad = str(tmp_path / "pred" / "bad.txt")
    os.makedirs(str(tmp_path / "pred"), exist_ok=True)
    with open(bad, "w") as f:
        f.write("onlytwo fields\n")
    with pytest.raises(RuntimeError, match="Invalid prediction file"):
        instance_eval.read_pred_info(bad, args)
    with pytest.raises(RuntimeError, match="not found"):
        instance_eval.read_pred_info(str(tmp_path / "missing.txt"), args)


def test_distance_gated_variants_end_to_end(tmp_path, args):
    """Full image-driven path with distance data (VERDICT r2 #6): GT PNGs +
    prediction masks + a distance-carrying gtInstances.json cache (the
    reference's disparity-derived medDist/distConf arrives exactly this way,
    `evalInstanceLevelSemanticLabeling.py:191-208`) -> evaluate_img_lists
    with distance_available=True exercises all three
    minRegionSize/distanceTh/distanceConf rows. Instances are sized >= 1000
    px so they clear the distance rows' larger min-region gate
    (`:128-135`: minRegionSizes = [100, 1000, 1000])."""
    import json

    inst = np.zeros((100, 100), np.int32)
    inst[0:40, 0:40] = 26000      # near car, 1600 px
    inst[55:95, 55:95] = 26001    # far car, 1600 px
    gt_path = _write_instance_gt(tmp_path, "c_000003_000000", inst)
    # predict the NEAR car perfectly, miss the far one
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000003_000000",
                           [(inst == 26000, 26, 0.99)])

    # distance-annotated GT instance cache (medDist in meters)
    base = instances_to_dict([gt_path])
    for rec in base[os.path.abspath(gt_path)]["car"]:
        rec["medDist"] = 30.0 if rec["instID"] == 26000 else 80.0
        rec["distConf"] = 0.9
    with open(args.gt_instances_file, "w") as f:
        json.dump(base, f)

    args.distance_available = True
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)

    # default row (inf distance, minRegion 100): 1 of 2 GTs matched
    assert 0.0 < result["classes"]["car"]["ap"] < 1.0
    # 100 m row keeps both GTs (30 m and 80 m) -> same as default
    assert result["classes"]["car"]["ap100m"] == pytest.approx(
        result["classes"]["car"]["ap"])
    # 50 m row drops the far GT; the near one is matched perfectly
    assert result["classes"]["car"]["ap50m"] == pytest.approx(1.0)
    assert result["allAp50m"] == pytest.approx(1.0)
    assert os.path.isfile(args.export_file)


def test_csv_output_mode(tmp_path, args, capsys):
    """args.csv=True prints the results table as parseable CSV — header,
    one row per instance class, an 'average' row, no rule lines (reference
    printResults, evalInstanceLevelSemanticLabeling.py:578-627)."""
    inst = np.zeros((100, 100), np.int32)
    inst[10:40, 10:40] = 26000
    gt_path = _write_instance_gt(tmp_path, "c_000004_000000", inst)
    pred_txt = _write_pred(str(tmp_path / "pred"), "c_000004_000000",
                           [(inst == 26000, 26, 0.99)])
    args.quiet = False
    args.csv = True
    result = instance_eval.evaluate_img_lists([pred_txt], [gt_path], args)

    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if "," in ln]  # drop the progress chatter
    header = lines[0].split(",")
    assert header == ["what", "AP", "AP_50%"]
    rows = {ln.split(",")[0]: ln.split(",")[1:] for ln in lines[1:]}
    assert set(rows) == set(args.inst_labels) | {"average"}
    assert float(rows["car"][0]) == pytest.approx(result["classes"]["car"]["ap"], abs=5e-4)
    assert float(rows["average"][1]) == pytest.approx(result["allAp50%"], abs=5e-4)
    # no ANSI escapes, no rule lines
    assert all("\033" not in ln and not ln.startswith("-") for ln in lines)


def test_csv_output_distance_columns(args, capsys):
    """CSV mode with distance_available=True carries the three extra
    distance-gated columns (reference :592-596)."""
    args.quiet = False
    args.csv = True
    args.distance_available = True
    instance_eval.set_inst_labels(args)
    aps = np.full((3, len(args.inst_labels), 10), 0.5)
    avg = instance_eval.compute_averages(aps, args)
    instance_eval.print_results(avg, args)
    header = capsys.readouterr().out.splitlines()[0].split(",")
    assert header == ["what", "AP", "AP_50%", "AP_50m", "AP_100m", "AP_50%50m"]
