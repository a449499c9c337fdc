"""Offline pixel-level evaluator + native confusion-matrix kernel tests
(SURVEY.md §4: C++ kernel vs NumPy reference, score formula parity)."""

import os

import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.evaluation import confmat, pixel_eval
from fcn8s_tensorflow_tpu.labels.cityscapes import id2label, name2label
from fcn8s_tensorflow_tpu.utils import cs_helpers


# ---------------------------------------------------------------------------
# native kernel
# ---------------------------------------------------------------------------
def test_native_kernel_builds_and_matches_numpy(rng):
    pred = rng.integers(0, 34, (512, 512), dtype=np.uint8)
    gt = rng.integers(0, 34, (512, 512), dtype=np.uint8)
    conf = np.zeros((34, 34), np.uint64)
    confmat.accumulate_confusion(pred, gt, conf)
    want = np.bincount(
        gt.astype(np.int64).ravel() * 34 + pred.ravel(), minlength=34 * 34
    ).reshape(34, 34)
    np.testing.assert_array_equal(conf, want.astype(np.uint64))
    assert conf.sum() == pred.size


def test_accumulation_is_additive(rng):
    pred = rng.integers(0, 10, (64, 64), dtype=np.uint8)
    gt = rng.integers(0, 10, (64, 64), dtype=np.uint8)
    conf = np.zeros((10, 10), np.uint64)
    confmat.accumulate_confusion(pred, gt, conf)
    confmat.accumulate_confusion(pred, gt, conf)
    assert conf.sum() == 2 * pred.size


def test_find_invalid_label():
    gt = np.array([[1, 2], [3, 9]], dtype=np.uint8)
    assert confmat.find_invalid_label(gt, [1, 2, 3, 9]) == -1
    assert confmat.find_invalid_label(gt, [1, 2, 3]) == 3  # flat index of the 9


def test_instance_tp_size():
    inst = np.zeros((10, 10), np.int32)
    inst[2:6, 2:6] = 26005
    pred = np.zeros((10, 10), np.uint8)
    pred[2:4, 2:6] = 26
    tp, size = confmat.instance_tp_size(pred, inst, 26005, 26)
    assert (tp, size) == (8, 16)


def test_size_mismatch_raises(rng):
    with pytest.raises(ValueError):
        confmat.accumulate_confusion(
            np.zeros((4, 4), np.uint8), np.zeros((5, 5), np.uint8), np.zeros((3, 3), np.uint64)
        )


# ---------------------------------------------------------------------------
# cs_helpers
# ---------------------------------------------------------------------------
def test_cs_file_info():
    info = cs_helpers.get_cs_file_info("/x/aachen_000001_000019_gtFine_labelIds.png")
    assert info.city == "aachen"
    assert info.sequenceNb == "000001"
    assert info.frameNb == "000019"
    assert info.type == "gtFine"
    assert info.type2 == "labelIds"
    assert info.ext == "png"
    # multi-underscore city
    info = cs_helpers.get_cs_file_info("frankfurt_am_main_000001_000019_leftImg8bit.png")
    assert info.city == "frankfurt_am_main"
    assert cs_helpers.get_core_image_file_name(
        "aachen_000001_000019_leftImg8bit.png") == "aachen_000001_000019"


def test_color_entry_thresholds():
    """Every band and every boundary of the reference's score colorizer
    (csHelpers.py:62-76): [0,.20) RED, [.20,.40) YELLOW, [.40,.60) BLUE,
    [.60,.80) CYAN, [.80,1] GREEN; boundaries belong to the upper band."""
    class A: colorized = True
    a = A()
    c = cs_helpers.colors
    expected = [
        (0.0, c.RED), (0.1, c.RED), (0.19999, c.RED),
        (0.20, c.YELLOW), (0.39999, c.YELLOW),
        (0.40, c.BLUE), (0.59999, c.BLUE),
        (0.60, c.CYAN), (0.65, c.CYAN), (0.79999, c.CYAN),
        (0.80, c.GREEN), (0.95, c.GREEN), (1.0, c.GREEN),
    ]
    for val, color in expected:
        assert cs_helpers.get_color_entry(val, a) == color, val
    assert cs_helpers.get_color_entry(float("nan"), a) == c.ENDC
    class B: colorized = False
    assert cs_helpers.get_color_entry(0.1, B()) == ""


# ---------------------------------------------------------------------------
# pixel-level evaluator on a synthetic dataset
# ---------------------------------------------------------------------------
@pytest.fixture
def synthetic_eval_dataset(tmp_path):
    """One 100x100 image: GT left half road(7), right half car(26) with one
    car instance; prediction gets road fully right, car 75% right (misses a
    25-column strip as building(11))."""
    gt = np.zeros((100, 100), np.uint8)
    gt[:, :50] = 7
    gt[:, 50:] = 26
    pred = gt.copy()
    pred[:, 50:75] = 11  # half the car area misclassified as building... 25/50 cols
    inst = np.zeros((100, 100), np.int32)
    inst[:, 50:] = 26001  # one car instance
    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    pred_dir = tmp_path / "pred"; pred_dir.mkdir()
    gt_path = str(gt_dir / "city_000000_000000_gtFine_labelIds.png")
    inst_path = str(gt_dir / "city_000000_000000_gtFine_instanceIds.png")
    pred_path = str(pred_dir / "city_000000_000000_pred.png")
    Image.fromarray(gt).save(gt_path)
    Image.fromarray(inst.astype(np.int32), mode="I").save(inst_path)
    Image.fromarray(pred).save(pred_path)
    return pred_path, gt_path, tmp_path


def _quiet_args(tmp_path):
    args = pixel_eval.EvalArgs()
    args.quiet = True
    args.json_output = True
    args.export_file = str(tmp_path / "out" / "result.json")
    return args


def test_evaluate_img_lists_scores(synthetic_eval_dataset):
    pred_path, gt_path, tmp_path = synthetic_eval_dataset
    args = _quiet_args(tmp_path)
    results = pixel_eval.evaluate_img_lists([pred_path], [gt_path], args)

    # road: predicted perfectly -> IoU 1.0
    assert results["classScores"]["road"] == pytest.approx(1.0)
    # car: tp=2500, fn=2500, fp=0 -> IoU 0.5
    assert results["classScores"]["car"] == pytest.approx(0.5)
    # building: tp=0 but fp>0 -> 0.0
    assert results["classScores"]["building"] == pytest.approx(0.0)
    # never-seen evaluated class -> NaN, excluded from the average
    assert np.isnan(results["classScores"]["person"])
    # instance-weighted car iIoU: weight cancels (tp_w=w*2500, fn_w=w*2500, fp=0) -> 0.5
    assert results["classInstScores"]["car"] == pytest.approx(0.5)
    # category 'flat' contains road only here -> 1.0
    assert results["categoryScores"]["flat"] == pytest.approx(1.0)
    # vehicle category: only car pixels in GT; category-level fp excludes
    # in-category cols; building is out-of-category fp=0 (building col not in vehicle)
    assert results["categoryScores"]["vehicle"] == pytest.approx(0.5)
    # JSON export written
    assert os.path.isfile(args.export_file)


def test_conf_matrix_sanity_check(synthetic_eval_dataset):
    pred_path, gt_path, tmp_path = synthetic_eval_dataset
    args = _quiet_args(tmp_path)
    args.eval_inst_level_score = False
    results = pixel_eval.evaluate_img_lists([pred_path], [gt_path], args)
    conf = np.asarray(results["confMatrix"])
    assert conf.sum() == 100 * 100
    assert conf[7, 7] == 5000
    assert conf[26, 26] == 2500
    assert conf[26, 11] == 2500


def test_mismatched_sizes_error(synthetic_eval_dataset, tmp_path):
    pred_path, gt_path, base = synthetic_eval_dataset
    bad = str(tmp_path / "bad_pred.png")
    Image.fromarray(np.zeros((50, 50), np.uint8)).save(bad)
    args = _quiet_args(base)
    with pytest.raises(RuntimeError, match="not equal"):
        pixel_eval.evaluate_img_lists([bad], [gt_path], args)


def test_unknown_label_error(synthetic_eval_dataset, tmp_path):
    pred_path, gt_path, base = synthetic_eval_dataset
    bad_gt = str(tmp_path / "city_000001_000000_gtFine_labelIds.png")
    Image.fromarray(np.full((100, 100), 200, np.uint8)).save(bad_gt)
    args = _quiet_args(base)
    args.eval_inst_level_score = False
    with pytest.raises(RuntimeError, match="Unknown label"):
        pixel_eval.evaluate_img_lists([pred_path], [bad_gt], args)


def test_get_prediction_discovery(synthetic_eval_dataset):
    pred_path, gt_path, tmp_path = synthetic_eval_dataset
    args = pixel_eval.EvalArgs()
    args.prediction_path = os.path.dirname(pred_path)
    found = pixel_eval.get_prediction(args, gt_path)
    assert found == pred_path


def test_eval_pixel_accuracy_stats(synthetic_eval_dataset):
    pred_path, gt_path, tmp_path = synthetic_eval_dataset
    args = _quiet_args(tmp_path)
    args.eval_pixel_accuracy = True
    args.eval_inst_level_score = False
    results = pixel_eval.evaluate_img_lists([pred_path], [gt_path], args)
    stats = results["perImageScores"][pred_path]
    assert stats["nbNotIgnoredPixels"] == 100 * 100  # all GT px are road/car
    # 2,500 px are erroneous; we store actual CORRECT pixels (the reference
    # stores the erroneous count under this key — documented divergence).
    assert stats["nbCorrectPixels"] == 100 * 100 - 2500


# ---------------------------------------------------------------------------
# closed-loop scorer consistency (VERDICT r2 #2): weld the three
# independently-tested halves — trainer, serving (predict_and_save ids),
# offline benchmark scorer — into one verified chain, and assert the
# offline per-class IoU equals the streaming confusion-matrix IoU computed
# on the same predictions.
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_closed_loop_scorer_consistency(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.engine.model import FCN8s
    from fcn8s_tensorflow_tpu.engine.schedules import constant
    from fcn8s_tensorflow_tpu.labels import (
        IDS_TO_TRAINIDS_ARRAY,
        NUM_TRAIN_CLASSES,
        TRAINIDS_TO_IDS_ARRAY,
    )
    from fcn8s_tensorflow_tpu.ops import metrics as metrics_ops

    rng = np.random.default_rng(0)
    H, W = 64, 128
    ds = tmp_path / "ds"
    img_dir = ds / "leftImg8bit" / "val" / "synth"
    gt_dir = ds / "gtFine" / "val" / "synth"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)

    # GT in labelId space: road(7)/building(11)/car(26) stripes rotated per
    # image, plus a void strip (unlabeled=0) to exercise the benchmark's
    # FP-excludes-ignored-GT rule
    CLASS_COLORS = {7: (128, 64, 128), 11: (70, 70, 70), 26: (0, 0, 142)}
    images, gts = [], []
    for n in range(4):
        gt = np.zeros((H, W), np.uint8)
        gt[:, :40] = 7
        gt[:, 40:88] = 11
        gt[:, 88:] = 26
        gt = np.roll(gt, n * 16, axis=1)
        gt[:4] = 0
        img = np.zeros((H, W, 3), np.uint8)
        for cid, col in CLASS_COLORS.items():
            img[gt == cid] = col
        img = np.clip(
            img.astype(np.int16) + rng.integers(-10, 10, (H, W, 3)), 0, 255
        ).astype(np.uint8)
        name = f"synth_000000_{n:06d}"
        Image.fromarray(img).save(img_dir / f"{name}_leftImg8bit.png")
        Image.fromarray(gt).save(gt_dir / f"{name}_gtFine_labelIds.png")
        Image.fromarray(gt.astype(np.uint16)).save(
            gt_dir / f"{name}_gtFine_instanceIds.png")
        images.append(img)
        gts.append(gt)
    images = np.stack(images)
    train_ids = IDS_TO_TRAINIDS_ARRAY[np.stack(gts)].astype(np.uint8)

    # short train in trainId space (color-coded classes learn quickly)
    model = FCN8s(num_classes=NUM_TRAIN_CLASSES, width_mult=1 / 16,
                  fc_channels=64, compute_dtype=jnp.float32)

    def gen():
        while True:
            yield images, train_ids

    model.train(gen(), epochs=1, steps_per_epoch=50,
                learning_rate_schedule=constant(3e-3), keep_prob=1.0,
                record_summaries=False)

    # serving: benchmark-submission-format id maps (trainId -> labelId)
    results_dir = tmp_path / "results"
    model.predict_and_save(str(results_dir), str(img_dir),
                           output_format="ids", id_map=TRAINIDS_TO_IDS_ARRAY,
                           batch_size=2)
    saved = sorted(os.listdir(results_dir))
    assert len(saved) == 4 and all(p.endswith(".png") for p in saved)

    # offline scorer: the reference CLI path — env-var config + discovery
    monkeypatch.setenv("CITYSCAPES_DATASET", str(ds))
    monkeypatch.setenv("CITYSCAPES_RESULTS", str(results_dir))
    export = tmp_path / "export"
    export.mkdir()
    monkeypatch.setenv("CITYSCAPES_EXPORT_DIR", str(export))
    offline = pixel_eval.main([])
    assert os.path.isfile(export / "resultPixelLevelSemanticLabeling.json")

    # streaming side: the training-time confusion matrix on the SAME
    # predictions, bridged to the benchmark FP rule
    preds = model.predict(images)  # trainId argmax, same executable family
    conf = np.asarray(metrics_ops.confusion_matrix(
        jnp.asarray(preds), jnp.asarray(train_ids), NUM_TRAIN_CLASSES
    )).astype(np.int64)
    iou, valid = metrics_ops.benchmark_iou_from_confusion(jnp.asarray(conf))
    iou, valid = np.asarray(iou), np.asarray(valid)

    # integer-exact: the offline id-space matrix collapsed to trainId space
    # must equal the streaming trainId matrix cell for cell
    offline_conf = np.asarray(offline["confMatrix"], dtype=np.int64)
    collapsed = np.zeros_like(conf)
    for gt_id in range(offline_conf.shape[0]):
        for pr_id in range(offline_conf.shape[1]):
            if offline_conf[gt_id, pr_id]:
                collapsed[IDS_TO_TRAINIDS_ARRAY[gt_id],
                          IDS_TO_TRAINIDS_ARRAY[pr_id]] += offline_conf[gt_id, pr_id]
    np.testing.assert_array_equal(collapsed, conf)

    checked = 0
    for cid in (7, 11, 26):
        label = id2label[cid]
        offline_iou = offline["classScores"][label.name]
        assert valid[label.trainId]
        # counts are integer-exact (asserted above); the quotient differs
        # only by the bridge's float32 division vs the scorer's float64
        assert offline_iou == pytest.approx(float(iou[label.trainId]), abs=1e-6), label.name
        checked += 1
    assert checked == 3
    # the model actually learned the mapping (random 20-class argmax would
    # score ~0.05) — the chain is non-trivial; measured ~0.44 at 50 steps
    assert np.nanmean([offline["classScores"][id2label[c].name] for c in (7, 11, 26)]) > 0.3


def test_score_benchmark_facade(tmp_path, monkeypatch, capsys):
    """FCN8s.score_benchmark: the predict->export->offline-score chain as
    one call (mechanics only; scorer/streaming agreement is pinned by
    test_closed_loop_scorer_consistency). Also pins: a stale
    CITYSCAPES_EXPORT_DIR env var is ignored (EvalArgs is built directly,
    every env-derived field overridden); quiet=True keeps stdout silent;
    a missing gtFine tree fails BEFORE any inference runs."""
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.engine.model import FCN8s
    from fcn8s_tensorflow_tpu.labels import NUM_TRAIN_CLASSES

    rng = np.random.default_rng(1)
    H, W = 32, 64
    ds = tmp_path / "ds"
    img_dir = ds / "leftImg8bit" / "val" / "synth"
    gt_dir = ds / "gtFine" / "val" / "synth"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    for n in range(2):
        gt = np.full((H, W), 7, np.uint8)
        gt[:, W // 2:] = 26
        name = f"synth_000000_{n:06d}"
        Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
            img_dir / f"{name}_leftImg8bit.png")
        Image.fromarray(gt).save(gt_dir / f"{name}_gtFine_labelIds.png")
        Image.fromarray(gt.astype(np.uint16)).save(
            gt_dir / f"{name}_gtFine_instanceIds.png")

    model = FCN8s(num_classes=NUM_TRAIN_CLASSES, width_mult=1 / 32,
                  fc_channels=32, compute_dtype=jnp.float32)
    results_dir = str(tmp_path / "results")
    # stale env pointing at a nonexistent export dir must be ignored
    monkeypatch.setenv("CITYSCAPES_EXPORT_DIR", str(tmp_path / "gone"))
    capsys.readouterr()  # drain anything buffered before the quiet call
    out = model.score_benchmark(str(ds), results_dir)
    assert capsys.readouterr().out == ""  # quiet=True covers predict + score
    assert "classScores" in out and "confMatrix" in out
    conf = np.asarray(out["confMatrix"])
    assert conf.sum() == 2 * H * W  # every pixel scored exactly once
    assert os.path.isfile(os.path.join(
        results_dir, "resultPixelLevelSemanticLabeling.json"))
    saved = [p for p in os.listdir(results_dir) if p.endswith(".png")]
    assert len(saved) == 2
    with pytest.raises(ValueError, match="image root"):
        model.score_benchmark(str(tmp_path / "nope"), results_dir)
    # missing gtFine split: fail fast, BEFORE any prediction is written
    ds2 = tmp_path / "ds2"
    img2 = ds2 / "leftImg8bit" / "val" / "synth"
    img2.mkdir(parents=True)
    Image.fromarray(rng.integers(0, 255, (H, W, 3), np.uint8)).save(
        img2 / "synth_000000_000000_leftImg8bit.png")
    results2 = str(tmp_path / "results2")
    with pytest.raises(ValueError, match="no ground truth"):
        model.score_benchmark(str(ds2), results2)
    assert not os.path.isdir(results2) or not os.listdir(results2)
    model.close()
