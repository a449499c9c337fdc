"""Label-registry invariants (SURVEY.md §4 test strategy)."""

import numpy as np

from fcn8s_tensorflow_tpu.labels import (
    CATEGORYIDS_TO_IDS_ARRAY,
    IDS_TO_COLORS_ARRAY,
    IDS_TO_TRAINIDS_ARRAY,
    NUM_TRAIN_CLASSES,
    TRAINIDS_TO_COLORS_ARRAY,
    TRAINIDS_TO_IDS_ARRAY,
    TRAINIDS_TO_RGBA_DICT,
    assure_single_instance_name,
    id2label,
    labels,
    labels_original,
    name2label,
    trainId2label,
)


def test_num_train_classes():
    assert NUM_TRAIN_CLASSES == 20
    train_ids = {l.trainId for l in labels}
    assert train_ids == set(range(20))


def test_void_classes_collapse_to_zero():
    for label in labels:
        if label.ignoreInEval:
            assert label.trainId == 0, label.name


def test_evaluated_classes_are_1_to_19():
    evaluated = [l for l in labels if not l.ignoreInEval]
    assert sorted(l.trainId for l in evaluated) == list(range(1, 20))


def test_original_scheme_uses_255_ignore():
    for label in labels_original:
        if label.id >= 0 and label.ignoreInEval:
            assert label.trainId == 255, label.name
    evaluated = [l for l in labels_original if not l.ignoreInEval]
    assert sorted(l.trainId for l in evaluated) == list(range(19))


def test_id_lut_roundtrip():
    # Every evaluated class survives id -> trainId -> id.
    for label in labels:
        if not label.ignoreInEval and label.id >= 0:
            assert IDS_TO_TRAINIDS_ARRAY[label.id] == label.trainId
            assert TRAINIDS_TO_IDS_ARRAY[label.trainId] == label.id
    assert TRAINIDS_TO_IDS_ARRAY[0] == 0  # void maps to 'unlabeled'


def test_color_luts():
    assert IDS_TO_COLORS_ARRAY.shape == (35, 3)
    assert TRAINIDS_TO_COLORS_ARRAY.shape == (20, 3)
    road = name2label["road"]
    assert tuple(IDS_TO_COLORS_ARRAY[road.id]) == road.color
    assert tuple(TRAINIDS_TO_COLORS_ARRAY[road.trainId]) == road.color


def test_rgba_alpha():
    for rgba in TRAINIDS_TO_RGBA_DICT.values():
        assert len(rgba) == 4 and rgba[3] == 127


def test_trainid2label_prefers_first_label():
    # reversed() trick: trainId 0 resolves to 'unlabeled', not 'license plate'.
    assert trainId2label[0].name == "unlabeled"
    assert trainId2label[1].name == "road"


def test_assure_single_instance_name():
    assert assure_single_instance_name("car") == "car"
    assert assure_single_instance_name("cargroup") == "car"
    # 'polegroup' is itself a registered label, so it passes through unchanged
    assert assure_single_instance_name("polegroup") == "polegroup"
    # an unknown group name whose base class has no instances resolves to None
    assert assure_single_instance_name("roadgroup") is None
    assert assure_single_instance_name("nonexistent") is None


def test_category_lut():
    assert CATEGORYIDS_TO_IDS_ARRAY.shape == (8,)
    assert id2label[7].category == "flat"


def test_lut_vectorized_remap(rng):
    ids = rng.integers(0, 34, size=(64, 128), dtype=np.uint8)
    train = IDS_TO_TRAINIDS_ARRAY[ids]
    for label in labels:
        if 0 <= label.id < 34:
            assert np.all(train[ids == label.id] == label.trainId)
