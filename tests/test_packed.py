"""Packed binary dataset format (data/packed.py): pack-time content
fidelity, static transforms, and byte-identical generate() equivalence with
BatchGenerator (same seed -> same batches) — the property that makes the
packed backend a drop-in storage swap."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.data import BatchGenerator, DataError, \
    PackedDataset, pack_dataset


@pytest.fixture
def tree(tmp_path, rng):
    img_root = tmp_path / "images"
    gt_root = tmp_path / "gt"
    for city in ["aachen", "bochum"]:
        (img_root / city).mkdir(parents=True)
        (gt_root / city).mkdir(parents=True)
        for i in range(4):
            stem = f"{city}_{i:06d}_000019"
            img = rng.integers(0, 255, (40, 64, 3), dtype=np.uint8)
            gt = rng.integers(0, 20, (40, 64), dtype=np.uint8)
            Image.fromarray(img).save(img_root / city / f"{stem}_leftImg8bit.png")
            Image.fromarray(gt).save(gt_root / city / f"{stem}_gtFine_labelIds.png")
    return {"img_root": str(img_root), "gt_root": str(gt_root), "tmp": tmp_path}


def _gen(tree, **kw):
    return BatchGenerator(
        image_dirs=[tree["img_root"]],
        ground_truth_dirs=[tree["gt_root"]],
        image_name_split_separator="leftImg8bit",
        ground_truth_suffix="gtFine_labelIds",
        num_classes=20,
        **kw,
    )


def _pack(tree, **kw):
    gen = _gen(tree)
    out = pack_dataset(gen, str(tree["tmp"] / "packed"), **kw)
    return gen, PackedDataset(out, num_classes=20)


def test_pack_roundtrip_content(tree):
    """Packed arrays hold exactly the decoded source pixels, in discovery
    order, with a valid manifest."""
    gen, ds = _pack(tree)
    assert ds.get_num_files() == gen.get_num_files() == 8
    for i, path in enumerate(gen.image_paths):
        src = np.asarray(Image.open(path))
        np.testing.assert_array_equal(ds.images[i], src)
        gt_path = gen.ground_truth_paths[os.path.basename(path)]
        np.testing.assert_array_equal(ds.labels[i], np.asarray(Image.open(gt_path)))
    with open(os.path.join(ds.directory, "index.json")) as f:
        index = json.load(f)
    assert index["format_version"] == 1
    assert index["image_shape"] == [40, 64, 3]
    assert index["count"] == 8


def test_generate_equivalence_with_batch_generator(tree):
    """THE contract: same seed + same dynamic-augmentation config ->
    byte-identical batches from PackedDataset and BatchGenerator, through
    shuffled epoch boundaries (batch 3 over 8 images exercises the short
    chunk + reshuffle)."""
    gen, ds = _pack(tree)
    cfg = dict(
        batch_size=3, convert_to_one_hot=True, void_class_id=0,
        brightness=(0.5, 1.5, 0.5), flip=0.5, translate=((1, 4), (1, 4), 0.5),
        scale=(0.8, 1.2, 0.5), contrast=(0.7, 1.3, 0.5), gray=False,
        shuffle=True, seed=99,
    )
    a = gen.generate(**cfg)
    b = ds.generate(**cfg)
    for _ in range(7):  # > 2 epochs
        im_a, gt_a = next(a)
        im_b, gt_b = next(b)
        np.testing.assert_array_equal(im_a, im_b)
        np.testing.assert_array_equal(gt_a, gt_b)


def test_generate_shard_equivalence(tree):
    """Sharded streams match BatchGenerator's shard semantics batch for
    batch (disjointness + lockstep shuffles are pinned in test_data.py;
    here we pin backend equality)."""
    gen, ds = _pack(tree)
    cfg = dict(batch_size=2, convert_to_one_hot=False, shuffle=True,
               seed=7, flip=0.5, shard=(1, 3))
    a, b = gen.generate(**cfg), ds.generate(**cfg)
    for _ in range(5):
        im_a, gt_a = next(a)
        im_b, gt_b = next(b)
        np.testing.assert_array_equal(im_a, im_b)
        np.testing.assert_array_equal(gt_a, gt_b)


def test_pack_static_transforms(tree):
    """resize + ID remap applied once at pack time."""
    lut = np.zeros(256, np.uint8)
    lut[:20] = np.arange(20)[::-1]
    gen, ds = _pack(tree, resize=(20, 32), convert_ids_to_ids=lut)
    assert ds.images.shape == (8, 20, 32, 3)
    assert ds.labels.shape == (8, 20, 32)
    # remap happened: ids are within the reversed range
    assert int(np.asarray(ds.labels).max()) <= 19
    im, gt = next(ds.generate(batch_size=2, convert_to_one_hot=False,
                              shuffle=False))
    assert im.shape == (2, 20, 32, 3) and gt.shape == (2, 20, 32)


def test_class_pixel_counts_matches_generator(tree):
    gen, ds = _pack(tree)
    np.testing.assert_array_equal(
        ds.class_pixel_counts(20), gen.class_pixel_counts(20))


def test_nonuniform_sizes_raise(tree):
    odd = os.path.join(tree["img_root"], "aachen", "odd_leftImg8bit.png")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(odd)
    Image.fromarray(np.zeros((8, 8), np.uint8)).save(
        os.path.join(tree["gt_root"], "aachen", "odd_gtFine_labelIds.png"))
    gen = _gen(tree)
    with pytest.raises(DataError, match="uniform size"):
        pack_dataset(gen, str(tree["tmp"] / "packed_bad"))


@pytest.mark.slow
def test_offline_preprocessing_example_packed(tmp_path, rng):
    """The tutorial-equivalent CLI's --packed mode (examples/
    offline_preprocessing.py, reference `offline_preprocessing_tutorial.ipynb`)
    writes a loadable packed dataset with the remap+resize applied."""
    import subprocess
    import sys as _sys

    root = tmp_path / "cs"
    for split in ["train"]:
        img_dir = root / "leftImg8bit" / split / "aachen"
        gt_dir = root / "gtFine" / split / "aachen"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(2):
            stem = f"aachen_{i:06d}_000019"
            Image.fromarray(
                rng.integers(0, 255, (64, 128, 3), dtype=np.uint8)
            ).save(img_dir / f"{stem}_leftImg8bit.png")
            Image.fromarray(
                rng.integers(0, 34, (64, 128), dtype=np.uint8)
            ).save(gt_dir / f"{stem}_gtFine_labelIds.png")
    export = tmp_path / "packed_out"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [_sys.executable, os.path.join(repo, "examples", "offline_preprocessing.py"),
         "--dataset", str(root), "--export", str(export),
         "--resolution", "32", "64", "--splits", "train", "--packed"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    ds = PackedDataset(str(export / "train"), num_classes=20)
    assert ds.get_num_files() == 2
    assert ds.images.shape == (2, 32, 64, 3)
    assert int(np.asarray(ds.labels).max()) <= 19  # IDs->trainIds applied
    im, gt = next(ds.generate(2, convert_to_one_hot=False, shuffle=False))
    assert im.shape == (2, 32, 64, 3) and gt.shape == (2, 32, 64)


def test_version_and_missing_index_guards(tree):
    _, ds = _pack(tree)
    with pytest.raises(DataError, match="not a packed dataset"):
        PackedDataset(str(tree["tmp"]))
    index_path = os.path.join(ds.directory, "index.json")
    with open(index_path) as f:
        index = json.load(f)
    index["format_version"] = 999
    with open(index_path, "w") as f:
        json.dump(index, f)
    with pytest.raises(DataError, match="format_version"):
        PackedDataset(ds.directory)
