"""Data pipeline tests: pairing, augmentation semantics, offline mode, KITTI,
prefetch (SURVEY.md §4)."""

import os

import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.data import augment
from fcn8s_tensorflow_tpu.data.generator import BatchGenerator, DataError
from fcn8s_tensorflow_tpu.data.kitti import batch_generator as kitti_generator


# ---------------------------------------------------------------------------
# fixtures: a tiny Cityscapes-style tree
# ---------------------------------------------------------------------------
@pytest.fixture
def cityscapes_tree(tmp_path, rng):
    """images/<city>/<name>_leftImg8bit.png + gt/<city>/<name>_gtFine_labelIds.png"""
    img_root = tmp_path / "images"
    gt_root = tmp_path / "gt"
    names = []
    for city in ["aachen", "bochum"]:
        (img_root / city).mkdir(parents=True)
        (gt_root / city).mkdir(parents=True)
        for i in range(3):
            stem = f"{city}_{i:06d}_000019"
            img = rng.integers(0, 255, (40, 64, 3), dtype=np.uint8)
            gt = rng.integers(0, 20, (40, 64), dtype=np.uint8)
            Image.fromarray(img).save(img_root / city / f"{stem}_leftImg8bit.png")
            Image.fromarray(gt).save(gt_root / city / f"{stem}_gtFine_labelIds.png")
            names.append(stem)
    return {"img_root": str(img_root), "gt_root": str(gt_root), "names": names,
            "tmp": tmp_path}


def _make_gen(tree, **kw):
    return BatchGenerator(
        image_dirs=[tree["img_root"]],
        ground_truth_dirs=[tree["gt_root"]],
        image_name_split_separator="leftImg8bit",
        ground_truth_suffix="gtFine_labelIds",
        num_classes=20,
        **kw,
    )


def test_pairing_discovers_all(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    assert gen.get_num_files() == 6
    assert gen.ground_truth


def test_missing_gt_raises(cityscapes_tree):
    os.remove(
        os.path.join(cityscapes_tree["gt_root"], "aachen",
                     "aachen_000000_000019_gtFine_labelIds.png")
    )
    with pytest.raises(DataError):
        _make_gen(cityscapes_tree)


def test_empty_dataset_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(DataError):
        BatchGenerator(image_dirs=[str(tmp_path / "empty")])


def test_generate_one_hot_batch(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    images, gts = next(gen.generate(batch_size=2, seed=0))
    assert images.shape == (2, 40, 64, 3)
    assert gts.shape == (2, 40, 64, 20)
    assert gts.sum(-1).max() == 1


def test_generate_id_maps(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    images, gts = next(gen.generate(batch_size=2, convert_to_one_hot=False, seed=0))
    assert gts.shape == (2, 40, 64)
    assert gts.dtype == np.uint8


def test_generate_deterministic_with_seed(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    kw = dict(batch_size=2, flip=0.5, brightness=(0.5, 1.5, 0.5),
              translate=((0, 4), (0, 4), 0.5), scale=(0.8, 1.2, 0.5),
              void_class_id=0, convert_to_one_hot=False)
    a = [next(gen.generate(seed=123, **kw)) for _ in range(1)]
    b = [next(gen.generate(seed=123, **kw)) for _ in range(1)]
    np.testing.assert_array_equal(a[0][0], b[0][0])
    np.testing.assert_array_equal(a[0][1], b[0][1])


def test_generate_epoch_wraps(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    it = gen.generate(batch_size=4, shuffle=False, convert_to_one_hot=False)
    next(it)  # 4 of 6
    images, _ = next(it)  # remaining 2 (short batch, reference semantics)
    assert images.shape[0] == 2
    images, _ = next(it)  # wrapped around
    assert images.shape[0] == 4


def test_resize_and_remap(cityscapes_tree):
    from fcn8s_tensorflow_tpu.labels import IDS_TO_TRAINIDS_ARRAY

    gen = _make_gen(cityscapes_tree)
    images, gts = next(gen.generate(
        batch_size=1, resize=(20, 32), convert_ids_to_ids=IDS_TO_TRAINIDS_ARRAY,
        convert_to_one_hot=False, shuffle=False, seed=0))
    assert images.shape == (1, 20, 32, 3)
    assert gts.shape == (1, 20, 32)
    assert gts.max() < 20


def test_pad_to_multiple(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    images, gts = next(gen.generate(
        batch_size=1, pad_to_multiple=32, void_class_id=0,
        convert_to_one_hot=False, shuffle=False))
    assert images.shape[1] % 32 == 0 and images.shape[2] % 32 == 0
    assert images.shape[1:3] == (64, 64)  # 40 -> 64, 64 -> 64


def test_process_all_mirrors_tree(cityscapes_tree):
    export = str(cityscapes_tree["tmp"] / "export")
    gen = BatchGenerator(
        image_dirs=[cityscapes_tree["img_root"]],
        ground_truth_dirs=[cityscapes_tree["gt_root"]],
        image_name_split_separator="leftImg8bit",
        ground_truth_suffix="gtFine_labelIds",
        num_classes=20,
        root_dir=str(cityscapes_tree["tmp"]),
        export_dir=export,
    )
    gen.process_all(resize=(20, 32))
    out = os.path.join(export, "images", "aachen", "aachen_000000_000019_leftImg8bit.png")
    assert os.path.isfile(out)
    assert np.asarray(Image.open(out)).shape == (20, 32, 3)
    gt_out = os.path.join(export, "gt", "aachen", "aachen_000000_000019_gtFine_labelIds.png")
    assert np.asarray(Image.open(gt_out)).shape == (20, 32)


# ---------------------------------------------------------------------------
# augmentation transform semantics
# ---------------------------------------------------------------------------
def test_random_crop_smaller(rng):
    img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    gt = rng.integers(0, 5, (20, 30), dtype=np.uint8)
    out_img, out_gt = augment.random_crop_with_void(rng, img, gt, (10, 12), 0)
    assert out_img.shape == (10, 12, 3) and out_gt.shape == (10, 12)


def test_random_crop_larger_pads_void(rng):
    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    gt = np.full((8, 8), 3, dtype=np.uint8)
    out_img, out_gt = augment.random_crop_with_void(rng, img, gt, (16, 16), 7)
    assert out_img.shape == (16, 16, 3)
    # exactly 8x8 of the original content survives; the rest is void
    assert (out_gt == 3).sum() == 64
    assert (out_gt == 7).sum() == 256 - 64
    assert (out_img.sum(-1) > 0).sum() == 64


def test_fixed_crop(rng):
    img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    out, _ = augment.fixed_crop(img, None, (2, 3, 4, 5))
    assert out.shape == (15, 21, 3)
    np.testing.assert_array_equal(out, img[2:17, 4:25])


def test_resize_gt_is_nearest(rng):
    gt = np.zeros((10, 10), dtype=np.uint8)
    gt[:5] = 7
    _, out_gt = augment.resize_pair(np.zeros((10, 10, 3), np.uint8), gt, (20, 20))
    # nearest keeps only {0, 7}; bilinear would interpolate
    assert set(np.unique(out_gt)) == {0, 7}


def test_brightness_clamps(rng):
    img = np.full((8, 8, 3), 250, dtype=np.uint8)
    out = augment.brightness_hsv(rng, img, 2.0, 2.0)
    assert out.dtype == np.uint8
    assert out.max() <= 255


def test_flip(rng):
    img = rng.integers(0, 255, (4, 6, 3), dtype=np.uint8)
    gt = rng.integers(0, 5, (4, 6), dtype=np.uint8)
    out_img, out_gt = augment.horizontal_flip(img, gt)
    np.testing.assert_array_equal(out_img, img[:, ::-1])
    np.testing.assert_array_equal(out_gt, gt[:, ::-1])


def test_translate_fills_void(rng):
    img = np.full((10, 10, 3), 100, dtype=np.uint8)
    gt = np.full((10, 10), 2, dtype=np.uint8)
    out_img, out_gt = augment.translate(rng, img, gt, (3, 3), (0, 0), void_class_id=9)
    assert out_img.shape == img.shape
    # 3 columns shifted out; their replacement is black/void
    assert (out_gt == 9).sum() == 3 * 10
    assert (out_gt == 2).sum() == 7 * 10


def test_scale_down_centers_on_void(rng):
    img = np.full((10, 10, 3), 100, dtype=np.uint8)
    gt = np.full((10, 10), 2, dtype=np.uint8)
    out_img, out_gt = augment.scale_zoom(rng, img, gt, 0.5, 0.5, void_class_id=9)
    assert out_img.shape == img.shape
    assert (out_gt == 2).sum() == 25
    assert out_gt[5, 5] == 2 and out_gt[0, 0] == 9


def test_scale_up_crops_center(rng):
    img = np.zeros((10, 10, 3), dtype=np.uint8)
    img[4:6, 4:6] = 255
    gt = np.zeros((10, 10), dtype=np.uint8)
    out_img, out_gt = augment.scale_zoom(rng, img, gt, 2.0, 2.0, void_class_id=9)
    assert out_img.shape == img.shape
    assert out_gt.shape == gt.shape
    assert 9 not in np.unique(out_gt)  # zoom-in never introduces void


def test_grayscale(rng):
    img = rng.integers(0, 255, (6, 6, 3), dtype=np.uint8)
    out = augment.grayscale(img)
    assert out.shape == (6, 6, 1)


# ---------------------------------------------------------------------------
# KITTI
# ---------------------------------------------------------------------------
@pytest.fixture
def kitti_tree(tmp_path, rng):
    img_dir = tmp_path / "image_2"
    gt_dir = tmp_path / "gt_image_2"
    img_dir.mkdir()
    gt_dir.mkdir()
    for i in range(3):
        img = rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)
        gt = np.full((16, 24, 3), [255, 0, 0], dtype=np.uint8)  # all background
        gt[8:, :] = [255, 0, 255]  # bottom half road
        Image.fromarray(img).save(img_dir / f"um_{i:06d}.png")
        Image.fromarray(gt).save(gt_dir / f"um_road_{i:06d}.png")
    return str(img_dir), str(gt_dir)


def test_kitti_generator(kitti_tree):
    img_dir, gt_dir = kitti_tree
    images, gts = next(kitti_generator(2, img_dir, gt_dir, shuffle=False, seed=0))
    assert images.shape == (2, 16, 24, 3)
    assert gts.shape == (2, 16, 24, 2)
    # bottom half is road (channel 1)
    assert gts[0, 12, 12, 1] == 1 and gts[0, 2, 2, 0] == 1


def test_kitti_id_maps(kitti_tree):
    img_dir, gt_dir = kitti_tree
    _, gts = next(kitti_generator(1, img_dir, gt_dir, shuffle=False, one_hot=False))
    assert gts.shape == (1, 16, 24)
    assert set(np.unique(gts)) == {0, 1}


# ---------------------------------------------------------------------------
# prefetch
# ---------------------------------------------------------------------------
def test_device_prefetcher(cityscapes_tree):
    import jax

    from fcn8s_tensorflow_tpu.data.prefetch import DevicePrefetcher
    from fcn8s_tensorflow_tpu.parallel.mesh import batch_sharding, create_mesh

    mesh = create_mesh(data=2, model=1, devices=jax.devices()[:2])
    gen = _make_gen(cityscapes_tree)
    host_it = gen.generate(batch_size=2, convert_to_one_hot=False, seed=0)
    pf = DevicePrefetcher(host_it, batch_sharding(mesh), depth=2)
    for _ in range(3):
        images, gts = next(pf)
        assert images.shape == (2, 40, 64, 3)
        assert images.sharding.spec == jax.sharding.PartitionSpec("data")
    pf.close()


def test_device_prefetcher_propagates_errors():
    import jax

    from fcn8s_tensorflow_tpu.data.prefetch import DevicePrefetcher

    def bad_iter():
        yield np.zeros((2, 4, 4, 3), np.uint8)
        raise RuntimeError("boom")

    pf = DevicePrefetcher(bad_iter(), jax.sharding.SingleDeviceSharding(jax.devices()[0]))
    next(pf)
    with pytest.raises(RuntimeError, match="boom"):
        next(pf)
        next(pf)


def test_generate_workers_deterministic_and_pool_size_independent(cityscapes_tree):
    """workers>1: same seed -> identical stream; independent of the worker
    count (child RNGs derive in path order, not worker order)."""
    aug = dict(batch_size=3, convert_to_one_hot=False, seed=7,
               flip=0.5, brightness=(0.7, 1.3, 0.5),
               translate=((0, 4), (0, 4), 0.5), void_class_id=0,
               resize=(32, 48))

    def take(workers, n=4):
        gen = _make_gen(cityscapes_tree).generate(workers=workers, **aug)
        out = [next(gen) for _ in range(n)]
        gen.close()
        return out

    a, b, c = take(2), take(2), take(3)
    for (ia, ga), (ib, gb), (ic, gc) in zip(a, b, c):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ga, gb)
        np.testing.assert_array_equal(ia, ic)  # pool-size independent
        np.testing.assert_array_equal(ga, gc)
    # sequential stream unchanged and same shapes
    s = take(1)
    assert s[0][0].shape == a[0][0].shape


# ---------------------------------------------------------------------------
# multi-host input sharding: generate(shard=(index, count))
# ---------------------------------------------------------------------------
def _identity_map(tree):
    """image bytes -> stem, for identifying yielded images."""
    out = {}
    for city in ["aachen", "bochum"]:
        for path in sorted(os.listdir(os.path.join(tree["img_root"], city))):
            arr = np.asarray(Image.open(os.path.join(tree["img_root"], city, path)))
            out[arr.tobytes()] = path
    return out


def _epoch_stems(gen_iter, n_batches, ident):
    stems = []
    for _ in range(n_batches):
        images, _ = next(gen_iter)
        for im in images:
            stems.append(ident[im.tobytes()])
    return stems


def test_shard_disjoint_and_covering(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    ident = _identity_map(cityscapes_tree)
    shards = []
    for idx in (0, 1):
        it = gen.generate(batch_size=1, convert_to_one_hot=False, shuffle=True,
                          seed=11, shard=(idx, 2))
        shards.append(_epoch_stems(it, 3, ident))  # one epoch = 3 images/host
    assert not set(shards[0]) & set(shards[1])  # disjoint
    assert len(set(shards[0] + shards[1])) == 6  # together: the full epoch

    # deterministic: the same (seed, shard) replays identically
    it = gen.generate(batch_size=1, convert_to_one_hot=False, shuffle=True,
                      seed=11, shard=(0, 2))
    assert _epoch_stems(it, 3, ident) == shards[0]


def test_shard_stays_disjoint_across_epochs_with_augmentation(cityscapes_tree):
    """Augmentation draw counts differ per host; the isolated shuffle stream
    must keep later-epoch permutations in lockstep anyway."""
    gen = _make_gen(cityscapes_tree)
    ident = _identity_map(cityscapes_tree)
    # flip mutates pixels; identify by shape-stable content via flip-back
    epochs = {}
    for idx in (0, 1):
        it = gen.generate(batch_size=1, convert_to_one_hot=False, shuffle=True,
                          seed=7, shard=(idx, 2), flip=0.5)
        stems = []
        for _ in range(9):  # 3 epochs x 3 images
            images, _ = next(it)
            im = images[0]
            key = im.tobytes()
            if key not in ident:
                key = im[:, ::-1].tobytes()  # undo a flip
            stems.append(ident[key])
        epochs[idx] = [stems[0:3], stems[3:6], stems[6:9]]
    for e in range(3):
        assert not set(epochs[0][e]) & set(epochs[1][e]), f"epoch {e} overlaps"
        assert len(set(epochs[0][e] + epochs[1][e])) == 6


def test_shard_validation(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    with pytest.raises(ValueError, match="seed"):
        next(gen.generate(batch_size=1, convert_to_one_hot=False, shuffle=True,
                          shard=(0, 2)))
    with pytest.raises(ValueError, match="index"):
        next(gen.generate(batch_size=1, convert_to_one_hot=False, shuffle=False,
                          shard=(2, 2)))


def test_shard_unsharded_stream_unchanged(cityscapes_tree):
    """shard=None must keep the legacy byte-identical RNG stream (shuffle and
    augment draws from ONE generator)."""
    gen = _make_gen(cityscapes_tree)
    a = next(gen.generate(batch_size=6, convert_to_one_hot=False, shuffle=True,
                          seed=3, brightness=(0.5, 1.5, 0.5)))
    b = next(gen.generate(batch_size=6, convert_to_one_hot=False, shuffle=True,
                          seed=3, brightness=(0.5, 1.5, 0.5)))
    np.testing.assert_array_equal(a[0], b[0])


def test_shard_uneven_split_stays_lockstep(cityscapes_tree):
    """6 images over 4 hosts: epoch_len=ceil(6/4)=2, hosts 2/3 pad by
    wrapping within their own slice. All hosts must reshuffle at the same
    iteration (lockstep permutations survive the uneven split), shards
    stay disjoint every epoch, and each epoch covers all 6 images."""
    gen = _make_gen(cityscapes_tree)
    ident = _identity_map(cityscapes_tree)
    per_host = {}
    for idx in range(4):
        it = gen.generate(batch_size=1, convert_to_one_hot=False, shuffle=True,
                          seed=5, shard=(idx, 4), flip=0.5)
        stems = []
        for _ in range(6):  # 3 epochs x 2 images/host
            images, _ = next(it)
            im = images[0]
            key = im.tobytes()
            if key not in ident:
                key = im[:, ::-1].tobytes()
            stems.append(ident[key])
        per_host[idx] = [stems[0:2], stems[2:4], stems[4:6]]
    for e in range(3):
        uniq = [set(per_host[i][e]) for i in range(4)]
        for a in range(4):
            for b in range(a + 1, 4):
                assert not uniq[a] & uniq[b], f"epoch {e}: hosts {a},{b} overlap"
        assert len(set().union(*uniq)) == 6, f"epoch {e} incomplete"


def test_shard_count_exceeding_dataset_raises(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    with pytest.raises(DataError, match="exceeds the dataset size"):
        next(gen.generate(batch_size=1, convert_to_one_hot=False,
                          shuffle=False, shard=(0, 7)))


# ---------------------------------------------------------------------------
# beyond-reference host photometric transforms (twins of ops/augment_device)
# ---------------------------------------------------------------------------
from tests.conftest import FixedRng


def _FixedRng(u):
    return FixedRng(uniform_value=u)


def test_photometric_host_device_twins_agree():
    """Host NumPy and device JAX implementations share the formula: with
    the factor pinned (degenerate lo==hi uniform on the device side) the
    outputs agree to <=1 LSB (f32 pow/round boundaries)."""
    import jax
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.ops import augment_device as dev

    rng = np.random.default_rng(2)
    image = rng.integers(0, 255, (6, 8, 3), np.uint8)
    batch = jnp.asarray(image[None])
    key = jax.random.PRNGKey(0)
    for host_fn, dev_fn, f in [(augment.contrast, dev.random_contrast, 1.4),
                               (augment.saturation, dev.random_saturation, 0.6),
                               (augment.gamma, dev.random_gamma, 1.7)]:
        h = host_fn(_FixedRng(f), image, f, f)
        d = np.asarray(dev_fn(key, batch, f, f, 1.0))[0]
        assert np.abs(h.astype(np.int32) - d.astype(np.int32)).max() <= 1, host_fn


def test_host_hue_rotate_matches_colorsys():
    import colorsys

    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (5, 7, 3), np.uint8)
    delta = 0.21
    out = augment.hue_rotate(_FixedRng(delta), image, 0.5)
    x = image.astype(np.float64) / 255.0
    exp = np.zeros_like(x)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            h, s, v = colorsys.rgb_to_hsv(*x[i, j])
            exp[i, j] = colorsys.hsv_to_rgb((h + delta) % 1.0, s, v)
    exp = np.clip(np.round(exp * 255.0), 0, 255)
    assert np.abs(out.astype(np.int32) - exp.astype(np.int32)).max() <= 1


def test_generate_with_photometric_extras(cityscapes_tree):
    """The generator applies the photometric kwargs (prob=1, strong
    factors change pixels; GT untouched)."""
    gen = _make_gen(cityscapes_tree)
    plain = next(gen.generate(batch_size=2, convert_to_one_hot=False,
                              shuffle=False, seed=1))
    shifted = next(gen.generate(batch_size=2, convert_to_one_hot=False,
                                shuffle=False, seed=1,
                                contrast=(1.8, 1.8, 1.0), gamma=(0.5, 0.5, 1.0),
                                saturation=(0.2, 0.2, 1.0), hue=(0.3, 1.0)))
    assert any((np.asarray(a) != np.asarray(b)).any()
               for a, b in zip(plain[0], shifted[0]))
    for a, b in zip(plain[1], shifted[1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # GT unchanged


def test_hue_three_tuple_rejected(cityscapes_tree):
    gen = _make_gen(cityscapes_tree)
    with pytest.raises(ValueError, match="max_delta, prob"):
        next(gen.generate(batch_size=1, convert_to_one_hot=False,
                          shuffle=False, hue=(0.1, 0.5, 1.0)))


def test_shard_composes_with_workers(cityscapes_tree):
    """shard + workers: same (seed, shard) stream regardless of worker
    count, still disjoint across hosts."""
    gen = _make_gen(cityscapes_tree)
    ident = _identity_map(cityscapes_tree)

    def epoch(idx, workers):
        it = gen.generate(batch_size=1, convert_to_one_hot=False, shuffle=True,
                          seed=13, shard=(idx, 2), workers=workers)
        return _epoch_stems(it, 3, ident)

    a2, a3 = epoch(0, 2), epoch(0, 3)
    assert a2 == a3  # worker-count independent
    b2 = epoch(1, 2)
    assert not set(a2) & set(b2) and len(set(a2 + b2)) == 6
