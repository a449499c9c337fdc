"""GT conversion round-trips: IDs <-> colors <-> one-hot (SURVEY.md §4)."""

import numpy as np

from fcn8s_tensorflow_tpu.data import conversions as cv
from fcn8s_tensorflow_tpu.labels import (
    COLORS_TO_IDS_DICT,
    IDS_TO_COLORS_ARRAY,
    IDS_TO_TRAINIDS_ARRAY,
)


def test_convert_ids_to_ids_lut(rng):
    ids = rng.integers(0, 34, size=(32, 48), dtype=np.uint8)
    out = cv.convert_ids_to_ids(ids, IDS_TO_TRAINIDS_ARRAY)
    assert out.shape == ids.shape
    assert np.array_equal(out, IDS_TO_TRAINIDS_ARRAY[ids])


def test_convert_ids_to_ids_partial(rng):
    ids = rng.integers(0, 10, size=(16, 16), dtype=np.uint8)
    out = cv.convert_ids_to_ids_partial(ids, {3: 7, 5: 0})
    assert np.all(out[ids == 3] == 7)
    assert np.all(out[ids == 5] == 0)
    mask = (ids != 3) & (ids != 5)
    assert np.array_equal(out[mask], ids[mask])


def test_colors_to_ids_and_back(rng):
    ids = rng.integers(0, 34, size=(20, 30), dtype=np.uint8)
    colors = cv.convert_ids_to_colors(ids, IDS_TO_COLORS_ARRAY)
    assert colors.shape == (20, 30, 3)
    # rebuild color->id from labels with id>=0 (the registry dict's
    # license-plate entry, id=-1, shadows car's color key entirely)
    from fcn8s_tensorflow_tpu.labels import labels as all_labels

    color_map = {l.color: l.id for l in all_labels if l.id >= 0}
    back = cv.convert_between_ids_and_colors(colors, color_map)
    # Colors are not unique across ids (void classes share (0,0,0)); verify
    # color-level equivalence rather than id-level.
    colors2 = cv.convert_ids_to_colors(back, IDS_TO_COLORS_ARRAY)
    assert np.array_equal(colors, colors2)


def test_ids_to_colors_direction_of_dict(rng):
    ids = rng.integers(0, 5, size=(8, 8), dtype=np.uint8)
    id_to_color = {i: (i * 10, i * 20, i * 30) for i in range(5)}
    colors = cv.convert_between_ids_and_colors(ids, id_to_color)
    assert colors.shape == (8, 8, 3)
    assert np.all(colors[ids == 2] == np.array([20, 40, 60], np.uint8))


def test_one_hot_roundtrip(rng):
    ids = rng.integers(0, 20, size=(16, 24), dtype=np.uint8)
    one_hot = cv.convert_ids_to_one_hot(ids, 20)
    assert one_hot.shape == (16, 24, 20)
    assert one_hot.sum(axis=-1).max() == 1
    back = cv.convert_one_hot_to_ids(one_hot)
    assert np.array_equal(back, ids)


def test_jax_matches_numpy(rng):
    import jax.numpy as jnp

    ids = rng.integers(0, 20, size=(8, 12), dtype=np.uint8)
    np_oh = cv.convert_ids_to_one_hot(ids, 20, dtype=np.float32)
    jx_oh = np.asarray(cv.jax_convert_ids_to_one_hot(jnp.asarray(ids), 20))
    assert np.array_equal(np_oh, jx_oh)

    np_remap = cv.convert_ids_to_ids(ids, IDS_TO_TRAINIDS_ARRAY)
    jx_remap = np.asarray(cv.jax_convert_ids_to_ids(jnp.asarray(ids), IDS_TO_TRAINIDS_ARRAY))
    assert np.array_equal(np_remap, jx_remap)
