"""Multi-device sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4).

A tiny proxy model config keeps CPU runtime sane while exercising the real
train/eval step machinery, mesh construction, TP param specs, and the
DP-equivalence invariant (devices=8 result == devices=1 result).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
from fcn8s_tensorflow_tpu.ops.metrics import empty_metrics_state, finalize_metrics
from fcn8s_tensorflow_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    param_spec_tree,
    shard_batch,
)
from fcn8s_tensorflow_tpu.parallel.steps import (
    TrainState,
    compile_eval_step,
    compile_predict_step,
    compile_train_step,
    create_train_state,
    make_optimizer,
)

NUM_CLASSES = 4
HW = (32, 32)


@pytest.fixture(scope="module")
def model_state():
    params = init_fcn8s(jax.random.PRNGKey(0), NUM_CLASSES, width_mult=1 / 32, fc_channels=32)
    optimizer = make_optimizer()
    return create_train_state(params, optimizer), optimizer


def _batch(rng, n):
    images = rng.integers(0, 255, size=(n, *HW, 3), dtype=np.uint8)
    labels = rng.integers(0, NUM_CLASSES, size=(n, *HW), dtype=np.uint8)
    mask = np.ones((n,), np.float32)
    return images, labels, mask


def test_mesh_axes():
    mesh = create_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.size == 8


def test_mesh_shapes():
    assert create_mesh(data=4, model=2).devices.shape == (4, 2)
    with pytest.raises(ValueError):
        create_mesh(data=5, model=3)


def test_param_spec_tree_tp_rules(model_state):
    state, _ = model_state
    specs = param_spec_tree(state.params)
    assert specs["encoder"]["fc6"]["kernel"] == P(None, None, None, "model")
    assert specs["encoder"]["fc6"]["bias"] == P("model")
    assert specs["encoder"]["fc7"]["kernel"] == P(None, None, "model", None)
    assert specs["encoder"]["conv1_1"]["kernel"] == P()
    assert specs["decoder"]["fc7_1x1"]["kernel"] == P()


@pytest.mark.slow
def test_dp_train_step_runs_and_matches_single_device(model_state, rng):
    state, optimizer = model_state
    images, labels, mask = _batch(rng, 8)
    key = jax.random.PRNGKey(7)

    mesh8 = create_mesh(data=8, model=1)
    step8 = compile_train_step(mesh8, optimizer, NUM_CLASSES,
                               compute_dtype=jnp.float32, example_state=state, donate=False)
    im8, lb8, mk8 = shard_batch(mesh8, images, labels, mask)
    new8, loss8 = step8(state, im8, lb8, mk8, key, 1e-3, 0.0, 1.0)

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    step1 = compile_train_step(mesh1, optimizer, NUM_CLASSES,
                               compute_dtype=jnp.float32, example_state=state, donate=False)
    im1, lb1, mk1 = shard_batch(mesh1, images, labels, mask)
    new1, loss1 = step1(state, im1, lb1, mk1, key, 1e-3, 0.0, 1.0)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    # parameters after one step must agree (DP-equivalence invariant)
    l8 = jax.tree.leaves(new8.params)
    l1 = jax.tree.leaves(new1.params)
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)
    assert int(new8.step) == 1


@pytest.mark.slow
def test_tp_train_step_runs(model_state, rng):
    state, optimizer = model_state
    images, labels, mask = _batch(rng, 4)
    mesh = create_mesh(data=2, model=4)
    step = compile_train_step(mesh, optimizer, NUM_CLASSES,
                              compute_dtype=jnp.float32, example_state=state, donate=False)
    im, lb, mk = shard_batch(mesh, images, labels, mask)
    new_state, loss = step(state, im, lb, mk, jax.random.PRNGKey(0), 1e-3, 1e-4, 0.9)
    assert np.isfinite(float(loss))
    # fc6 kernel really is sharded over the model axis
    fc6 = new_state.params["encoder"]["fc6"]["kernel"]
    assert fc6.sharding.spec == P(None, None, None, "model")


def test_eval_step_accumulates(model_state, rng):
    state, _ = model_state
    mesh = create_mesh(data=8, model=1)
    evalf = compile_eval_step(mesh, NUM_CLASSES, compute_dtype=jnp.float32,
                              example_params=state.params)
    mstate = empty_metrics_state(NUM_CLASSES)
    for _ in range(2):
        images, labels, mask = _batch(rng, 8)
        im, lb, mk = shard_batch(mesh, images, labels, mask)
        mstate = evalf(state.params, mstate, im, lb, mk)
    out = finalize_metrics(mstate)
    assert int(np.asarray(mstate["conf_matrix"]).sum()) == 2 * 8 * HW[0] * HW[1]
    assert 0.0 <= float(out["accuracy"]) <= 1.0
    assert np.isfinite(float(out["loss"]))


def test_predict_step_shapes(model_state, rng):
    state, _ = model_state
    mesh = create_mesh(data=8, model=1)
    images, _, _ = _batch(rng, 8)
    pred_ids = compile_predict_step(mesh, argmax=True, compute_dtype=jnp.float32,
                                    example_params=state.params)(state.params, shard_batch(mesh, images))
    assert pred_ids.shape == (8, *HW)
    assert pred_ids.dtype == jnp.int32
    probs = compile_predict_step(mesh, argmax=False, compute_dtype=jnp.float32,
                                 example_params=state.params)(state.params, shard_batch(mesh, images))
    assert probs.shape == (8, *HW, NUM_CLASSES)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)


@pytest.mark.slow
def test_lr_is_live_per_step(model_state, rng):
    """Changing the traced learning rate must not recompile and must change
    the update magnitude (the reference's per-step LR schedule semantics)."""
    state, optimizer = model_state
    mesh = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    step = compile_train_step(mesh, optimizer, NUM_CLASSES,
                              compute_dtype=jnp.float32, example_state=state, donate=False)
    images, labels, mask = _batch(rng, 1)
    im, lb, mk = shard_batch(mesh, images, labels, mask)
    key = jax.random.PRNGKey(0)
    s_small, _ = step(state, im, lb, mk, key, 1e-6, 0.0, 1.0)
    s_big, _ = step(state, im, lb, mk, key, 1e-2, 0.0, 1.0)
    d_small = float(jnp.abs(s_small.params["decoder"]["fc7_1x1"]["kernel"] - state.params["decoder"]["fc7_1x1"]["kernel"]).max())
    d_big = float(jnp.abs(s_big.params["decoder"]["fc7_1x1"]["kernel"] - state.params["decoder"]["fc7_1x1"]["kernel"]).max())
    assert d_big > d_small * 100


def test_spatial_partitioning_matches_unsharded(model_state, rng):
    """Width-sharded inference (conv halo exchange via GSPMD) must equal
    the replicated result exactly."""
    state, _ = model_state
    mesh = create_mesh(data=2, model=4)
    images = rng.integers(0, 255, size=(2, 32, 128, 3), dtype=np.uint8)  # W=128 = 32*4
    sp = compile_predict_step(mesh, argmax=False, compute_dtype=jnp.float32,
                              example_params=state.params, tensor_parallel=False,
                              spatial_partition=True)
    from jax.sharding import NamedSharding
    from fcn8s_tensorflow_tpu.parallel.mesh import spatial_spec

    im_sp = jax.device_put(images, NamedSharding(mesh, spatial_spec()))
    probs_sp = np.asarray(sp(state.params, im_sp))

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    plain = compile_predict_step(mesh1, argmax=False, compute_dtype=jnp.float32,
                                 example_params=state.params, tensor_parallel=False)
    probs = np.asarray(plain(state.params, shard_batch(mesh1, images)))
    np.testing.assert_allclose(probs_sp, probs, rtol=2e-4, atol=2e-5)


def test_spatial_and_tp_mutually_exclusive(model_state):
    state, _ = model_state
    mesh = create_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compile_predict_step(mesh, example_params=state.params,
                             tensor_parallel=True, spatial_partition=True)


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_grad_accum_matches_full_batch(model_state, rng):
    """grad_accum=2 is the full-batch gradient exactly (math identity:
    microbatch gradients weighted by real-sample share). keep_prob=1 so no
    per-microbatch dropout keys enter."""
    state, optimizer = model_state
    images, labels, mask = _batch(rng, 4)
    mask[-1] = 0.0  # include a padding sample: weights must track real counts
    key = jax.random.PRNGKey(7)
    mesh = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    kw = dict(compute_dtype=jnp.float32, example_state=state, donate=False)
    step_full = compile_train_step(mesh, optimizer, NUM_CLASSES, **kw)
    step_acc = compile_train_step(mesh, optimizer, NUM_CLASSES, grad_accum=2, **kw)
    im, lb, mk = shard_batch(mesh, images, labels, mask)
    new_f, loss_f = step_full(state, im, lb, mk, key, 1e-3, 0.0, 1.0)
    new_a, loss_a = step_acc(state, im, lb, mk, key, 1e-3, 0.0, 1.0)
    np.testing.assert_allclose(float(loss_a), float(loss_f), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(new_a.params), jax.tree.leaves(new_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    assert int(new_a.step) == 1


def test_grad_accum_rejects_indivisible(model_state, rng):
    state, optimizer = model_state
    images, labels, mask = _batch(rng, 4)
    mesh = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    step = compile_train_step(mesh, optimizer, NUM_CLASSES, grad_accum=3,
                              compute_dtype=jnp.float32, example_state=state,
                              donate=False)
    im, lb, mk = shard_batch(mesh, images, labels, mask)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, im, lb, mk, jax.random.PRNGKey(0), 1e-3, 0.0, 1.0)


@pytest.mark.slow
def test_spatial_partitioned_train_step_matches_unsharded(model_state, rng):
    """Width-sharded TRAINING (GSPMD conv halos in fwd AND bwd): one step
    on a (2 data x 4 model) spatial mesh must match the unsharded step."""
    from jax.sharding import NamedSharding

    from fcn8s_tensorflow_tpu.parallel.mesh import spatial_spec

    state, optimizer = model_state
    images, labels, mask = _batch(rng, 2)
    key = jax.random.PRNGKey(3)

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    step1 = compile_train_step(mesh1, optimizer, NUM_CLASSES, tensor_parallel=False,
                               compute_dtype=jnp.float32, example_state=state,
                               donate=False, use_pallas_ce=False)
    im1, lb1, mk1 = shard_batch(mesh1, images, labels, mask)
    new1, loss1 = step1(state, im1, lb1, mk1, key, 1e-3, 0.0, 1.0)

    mesh = create_mesh(data=2, model=4)
    step_sp = compile_train_step(mesh, optimizer, NUM_CLASSES, tensor_parallel=False,
                                 compute_dtype=jnp.float32, example_state=state,
                                 donate=False, spatial_partition=True)
    sp = NamedSharding(mesh, spatial_spec())
    im_s = jax.device_put(images, sp)
    lb_s = jax.device_put(labels, sp)
    mk_s = jax.device_put(mask, NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    new_s, loss_s = step_sp(state, im_s, lb_s, mk_s, key, 1e-3, 0.0, 1.0)

    np.testing.assert_allclose(float(loss_s), float(loss1), rtol=1e-5)
    # Adam normalizes by |g|: for ~zero-grad leaves (the 1e-4-scaled pool3
    # score head) halo-exchange reduction order flips eps-scale grads and
    # the first update diverges RELATIVELY while staying < lr absolutely.
    # Bound absolutely at 0.3*lr; a second step's loss pins the composed
    # params (a systematic error would compound, rounding noise doesn't).
    for a, b in zip(jax.tree.leaves(new_s.params), jax.tree.leaves(new1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
    _, loss_s2 = step_sp(new_s, im_s, lb_s, mk_s, key, 1e-3, 0.0, 1.0)
    _, loss1_2 = step1(new1, im1, lb1, mk1, key, 1e-3, 0.0, 1.0)
    np.testing.assert_allclose(float(loss_s2), float(loss1_2), rtol=1e-4)


def test_spatial_train_rejects_tensor_parallel(model_state):
    state, optimizer = model_state
    mesh = create_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compile_train_step(mesh, optimizer, NUM_CLASSES, tensor_parallel=True,
                           example_state=state, spatial_partition=True)


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_spatial_partitioned_eval_matches_unsharded(model_state, rng):
    """Width-sharded evaluation accumulates the same metrics as unsharded."""
    from jax.sharding import NamedSharding

    from fcn8s_tensorflow_tpu.parallel.mesh import spatial_spec
    from fcn8s_tensorflow_tpu.parallel.steps import compile_eval_step

    state, _ = model_state
    # W=128 so the stride-32 tap keeps >=1 column per 'model' shard (the
    # same geometry the spatial predict test pins bit-exactly)
    images = rng.integers(0, 255, size=(2, 32, 128, 3), dtype=np.uint8)
    labels = rng.integers(0, NUM_CLASSES, size=(2, 32, 128), dtype=np.uint8)
    mask = np.ones((2,), np.float32)

    mesh1 = create_mesh(data=1, model=1, devices=jax.devices()[:1])
    step1 = compile_eval_step(mesh1, NUM_CLASSES, tensor_parallel=False,
                              compute_dtype=jnp.float32,
                              example_params=state.params)
    m1 = jax.device_put(empty_metrics_state(NUM_CLASSES),
                        jax.sharding.NamedSharding(mesh1, jax.sharding.PartitionSpec()))
    im1, lb1, mk1 = shard_batch(mesh1, images, labels, mask)
    m1 = step1(state.params, m1, im1, lb1, mk1)
    vals1 = {k: float(v) for k, v in finalize_metrics(m1).items()}

    mesh = create_mesh(data=2, model=4)
    step_sp = compile_eval_step(mesh, NUM_CLASSES, tensor_parallel=False,
                                compute_dtype=jnp.float32,
                                example_params=state.params,
                                spatial_partition=True)
    sp = NamedSharding(mesh, spatial_spec())
    m_s = jax.device_put(empty_metrics_state(NUM_CLASSES),
                         NamedSharding(mesh, jax.sharding.PartitionSpec()))
    m_s = step_sp(state.params, m_s,
                  jax.device_put(images, sp), jax.device_put(labels, sp),
                  jax.device_put(mask, NamedSharding(mesh, jax.sharding.PartitionSpec("data"))))
    vals_s = {k: float(v) for k, v in finalize_metrics(m_s).items()}
    for k in vals1:
        np.testing.assert_allclose(vals_s[k], vals1[k], rtol=1e-5, err_msg=k)


def test_spatial_eval_rejects_tensor_parallel(model_state):
    from fcn8s_tensorflow_tpu.parallel.steps import compile_eval_step

    state, _ = model_state
    mesh = create_mesh(data=4, model=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compile_eval_step(mesh, NUM_CLASSES, tensor_parallel=True,
                          example_params=state.params, spatial_partition=True)


@pytest.mark.slow
def test_spatial_with_grad_accum_composes(model_state, rng):
    """The two memory-scaling modes compose: width sharding + microbatch
    scan in one compiled step."""
    from jax.sharding import NamedSharding

    from fcn8s_tensorflow_tpu.parallel.mesh import spatial_spec

    state, optimizer = model_state
    mesh = create_mesh(data=2, model=4)
    step = compile_train_step(mesh, optimizer, NUM_CLASSES, tensor_parallel=False,
                              compute_dtype=jnp.float32, example_state=state,
                              spatial_partition=True, grad_accum=2, donate=False)
    images = rng.integers(0, 255, size=(4, 32, 128, 3), dtype=np.uint8)
    labels = rng.integers(0, NUM_CLASSES, size=(4, 32, 128), dtype=np.uint8)
    sp = NamedSharding(mesh, spatial_spec())
    new, loss = step(state, jax.device_put(images, sp), jax.device_put(labels, sp),
                     jax.device_put(np.ones((4,), np.float32), batch_sharding(mesh)),
                     jax.random.PRNGKey(1), 1e-3, 0.0, 1.0)
    assert np.isfinite(float(loss))
    assert int(new.step) == 1


@pytest.mark.slow
def test_multi_step_scan_matches_single_dispatches(model_state, rng):
    """compile_multi_train_step(S) == S single-step dispatches: identical
    math and per-step RNG folds, so params and losses must agree."""
    from fcn8s_tensorflow_tpu.parallel.steps import compile_multi_train_step

    state, optimizer = model_state
    mesh = create_mesh(data=4, model=2)
    key = jax.random.PRNGKey(3)
    batches = [_batch(rng, 4) for _ in range(3)]

    step1 = compile_train_step(mesh, optimizer, NUM_CLASSES, tensor_parallel=False,
                               compute_dtype=jnp.float32, example_state=state,
                               donate=False)
    st = state
    ref_losses = []
    for images, labels, mask in batches:
        im, lb, mk = shard_batch(mesh, images, labels, mask)
        st, loss = step1(st, im, lb, mk, key, 1e-3, 1e-4, 1.0)
        ref_losses.append(float(loss))

    stepS = compile_multi_train_step(mesh, optimizer, NUM_CLASSES,
                                     steps_per_dispatch=3, tensor_parallel=False,
                                     compute_dtype=jnp.float32, example_state=state,
                                     donate=False)
    stacked = [np.stack([b[i] for b in batches]) for i in range(3)]
    stM, losses = stepS(state, *[jax.device_put(x) for x in stacked],
                        key, 1e-3, 1e-4, 1.0)
    np.testing.assert_allclose(np.asarray(losses), ref_losses, rtol=1e-5)
    assert int(stM.step) == 3
    for a, b in zip(jax.tree.leaves(stM.params), jax.tree.leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_multi_step_dropout_rng_distinct_per_scanned_step(model_state, rng):
    """The per-step RNG fold must give each scanned step a fresh dropout
    mask: two scanned steps on IDENTICAL data must produce different losses
    under keep_prob < 1 (same loss would mean a reused mask)."""
    from fcn8s_tensorflow_tpu.parallel.steps import compile_multi_train_step

    state, optimizer = model_state
    mesh = create_mesh(data=4, model=2)
    images, labels, mask = _batch(rng, 4)
    stacked = [np.stack([x, x]) for x in (images, labels, mask)]
    stepS = compile_multi_train_step(mesh, optimizer, NUM_CLASSES,
                                     steps_per_dispatch=2, tensor_parallel=False,
                                     compute_dtype=jnp.float32, example_state=state,
                                     donate=False)
    _, losses = stepS(state, *[jax.device_put(x) for x in stacked],
                      jax.random.PRNGKey(5), 0.0, 0.0, 0.5)  # lr=0: same params
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[0] != losses[1]


def test_overlay_select_chain_matches_gather_spec(model_state, rng):
    """predict_step's overlay compositing (the round-5 per-class
    compare/select chain that replaced the (C,4) row gather —
    benchmarks/overlay_bench.py) must reproduce the gather-spec math
    ``floor(img*(1-a) + color*a)``: LUT rows with zero alpha leave pixels
    EXACTLY at the raw image, and rows with zero color channels (the
    ``!= 0.0`` unroll skip) blend toward black like any other value.
    Reference behavior: host compositing, `visualization_utils.py:7-52`
    (<=1 LSB tolerance for compiler FMA contraction, as in
    tests/test_engine.py::test_on_device_overlay_matches_host)."""
    state, _ = model_state
    mesh = create_mesh()
    lut = np.array([
        [255.0, 0.0, 0.0, 0.0],     # alpha 0: raw-image passthrough
        [0.0, 255.0, 0.0, 255.0],   # opaque green (two zero channels)
        [10.0, 20.0, 30.0, 127.0],  # half-alpha mixed
        [0.0, 0.0, 0.0, 255.0],     # opaque black (all-zero color row)
    ], np.float32)
    images, _, _ = _batch(rng, 8)
    ids_fn = compile_predict_step(mesh, argmax=True, example_params=state.params)
    ov_fn = compile_predict_step(mesh, argmax=True, example_params=state.params,
                                 overlay_lut=lut)
    sharded = shard_batch(mesh, images)
    ids = np.asarray(ids_fn(state.params, sharded))
    got = np.asarray(ov_fn(state.params, sharded))
    assert got.shape == images.shape and got.dtype == np.uint8
    rgba = lut[ids]
    alpha = rgba[..., 3:4] * np.float32(1.0 / 255.0)
    want = np.floor(images.astype(np.float32) * (1.0 - alpha)
                    + rgba[..., :3] * alpha).astype(np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # the alpha-0 class must be an EXACT passthrough (img*1 + c*0 is exact
    # in f32 regardless of contraction)
    passthrough = ids == 0
    assert passthrough.any()
    np.testing.assert_array_equal(got[passthrough], images[passthrough])
