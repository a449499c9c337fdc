"""VGG-16 pretrained weight import: layout conversion + end-to-end restore."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

import import_vgg16  # noqa: E402
from fcn8s_tensorflow_tpu.models.vgg16 import VGG16_CONV_LAYERS  # noqa: E402


def _synthetic_torch_state_dict(rng):
    import torch

    sd = {}
    for (name, in_ch, out_ch), idx in zip(VGG16_CONV_LAYERS, import_vgg16._TORCH_FEATURE_IDX):
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rng.normal(size=(out_ch, in_ch, 3, 3)).astype(np.float32))
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rng.normal(size=(out_ch,)).astype(np.float32))
    sd["classifier.0.weight"] = torch.from_numpy(
        rng.normal(size=(4096, 512 * 7 * 7)).astype(np.float32))
    sd["classifier.0.bias"] = torch.from_numpy(rng.normal(size=(4096,)).astype(np.float32))
    sd["classifier.3.weight"] = torch.from_numpy(
        rng.normal(size=(4096, 4096)).astype(np.float32))
    sd["classifier.3.bias"] = torch.from_numpy(rng.normal(size=(4096,)).astype(np.float32))
    return sd


@pytest.fixture(scope="module")
def torch_encoder(rng_module):
    sd = _synthetic_torch_state_dict(rng_module)
    return sd, import_vgg16.from_torch_state_dict(sd)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


@pytest.mark.slow
def test_torch_conversion_shapes(torch_encoder):
    _, enc = torch_encoder
    assert enc["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert enc["fc6"]["kernel"].shape == (7, 7, 512, 4096)
    assert enc["fc7"]["kernel"].shape == (1, 1, 4096, 4096)


@pytest.mark.slow
def test_torch_conv_layout_oihw_to_hwio(torch_encoder):
    sd, enc = torch_encoder
    # conv1_2: pure layout conversion (conv1_1 additionally folds the
    # torchvision input preprocessing — tested separately below)
    w = sd["features.2.weight"].numpy()  # (O, I, H, W)
    np.testing.assert_array_equal(enc["conv1_2"]["kernel"][1, 2, :, :], w[:, :, 1, 2].T)


@pytest.mark.slow
def test_torch_preprocessing_fold_is_exact(torch_encoder):
    """conv1_1 with folded weights on Caffe-style input (x - VGG_MEAN_RGB)
    must equal the torch conv on torch-normalized input ((x/255 - mean)/std)
    at interior pixels (ADVICE r1: without the fold, an imported encoder
    receives inputs ~255x out of scale)."""
    from fcn8s_tensorflow_tpu.models.vgg16 import VGG_MEAN_RGB

    sd, enc = torch_encoder
    rng = np.random.default_rng(11)
    x = rng.integers(0, 255, size=(3, 3, 3)).astype(np.float32)  # one 3x3 patch, HWC

    mean = np.asarray(import_vgg16.TORCH_IMAGENET_MEAN, np.float32)
    std = np.asarray(import_vgg16.TORCH_IMAGENET_STD, np.float32)
    t = (x / 255.0 - mean) / std
    w = sd["features.0.weight"].numpy()  # (O, I, H, W)
    b = sd["features.0.bias"].numpy()
    torch_out = np.einsum("hwc,ochw->o", t, w) + b

    u = x - np.asarray(VGG_MEAN_RGB, np.float32)
    ours = (
        np.tensordot(u, enc["conv1_1"]["kernel"], axes=([0, 1, 2], [0, 1, 2]))
        + enc["conv1_1"]["bias"]
    )
    np.testing.assert_allclose(ours, torch_out, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_torch_fc6_convolutionalization_is_conv_equivalent(torch_encoder):
    """The converted fc6 conv over a 7x7 input must equal the torch linear
    layer applied to the (C, H, W)-flattened input — the FCN recipe."""
    import torch

    sd, enc = torch_encoder
    rng = np.random.default_rng(3)
    x = rng.normal(size=(7, 7, 512)).astype(np.float32)  # HWC
    # torch linear on CHW flatten
    linear_out = (
        sd["classifier.0.weight"].numpy() @ x.transpose(2, 0, 1).reshape(-1)
        + sd["classifier.0.bias"].numpy()
    )
    # our VALID 7x7 conv at the single position = tensordot over (H, W, I)
    conv_out = np.tensordot(x, enc["fc6"]["kernel"], axes=([0, 1, 2], [0, 1, 2])) + enc["fc6"]["bias"]
    # fp32 summation-order noise over 25088-term dot products
    np.testing.assert_allclose(conv_out, linear_out, rtol=2e-3, atol=1e-3)


@pytest.mark.slow
def test_torch_fc7_layout(torch_encoder):
    sd, enc = torch_encoder
    np.testing.assert_array_equal(
        enc["fc7"]["kernel"][0, 0], sd["classifier.3.weight"].numpy().T)


def test_shape_validation_rejects_wrong_shapes():
    with pytest.raises(ValueError, match="kernel shape"):
        import_vgg16._as_encoder_tree(
            {name: np.zeros((3, 3, 1, 1), np.float32) for name, _, _ in VGG16_CONV_LAYERS}
            | {"fc6": np.zeros((1,)), "fc7": np.zeros((1,))},
            {name: np.zeros((1,)) for name, _, _ in VGG16_CONV_LAYERS}
            | {"fc6": np.zeros((1,)), "fc7": np.zeros((1,))},
        )


@pytest.mark.slow
def test_tf_savedmodel_roundtrip(tmp_path, rng_module):
    """Build a Udacity-format SavedModel with TF, convert, compare exactly,
    then restore into FCN8s via vgg16_dir."""
    tf = pytest.importorskip("tensorflow")
    rng = rng_module
    sm_dir = str(tmp_path / "vgg16_sm")
    sources = {}
    with tf.Graph().as_default():
        with tf.compat.v1.Session() as sess:
            for name, in_ch, out_ch in VGG16_CONV_LAYERS:
                k = rng.normal(size=(3, 3, in_ch, out_ch)).astype(np.float32)
                b = rng.normal(size=(out_ch,)).astype(np.float32)
                tf.compat.v1.get_variable(f"{name}/filter", initializer=k)
                tf.compat.v1.get_variable(f"{name}/biases", initializer=b)
                sources[name] = (k, b)
            for name, shape in [("fc6", (7, 7, 512, 4096)), ("fc7", (1, 1, 4096, 4096))]:
                k = rng.normal(size=shape).astype(np.float32) * 0.01
                b = rng.normal(size=(shape[-1],)).astype(np.float32)
                tf.compat.v1.get_variable(f"{name}/weights", initializer=k)
                tf.compat.v1.get_variable(f"{name}/biases", initializer=b)
                sources[name] = (k, b)
            sess.run(tf.compat.v1.global_variables_initializer())
            builder = tf.compat.v1.saved_model.builder.SavedModelBuilder(sm_dir)
            builder.add_meta_graph_and_variables(sess, ["vgg16"])
            builder.save()

    encoder = import_vgg16.from_tf_savedmodel(sm_dir, "vgg16")
    for name, (k, b) in sources.items():
        np.testing.assert_array_equal(encoder[name]["kernel"], k)
        np.testing.assert_array_equal(encoder[name]["bias"], b)

    out_dir = str(tmp_path / "converted")
    import_vgg16.save_encoder(encoder, out_dir, "test")

    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.engine.model import FCN8s

    model = FCN8s(num_classes=5, vgg16_dir=out_dir, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(model.state.params["encoder"]["conv3_3"]["kernel"]),
        sources["conv3_3"][0],
    )
    np.testing.assert_array_equal(
        np.asarray(model.state.params["encoder"]["fc6"]["bias"]), sources["fc6"][1]
    )


@pytest.mark.slow
def test_orbax_interop_roundtrip(tmp_path):
    """tools/orbax_interop.py: our checkpoint -> orbax PyTree checkpoint ->
    params-only checkpoint, bit-exact through the facade (the JAX-ecosystem
    portability path; the reference's analog is its SavedModel/Saver pair)."""
    import jax.numpy as jnp
    import orbax_interop

    from fcn8s_tensorflow_tpu.engine.model import FCN8s

    model = FCN8s(num_classes=4, width_mult=1 / 16, fc_channels=32,
                  compute_dtype=jnp.float32)
    images = np.zeros((1, 32, 64, 3), np.uint8)
    images[:, :, 32:] = 255
    pred = model.predict(images, argmax=False)
    model.variables_updated = True
    src = model.save(str(tmp_path / "native"), force_save=True)

    orbax_dir = orbax_interop.export_params_to_orbax(
        src, str(tmp_path / "orbax"))
    assert os.path.isfile(os.path.join(orbax_dir, orbax_interop.MANIFEST_NAME))
    back = orbax_interop.import_params_from_orbax(
        orbax_dir, str(tmp_path / "back"))

    # params-only restore into a freshly-configured model: identical logits
    twin = FCN8s(num_classes=4, width_mult=1 / 16, fc_channels=32,
                 compute_dtype=jnp.float32, variables_load_dir=back)
    np.testing.assert_array_equal(np.asarray(pred),
                                  np.asarray(twin.predict(images, argmax=False)))
    # the sidecar manifest preserves model_config for provenance
    from fcn8s_tensorflow_tpu.engine import checkpoint as ckpt
    assert ckpt.load_metadata(back)["model_config"]["num_classes"] == 4
    model.close(), twin.close()
