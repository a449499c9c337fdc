"""Decoder/encoder shape algebra and numerics (SURVEY.md §4).

Runs on a tiny proxy encoder config via the real layers — full VGG-16 at
CPU-test scale is exercised at reduced resolution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcn8s_tensorflow_tpu.models.fcn8s import (
    apply_fcn8s,
    apply_fcn8s_decoder,
    decoder_l2_loss,
    init_fcn8s,
    init_fcn8s_decoder,
)
from fcn8s_tensorflow_tpu.models.initializers import bilinear_upsampling_kernel
from fcn8s_tensorflow_tpu.models.vgg16 import apply_vgg16, init_vgg16
from fcn8s_tensorflow_tpu.ops.nn import conv2d, conv2d_transpose, max_pool_2x2

NUM_CLASSES = 5


@pytest.mark.slow
def test_encoder_tap_strides():
    # tiny-width proxy: same 16-layer graph, cheap on CPU
    params = init_vgg16(jax.random.PRNGKey(0), width_mult=1 / 32, fc_channels=64)
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    pool3, pool4, fc7 = apply_vgg16(params, x, compute_dtype=jnp.float32)
    assert pool3.shape == (1, 8, 12, 8)     # stride 8
    assert pool4.shape == (1, 4, 6, 16)     # stride 16
    assert fc7.shape == (1, 2, 3, 64)       # stride 32


@pytest.mark.slow
def test_canonical_param_shapes():
    # full-width init (no forward pass): canonical VGG-16 kernel shapes
    params = init_vgg16(jax.random.PRNGKey(0))
    assert params["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert params["conv3_3"]["kernel"].shape == (3, 3, 256, 256)
    assert params["conv5_3"]["kernel"].shape == (3, 3, 512, 512)
    assert params["fc6"]["kernel"].shape == (7, 7, 512, 4096)
    assert params["fc7"]["kernel"].shape == (1, 1, 4096, 4096)


@pytest.mark.slow
def test_full_model_output_resolution():
    params = init_fcn8s(jax.random.PRNGKey(0), NUM_CLASSES, width_mult=1 / 32, fc_channels=32)
    x = jnp.zeros((2, 64, 96, 3), jnp.float32)
    logits = apply_fcn8s(params, x, compute_dtype=jnp.float32)
    assert logits.shape == (2, 64, 96, NUM_CLASSES)
    assert logits.dtype == jnp.float32


def test_decoder_shape_algebra():
    # Feed synthetic taps at strides 8/16/32 of a 32x64 "image".
    dec = init_fcn8s_decoder(jax.random.PRNGKey(1), NUM_CLASSES, pool3_ch=8, pool4_ch=16, fc7_ch=32)
    pool3 = jnp.zeros((1, 4, 8, 8))
    pool4 = jnp.zeros((1, 2, 4, 16))
    fc7 = jnp.zeros((1, 1, 2, 32))
    logits = apply_fcn8s_decoder(dec, pool3, pool4, fc7, compute_dtype=jnp.float32)
    assert logits.shape == (1, 32, 64, NUM_CLASSES)


@pytest.mark.parametrize("k,s", [(4, 2), (16, 8), (2, 2), (8, 8)])
def test_conv_transpose_same_shape(k, s):
    x = jnp.ones((1, 3, 5, 2))
    kernel = jnp.ones((k, k, 2, 4)) * 0.1
    y = conv2d_transpose(x, kernel, strides=(s, s))
    assert y.shape == (1, 3 * s, 5 * s, 4)


@pytest.mark.slow
def test_conv_transpose_matches_gradient_definition():
    """A transposed conv must be the adjoint of the forward strided conv:
    <conv(x), y> == <x, conv_transpose(y)> with the same kernel."""
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (1, 8, 8, 3))
    kernel = jax.random.normal(k2, (4, 4, 3, 6)) * 0.2

    def fwd(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    y = jax.random.normal(k3, fwd(x).shape)
    lhs = jnp.vdot(fwd(x), y)
    # adjoint applied to y: conv_transpose with kernel transposed I<->O
    xt = conv2d_transpose(y, jnp.swapaxes(kernel, 2, 3)[::-1, ::-1], strides=(2, 2))
    rhs = jnp.vdot(x, xt)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)  # fp32 summation-order noise


def test_bilinear_kernel_interpolates_constant():
    """Deconv with the bilinear kernel on a constant map is constant in the
    interior (edges taper due to zero padding)."""
    c = 3
    kernel = jnp.asarray(bilinear_upsampling_kernel(4, c))
    x = jnp.ones((1, 6, 6, c))
    y = conv2d_transpose(x, kernel, strides=(2, 2))
    assert y.shape == (1, 12, 12, c)
    interior = y[0, 3:-3, 3:-3]
    np.testing.assert_allclose(np.asarray(interior), 1.0, rtol=1e-5)


def test_max_pool_same_odd_dims():
    x = jnp.arange(5 * 7, dtype=jnp.float32).reshape(1, 5, 7, 1)
    y = max_pool_2x2(x)
    assert y.shape == (1, 3, 4, 1)  # ceil(5/2), ceil(7/2)


def test_conv2d_same_preserves_shape():
    x = jnp.ones((1, 9, 11, 4))
    kernel = jnp.ones((3, 3, 4, 8)) * 0.01
    assert conv2d(x, kernel).shape == (1, 9, 11, 8)


def test_decoder_l2_loss_positive_and_tf_semantics():
    dec = init_fcn8s_decoder(jax.random.PRNGKey(2), NUM_CLASSES, pool3_ch=8, pool4_ch=16, fc7_ch=32)
    loss = decoder_l2_loss(dec)
    manual = sum(0.5 * float(np.sum(np.asarray(v["kernel"]) ** 2)) for v in dec.values())
    np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


def test_dropout_determinism_and_scaling():
    from fcn8s_tensorflow_tpu.ops.nn import dropout

    x = jnp.ones((1000,), jnp.float32)
    out = dropout(x, jax.random.PRNGKey(0), 0.5, deterministic=False)
    kept = np.asarray(out) > 0
    # kept units are scaled by 1/keep_prob
    np.testing.assert_allclose(np.asarray(out)[kept], 2.0, rtol=1e-5)
    assert 0.35 < kept.mean() < 0.65
    assert np.array_equal(np.asarray(dropout(x, None, 0.5, deterministic=True)), np.asarray(x))


@pytest.mark.slow
class TestFCNVariants:
    """FCN-16s / FCN-32s decoder variants (beyond-reference: the reference
    ships only fcn8s; the paper's family shares the encoder)."""

    def test_variant_shapes(self):
        import jax
        import jax.numpy as jnp

        from fcn8s_tensorflow_tpu.models.fcn8s import apply_fcn8s, init_fcn8s

        x = jnp.zeros((1, 64, 96, 3), jnp.uint8)
        for variant in ("fcn8s", "fcn16s", "fcn32s"):
            params = init_fcn8s(jax.random.PRNGKey(0), 5, width_mult=1 / 16,
                                fc_channels=32, variant=variant)
            logits = apply_fcn8s(params, x, compute_dtype=jnp.float32)
            assert logits.shape == (1, 64, 96, 5), variant

    def test_variant_param_sets(self):
        import jax

        from fcn8s_tensorflow_tpu.models.fcn8s import decoder_variant, init_fcn8s

        p8 = init_fcn8s(jax.random.PRNGKey(0), 3, width_mult=1 / 16,
                        fc_channels=32)
        p16 = init_fcn8s(jax.random.PRNGKey(0), 3, width_mult=1 / 16,
                         fc_channels=32, variant="fcn16s")
        p32 = init_fcn8s(jax.random.PRNGKey(0), 3, width_mult=1 / 16,
                         fc_channels=32, variant="fcn32s")
        assert set(p16["decoder"]) == {"pool4_1x1", "fc7_1x1", "fc7_deconv",
                                       "fc7_pool4_deconv"}
        assert set(p32["decoder"]) == {"fc7_1x1", "fc7_deconv"}
        assert p32["decoder"]["fc7_deconv"]["kernel"].shape[:2] == (64, 64)
        assert decoder_variant(p8["decoder"]) == "fcn8s"
        assert decoder_variant(p16["decoder"]) == "fcn16s"
        assert decoder_variant(p32["decoder"]) == "fcn32s"
        import pytest

        with pytest.raises(ValueError, match="variant"):
            init_fcn8s(jax.random.PRNGKey(0), 3, variant="fcn4s")

    def test_variant_facade_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np

        from fcn8s_tensorflow_tpu.engine.model import FCN8s

        model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                      compute_dtype=jnp.float32, variant="fcn16s")
        images = np.zeros((1, 32, 64, 3), np.uint8)
        pred = model.predict(images)
        assert pred.shape == (1, 32, 64)
        model.variables_updated = True
        path = model.save(str(tmp_path), force_save=True)
        reloaded = FCN8s(model_load_dir=path, compute_dtype=jnp.float32)
        assert reloaded.variant == "fcn16s"
        np.testing.assert_array_equal(pred, reloaded.predict(images))
        model.close(), reloaded.close()


class TestModelSummary:
    """utils/summary.py — analytic layer report (params/MACs/activations)."""

    # fast-suite re-triage (round 5): the flagship variant stays in the
    # inner loop; the 16s/32s twins ride the slow suite
    @pytest.mark.parametrize("variant", [
        "fcn8s",
        pytest.param("fcn16s", marks=pytest.mark.slow),
        pytest.param("fcn32s", marks=pytest.mark.slow),
    ])
    def test_totals_match_param_tree(self, variant):
        from fcn8s_tensorflow_tpu.utils.summary import model_summary_rows

        params = init_fcn8s(jax.random.PRNGKey(0), 5, width_mult=1 / 16,
                            fc_channels=48, variant=variant)
        rows = model_summary_rows(params, (64, 96), batch=2)
        assert sum(r["params"] for r in rows) == sum(
            int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))

    def test_hand_computed_macs_and_shapes(self):
        from fcn8s_tensorflow_tpu.utils.summary import model_summary_rows

        params = init_fcn8s(jax.random.PRNGKey(0), 4, width_mult=1 / 16,
                            fc_channels=32)
        rows = {r["name"]: r for r in model_summary_rows(params, (64, 96), batch=2)}
        # conv1_1: 3x3x3x8 kernel at full res, batch 2
        c = rows["conv1_1"]
        assert c["kernel"] == (3, 3, 3, 8) and c["output"] == (64, 96, 8)
        assert c["macs"] == 2 * 64 * 96 * 3 * 3 * 3 * 8
        assert c["act_bytes"] == 2 * 64 * 96 * 8 * 2  # bf16
        # fc6: 7x7 conv at stride 32
        f = rows["fc6"]
        assert f["output"] == (2, 3, 32)
        assert f["macs"] == 2 * 2 * 3 * 7 * 7 * 32 * 32
        # final deconv: per-INPUT-pixel kernel cost, output at full res
        d = rows["fc7_pool4_pool3_deconv"]
        assert d["kernel"] == (16, 16, 4, 4) and d["output"] == (64, 96, 4)
        assert d["macs"] == 2 * (64 // 8) * (96 // 8) * 16 * 16 * 4 * 4
        # forward order preserved
        names = [r["name"] for r in model_summary_rows(params, (64, 96))]
        assert names[0] == "conv1_1" and names[-1] == "fc7_pool4_pool3_deconv"

    def test_facade_summary_string(self):
        from fcn8s_tensorflow_tpu.engine.model import FCN8s

        model = FCN8s(num_classes=3, width_mult=1 / 32, fc_channels=32,
                      compute_dtype=jnp.float32)
        text = model.summary(input_hw=(64, 96), batch=1)
        assert "conv1_1" in text and "fc7" in text and "params" in text
        assert "fcn8s" in text
        with pytest.raises(ValueError, match="divisible by 32"):
            model.summary(input_hw=(65, 96))
        model.close()
