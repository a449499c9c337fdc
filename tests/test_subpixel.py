"""Subpixel deconv rewrite: exact equivalence with the dilated-conv lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcn8s_tensorflow_tpu.ops.nn import conv2d_transpose
from fcn8s_tensorflow_tpu.ops.subpixel import conv2d_transpose_subpixel


@pytest.mark.parametrize("s,c_in,c_out,hw", [
    (8, 20, 20, (4, 6)),
    (2, 20, 20, (5, 7)),
    (2, 3, 5, (4, 4)),
    (4, 7, 3, (3, 3)),
])
def test_subpixel_matches_conv_transpose(rng, s, c_in, c_out, hw):
    x = jnp.asarray(rng.normal(size=(2, *hw, c_in)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2 * s, 2 * s, c_in, c_out)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(c_out,)).astype(np.float32))
    want = conv2d_transpose(x, k, b, strides=(s, s))
    got = conv2d_transpose_subpixel(x, k, b, stride=s)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_subpixel_gradients_match(rng):
    s = 2
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 4, 3, 5)).astype(np.float32))

    g_ref = jax.grad(lambda k: jnp.sum(conv2d_transpose(x, k, strides=(s, s)) ** 2))(k)
    g_sub = jax.grad(lambda k: jnp.sum(conv2d_transpose_subpixel(x, k, stride=s) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g_sub), np.asarray(g_ref), atol=1e-3, rtol=1e-3)


def test_subpixel_rejects_wrong_kernel():
    with pytest.raises(ValueError, match="2s"):
        conv2d_transpose_subpixel(jnp.zeros((1, 4, 4, 3)), jnp.zeros((3, 3, 3, 5)), stride=2)


def test_decoder_subpixel_vs_dilated(rng):
    """Full decoder: subpixel (default) equals the dilated lowering."""
    from fcn8s_tensorflow_tpu.models.fcn8s import apply_fcn8s_decoder, init_fcn8s_decoder

    dec = init_fcn8s_decoder(jax.random.PRNGKey(0), 5, pool3_ch=8, pool4_ch=16, fc7_ch=32)
    p3 = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    p4 = jnp.asarray(rng.normal(size=(1, 4, 4, 16)).astype(np.float32))
    f7 = jnp.asarray(rng.normal(size=(1, 2, 2, 32)).astype(np.float32))
    a = apply_fcn8s_decoder(dec, p3, p4, f7, compute_dtype=jnp.float32, subpixel=True)
    b = apply_fcn8s_decoder(dec, p3, p4, f7, compute_dtype=jnp.float32, subpixel=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_space_to_depth_labels(rng):
    from fcn8s_tensorflow_tpu.ops.subpixel import space_to_depth_labels

    labels = rng.integers(0, 20, (2, 16, 24), dtype=np.uint8)
    packed = np.asarray(space_to_depth_labels(jnp.asarray(labels), 8))
    assert packed.shape == (2, 2, 3, 8, 8)
    for y, x, py, px in [(0, 0, 0, 0), (1, 2, 3, 5), (0, 1, 7, 7)]:
        assert packed[1, y, x, py, px] == labels[1, 8 * y + py, 8 * x + px]


@pytest.mark.slow
def test_packed_final_loss_equals_unpacked(rng):
    """CE over packed logits + packed labels == CE over the unpacked pair."""
    from fcn8s_tensorflow_tpu.models.fcn8s import apply_fcn8s, init_fcn8s
    from fcn8s_tensorflow_tpu.ops.losses import mean_softmax_cross_entropy
    from fcn8s_tensorflow_tpu.ops.subpixel import space_to_depth_labels

    params = init_fcn8s(jax.random.PRNGKey(0), 4, width_mult=1 / 32, fc_channels=32)
    images = jnp.asarray(rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (1, 32, 32), dtype=np.uint8))

    flat = apply_fcn8s(params, images, compute_dtype=jnp.float32)
    packed = apply_fcn8s(params, images, compute_dtype=jnp.float32, packed_final=True)
    assert packed.shape == (1, 4, 4, 8, 8, 4)

    loss_flat = mean_softmax_cross_entropy(flat, labels)
    packed_labels = space_to_depth_labels(labels, 8)
    loss_packed = mean_softmax_cross_entropy(
        packed.reshape(-1, 4), packed_labels.reshape(-1))
    np.testing.assert_allclose(float(loss_packed), float(loss_flat), rtol=1e-5)

    # and the packed logits ARE the flat logits, permuted
    repacked = np.asarray(packed).transpose(0, 1, 3, 2, 4, 5).reshape(1, 32, 32, 4)
    np.testing.assert_allclose(repacked, np.asarray(flat), atol=1e-5)
