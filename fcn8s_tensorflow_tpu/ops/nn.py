"""Core NN ops: convolution, transposed convolution, pooling, dropout.

These are thin, MXU-shaped wrappers over ``jax.lax`` convolution primitives.
Design rules (TPU-first):

* NHWC activations / HWIO kernels — the layouts XLA:TPU tiles best.
* Mixed precision: parameters live in float32, compute runs in a configurable
  ``compute_dtype`` (bfloat16 by default). The TPU MXU accumulates bf16
  contractions in fp32 natively, so bf16-in/bf16-out convs lose nothing in
  the accumulation.
* ``padding='SAME'`` semantics match TF1's so the decoder shape algebra of the
  reference (`/root/reference/fcn8s_tensorflow.py:154-237`) carries over:
  ``conv(k, s=1, SAME)`` preserves H,W; ``conv_transpose(k, s, SAME)``
  produces exactly ``H*s, W*s``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d(x, kernel, bias=None, *, strides=(1, 1), padding="SAME"):
    """2-D convolution, NHWC x HWIO -> NHWC, in compute dtype.

    No ``preferred_element_type`` is requested: on TPU the MXU natively
    accumulates bf16 contractions in fp32 and rounds the result once, so a
    bf16-in/bf16-out conv already gets fp32 accumulation for free — and JAX
    0.9's conv VJP rejects mixed input/accumulator dtypes under ``grad``.
    """
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=strides,
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv2d_transpose(x, kernel, bias=None, *, strides=(2, 2)):
    """Fractionally-strided (transposed) convolution with TF-SAME semantics:
    output spatial dims are exactly ``input * stride``.

    Implemented as an input-dilated convolution (``lhs_dilation = strides``)
    with explicit padding ``k - 1 - pad_lo`` on each side, which is both what
    TF1's ``conv2d_transpose(padding='same')`` computes and the form XLA:TPU
    lowers efficiently (the zero-stuffed positions are skipped by the
    convolution tiler, not materialized).

    Kernel layout is HWIO with I = input channels of ``x`` (we define our own
    parameterization; there is no TF checkpoint-layout constraint).
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    sh, sw = strides
    # TF SAME deconv: out = in*s; total padding p_total = k - s (>=0 for our
    # kernels), split low = ceil(p/2) applied as crop, expressed here as
    # explicit padding of the dilated input: pad = k - 1 - crop.
    pad_h = _same_transpose_padding(kh, sh)
    pad_w = _same_transpose_padding(kw, sw)
    out = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(sh, sw),
        dimension_numbers=DIMENSION_NUMBERS,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _same_transpose_padding(k: int, s: int) -> tuple[int, int]:
    """Explicit (lo, hi) padding of the s-dilated input so that a stride-1
    conv with kernel k yields exactly in*s outputs, matching TF SAME."""
    # Dilated length: (in-1)*s + 1. Want out = in*s = dilated + pad_lo + pad_hi - k + 1
    # => pad_lo + pad_hi = in*s - (in-1)*s - 1 + k - 1 = s + k - 2... per-side split
    # mirrors TF: total crop = k - s (for k >= s), crop_lo = ceil((k-s)/2).
    pad_total = s + k - 2
    crop_total = k - s
    if crop_total >= 0:
        crop_lo = (crop_total + 1) // 2
        pad_lo = k - 1 - crop_lo
    else:
        pad_lo = (pad_total + 1) // 2
    return (pad_lo, pad_total - pad_lo)


def max_pool_2x2(x):
    """2x2 stride-2 max pool with SAME padding (ceil division of odd dims),
    matching the VGG-16 pool layers."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="SAME",
    )


def dropout(x, rng, keep_prob, *, deterministic: bool):
    """Inverted dropout matching TF's ``tf.nn.dropout`` scaling (kept units
    are divided by ``keep_prob``). ``keep_prob`` may be a traced scalar, so a
    constant keep_prob does not trigger recompilation when swept."""
    if deterministic:
        return x
    keep_prob = jnp.asarray(keep_prob, dtype=jnp.float32)
    mask = jax.random.bernoulli(rng, keep_prob, shape=x.shape)
    scale = (1.0 / jnp.maximum(keep_prob, 1e-8)).astype(x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros((), x.dtype))
