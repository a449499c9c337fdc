"""Parameter initializers.

Matches the reference's decoder init distribution (truncated normal,
`/root/reference/fcn8s_tensorflow.py:159-160`: sigma=0.001 for the 1x1 score
convs, sigma=0.01 for the transposed convs) and adds the FCN paper's bilinear
upsampling kernel as an optional alternative for the deconvs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def truncated_normal(rng, shape, stddev, dtype=jnp.float32):
    """TF-style truncated normal: values beyond 2 sigma are resampled; jax's
    ``truncated_normal`` samples from the same +/-2-sigma-truncated unit
    normal, scaled by stddev."""
    return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)


def he_normal(rng, shape, dtype=jnp.float32):
    """He/Kaiming normal for HWIO conv kernels (fan_in = kh*kw*in_ch). Used
    for the from-scratch VGG-16 encoder (the reference's encoder only ever
    exists pretrained inside a SavedModel protobuf)."""
    fan_in = int(np.prod(shape[:-1]))
    std = float(np.sqrt(2.0 / fan_in))
    return std * jax.random.normal(rng, shape, dtype)


def bilinear_upsampling_kernel(kernel_size: int, channels: int, dtype=np.float32) -> np.ndarray:
    """HWIO (k, k, C, C) kernel performing channelwise bilinear upsampling,
    the init from the FCN paper ('Fully Convolutional Networks for Semantic
    Segmentation', Long et al.). Off-diagonal channel pairs are zero."""
    factor = (kernel_size + 1) // 2
    center = factor - 1.0 if kernel_size % 2 == 1 else factor - 0.5
    og = np.ogrid[:kernel_size, :kernel_size]
    filt_1d = (1 - abs(og[0] - center) / factor) * (1 - abs(og[1] - center) / factor)
    kernel = np.zeros((kernel_size, kernel_size, channels, channels), dtype=dtype)
    for c in range(channels):
        kernel[:, :, c, c] = filt_1d
    return kernel
