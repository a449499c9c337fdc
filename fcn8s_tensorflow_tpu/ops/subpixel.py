"""Subpixel (conv + depth-to-space) reformulation of transposed convolution.

For our deconv family (kernel k = 2s, stride s, TF-SAME) the fractionally
strided convolution is exactly a stride-1 3x3 convolution producing s*s*C
output channels followed by a depth-to-space reshape:

    out[s*y + py, s*x + px, c] =
        sum_{dy,dx in {-1,0,1}} x[y+dy, x+dx] . K[-s*dy + py + s//2,
                                                  -s*dx + px + s//2]
        (taps outside [0, 2s) are zero)

This trades the input-dilated conv (spatially huge, C channels) for a dense
(h, w, 9*C_in) x (9*C_in, s*s*C_out) contraction at the LOW resolution —
a much better MXU shape when C is small (20 classes) and s is large (8).

The rewrite is numerically exact (tests/test_subpixel.py checks it against
``ops.nn.conv2d_transpose`` to fp32 tolerance); whether it is *faster* than
XLA's native lowering is hardware-dependent — measured numbers live in the
benchmark notes below.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .nn import DIMENSION_NUMBERS


def _subpixel_kernel(kernel: np.ndarray | jnp.ndarray, s: int):
    """Rearrange an HWIO (2s, 2s, I, O) deconv kernel into the equivalent
    (3, 3, I, s*s*O) stride-1 conv kernel (output channel order: (py, px, O),
    matching a depth-to-space that expands H then W)."""
    k = kernel.shape[0]
    if k != 2 * s or kernel.shape[1] != k:
        raise ValueError(f"subpixel path requires kernel 2s x 2s, got {kernel.shape} for s={s}")
    in_ch, out_ch = kernel.shape[2], kernel.shape[3]
    crop = s // 2 + (s % 2)  # crop_lo = ceil((k - s)/2) = ceil(s/2)

    new = jnp.zeros((3, 3, in_ch, s, s, out_ch), dtype=kernel.dtype)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # kernel tap indices for each phase: the dilated-input conv is a
            # cross-correlation, so out[s*y+p] = sum_d x[y+d] * K[(k-1-crop)
            # + s*d - p] (derived from impulse responses; see tests)
            py = np.arange(s)
            iy = (k - 1 - crop) + s * dy - py
            px = np.arange(s)
            ix = (k - 1 - crop) + s * dx - px
            vy = (iy >= 0) & (iy < k)
            vx = (ix >= 0) & (ix < k)
            if not (vy.any() and vx.any()):
                continue
            sel_y = np.where(vy)[0]
            sel_x = np.where(vx)[0]
            block = kernel[np.ix_(iy[sel_y], ix[sel_x])]  # (ny, nx, I, O)
            block = jnp.transpose(jnp.asarray(block), (2, 0, 1, 3))  # (I, ny, nx, O)
            new = new.at[dy + 1, dx + 1, :, sel_y[:, None], sel_x[None, :], :].set(
                jnp.transpose(block, (1, 2, 0, 3))
            )
    return new.reshape(3, 3, in_ch, s * s * out_ch)


def conv2d_transpose_subpixel(x, kernel, bias=None, *, stride: int, packed: bool = False):
    """Drop-in for ``ops.nn.conv2d_transpose`` when kernel = 2*stride
    (all FCN-8s deconvs): stride-1 conv at low res + depth-to-space.

    ``packed=True`` skips the depth-to-space and returns
    ``(n, h, w, s, s, out_ch)`` — output pixel ``(s*y+py, s*x+px)`` lives at
    ``[n, y, x, py, px]``. For pixel-order-invariant consumers (the CE loss)
    this removes a 2x full-resolution transpose from fwd+bwd; pair with
    ``space_to_depth_labels`` on the targets."""
    s = stride
    n, h, w, _ = x.shape
    out_ch = kernel.shape[3]
    conv_out = lax.conv_general_dilated(
        x,
        _subpixel_kernel(kernel, s).astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=DIMENSION_NUMBERS,
    )  # (n, h, w, s*s*out_ch)
    out = conv_out.reshape(n, h, w, s, s, out_ch)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    if packed:
        return out
    return jnp.transpose(out, (0, 1, 3, 2, 4, 5)).reshape(n, h * s, w * s, out_ch)


def space_to_depth_labels(labels, s: int):
    """Rearrange (N, H, W) targets into the packed layout of
    ``conv2d_transpose_subpixel(packed=True)``: (N, H/s, W/s, s, s) with
    ``out[n, y, x, py, px] == labels[n, s*y+py, s*x+px]``. A cheap uint8
    permutation vs a full-resolution float transpose on the logits."""
    n, h_full, w_full = labels.shape
    h, w = h_full // s, w_full // s
    return labels.reshape(n, h, s, w, s).transpose(0, 1, 3, 2, 4)
