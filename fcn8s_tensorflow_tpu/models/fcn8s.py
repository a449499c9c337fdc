"""FCN-8s decoder and full model.

Re-specifies the reference decoder (`/root/reference/fcn8s_tensorflow.py:154-237`)
TPU-natively:

* pool3 scaled by 1e-4, pool4 by 1e-2 (the paper's "at-once" trick);
* three 1x1 score convs to ``num_classes`` channels, truncated-normal
  sigma=0.001 init, L2-regularized kernels;
* upsampling chain: 4x4/s2 deconv on the fc7 score + pool4-score add,
  4x4/s2 deconv + pool3-score add, final 16x16/s8 deconv to full resolution;
  deconv kernels truncated-normal sigma=0.01 (or bilinear init).

All deconvs use TF-SAME shape semantics (out = in * stride), so for inputs
with H, W divisible by 32 the logits come back at exactly the input
resolution. Logits are returned in float32 — the loss and argmax heads want
full precision, and XLA fuses the final cast into the last deconv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nn import conv2d, conv2d_transpose
from ..ops.subpixel import conv2d_transpose_subpixel
from .initializers import bilinear_upsampling_kernel, truncated_normal
from .vgg16 import apply_vgg16, init_vgg16

POOL3_SCALE = 1e-4
POOL4_SCALE = 1e-2
STDDEV_1X1 = 0.001
STDDEV_DECONV = 0.01

# (name, kind, kernel_shape) — kind 'conv' is a 1x1 score conv, 'deconv' a
# transposed conv (kernel 2s x 2s, stride s). Channel dim C filled at init.
# The reference ships ONLY fcn8s (`fcn8s_tensorflow.py:154-237`); fcn16s and
# fcn32s complete the FCN paper's family (same at-once skip scaling where a
# skip exists) as beyond-reference variants sharing the encoder and facade.
# Measured v5e @8x1024x512 (full width): fcn8s 110.1 ms/step train / 37.7 ms
# fwd; fcn16s 114.0 / 40.4; fcn32s 157.5 / 46.0 — the single large-kernel
# deconvs (32x32/s16, 64x64/s32) cost MORE than fcn8s's staged 4/4/16 chain
# despite fewer layers (their subpixel contractions are s^2*C-wide). These
# are quality-ablation variants, not speed paths.
_DECODER_SPECS = {
    "fcn8s": [
        ("pool3_1x1", "conv", (1, 1, 256, None)),
        ("pool4_1x1", "conv", (1, 1, 512, None)),
        ("fc7_1x1", "conv", (1, 1, 4096, None)),
        ("fc7_deconv", "deconv", (4, 4, None, None)),
        ("fc7_pool4_deconv", "deconv", (4, 4, None, None)),
        ("fc7_pool4_pool3_deconv", "deconv", (16, 16, None, None)),
    ],
    "fcn16s": [
        ("pool4_1x1", "conv", (1, 1, 512, None)),
        ("fc7_1x1", "conv", (1, 1, 4096, None)),
        ("fc7_deconv", "deconv", (4, 4, None, None)),
        ("fc7_pool4_deconv", "deconv", (32, 32, None, None)),  # s16 to full res
    ],
    "fcn32s": [
        ("fc7_1x1", "conv", (1, 1, 4096, None)),
        ("fc7_deconv", "deconv", (64, 64, None, None)),  # s32 to full res
    ],
}
_DECODER_SPEC = _DECODER_SPECS["fcn8s"]  # back-compat alias


def init_fcn8s_decoder(
    rng,
    num_classes: int,
    *,
    bilinear_deconv_init: bool = False,
    pool3_ch: int = 256,
    pool4_ch: int = 512,
    fc7_ch: int = 4096,
    variant: str = "fcn8s",
) -> dict:
    """Decoder parameters. ``bilinear_deconv_init=True`` swaps the deconv
    random init for the FCN paper's fixed bilinear-interpolation kernels.
    The ``*_ch`` kwargs follow the encoder's tap widths (non-default only
    for width-scaled test/debug encoders). ``variant``: 'fcn8s' (default,
    the reference's model), 'fcn16s', or 'fcn32s'."""
    if variant not in _DECODER_SPECS:
        raise ValueError(f"variant must be one of {sorted(_DECODER_SPECS)}, got {variant!r}")
    spec = _DECODER_SPECS[variant]
    tap_ch = {"pool3_1x1": pool3_ch, "pool4_1x1": pool4_ch, "fc7_1x1": fc7_ch}
    params = {}
    keys = jax.random.split(rng, len(spec))
    for key, (name, kind, shape) in zip(keys, spec):
        shape = tuple(num_classes if s is None else s for s in shape)
        if name in tap_ch:
            shape = (shape[0], shape[1], tap_ch[name], shape[3])
        if kind == "conv":
            kernel = truncated_normal(key, shape, STDDEV_1X1)
        elif bilinear_deconv_init:
            kernel = jnp.asarray(bilinear_upsampling_kernel(shape[0], num_classes))
        else:
            kernel = truncated_normal(key, shape, STDDEV_DECONV)
        params[name] = {"kernel": kernel, "bias": jnp.zeros((num_classes,), jnp.float32)}
    return params


def apply_fcn8s_decoder(params: dict, pool3, pool4, fc7_out, *, compute_dtype=jnp.bfloat16,
                        logits_dtype=jnp.float32, subpixel: bool = True,
                        packed_final: bool = False, variant: str = "fcn8s"):
    """Decode (pool3, pool4, fc7) feature taps to full-resolution logits.

    ``logits_dtype``: fp32 by default (loss/argmax heads want precision);
    pass the compute dtype when the consumer handles fp32 internally (the
    Pallas CE kernel does) — halves the traffic of the biggest tensor in the
    model (full-res logits), measured ~4.5% off the whole train step.

    ``subpixel``: compute the transposed convs as stride-1 3x3 convs at low
    resolution + depth-to-space (exact rewrite, ops/subpixel.py) — a better
    MXU shape for the 20-channel deconvs, measured 37% faster decoder
    backward on v5e. ``False`` uses the input-dilated XLA lowering.

    ``packed_final``: return the final deconv in packed subpixel layout
    (n, H/8, W/8, 8, 8, C) — for pixel-order-invariant consumers (the CE
    loss; pair with ``ops.subpixel.space_to_depth_labels``), skipping the
    full-resolution depth-to-space transpose in fwd AND bwd."""
    p = params

    def score(name, x, scale=None):
        if scale is not None:
            x = x * jnp.asarray(scale, x.dtype)
        return conv2d(x, p[name]["kernel"], p[name]["bias"])

    def deconv(x, name, stride, packed=False):
        if subpixel or packed:
            return conv2d_transpose_subpixel(
                x, p[name]["kernel"], p[name]["bias"], stride=stride, packed=packed
            )
        return conv2d_transpose(
            x, p[name]["kernel"], p[name]["bias"], strides=(stride, stride)
        )

    fc7_score = score("fc7_1x1", fc7_out.astype(compute_dtype))
    if variant == "fcn32s":
        x = deconv(fc7_score, "fc7_deconv", 32, packed=packed_final)
        return x.astype(logits_dtype)

    pool4_score = score("pool4_1x1", pool4.astype(compute_dtype), POOL4_SCALE)
    x = deconv(fc7_score, "fc7_deconv", 2) + pool4_score
    if variant == "fcn16s":
        x = deconv(x, "fc7_pool4_deconv", 16, packed=packed_final)
        return x.astype(logits_dtype)

    pool3_score = score("pool3_1x1", pool3.astype(compute_dtype), POOL3_SCALE)
    x = deconv(x, "fc7_pool4_deconv", 2) + pool3_score
    x = deconv(x, "fc7_pool4_pool3_deconv", 8, packed=packed_final)
    return x.astype(logits_dtype)


def init_fcn8s(
    rng,
    num_classes: int,
    *,
    bilinear_deconv_init: bool = False,
    width_mult: float = 1.0,
    fc_channels: int | None = None,
    variant: str = "fcn8s",
) -> dict:
    """Full model params: {'encoder': vgg16 tree, 'decoder': decoder tree}.

    ``width_mult`` / ``fc_channels`` build width-scaled debug/test variants
    with the identical graph structure (see ``init_vgg16``). ``variant``
    selects the FCN family member ('fcn8s'/'fcn16s'/'fcn32s')."""
    enc_rng, dec_rng = jax.random.split(rng)
    encoder = init_vgg16(enc_rng, width_mult=width_mult, fc_channels=fc_channels)
    decoder = init_fcn8s_decoder(
        dec_rng,
        num_classes,
        bilinear_deconv_init=bilinear_deconv_init,
        pool3_ch=encoder["conv3_3"]["kernel"].shape[-1],
        pool4_ch=encoder["conv4_3"]["kernel"].shape[-1],
        fc7_ch=encoder["fc7"]["kernel"].shape[-1],
        variant=variant,
    )
    return {"encoder": encoder, "decoder": decoder}


def apply_fcn8s(
    params: dict,
    images,
    *,
    keep_prob=1.0,
    rng=None,
    deterministic: bool = True,
    compute_dtype=jnp.bfloat16,
    normalize: bool = True,
    logits_dtype=jnp.float32,
    remat: bool = False,
    packed_final: bool = False,
    variant: str | None = None,
):
    """End-to-end forward: NHWC images -> (N, H, W, num_classes) logits
    (fp32 by default; see ``apply_fcn8s_decoder``, incl. ``packed_final``).

    The fully-convolutional property of the reference (`predict()` docstring,
    `fcn8s_tensorflow.py:748-756`) is preserved: any H, W divisible by 32
    works with a single compiled program per shape bucket.
    """
    pool3, pool4, fc7_out = apply_vgg16(
        params["encoder"],
        images,
        keep_prob=keep_prob,
        rng=rng,
        deterministic=deterministic,
        compute_dtype=compute_dtype,
        normalize=normalize,
        remat=remat,
    )
    if variant is None:
        variant = decoder_variant(params["decoder"])
    return apply_fcn8s_decoder(
        params["decoder"], pool3, pool4, fc7_out,
        compute_dtype=compute_dtype, logits_dtype=logits_dtype,
        packed_final=packed_final, variant=variant,
    )


def decoder_variant(decoder_params: dict) -> str:
    """Infer the FCN variant from a decoder param tree (the key set is
    unambiguous across the family)."""
    if "fc7_pool4_pool3_deconv" in decoder_params:
        return "fcn8s"
    if "fc7_pool4_deconv" in decoder_params:
        return "fcn16s"
    return "fcn32s"


def decoder_l2_loss(decoder_params: dict) -> jnp.ndarray:
    """Sum of TF-style L2 terms over the decoder kernels (biases exempt):
    ``sum(w**2) / 2`` per kernel, matching ``tf.contrib.layers.l2_regularizer``
    semantics used at reference `fcn8s_tensorflow.py:162,250-251` (the rate is
    multiplied in by the caller). Iterates the tree, so every FCN variant's
    kernel set is covered."""
    total = jnp.zeros((), jnp.float32)
    for layer in decoder_params.values():
        w = layer["kernel"].astype(jnp.float32)
        total = total + 0.5 * jnp.sum(w * w)
    return total
