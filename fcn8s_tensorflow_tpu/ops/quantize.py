"""Int8 quantized inference path (serving).

The reference has no quantized serving story (TF1 feed_dict inference only,
`/root/reference/fcn8s_tensorflow.py:743-770`). On TPU v5e the MXU's int8
peak is 2x its bf16 peak (394 vs 197 TOPS), so a quantized forward roughly
halves the compute-bound portion of inference. This module implements the
TPU-native recipe:

* **weights**: per-output-channel symmetric int8 (scale = max|w| / 127 per
  output channel) — the standard accuracy-preserving choice for convs (measured on this hardware,
  full-width fwd @8x1024x512: per-op profile shows the fc6 conv at 2.24 ms
  int8 vs 4.36 ms bf16 — the 2x MXU win is real where arithmetic intensity
  is high — but wall time lands at parity with bf16 (37-38 ms/batch both)
  because the conv1/conv2 blocks are HBM-bound and pay extra
  quantize/dequantize passes there; argmax agreement 94.5% even on a
  random-init model whose logits sit in the noise regime, >=97% asserted
  on a trained model in tests/test_quantize.py);
* **activations**: per-tensor symmetric int8, two modes —
  **dynamic** (scale from the current tensor's max|x|, on device in the
  same executable; no calibration data needed) and **calibrated static**
  (``collect_activation_absmax`` freezes per-layer scales, making
  quantization a pure elementwise epilogue). Measured v5e @8x1024x512
  argmax predict: bf16 37.6 ms, int8 dynamic 35.6 ms, int8 static
  **30.0 ms** (-20% vs bf16) — the dynamic mode's per-layer max|x|
  reduction passes are what ate the MXU win;
* **accumulation**: int8 x int8 -> int32 on the MXU
  (``preferred_element_type=int32``), dequantized into the compute dtype,
  bias added in float.

The decoder's 1x1 score convs and transposed convs stay in bf16: they are
<2% of forward FLOPs and the score scales (1e-4 / 1e-2, models/fcn8s.py)
make them the numerically touchiest part of the model.

Quantization error: int8 per-channel weight + dynamic act quantization on
this 20-class head typically flips only boundary pixels; the argmax
agreement threshold is asserted in tests/test_quantize.py on a
synthetically-trained model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .nn import DIMENSION_NUMBERS, max_pool_2x2

INT8_MAX = 127.0


def quantize_kernel_per_channel(kernel: jnp.ndarray):
    """HWIO kernel -> (int8 kernel, (O,) float32 scale).

    Symmetric per-output-channel: ``w_q = round(w / scale)``,
    ``scale = max|w| over (H,W,I) per O / 127``. Zero-max channels get
    scale 1 to avoid 0/0 (their quantized weights are all zero anyway).
    """
    kernel = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.where(absmax > 0, absmax / INT8_MAX, 1.0)
    q = jnp.clip(jnp.round(kernel / scale), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    return q, scale


def quantize_vgg16_params(encoder_params: dict, act_absmax: dict | None = None) -> dict:
    """Per-layer {'kernel_q', 'scale', 'bias'[, 'act_scale']} tree for the
    encoder convs. ``act_absmax`` (from ``collect_activation_absmax``) adds
    calibrated static activation scales."""
    out = {}
    for name, layer in encoder_params.items():
        q, scale = quantize_kernel_per_channel(layer["kernel"])
        out[name] = {
            "kernel_q": q,
            "scale": scale,
            "bias": layer["bias"].astype(jnp.float32),
        }
        if act_absmax is not None:
            out[name]["act_scale"] = jnp.maximum(
                jnp.asarray(act_absmax[name], jnp.float32), 1e-12) / INT8_MAX
    return out


def _quantize_activation(x, static_scale=None):
    """Per-tensor symmetric int8. Returns (x_q, scale: f32 scalar).

    Dynamic mode (``static_scale=None``): scale from the current tensor's
    max|x| — the reduction fuses with the producing op's epilogue under XLA
    but still costs an extra pass over HBM-bound activations. Static mode:
    use a calibration-time scale (``collect_activation_absmax``), making
    quantization a pure elementwise epilogue. Post-ReLU tensors are
    non-negative but we keep the symmetric formula (the MXU has no
    asymmetric-zero-point path worth the correction term).
    """
    if static_scale is None:
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = jnp.maximum(absmax, 1e-12) / INT8_MAX
    else:
        scale = jnp.asarray(static_scale, jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -INT8_MAX, INT8_MAX)
    return xq.astype(jnp.int8), scale


def conv2d_int8(x, qlayer: dict, *, strides=(1, 1), padding="SAME",
                compute_dtype=jnp.bfloat16):
    """Quantized conv: int8 activations (dynamic, or static via a
    calibrated ``act_scale`` in ``qlayer``) x per-channel-int8 kernel,
    int32 MXU accumulation, float dequant + bias. Drop-in for
    ``ops.nn.conv2d`` (inference only)."""
    xq, x_scale = _quantize_activation(x, static_scale=qlayer.get("act_scale"))
    # preferred_element_type is REQUIRED here (int8 x int8 must accumulate
    # int32) — the CLAUDE.md "no preferred_element_type on convs" rule is
    # about bf16 convs under grad (JAX 0.9 VJP rejection); this is an
    # inference-only integer path, never differentiated (QAT would need a
    # straight-through custom VJP anyway).
    acc = lax.conv_general_dilated(
        xq,
        qlayer["kernel_q"],
        window_strides=strides,
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32,
    )
    scale = (x_scale * qlayer["scale"]).astype(jnp.float32)
    out = acc.astype(jnp.float32) * scale + qlayer["bias"]
    return out.astype(compute_dtype)


def apply_vgg16_int8(qparams: dict, images, *, compute_dtype=jnp.bfloat16,
                     normalize: bool = True):
    """Quantized-encoder forward mirroring ``models.vgg16.apply_vgg16``
    (deterministic / keep_prob=1 — this is a serving path). Returns
    (pool3, pool4, fc7_out)."""
    from ..models.vgg16 import VGG16_CONV_LAYERS, VGG_MEAN_RGB, _BLOCK_ENDS

    x = images.astype(jnp.float32)
    if normalize:
        x = x - jnp.asarray(VGG_MEAN_RGB, jnp.float32)
    x = x.astype(compute_dtype)

    pool3 = pool4 = None
    for name, _, _ in VGG16_CONV_LAYERS:
        x = jax.nn.relu(conv2d_int8(x, qparams[name], compute_dtype=compute_dtype))
        if name in _BLOCK_ENDS:
            x = max_pool_2x2(x)
            if name == "conv3_3":
                pool3 = x
            elif name == "conv4_3":
                pool4 = x

    x = jax.nn.relu(conv2d_int8(x, qparams["fc6"], compute_dtype=compute_dtype))
    x = jax.nn.relu(conv2d_int8(x, qparams["fc7"], compute_dtype=compute_dtype))
    return pool3, pool4, x


def collect_activation_absmax(params: dict, images, *, compute_dtype=jnp.bfloat16,
                              normalize: bool = True) -> dict:
    """Calibration pass: run the float encoder on ``images`` and record each
    quantized conv's INPUT max|x| (layer name -> f32 scalar). Jit-safe; for
    multi-batch calibration, tree-max the per-batch results
    (``jax.tree.map(jnp.maximum, a, b)``)."""
    from ..models.vgg16 import VGG16_CONV_LAYERS, VGG_MEAN_RGB, _BLOCK_ENDS
    from .nn import conv2d

    x = images.astype(jnp.float32)
    if normalize:
        x = x - jnp.asarray(VGG_MEAN_RGB, jnp.float32)
    x = x.astype(compute_dtype)

    absmax = {}

    def observe(name, x):
        absmax[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))

    for name, _, _ in VGG16_CONV_LAYERS:
        observe(name, x)
        layer = params["encoder"][name]
        x = jax.nn.relu(conv2d(x, layer["kernel"], layer["bias"]))
        if name in _BLOCK_ENDS:
            x = max_pool_2x2(x)
    observe("fc6", x)
    x = jax.nn.relu(conv2d(x, params["encoder"]["fc6"]["kernel"],
                           params["encoder"]["fc6"]["bias"]))
    observe("fc7", x)
    return absmax


def quantize_fcn8s_params(params: dict, act_absmax: dict | None = None) -> dict:
    """Full-model quantized param tree: int8 encoder + the original (float)
    decoder (see module docstring for why the decoder stays bf16).

    ``act_absmax`` (from ``collect_activation_absmax``, optionally
    tree-maxed over several calibration batches) switches the activation
    quantization from dynamic to calibrated-static scales."""
    return {
        "encoder_q": quantize_vgg16_params(params["encoder"], act_absmax),
        "decoder": params["decoder"],
    }


def apply_fcn8s_int8(qparams: dict, images, *, compute_dtype=jnp.bfloat16,
                     normalize: bool = True, logits_dtype=jnp.float32,
                     packed_final: bool = False):
    """Quantized end-to-end forward: int8 encoder -> bf16 FCN-8s decoder.
    Same (N, H, W, C) logits contract as ``models.fcn8s.apply_fcn8s``
    (incl. ``packed_final``)."""
    from ..models.fcn8s import apply_fcn8s_decoder, decoder_variant

    pool3, pool4, fc7_out = apply_vgg16_int8(
        qparams["encoder_q"], images, compute_dtype=compute_dtype,
        normalize=normalize,
    )
    return apply_fcn8s_decoder(
        qparams["decoder"], pool3, pool4, fc7_out,
        compute_dtype=compute_dtype, logits_dtype=logits_dtype,
        variant=decoder_variant(qparams["decoder"]),
        packed_final=packed_final,
    )
