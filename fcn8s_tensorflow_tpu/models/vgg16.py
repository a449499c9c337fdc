"""Explicitly-coded convolutionalized VGG-16 encoder.

The reference never builds its encoder in code — it loads an opaque SavedModel
protobuf ("Udacity CarND" format) and pulls five tensors out by name
(`/root/reference/fcn8s_tensorflow.py:127-152`). We re-specify that encoder
explicitly:

* 13 conv3x3+ReLU layers in 5 blocks (64,64 / 128,128 / 256x3 / 512x3 / 512x3)
  each followed by a 2x2/s2 SAME max-pool;
* fc6 convolutionalized as a 7x7x512x4096 SAME conv + ReLU + dropout;
* fc7 as a 1x1x4096x4096 conv + ReLU + dropout
  (dropout keep_prob is the reference's ``keep_prob`` feed, visible in its
  summary names `fc6/weights`, `fc7/weights`, `fcn8s_tensorflow.py:343-350`).

The encoder exposes (pool3, pool4, fc7_out) at strides 8/16/32 — the three
taps the FCN-8s decoder fuses.

Functional style: ``init_vgg16`` builds a nested param dict (pure pytree),
``apply_vgg16`` is a pure function of (params, images, rng) suitable for
``jax.jit`` / ``pjit`` / ``jax.grad``. Parameters are float32; compute runs in
``compute_dtype`` (bfloat16 by default) with fp32 MXU accumulation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.nn import conv2d, dropout, max_pool_2x2
from .initializers import he_normal

# (name, in_ch, out_ch) per conv layer, block structure implied by pools.
VGG16_CONV_LAYERS = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
]
# Pool follows the last conv of each block.
_BLOCK_ENDS = {"conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"}

FC6_KERNEL = (7, 7, 512, 4096)
FC7_KERNEL = (1, 1, 4096, 4096)

# Mean-RGB normalization applied on device (the VGG preprocessing the Udacity
# SavedModel bakes in; applying it explicitly keeps the host pipeline uint8).
VGG_MEAN_RGB = (123.68, 116.779, 103.939)


def init_vgg16(rng, *, width_mult: float = 1.0, fc_channels: int | None = None) -> dict:
    """Fresh (untrained) encoder parameters, He-normal kernels, zero biases.

    ``width_mult`` scales every conv width and ``fc_channels`` overrides the
    4096-wide fc6/fc7 — the graph structure (16 layers, 5 pools, 3 taps) is
    identical at any width, so tiny configs exercise the full architecture in
    CPU tests while production uses the canonical widths.
    """

    def scale(ch: int) -> int:
        return max(8, int(ch * width_mult)) if width_mult != 1.0 else ch

    fc_ch = fc_channels if fc_channels is not None else scale(FC6_KERNEL[-1])
    params = {}
    keys = jax.random.split(rng, len(VGG16_CONV_LAYERS) + 2)
    for key, (name, in_ch, out_ch) in zip(keys, VGG16_CONV_LAYERS):
        in_ch = 3 if in_ch == 3 else scale(in_ch)
        params[name] = {
            "kernel": he_normal(key, (3, 3, in_ch, scale(out_ch))),
            "bias": jnp.zeros((scale(out_ch),), jnp.float32),
        }
    params["fc6"] = {
        "kernel": he_normal(keys[-2], (7, 7, scale(FC6_KERNEL[2]), fc_ch)),
        "bias": jnp.zeros((fc_ch,), jnp.float32),
    }
    params["fc7"] = {
        "kernel": he_normal(keys[-1], (1, 1, fc_ch, fc_ch)),
        "bias": jnp.zeros((fc_ch,), jnp.float32),
    }
    return params


def apply_vgg16(
    params: dict,
    images,
    *,
    keep_prob=1.0,
    rng=None,
    deterministic: bool = True,
    compute_dtype=jnp.bfloat16,
    normalize: bool = True,
    remat: bool = False,
):
    """Run the encoder. ``images`` is NHWC, float or uint8 in [0, 255].

    Returns ``(pool3, pool4, fc7_out)`` at strides 8/16/32, all in
    ``compute_dtype``. H and W must be divisible by 32 (the facade pads).

    ``remat=True`` wraps each conv block in ``jax.checkpoint``: the backward
    pass recomputes block activations instead of storing them, trading
    ~30% more encoder FLOPs for a large cut in activation HBM — use it to
    fit bigger batches or full 1024x2048 Cityscapes resolution.
    """
    x = images.astype(jnp.float32)
    if normalize:
        x = x - jnp.asarray(VGG_MEAN_RGB, jnp.float32)
    x = x.astype(compute_dtype)

    if not deterministic and rng is None:
        raise ValueError("apply_vgg16: rng is required when deterministic=False")
    rngs = jax.random.split(rng, 2) if rng is not None else (None, None)

    # conv blocks, grouped so remat checkpoints at block boundaries
    blocks: list[list] = [[]]
    for name, _, _ in VGG16_CONV_LAYERS:
        blocks[-1].append(name)
        if name in _BLOCK_ENDS:
            blocks.append([])
    blocks = [b for b in blocks if b]

    def run_block(block_names, x, block_params):
        for name in block_names:
            layer = block_params[name]
            x = jax.nn.relu(conv2d(x, layer["kernel"], layer["bias"]))
        return max_pool_2x2(x)

    pool3 = pool4 = None
    for block_names in blocks:
        fn = jax.checkpoint(partial(run_block, block_names)) if remat else partial(run_block, block_names)
        x = fn(x, {n: params[n] for n in block_names})
        if block_names[-1] == "conv3_3":
            pool3 = x
        elif block_names[-1] == "conv4_3":
            pool4 = x

    def run_head(x, fc6, fc7):
        x = jax.nn.relu(conv2d(x, fc6["kernel"], fc6["bias"]))
        x = dropout(x, rngs[0], keep_prob, deterministic=deterministic)
        x = jax.nn.relu(conv2d(x, fc7["kernel"], fc7["bias"]))
        return dropout(x, rngs[1], keep_prob, deterministic=deterministic)

    head = jax.checkpoint(run_head) if remat else run_head
    x = head(x, params["fc6"], params["fc7"])
    return pool3, pool4, x
