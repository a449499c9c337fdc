"""Cross-framework numerical parity harness: TF reference graph vs JAX model.

The reference's one quality anchor (38.2% val mIoU, `/root/reference/README.md:19`)
needs the Cityscapes dataset and its pretrained SavedModel, neither of which
exists in this environment. The achievable substitute, built here: construct
the reference's *exact* graph (`/root/reference/fcn8s_tensorflow.py:154-237`
decoder on a convolutionalized VGG-16 encoder) in TF 2.x, load IDENTICAL
weights into it and into ``apply_fcn8s``, and assert logits / argmax /
cross-entropy-loss / Adam-step agreement on real images. If the composed
models agree numerically for arbitrary shared weights, they agree for the
pretrained ones.

Kernel layout mapping:
* conv kernels are HWIO in both frameworks — copied verbatim;
* TF ``conv2d_transpose`` is the *gradient* of a forward conv, so its kernel
  (h, w, out, in) equals our forward-correlation deconv kernel (HWIO over the
  dilated input, `ops/nn.py:46-76`) spatially flipped with channel dims
  swapped: ``K_tf = K_jax[::-1, ::-1].transpose(0, 1, 3, 2)``.

Used by ``tests/test_tf_parity.py``; measured deltas are recorded in
PARITY.md. Run standalone:  python tools/parity_harness.py
"""

from __future__ import annotations

import numpy as np

from fcn8s_tensorflow_tpu.models.vgg16 import VGG16_CONV_LAYERS, VGG_MEAN_RGB


def build_tf_reference_model(num_classes, *, input_shape=(None, None, 3),
                             width_mult=1.0, fc_channels=None,
                             variant="fcn8s"):
    """The reference graph in TF 2.x Keras, layer-for-layer
    (`fcn8s_tensorflow.py:154-237` + the Udacity VGG-16 encoder structure):
    13 conv3x3+ReLU / 5 SAME max-pools, fc6 7x7 conv + ReLU, fc7 1x1 conv +
    ReLU (dropout omitted: parity runs use keep_prob=1), decoder with
    pool3*1e-4 / pool4*1e-2 scaling, 1x1 score convs, 4/2 + 4/2 + 16/8
    SAME transposed convs with skip adds. fp32 throughout.

    ``variant`` extends the reference graph (which only exists for fcn8s)
    to the framework's fcn16s / fcn32s family members with the same layer
    naming as models/fcn8s.py's ``_DECODER_SPECS``: fcn16s = 4/2 deconv +
    pool4 skip + 32/16 to full res; fcn32s = one 64/32 deconv."""
    import tensorflow as tf

    if variant not in ("fcn8s", "fcn16s", "fcn32s"):
        raise ValueError(f"unknown variant {variant!r}")

    def scale(ch):
        return max(8, int(ch * width_mult)) if width_mult != 1.0 else ch

    x = inp = tf.keras.Input(shape=input_shape)
    x = x - tf.constant(VGG_MEAN_RGB, tf.float32)
    taps = {}
    block_ends = {"conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"}
    for bi, (name, _, out_ch) in enumerate(VGG16_CONV_LAYERS):
        x = tf.keras.layers.Conv2D(scale(out_ch), 3, padding="same",
                                   activation="relu", name=name)(x)
        if name in block_ends:
            x = tf.keras.layers.MaxPool2D(2, 2, padding="same")(x)
            taps[name] = x
    fc_ch = fc_channels if fc_channels is not None else scale(4096)
    x = tf.keras.layers.Conv2D(fc_ch, 7, padding="same", activation="relu",
                               name="fc6")(x)
    x = tf.keras.layers.Conv2D(fc_ch, 1, padding="same", activation="relu",
                               name="fc7")(x)

    # decoder (reference `:154-237`; fcn16s/fcn32s are the same scheme with
    # the tail deconv jumping straight to full resolution)
    f7 = tf.keras.layers.Conv2D(num_classes, 1, name="fc7_1x1")(x)
    if variant == "fcn32s":
        out = tf.keras.layers.Conv2DTranspose(num_classes, 64, 32, padding="same",
                                              name="fc7_deconv")(f7)
        return tf.keras.Model(inp, out)
    p4 = tf.keras.layers.Conv2D(num_classes, 1, name="pool4_1x1")(
        taps["conv4_3"] * 1e-2)
    u1 = tf.keras.layers.Conv2DTranspose(num_classes, 4, 2, padding="same",
                                         name="fc7_deconv")(f7) + p4
    if variant == "fcn16s":
        out = tf.keras.layers.Conv2DTranspose(num_classes, 32, 16, padding="same",
                                              name="fc7_pool4_deconv")(u1)
        return tf.keras.Model(inp, out)
    p3 = tf.keras.layers.Conv2D(num_classes, 1, name="pool3_1x1")(
        taps["conv3_3"] * 1e-4)
    u2 = tf.keras.layers.Conv2DTranspose(num_classes, 4, 2, padding="same",
                                         name="fc7_pool4_deconv")(u1) + p3
    out = tf.keras.layers.Conv2DTranspose(num_classes, 16, 8, padding="same",
                                          name="fc7_pool4_pool3_deconv")(u2)
    return tf.keras.Model(inp, out)


def copy_params_to_tf(params, tf_model) -> None:
    """Load a JAX param pytree into the TF reference graph, with the deconv
    flip/transpose mapping (module docstring)."""
    enc, dec = params["encoder"], params["decoder"]
    for name in list(enc) + list(dec):
        tree = enc if name in enc else dec
        kernel = np.asarray(tree[name]["kernel"], np.float32)
        bias = np.asarray(tree[name]["bias"], np.float32)
        if name.endswith("deconv"):
            kernel = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
        tf_model.get_layer(name).set_weights([kernel, bias])


def tf_forward(tf_model, images) -> np.ndarray:
    """fp32 logits from the TF graph (images raw RGB, any float/uint8)."""
    import tensorflow as tf

    return tf_model(tf.constant(np.asarray(images, np.float32)),
                    training=False).numpy()


def jax_forward(params, images) -> np.ndarray:
    """fp32 logits from apply_fcn8s (deterministic, normalize on device)."""
    import jax
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.models.fcn8s import apply_fcn8s

    fn = jax.jit(lambda p, x: apply_fcn8s(p, x, compute_dtype=jnp.float32))
    return np.asarray(fn(params, jnp.asarray(np.asarray(images, np.float32))))


def tf_loss_and_adam_step(tf_model, images, label_ids, num_classes,
                          learning_rate=1e-3):
    """One reference train step: mean softmax-CE over all pixels
    (`fcn8s_tensorflow.py:253`) + Adam with TF1 defaults (`:256`).
    Returns (loss_before, updated weights dict name -> [kernel, bias])."""
    import tensorflow as tf

    opt = tf.keras.optimizers.Adam(learning_rate, beta_1=0.9, beta_2=0.999,
                                   epsilon=1e-8)
    one_hot = tf.one_hot(np.asarray(label_ids), num_classes)
    x = tf.constant(np.asarray(images, np.float32))
    with tf.GradientTape() as tape:
        logits = tf_model(x, training=False)
        loss = tf.reduce_mean(
            tf.nn.softmax_cross_entropy_with_logits(labels=one_hot, logits=logits)
        )
    grads = tape.gradient(loss, tf_model.trainable_variables)
    opt.apply_gradients(zip(grads, tf_model.trainable_variables))
    weights = {}
    for layer in tf_model.layers:
        if layer.weights:
            weights[layer.name] = [w.numpy() for w in layer.weights]
    return float(loss), weights


def tf_train_trajectory(tf_model, images, label_ids, num_classes,
                        learning_rate=1e-3, steps=5):
    """Loss sequence over several reference train steps (one persistent
    Adam optimizer, dropout off — the multi-step extension of
    ``tf_loss_and_adam_step``)."""
    import tensorflow as tf

    opt = tf.keras.optimizers.Adam(learning_rate, beta_1=0.9, beta_2=0.999,
                                   epsilon=1e-8)
    one_hot = tf.one_hot(np.asarray(label_ids), num_classes)
    x = tf.constant(np.asarray(images, np.float32))
    losses = []
    for _ in range(steps):
        with tf.GradientTape() as tape:
            logits = tf_model(x, training=False)
            loss = tf.reduce_mean(
                tf.nn.softmax_cross_entropy_with_logits(labels=one_hot,
                                                        logits=logits)
            )
        grads = tape.gradient(loss, tf_model.trainable_variables)
        opt.apply_gradients(zip(grads, tf_model.trainable_variables))
        losses.append(float(loss))
    return losses


def compare_logits(a, b) -> dict:
    """Parity stats between two (N,H,W,C) fp32 logit arrays."""
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    diff = np.abs(a - b)
    scale = max(np.abs(a).max(), 1e-12)
    return {
        "max_abs_diff": float(diff.max()),
        "max_rel_diff": float(diff.max() / scale),
        "logit_scale": float(np.abs(a).max()),
        "argmax_agreement": float(
            (np.argmax(a, -1) == np.argmax(b, -1)).mean()
        ),
    }


def main():
    import json

    import jax

    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s

    # Force CPU so the harness runs identically everywhere (fp32 CPU vs fp32
    # CPU — removes backend rounding from the comparison).
    jax.config.update("jax_platforms", "cpu")

    num_classes = 20
    params = init_fcn8s(jax.random.PRNGKey(0), num_classes)
    tf_model = build_tf_reference_model(num_classes)
    copy_params_to_tf(params, tf_model)

    from glob import glob

    from PIL import Image

    paths = sorted(glob("/root/reference/example_images/*_plain.png"))[:2]
    images = np.stack([np.asarray(Image.open(p).convert("RGB")) for p in paths])

    lt = tf_forward(tf_model, images)
    lj = jax_forward(params, images)
    print(json.dumps(compare_logits(lt, lj), indent=2))


if __name__ == "__main__":
    main()
