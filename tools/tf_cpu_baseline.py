"""One-time measurement of the TF-on-CPU reference-equivalent baseline.

The reference (TF1, pierluigiferrari/fcn8s_tensorflow) publishes no
throughput numbers and its pretrained VGG-16 SavedModel is not available in
this environment, so we measure an *equivalent* model — same layer stack
(VGG-16 conv layers + 7x7/4096 fc6 + 1x1/4096 fc7 + FCN-8s decoder), same
resolution, Adam, softmax CE — built in TF on CPU, which is what the
reference's own GPU warning says it falls back to ("will be unbearably slow
without a GPU", fcn8s_tensorflow.py:506-507).

The resulting images/sec goes into bench.py as BASELINE_TF_CPU_IMGS_PER_SEC
with provenance. Run: python tools/tf_cpu_baseline.py [height width batch steps]
"""

import json
import sys
import time

import numpy as np
import tensorflow as tf

H, W, BATCH, STEPS = 1024, 512, 1, 3
if len(sys.argv) > 1:
    H, W, BATCH, STEPS = map(int, sys.argv[1:5])
NUM_CLASSES = 20

tf.config.set_visible_devices([], "GPU")


def build_model():
    x = inp = tf.keras.Input((H, W, 3), batch_size=BATCH)
    cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
    taps = {}
    for bi, (ch, n) in enumerate(cfg, 1):
        for li in range(1, n + 1):
            x = tf.keras.layers.Conv2D(ch, 3, padding="same", activation="relu",
                                       name=f"conv{bi}_{li}")(x)
        x = tf.keras.layers.MaxPool2D(2, 2, padding="same", name=f"pool{bi}")(x)
        taps[f"pool{bi}"] = x
    x = tf.keras.layers.Conv2D(4096, 7, padding="same", activation="relu", name="fc6")(x)
    x = tf.keras.layers.Dropout(0.5)(x)
    x = tf.keras.layers.Conv2D(4096, 1, padding="same", activation="relu", name="fc7")(x)
    x = tf.keras.layers.Dropout(0.5)(x)
    p3 = tf.keras.layers.Conv2D(NUM_CLASSES, 1, name="pool3_1x1")(taps["pool3"] * 1e-4)
    p4 = tf.keras.layers.Conv2D(NUM_CLASSES, 1, name="pool4_1x1")(taps["pool4"] * 1e-2)
    f7 = tf.keras.layers.Conv2D(NUM_CLASSES, 1, name="fc7_1x1")(x)
    u1 = tf.keras.layers.Conv2DTranspose(NUM_CLASSES, 4, 2, padding="same")(f7) + p4
    u2 = tf.keras.layers.Conv2DTranspose(NUM_CLASSES, 4, 2, padding="same")(u1) + p3
    out = tf.keras.layers.Conv2DTranspose(NUM_CLASSES, 16, 8, padding="same")(u2)
    return tf.keras.Model(inp, out)


def main():
    model = build_model()
    opt = tf.keras.optimizers.Adam(1e-4)
    images = tf.constant(np.random.randint(0, 255, (BATCH, H, W, 3)).astype(np.float32))
    labels = tf.constant(np.eye(NUM_CLASSES, dtype=np.float32)[
        np.random.randint(0, NUM_CLASSES, (BATCH, H, W))])

    @tf.function
    def step():
        with tf.GradientTape() as tape:
            logits = model(images, training=True)
            loss = tf.reduce_mean(tf.nn.softmax_cross_entropy_with_logits(labels, logits))
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    @tf.function
    def infer():
        return tf.argmax(model(images, training=False), axis=-1)

    step()  # trace + compile
    t0 = time.time()
    for _ in range(STEPS):
        step()
    train_dt = (time.time() - t0) / STEPS

    infer()
    t0 = time.time()
    for _ in range(STEPS):
        infer()
    infer_dt = (time.time() - t0) / STEPS

    print(json.dumps({
        "train_images_per_sec": BATCH / train_dt,
        "infer_images_per_sec": BATCH / infer_dt,
        "train_sec_per_step": train_dt,
        "config": {"h": H, "w": W, "batch": BATCH, "steps": STEPS, "device": "cpu",
                   "tf": tf.__version__},
    }))


if __name__ == "__main__":
    main()
