"""TF SavedModel interop: deploy/export trained models into the reference's
ecosystem, and pull full models back.

The reference's serving artifact is a TF SavedModel
(`/root/reference/fcn8s_tensorflow.py:922-925`). This tool closes the
migration loop in BOTH directions:

* ``export_tf_savedmodel`` — take this framework's checkpoint (or live
  params) and write a TF SavedModel with a ``serving_default`` signature
  (uint8 RGB image -> fp32 logits + int argmax ids), built on the parity
  harness's layer-exact TF reconstruction of the reference graph
  (`tools/parity_harness.py`; logits agree with the JAX model to ~1e-7,
  see PARITY.md). Consumable by TF Serving / TF-Lite conversion / any TF
  pipeline the reference's users already run.
* ``load_tf_savedmodel_params`` — read a SavedModel produced by this
  exporter (or any Keras save of the harness graph) back into a JAX param
  tree. (For the reference's original *encoder-only* "Udacity" protobuf
  use ``tools/import_vgg16.py``; a full TF1 reference training checkpoint
  additionally carries the decoder under the variable names
  ``pool3_1x1/kernel … fc7_pool4_pool3_conv2d_trans/bias`` — mapped here
  by ``REFERENCE_DECONV_NAMES``.)

Run:  python tools/tf_interop.py export <checkpoint_dir> <out_dir>
Used by tests/test_tf_interop.py (slow).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tools.parity_harness import build_tf_reference_model, copy_params_to_tf

# our decoder layer name -> the reference TF1 graph's variable prefix
# (`/root/reference/fcn8s_tensorflow.py:180,191,200,211,222,233`)
REFERENCE_DECONV_NAMES = {
    "pool3_1x1": "pool3_1x1",
    "pool4_1x1": "pool4_1x1",
    "fc7_1x1": "fc7_1x1",
    "fc7_deconv": "fc7_conv2d_trans",
    "fc7_pool4_deconv": "fc7_pool4_conv2d_trans",
    "fc7_pool4_pool3_deconv": "fc7_pool4_pool3_conv2d_trans",
}


def _load_params(checkpoint_dir: str):
    """Checkpoint dir -> (params tree, model_config dict)."""
    import jax

    from fcn8s_tensorflow_tpu.engine import checkpoint as ckpt
    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s

    meta = ckpt.load_metadata(checkpoint_dir)
    cfg = meta["model_config"]
    example = init_fcn8s(
        jax.random.PRNGKey(0), cfg["num_classes"],
        width_mult=cfg.get("width_mult", 1.0),
        fc_channels=cfg.get("fc_channels"),
        variant=cfg.get("variant", "fcn8s"),
    )
    return ckpt.load_params_only(checkpoint_dir, example), cfg


def export_tf_savedmodel(source, out_dir: str, *, num_classes=None,
                         width_mult=1.0, fc_channels=None,
                         variant=None) -> str:
    """Write a TF SavedModel. ``source``: a checkpoint directory (config is
    read from its manifest) or a params pytree (then pass the config kwargs;
    ``variant`` defaults to inferring from the decoder key set). All three
    FCN family members export (`fcn8s_tensorflow.py:154-237` generalized —
    the reference graph itself only exists for fcn8s).
    Returns ``out_dir``."""
    import tensorflow as tf

    from fcn8s_tensorflow_tpu.models.fcn8s import decoder_variant

    if isinstance(source, str):
        params, cfg = _load_params(source)
        num_classes = cfg["num_classes"]
        width_mult = cfg.get("width_mult", 1.0)
        fc_channels = cfg.get("fc_channels")
        variant = cfg.get("variant", "fcn8s")
    else:
        params = source
        if num_classes is None:
            raise ValueError("num_classes required when passing a params tree")
    if variant is None:
        variant = decoder_variant(params["decoder"])

    # gather once: per-leaf np.asarray on a remote accelerator costs a
    # round-trip each (slow on tunneled devices)
    import jax

    params = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)

    tf_model = build_tf_reference_model(
        num_classes, width_mult=width_mult, fc_channels=fc_channels,
        variant=variant,
    )
    copy_params_to_tf(params, tf_model)

    class Served(tf.Module):
        def __init__(self, model):
            super().__init__()
            self.model = model

        @tf.function(input_signature=[
            tf.TensorSpec([None, None, None, 3], tf.uint8, name="image")
        ])
        def serve(self, image):
            logits = self.model(tf.cast(image, tf.float32), training=False)
            return {
                "logits": logits,
                "argmax": tf.argmax(logits, axis=-1, output_type=tf.int32),
            }

    served = Served(tf_model)
    tf.saved_model.save(served, out_dir,
                        signatures={"serving_default": served.serve})
    return out_dir


def load_tf_savedmodel_params(savedmodel_dir: str, example_params) -> dict:
    """SavedModel (from ``export_tf_savedmodel``) -> JAX param tree shaped
    like ``example_params``. Matches variables by the layer-scoped names the
    Keras build assigns (``<layer>/kernel|bias``); deconv kernels get the
    inverse flip/transpose (an involution — see parity_harness docstring)."""
    import tensorflow as tf

    loaded = tf.saved_model.load(savedmodel_dir)
    by_name: dict[str, np.ndarray] = {}
    # the serving signature captures every layer variable, names intact
    # ("conv1_1/kernel:0"); the restored root _UserObject itself exposes no
    # .variables in TF 2.21
    for v in loaded.signatures["serving_default"].variables:
        by_name[v.name.rsplit(":", 1)[0]] = v.numpy()

    out = {"encoder": {}, "decoder": {}}
    for tree_name, tree in (("encoder", example_params["encoder"]),
                            ("decoder", example_params["decoder"])):
        for layer in tree:
            kernel = by_name[f"{layer}/kernel"]
            bias = by_name[f"{layer}/bias"]
            if layer.endswith("deconv"):
                kernel = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
            want = tree[layer]["kernel"].shape
            if tuple(kernel.shape) != tuple(want):
                raise ValueError(
                    f"{layer}: SavedModel kernel {kernel.shape} != expected {want}"
                )
            out[tree_name][layer] = {
                "kernel": kernel.astype(np.float32),
                "bias": bias.astype(np.float32),
            }
    return out


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3 or argv[0] != "export":
        print(__doc__)
        return 1
    out = export_tf_savedmodel(argv[1], argv[2])
    print(f"exported TF SavedModel to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
