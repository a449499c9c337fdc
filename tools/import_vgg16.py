"""Pretrained VGG-16 encoder weight import.

The reference's encoder only exists as a downloaded SavedModel protobuf with
variables named ``conv1_1/filter`` ... ``conv5_3/filter``, ``fc6/weights``,
``fc7/weights`` (the "Udacity CarND" convolutionalized VGG-16 —
`/root/reference/fcn8s_tensorflow.py:127-152,343-350`). This tool converts
pretrained weights from either of two sources into this framework's
checkpoint format, loadable via ``FCN8s(vgg16_dir=...)``:

* a TF SavedModel in that format (``--tf-savedmodel DIR [--tag vgg16]``);
* a torchvision VGG-16 state_dict (``--torch-state-dict FILE``), whose fc
  layers are *convolutionalized* here (fc6: (4096, 25088) -> 7x7x512x4096,
  fc7: (4096, 4096) -> 1x1x4096x4096) exactly as the FCN paper prescribes.

Usage:
    python tools/import_vgg16.py --tf-savedmodel /path/to/vgg --out /ckpt/vgg16
    python tools/import_vgg16.py --torch-state-dict vgg16.pth --out /ckpt/vgg16
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from fcn8s_tensorflow_tpu.engine.checkpoint import save_checkpoint  # noqa: E402
from fcn8s_tensorflow_tpu.models.vgg16 import (  # noqa: E402
    VGG16_CONV_LAYERS,
    VGG_MEAN_RGB,
)

# torchvision vgg16.features indices of the 13 conv layers, in order.
_TORCH_FEATURE_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]

# torchvision preprocessing: inputs scaled to [0,1], ImageNet-normalized.
TORCH_IMAGENET_MEAN = (0.485, 0.456, 0.406)
TORCH_IMAGENET_STD = (0.229, 0.224, 0.225)


def _fold_torch_preprocessing(kernel: np.ndarray, bias: np.ndarray):
    """Fold torchvision's input preprocessing into conv1_1.

    torchvision VGG-16 sees ``t = (x/255 - mean)/std``; ``apply_vgg16``
    always feeds Caffe-style ``u = x - VGG_MEAN_RGB`` on 0..255 inputs
    (`models/vgg16.py:106-108`). Without this fold an imported encoder
    receives inputs ~255x out of scale. Writing ``t_c = a_c*u_c +
    a_c*resid_c`` with ``a_c = 1/(255*std_c)`` and ``resid_c =
    VGG_MEAN_RGB_c - 255*mean_c`` gives the exact interior-pixel-equivalent
    conv:  ``kernel' = kernel*a_c`` (per input channel), ``bias' = bias +
    sum_{h,w,c} kernel'[h,w,c,:] * resid_c``. (At SAME-padded borders both
    schemes zero-pad *their own* normalized input, so border rows differ by
    the padding convention — inherent to any mean-folding, not this one.)"""
    a = 1.0 / (255.0 * np.asarray(TORCH_IMAGENET_STD, np.float32))
    resid = (np.asarray(VGG_MEAN_RGB, np.float32)
             - 255.0 * np.asarray(TORCH_IMAGENET_MEAN, np.float32))
    folded = kernel * a[None, None, :, None]
    bias_adj = np.einsum("hwco,c->o", folded, resid)
    return folded, bias + bias_adj


def _as_encoder_tree(kernels: dict, biases: dict) -> dict:
    encoder = {}
    for name, in_ch, out_ch in VGG16_CONV_LAYERS:
        k = np.asarray(kernels[name], np.float32)
        if k.shape != (3, 3, in_ch, out_ch):
            raise ValueError(f"{name}: kernel shape {k.shape} != (3,3,{in_ch},{out_ch})")
        encoder[name] = {"kernel": k, "bias": np.asarray(biases[name], np.float32)}
    for name, shape in [("fc6", (7, 7, 512, 4096)), ("fc7", (1, 1, 4096, 4096))]:
        k = np.asarray(kernels[name], np.float32)
        if k.shape != shape:
            raise ValueError(f"{name}: kernel shape {k.shape} != {shape}")
        encoder[name] = {"kernel": k, "bias": np.asarray(biases[name], np.float32)}
    return encoder


def from_tf_savedmodel(savedmodel_dir: str, tag: str = "vgg16") -> dict:
    """Load the Udacity-format SavedModel and extract the encoder weights.
    Accepts ``filter``/``weights`` kernel names and ``biases``/``bias``."""
    import tensorflow as tf

    kernels, biases = {}, {}
    layer_names = [name for name, _, _ in VGG16_CONV_LAYERS] + ["fc6", "fc7"]
    with tf.Graph().as_default():
        with tf.compat.v1.Session() as sess:
            tf.compat.v1.saved_model.loader.load(sess, [tag], savedmodel_dir)
            # Read variable VALUES (not the ':0' tensors — under TF2 resource
            # variables those are resource handles, not the weights).
            variables = {v.op.name: v for v in tf.compat.v1.global_variables()}
            values = dict(zip(variables.keys(), sess.run(list(variables.values()))))

            def fetch(names):
                for n in names:
                    if n in values:
                        return values[n]
                raise KeyError(f"none of {names} found among SavedModel variables "
                               f"{sorted(values)[:8]}...")

            for layer in layer_names:
                kernels[layer] = fetch([f"{layer}/filter", f"{layer}/weights",
                                        f"{layer}/kernel"])
                biases[layer] = fetch([f"{layer}/biases", f"{layer}/bias"])
    return _as_encoder_tree(kernels, biases)


def from_torch_state_dict(state_dict) -> dict:
    """Convert a torchvision ``vgg16`` state_dict: conv kernels OIHW -> HWIO,
    classifier fc6/fc7 matrices convolutionalized (the FCN recipe)."""
    import torch

    def npy(t):
        return t.detach().cpu().numpy() if isinstance(t, torch.Tensor) else np.asarray(t)

    kernels, biases = {}, {}
    for (name, _, _), idx in zip(VGG16_CONV_LAYERS, _TORCH_FEATURE_IDX):
        w = npy(state_dict[f"features.{idx}.weight"])  # (O, I, H, W)
        kernels[name] = w.transpose(2, 3, 1, 0)  # -> (H, W, I, O)
        biases[name] = npy(state_dict[f"features.{idx}.bias"])
    # fc6: (4096, 25088) where 25088 = 512*7*7 in torch's (C, H, W) flatten order
    w6 = npy(state_dict["classifier.0.weight"]).reshape(4096, 512, 7, 7)
    kernels["fc6"] = w6.transpose(2, 3, 1, 0)  # -> (7, 7, 512, 4096)
    biases["fc6"] = npy(state_dict["classifier.0.bias"])
    w7 = npy(state_dict["classifier.3.weight"])  # (4096, 4096)
    kernels["fc7"] = w7.T[None, None]  # -> (1, 1, 4096, 4096)
    biases["fc7"] = npy(state_dict["classifier.3.bias"])
    # torchvision expects [0,1]-scaled ImageNet-normalized inputs; fold that
    # into conv1_1 so apply_vgg16's Caffe-style pipeline feeds it correctly.
    kernels["conv1_1"], biases["conv1_1"] = _fold_torch_preprocessing(
        kernels["conv1_1"], biases["conv1_1"]
    )
    return _as_encoder_tree(kernels, biases)


def save_encoder(encoder: dict, out_dir: str, source: str) -> str:
    """Write an encoder-only checkpoint loadable by ``FCN8s(vgg16_dir=...)``."""
    return save_checkpoint(
        out_dir,
        {"encoder": encoder},
        {"source": source, "format": "vgg16-encoder",
         "model_config": {"num_classes": None}},
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tf-savedmodel")
    p.add_argument("--tag", default="vgg16")
    p.add_argument("--torch-state-dict")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if bool(args.tf_savedmodel) == bool(args.torch_state_dict):
        p.error("exactly one of --tf-savedmodel / --torch-state-dict required")
    if args.tf_savedmodel:
        encoder = from_tf_savedmodel(args.tf_savedmodel, args.tag)
        source = f"tf_savedmodel:{args.tf_savedmodel}"
    else:
        import torch

        encoder = from_torch_state_dict(torch.load(args.torch_state_dict, map_location="cpu"))
        source = f"torch:{args.torch_state_dict}"
    out = save_encoder(encoder, args.out, source)
    n_params = sum(int(np.prod(v[k].shape)) for v in encoder.values() for k in v)
    print(f"wrote {out} ({n_params / 1e6:.1f}M params)")
    return out


if __name__ == "__main__":
    main()
