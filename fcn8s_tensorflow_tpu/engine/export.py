"""Portable serving artifacts via ``jax.export`` (StableHLO).

The reference's deployment artifact is a TF1 SavedModel
(`/root/reference/fcn8s_tensorflow.py:922-925`); this framework ships a TF
SavedModel interop path for that ecosystem (tools/tf_interop.py). THIS
module is the JAX-native equivalent: the compiled inference function is
serialized as a **StableHLO module** (``jax.export``) next to a params-only
checkpoint, so any JAX process — any future jaxlib, CPU/GPU/TPU, no access
to this package's model code — can load and run the exact traced
computation. The batch dimension is exported symbolically, so ONE artifact
serves every batch size; H/W are static (XLA-friendly — resize or tile on
the host to the exported resolution, the same contract a compiled TF
SavedModel signature has).

Artifact layout::

    <dir>/forward.stablehlo   serialized jax.export.Exported: f(params, uint8 NHWC images)
    <dir>/params/             params-only checkpoint (engine/checkpoint.py format)
    <dir>/manifest.json       input spec + head type + model config

Produce with ``FCN8s.export_serving(dir)`` (or ``export_serving_artifact``),
consume with ``load_serving_artifact(dir).predict(images)``.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import checkpoint as ckpt

ARTIFACT_VERSION = 1
_MANIFEST = "manifest.json"
_MODULE = "forward.stablehlo"


def export_serving_artifact(model, directory: str, *, input_hw=(1024, 512),
                            argmax: bool = True, use_ema: bool = False) -> str:
    """Serialize ``model``'s inference head for ``input_hw`` inputs into
    ``directory``. ``argmax=True`` exports the class-id head (uint8 ids for
    <=255 classes), ``argmax=False`` the full softmax head. ``use_ema``
    exports the EMA weight average instead of the live params. The batch
    dim is symbolic: the artifact accepts any N at load time."""
    from ..parallel.steps import predict_step

    h, w = int(input_hw[0]), int(input_hw[1])
    if h % 32 or w % 32:
        raise ValueError(f"input_hw must be divisible by 32, got {(h, w)}")
    params = (model._resolve_ema(use_ema, False) if use_ema
              else model.state.params)
    params = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), params)

    compact = argmax and model.num_classes <= 255
    fn = partial(predict_step, argmax=argmax,
                 compute_dtype=model.compute_dtype,
                 id_dtype=jnp.uint8 if compact else jnp.int32)
    (b,) = jax.export.symbolic_shape("b")
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params)
    image_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
    # plain single-device jit: the portable artifact carries no mesh; the
    # consumer shards (or doesn't) on its own topology
    exported = jax.export.export(jax.jit(fn))(param_specs, image_spec)

    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, _MODULE), "wb") as f:
        f.write(exported.serialize())
    ckpt.save_checkpoint(os.path.join(directory, "params"), params,
                         {"model_config": model.model_config})
    manifest = {
        "artifact_version": ARTIFACT_VERSION,
        "input_hw": [h, w],
        "argmax": argmax,
        "id_dtype": "uint8" if compact else "int32",
        "num_classes": model.num_classes,
        "compute_dtype": jnp.dtype(model.compute_dtype).name,
        "ema": bool(use_ema),
        "model_config": model.model_config,
    }
    with open(os.path.join(directory, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    return directory


class ServingArtifact:
    """A loaded StableHLO serving artifact: ``predict(images)`` with the
    facade's output conventions (int32 argmax ids / float32 softmax)."""

    def __init__(self, directory: str):
        manifest_path = os.path.join(directory, _MANIFEST)
        if not os.path.isfile(manifest_path):
            raise FileNotFoundError(
                f"'{directory}' is not a serving artifact (missing {_MANIFEST}).")
        with open(manifest_path) as f:
            self.manifest = json.load(f)
        version = self.manifest.get("artifact_version")
        if version != ARTIFACT_VERSION:
            raise ValueError(
                f"serving artifact at '{directory}' has artifact_version "
                f"{version}; this library reads version {ARTIFACT_VERSION}.")
        with open(os.path.join(directory, _MODULE), "rb") as f:
            self._exported = jax.export.deserialize(bytearray(f.read()))
        self.params, _ = ckpt.load_params_tree(os.path.join(directory, "params"))
        self.input_hw = tuple(self.manifest["input_hw"])
        self.argmax = self.manifest["argmax"]
        self.num_classes = self.manifest["num_classes"]
        # jit around Exported.call: compiles once per batch size, then
        # executes from cache (Exported.call alone re-stages every call)
        self._jitted = jax.jit(self._exported.call)

    def predict(self, images) -> np.ndarray:
        """``images``: (N, H, W, 3) or (H, W, 3) uint8 at the exported
        resolution. Returns int32 class ids (argmax artifact) or float32
        class probabilities (softmax artifact)."""
        images = np.asarray(images, dtype=np.uint8)
        if images.ndim == 3:
            images = images[None]
        h, w = images.shape[1:3]
        if (h, w) != self.input_hw:
            raise ValueError(
                f"artifact was exported for {self.input_hw} inputs, got "
                f"{(h, w)} — resize or tile on the host first.")
        out = np.asarray(jax.device_get(self._jitted(self.params, images)))
        return out.astype(np.int32) if self.argmax else out.astype(np.float32)


def load_serving_artifact(directory: str) -> ServingArtifact:
    return ServingArtifact(directory)
