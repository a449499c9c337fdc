"""Orbax checkpoint interop: move weights between this framework's
self-describing msgpack checkpoints and the JAX ecosystem's standard
checkpoint format (orbax.checkpoint).

Scope is the PARAMS tree (the portable artifact — optimizer state is
optimizer-shaped and stays in the native format, like the reference's
`tf.train.Saver` variables vs its SavedModel split,
`/root/reference/fcn8s_tensorflow.py:857-944`):

* ``export_params_to_orbax(ckpt_dir, orbax_dir)`` — our checkpoint's params
  as an orbax PyTree checkpoint (nested dict of named arrays) +
  the manifest stored alongside as ``fcn8s_manifest.json``. Readable by any
  orbax consumer (``StandardCheckpointer().restore``), e.g. to warm-start a
  flax/haiku reimplementation or publish weights.
* ``import_params_from_orbax(orbax_dir, ckpt_dir)`` — an orbax PyTree
  checkpoint (same layer naming) back into a params-only msgpack checkpoint
  loadable with ``FCN8s(variables_load_dir=...)`` / ``vgg16_dir=...``
  (encoder subtree).

The params tree is reconstructed from the manifest's ``param_paths`` (no
live model needed), so this runs standalone on a CPU-only host.

CLI:
    python tools/orbax_interop.py export <our_ckpt_dir> <orbax_dir>
    python tools/orbax_interop.py import <orbax_dir> <our_ckpt_dir>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from fcn8s_tensorflow_tpu.engine import checkpoint as ckpt  # noqa: E402

MANIFEST_NAME = "fcn8s_manifest.json"


# model-free params reconstruction now lives in the library proper
# (engine/checkpoint.py:load_params_tree); kept as an alias for callers
_params_tree_from_checkpoint = ckpt.load_params_tree


def export_params_to_orbax(checkpoint_dir: str, orbax_dir: str) -> str:
    """Our checkpoint -> orbax PyTree checkpoint (+ manifest sidecar)."""
    import orbax.checkpoint as ocp

    tree, meta = _params_tree_from_checkpoint(checkpoint_dir)
    orbax_dir = os.path.abspath(orbax_dir)
    with ocp.StandardCheckpointer() as saver:
        saver.save(orbax_dir, tree)
    with open(os.path.join(orbax_dir, MANIFEST_NAME), "w") as f:
        json.dump(meta, f, indent=2, default=float)
    return orbax_dir


def import_params_from_orbax(orbax_dir: str, checkpoint_dir: str,
                             metadata: dict | None = None) -> str:
    """Orbax PyTree checkpoint -> params-only msgpack checkpoint (loadable
    via ``FCN8s(variables_load_dir=...)``). ``metadata`` overrides the
    manifest sidecar if the orbax checkpoint came from elsewhere."""
    import orbax.checkpoint as ocp

    orbax_dir = os.path.abspath(orbax_dir)
    with ocp.StandardCheckpointer() as loader:
        tree = loader.restore(orbax_dir)
    if metadata is None:
        sidecar = os.path.join(orbax_dir, MANIFEST_NAME)
        if os.path.isfile(sidecar):
            with open(sidecar) as f:
                metadata = json.load(f)
            # drop stale step/loss: this is a params-only artifact
            metadata = {k: metadata[k] for k in ("model_config",)
                        if k in metadata}
        else:
            metadata = {}
    return ckpt.save_checkpoint(checkpoint_dir, tree, metadata)


def main(argv: list[str]) -> int:
    if len(argv) != 4 or argv[1] not in ("export", "import"):
        print(__doc__.split("CLI:")[-1].strip())
        return 1
    if argv[1] == "export":
        out = export_params_to_orbax(argv[2], argv[3])
        print(f"exported params -> orbax checkpoint at {out}")
    else:
        out = import_params_from_orbax(argv[2], argv[3])
        print(f"imported orbax params -> checkpoint at {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
