"""Device mesh construction and sharding specs.

The reference is single-process single-device (SURVEY.md §2: no DP/TP/PP, no
collective backend). Here parallelism is first-class and degenerates cleanly
to 1 chip:

* axis ``data``  — batch (data parallelism); gradients are reduced by the
  ``psum`` XLA inserts for the replicated-param out-sharding.
* axis ``model`` — tensor parallelism for the two giant encoder layers
  (fc6: 7x7x512x4096, fc7: 1x1x4096x4096 — together ~119M of the ~134M
  params). fc6 is column-parallel (output channels sharded), fc7
  row-parallel (input channels sharded), the Megatron pairing: the only
  collective on the activation path is one all-reduce after fc7, which XLA's
  GSPMD derives from the param shardings and routes over ICI.

Everything is expressed as ``NamedSharding`` / ``PartitionSpec`` annotations
on a ``jax.sharding.Mesh``; XLA inserts the collectives. Multi-host (DCN)
extends the same mesh via ``jax.distributed`` without code changes here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a 2-D ('data', 'model') mesh. ``data=None`` uses all remaining
    devices. On one chip this is the degenerate (1, 1) mesh."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        if len(devices) % model:
            raise ValueError(f"{len(devices)} devices not divisible by model={model}")
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {len(devices)}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Batch tensors: sharded along the leading (batch) dim over 'data',
    replicated over 'model'."""
    return P(DATA_AXIS)


def spatial_spec() -> P:
    """Spatial partitioning (the sequence-parallelism analog for a CNN —
    SURVEY.md §2): batch over 'data' AND the width dim over 'model'. XLA
    GSPMD inserts the convolution halo exchanges over ICI automatically.
    For mega-resolution inference where one chip can't hold the
    activations. W must be divisible by 32 (the model's stride) as usual;
    alignment of shard boundaries to the stride is not required (GSPMD
    inserts the necessary halos/padding — validated for W=96 on 4 shards).
    Keep W/32 >= the 'model'-axis size: when the stride-32 tap is narrower
    than the shard count, GSPMD's degenerate-dim padding makes results
    diverge slightly from the unsharded graph (observed ~0.2% of argmax
    pixels at W=32 on 4 shards; bit-exact at W/32 >= shards). Not a real
    deployment regime — spatial partitioning exists for W >> 32."""
    return P(DATA_AXIS, None, MODEL_AXIS)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec_tree(params, *, tensor_parallel: bool = True):
    """PartitionSpec pytree for a full FCN-8s param tree.

    With ``tensor_parallel`` and a >1 'model' axis, fc6 is column-parallel
    and fc7 row-parallel; all other (small) params replicate. The decoder is
    tiny (num_classes channels) and always replicates.
    """

    def spec_for(path: tuple[str, ...], leaf) -> P:
        if not tensor_parallel:
            return P()
        if "fc6" in path:
            if path[-1] == "kernel":
                return P(None, None, None, MODEL_AXIS)  # HWIO: shard O
            return P(MODEL_AXIS)  # bias follows output channels
        if "fc7" in path and path[-1] == "kernel":
            return P(None, None, MODEL_AXIS, None)  # HWIO: shard I
        return P()

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return spec_for(path, tree)

    return walk(params)


def param_sharding_tree(mesh: Mesh, params, *, tensor_parallel: bool = True):
    """NamedSharding pytree matching ``params``."""
    specs = param_spec_tree(params, tensor_parallel=tensor_parallel)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_batch(mesh: Mesh, *arrays):
    """Host numpy batch -> device arrays sharded over the 'data' axis."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out
