"""Pallas 2x2/s2 max-pool forward+backward pair (perf experiment).

Targets the pool1 tail of the train step (reference hot loop
`/root/reference/fcn8s_tensorflow.py:553-572`; our per-op profile: pool1
fwd ``fusion.513`` 1.9 ms + bwd ``select-and-scatter.4`` 3.6 ms at
8x1024x512, TODO.md). The XLA ops pay the conv1 block's lane-padded layout
(C=64 in 128 lanes -> every byte read twice); this kernel instead operates
on the *packed* 2-D view (N*H, W*C) where lanes are full:

* forward reads (2*TH, W*C) row pairs, reduces vertically by a sublane
  split and horizontally by viewing lanes as (W/2, 2C) and maxing the two
  C-wide halves — plus a 2-bit argmax code (stored uint8) with the exact
  first-maximum tie rule of ``lax.select_and_scatter`` (window order
  (r0,w0),(r0,w1),(r1,w0),(r1,w1));
* backward routes dy to the coded position without re-reading x (the XLA
  select-and-scatter re-reads the 537 MB input).

The catch, and why this is a recorded NEGATIVE RESULT rather than the
default: the producer (conv1_2) writes XLA's padded layout, so feeding the
kernel's packed view forces a relayout copy of the full tensor on the way
in (and the consumer conv2_1 relayouts the output back). MEASURED (v5e,
benchmarks/pallas_pool_bench.py, in-process steady-state, 2026-08-17):
standalone fwd+bwd pair on resident compact inputs 15.66 ms (Pallas) vs
16.63 ms (XLA) — a real but small win when no relayout is needed (both
numbers include undonated-output copies); full train step with pool1
swapped: **109.8 -> 117.3 ms (+7.5 ms)** — the boundary relayouts cost
more than the kernel saves. This closes TODO.md's "Pallas pool1 fwd+bwd
pair" lead (fourth and final formulation measured); the op is kept for
callers that already hold packed-layout data.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _fwd_kernel(x_ref, y_ref, idx_ref, *, c: int):
    # x_ref: (TH, 2, W/2, 2C) — the 4-D view is taken OUTSIDE in XLA (free
    # metadata on row-major); in-kernel lane-merge reshapes like
    # (TH,256,64)->(TH,16384) are Mosaic relayouts (rejected on real TPU)
    # compute in f32: the v5e VPU rejects bf16 comparisons ("Target does
    # not support this comparison"), and mixing f32 (8,128)-tiled masks
    # with bf16 (16,128)-tiled selects is an invalid i1 relayout — so the
    # whole select chain runs in one consistent f32 tiling
    x = x_ref[:].astype(jnp.float32)
    v0 = x[:, 0, :, :c]
    v1 = x[:, 0, :, c:]
    v2 = x[:, 1, :, :c]
    v3 = x[:, 1, :, c:]
    m = jnp.maximum(jnp.maximum(v0, v1), jnp.maximum(v2, v3))
    # first-max tie rule, window order v0,v1,v2,v3 (= select_and_scatter's).
    # The argmax code is stored in the INPUT dtype (0..3 exact in bf16):
    # a uint8 code forces Mosaic to relayout the (16,128)-tiled bf16
    # comparison masks to the (32,128) int8 tiling, which it rejects
    # ("Invalid relayout ... i1 ... (8,128) -> (32,128) replicated").
    # Select operands are full arrays for the same reason (no scalar
    # broadcast replication).
    u0 = jnp.zeros(m.shape, jnp.float32)
    idx = jnp.where(
        v0 == m, u0, jnp.where(v1 == m, u0 + 1, jnp.where(v2 == m, u0 + 2, u0 + 3))
    )
    y_ref[:] = m.astype(y_ref.dtype)
    idx_ref[:] = idx.astype(idx_ref.dtype)


def _bwd_kernel(dy_ref, idx_ref, dx_ref, *, c: int):
    # f32 compute for the same comparison/tiling constraints as the fwd
    d = dy_ref[:].astype(jnp.float32)
    ix = idx_ref[:].astype(jnp.float32)
    zero = jnp.zeros_like(d)

    def pick(j):
        return jnp.where(ix == (zero + j), d, zero)

    top = jnp.concatenate([pick(0), pick(1)], axis=-1)
    bot = jnp.concatenate([pick(2), pick(3)], axis=-1)
    dx_ref[:, 0] = top.astype(dx_ref.dtype)
    dx_ref[:, 1] = bot.astype(dx_ref.dtype)


def _check(shape):
    n, h, w, c = shape
    if h % 16 != 0 or w % 2 != 0:
        raise ValueError(f"pallas pool needs H%16==0 and even W, got {shape}")
    if not (c == 64 or c % 128 == 0):
        raise ValueError(f"pallas pool needs C==64 or C%128==0, got C={c}")


def _fwd_only_kernel(x_ref, y_ref, *, c: int):
    x = x_ref[:].astype(jnp.float32)
    m = jnp.maximum(
        jnp.maximum(x[:, 0, :, :c], x[:, 0, :, c:]),
        jnp.maximum(x[:, 1, :, :c], x[:, 1, :, c:]),
    )
    y_ref[:] = m.astype(y_ref.dtype)


def _fwd_impl(x, *, with_idx: bool = True, interpret: bool = False):
    n, h, w, c = x.shape
    _check(x.shape)
    rows2 = n * h // 2   # output rows
    w2 = w // 2
    x4 = x.reshape(rows2, 2, w2, 2 * c)
    th = 8
    out_block = pl.BlockSpec((th, w2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((th, 2, w2, 2 * c), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if not with_idx:
        # primal-only path: skip computing/writing the argmax tensor — a
        # pallas_call output cannot be DCE'd by XLA, so an inference-only
        # caller would otherwise pay a full output-sized HBM write
        y = pl.pallas_call(
            partial(_fwd_only_kernel, c=c),
            out_shape=jax.ShapeDtypeStruct((rows2, w2, c), x.dtype),
            grid=(rows2 // th,),
            in_specs=in_specs,
            out_specs=out_block,
            interpret=interpret,
        )(x4)
        return y.reshape(n, h // 2, w // 2, c), None
    y, idx = pl.pallas_call(
        partial(_fwd_kernel, c=c),
        out_shape=(
            jax.ShapeDtypeStruct((rows2, w2, c), x.dtype),
            jax.ShapeDtypeStruct((rows2, w2, c), x.dtype),
        ),
        grid=(rows2 // th,),
        in_specs=in_specs,
        out_specs=(out_block, out_block),
        interpret=interpret,
    )(x4)
    return y.reshape(n, h // 2, w // 2, c), idx


def _bwd_impl(dy, idx, out_shape, *, interpret: bool = False):
    n, h, w, c = out_shape
    rows2 = n * h // 2
    w2 = w // 2
    th = 8
    dy3 = dy.reshape(rows2, w2, c)
    dx = pl.pallas_call(
        partial(_bwd_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct((rows2, 2, w2, 2 * c), dy.dtype),
        grid=(rows2 // th,),
        in_specs=[
            pl.BlockSpec((th, w2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((th, w2, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, 2, w2, 2 * c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(dy3, idx)
    return dx.reshape(out_shape)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2_pallas(x, interpret: bool = False):
    """2x2/s2 VALID max pool (even H,W) with a saved-argmax Pallas backward.
    Gradient is bit-identical to ``lax.reduce_window``'s select-and-scatter
    including ties (tests/test_pallas.py)."""
    y, _ = _fwd_impl(x, with_idx=False, interpret=interpret)
    return y


def _vjp_fwd(x, interpret):
    y, idx = _fwd_impl(x, interpret=interpret)
    return y, (idx, x.shape)


def _vjp_bwd(interpret, res, dy):
    idx, x_shape = res
    return (_bwd_impl(dy, idx, x_shape, interpret=interpret),)


max_pool_2x2_pallas.defvjp(_vjp_fwd, _vjp_bwd)
