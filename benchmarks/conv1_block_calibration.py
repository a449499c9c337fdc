"""Calibration: can Pallas hit the throughput the fused conv1-block kernel
needs? Emulates the conv1_2 fwd core (the dominant matmul pattern): per
8-row tile, 3 K=128-packed + 3 K=64 matmuls of M=4096 with f32 accumulation,
relu, store. Grid = 1024 tiles (= N8 x H1024 at TH=8).

If this measures >= ~2.5 ms, the fused block can't beat XLA's conv family
enough to justify building it; ~1.5 ms or less says proceed.

MEASURED (v5e, 2026-08-17, one process back-to-back so the ratio holds even
under tunnel load): Pallas emulation 14.36 ms (21.5 TFLOPs effective) vs
XLA's real conv1_2 fwd 9.49 ms (32.6 TFLOPs) on the same 309 GFLOP. The
Pallas formulation (K-packed kx pairs, M=4096 row tiles) is 1.5x SLOWER
than XLA's conv emitter before any halo/edge/backward logic is added —
the fused conv1-block kernel cannot win and is closed as a negative
result (TODO.md). The N=64 output-lane ceiling plus Mosaic's per-tile
concat/slice overheads are the binding constraints; XLA's emitter already
packs the same MXU better in its native padded layout.
"""
import sys, time
from functools import partial
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8
W = 512
C = 64
TILES = 1024


def kernel(x_ref, w128_ref, w64_ref, out_ref):
    # x_ref: (TH+2, W, C) input rows incl halo
    acc = jnp.zeros((TH * W, C), jnp.float32)
    for ky in range(3):
        a = x_ref[ky:ky + TH].reshape(TH * W, C)
        a2 = jnp.concatenate([a, a], axis=-1)  # stands in for the kx pair
        acc += jnp.dot(a2, w128_ref[ky], preferred_element_type=jnp.float32)
        acc += jnp.dot(a, w64_ref[ky], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.maximum(acc, 0.0).astype(out_ref.dtype).reshape(TH, W, C)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((TILES * TH + 2, W, C)), jnp.bfloat16)
    w128 = jnp.asarray(rng.standard_normal((3, 2 * C, C)), jnp.bfloat16)
    w64 = jnp.asarray(rng.standard_normal((3, C, C)), jnp.bfloat16)

    # overlapping halo blocks are not expressible in BlockSpec units;
    # for calibration read disjoint (TH+2 -> pad to TH block + reread) —
    # emulate with block (TH, W, C) and shifting inside isn't possible, so
    # instead use stride trick: feed x twice with offset index maps.
    def kernel2(xa_ref, xb_ref, w128_ref, w64_ref, out_ref):
        # xa: rows [i*TH .. i*TH+8), xb: rows [i*TH+8 .. i*TH+16) (next tile)
        full = jnp.concatenate([xa_ref[:], xb_ref[:2]], axis=0)  # (TH+2, W, C)
        acc = jnp.zeros((TH * W, C), jnp.float32)
        for ky in range(3):
            a = full[ky:ky + TH].reshape(TH * W, C)
            a2 = jnp.concatenate([a, a], axis=-1)
            acc += jnp.dot(a2, w128_ref[ky], preferred_element_type=jnp.float32)
            acc += jnp.dot(a, w64_ref[ky], preferred_element_type=jnp.float32)
        out_ref[:] = jnp.maximum(acc, 0.0).astype(out_ref.dtype).reshape(TH, W, C)

    xmain = x[: TILES * TH]
    xnext = jnp.roll(x[: TILES * TH], -TH, axis=0)

    fn = pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((TILES * TH, W, C), jnp.bfloat16),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 2 * C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    jit = jax.jit(lambda a, b, c, d: fn(a, b, c, d).astype(jnp.float32).sum())
    for _ in range(3):
        r = jit(xmain, xnext, w128, w64)
    float(r)
    t0 = time.time()
    for _ in range(10):
        r = jit(xmain, xnext, w128, w64)
    float(r)
    dt = (time.time() - t0) / 10 * 1e3
    flops = TILES * (TH * W) * (3 * 128 * C + 3 * C * C) * 2
    print(f"conv1_2-core emulation: {dt:.2f} ms  ({flops/1e9:.0f} GFLOP -> {flops/dt/1e9:.1f} TFLOPs)")

    # reference point: XLA's real conv1_2 fwd on the same data volume
    from jax import lax
    xc = jnp.asarray(rng.standard_normal((8, 1024, W, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    conv = jax.jit(lambda x, k: jnp.maximum(lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), 0
    ).astype(jnp.float32).sum())
    for _ in range(3):
        r = conv(xc, k)
    float(r)
    t0 = time.time()
    for _ in range(10):
        r = conv(xc, k)
    float(r)
    dt2 = (time.time() - t0) / 10 * 1e3
    cflops = 8 * 1024 * W * 9 * C * C * 2
    print(f"XLA conv1_2 fwd (incl relu+reduce): {dt2:.2f} ms ({cflops/dt2/1e9:.1f} TFLOPs)")


if __name__ == "__main__":
    main()
