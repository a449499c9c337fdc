"""Buy-or-bury: int8 weight-gradient (wgrad) convolution for training.

TODO.md's last open perf idea: the fc6 wgrad is the largest single MXU op
in the train step (842 GFLOP @ batch 8, measured 4.8 ms fused with its
Adam update, ~bf16 roofline). The int8 MXU peak is 2x bf16, so an int8
wgrad could in principle halve it — IF the quantization overhead (two
max-abs reductions + casts over the operands, extra HBM passes) and the
accuracy loss don't eat the win.

This benchmark measures, in ONE process on the real chip:
  1. bf16 wgrad (the production formulation XLA emits under jax.grad),
  2. the same contraction expressed directly as a conv (sanity: equal time),
  3. int8 wgrad with in-step dynamic quantization (the deployable form),
  4. int8 wgrad on pre-quantized operands (upper bound, excludes overhead),
and the int8 dW's relative error vs an fp32 reference.

wgrad-as-conv: dW[kh,kw,ci,co] = sum_{n,oh,ow} X[n,oh+kh-3,ow+kw-3,ci] *
dY[n,oh,ow,co] == conv_general_dilated(X, dY, pad 3, dimension_numbers
("CHWN","IHWO","NHWC")) — batch becomes the contracted feature dim, Ci the
batch, dY the kernel (the standard transpose-free wgrad formulation).

Result (v5e, fc6 7x7x512x4096 @ (8,32,16,512), measured 2026-08-17,
single process, one-element sync): bf16 wgrad via jax.grad 5.37 ms
(156.7 TFLOPs, ~80% of bf16 peak) == direct-conv formulation 5.37 ms;
int8 with in-step dynamic quantization 5.86 ms (+9% — the max-abs passes
+ casts + s32->f32 dequant cost more than the MXU saves); int8 on
PRE-quantized operands 5.43 ms (+1% — the upper bound is a wash: this
wgrad is already near the chip's practical conv ceiling and the int8
conv emitter does not reach its nominal 2x on this contraction shape);
dW relative error 1.7e-2 int8 vs 1.7e-3 bf16 — 10x the gradient noise
for zero-at-best speedup. BURIED: int8 training wgrad loses on this
hardware before numerics even enter the argument.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N, H, W, CI, CO, K = 8, 32, 16, 512, 4096, 7
PAD = K // 2
DN = ("CHWN", "IHWO", "NHWC")  # wgrad-as-conv (see module docstring)


def wgrad_conv(x, dy, prefer=None):
    return jax.lax.conv_general_dilated(
        x, dy, window_strides=(1, 1), padding=((PAD, PAD), (PAD, PAD)),
        dimension_numbers=DN,
        **({"preferred_element_type": prefer} if prefer else {}),
    )


def wgrad_via_grad(x, dy, w0):
    """The production path: grad of the fwd conv wrt its kernel."""
    def f(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((PAD, PAD), (PAD, PAD)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * dy)

    return jax.grad(f)(w0)


def int8_wgrad_dynamic(x, dy):
    """Deployable form: per-tensor dynamic scales computed in-step."""
    sx = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0
    sy = jnp.max(jnp.abs(dy)).astype(jnp.float32) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    yq = jnp.clip(jnp.round(dy.astype(jnp.float32) / sy), -127, 127).astype(jnp.int8)
    acc = wgrad_conv(xq, yq, prefer=jnp.int32)
    return acc.astype(jnp.float32) * (sx * sy)


def int8_wgrad_prequant(xq, yq, sxy):
    """Upper bound: operands already int8 (overhead excluded)."""
    return wgrad_conv(xq, yq, prefer=jnp.int32).astype(jnp.float32) * sxy


def _sync(out):
    """Hard sync WITHOUT shipping the 205 MB dW over the tunnel: D2H one
    element (block_until_ready is a no-op on axon; a full np.asarray would
    dominate the measurement at the tunnel's ~37 MB/s)."""
    np.asarray(jax.tree.leaves(out)[0][0, 0, 0, :1])


def _time(fn, *args, iters=50):
    out = fn(*args)
    _sync(out)  # compile
    for _ in range(2):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H, W, CI)), jnp.bfloat16)
    dy = jnp.asarray(rng.normal(size=(N, H, W, CO)) * 1e-3, jnp.bfloat16)
    w0 = jnp.zeros((K, K, CI, CO), jnp.bfloat16)

    flops = 2 * N * H * W * CI * CO * K * K
    print(f"wgrad contraction: {flops / 1e9:.0f} GFLOP")

    t_grad = _time(jax.jit(wgrad_via_grad), x, dy, w0)
    print(f"bf16 wgrad (jax.grad): {t_grad:.2f} ms "
          f"({flops / t_grad / 1e9:.1f} TFLOPs)")
    t_conv = _time(jax.jit(lambda a, b: wgrad_conv(a, b)), x, dy)
    print(f"bf16 wgrad (direct conv): {t_conv:.2f} ms")

    t_dyn = _time(jax.jit(int8_wgrad_dynamic), x, dy)
    print(f"int8 wgrad (dynamic quant): {t_dyn:.2f} ms "
          f"({(t_dyn / t_grad - 1) * 100:+.0f}% vs bf16)")

    sx = float(jnp.max(jnp.abs(x))) / 127.0
    sy = float(jnp.max(jnp.abs(dy))) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
    yq = jnp.clip(jnp.round(dy.astype(jnp.float32) / sy), -127, 127).astype(jnp.int8)
    t_pre = _time(jax.jit(int8_wgrad_prequant), xq, yq, jnp.float32(sx * sy))
    print(f"int8 wgrad (pre-quantized upper bound): {t_pre:.2f} ms "
          f"({(t_pre / t_grad - 1) * 100:+.0f}% vs bf16)")

    # accuracy vs fp32 reference
    xf, yf = x.astype(jnp.float32), dy.astype(jnp.float32)
    ref = np.asarray(jax.jit(lambda a, b: wgrad_conv(a, b))(xf, yf))
    dq = np.asarray(jax.jit(int8_wgrad_dynamic)(x, dy))
    bf = np.asarray(jax.jit(lambda a, b: wgrad_conv(a, b))(x, dy)).astype(np.float32)
    rel = lambda a: float(np.linalg.norm(a - ref) / np.linalg.norm(ref))
    print(f"dW relative error: int8 {rel(dq):.2e}, bf16 {rel(bf):.2e}")


if __name__ == "__main__":
    main()
