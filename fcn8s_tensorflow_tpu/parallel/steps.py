"""pjit-compiled train / eval / predict steps.

The functional core of the framework: pure step functions over an explicit
``TrainState``, compiled once per (shape, mesh) with ``jax.jit`` +
``NamedSharding`` annotations. This replaces the reference's per-step
``sess.run(fetches, feed_dict)`` (`/root/reference/fcn8s_tensorflow.py:553-572`)
— where the reference re-feeds learning rate / keep_prob / L2 rate as
placeholders every step, we pass them as *traced scalars*, so the step
callable LR schedule semantics (`:527,583` — re-evaluated every step)
survive without a single recompile.

Gradient reduction across the 'data' axis and the fc7 all-reduce of the
tensor-parallel encoder are both inserted by XLA GSPMD from the sharding
annotations; there is no hand-written collective here (SURVEY.md §2:
the reference has no communication backend at all — this is its TPU-native
replacement).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.fcn8s import apply_fcn8s, decoder_l2_loss
from ..ops.losses import (
    class_pixel_weights,
    masked_mean_softmax_cross_entropy,
    softmax_cross_entropy_with_ids,
    valid_pixel_weights,
)
from ..ops.metrics import empty_metrics_state, update_metrics_state


class TrainState(NamedTuple):
    """Carried training state. ``step`` is the reference's ``global_step``
    variable (`fcn8s_tensorflow.py:246`) — checkpointed so LR schedules
    resume correctly (`:526`)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any


class ScaleByAdamTF1State(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def scale_by_adam_tf1(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """``tf.train.AdamOptimizer``'s exact update rule (reference `:256`):

        lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        w   -= lr_t * m_t / (sqrt(v_t) + eps)

    This differs from ``optax.adam`` only in the epsilon placement —
    optax adds eps to the *bias-corrected* sqrt(v_hat), TF1 to the raw
    sqrt(v_t), i.e. an effective eps 1/sqrt(1-b2^t) larger early on. The
    difference only matters where |grad| ~ eps, but exact is exact: the
    one-Adam-step cross-framework parity test (tests/test_tf_parity.py)
    matches TF to fp32 rounding with this rule and diverges by ~0.7*lr*1e-3
    with optax's."""

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdamTF1State(
            count=jnp.zeros((), jnp.int32), mu=zeros,
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        t = count.astype(jnp.float32)
        lr_scale = jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        out = jax.tree.map(
            lambda m, v: lr_scale * m / (jnp.sqrt(v) + eps), mu, nu
        )
        return out, ScaleByAdamTF1State(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


OPTIMIZERS = ("adam", "adamw", "momentum", "sgd")


def make_optimizer(name: str = "adam", clip_norm: float | None = None,
                   **hyper) -> optax.GradientTransformation:
    """Build the train-step optimizer. Default is the reference's exact
    optimizer — Adam with TF1 defaults and TF1's exact update formulation
    (beta1=0.9, beta2=0.999, eps=1e-8 — ``tf.train.AdamOptimizer``,
    reference `fcn8s_tensorflow.py:256`; see ``scale_by_adam_tf1``) — with
    the learning rate injected per-step as a traced hyperparameter, so the
    per-step LR-schedule semantics cost zero recompiles.

    Beyond the reference (which hardcodes Adam), ``name`` selects:

    * ``"adam"`` — TF1-exact Adam (``b1``, ``b2``, ``eps`` kwargs).
    * ``"adamw"`` — the same Adam scaling plus decoupled weight decay
      (``weight_decay``, default 1e-4): ``w -= lr*(adam_update + wd*w)``
      (Loshchilov & Hutter; the decay multiplies the *traced* lr, so LR
      schedules scale it automatically).
    * ``"momentum"`` — ``tf.train.MomentumOptimizer`` semantics
      (``momentum`` default 0.9, ``nesterov`` default False):
      ``accum = momentum*accum + g; w -= lr*accum``.
    * ``"sgd"`` — plain ``w -= lr*g``.

    ``clip_norm`` prepends global-norm gradient clipping (applied to the
    raw gradient, before any moment accumulation — the standard placement).
    All variants share the ``TrainState``/checkpoint plumbing: their states
    are optax pytrees saved and restored leaf-by-leaf."""
    name = name.lower()
    if name not in OPTIMIZERS:
        raise ValueError(f"unknown optimizer '{name}'; one of {OPTIMIZERS}")
    allowed = {"adam": {"b1", "b2", "eps"},
               "adamw": {"b1", "b2", "eps", "weight_decay"},
               "momentum": {"momentum", "nesterov"},
               "sgd": set()}[name]
    if not set(hyper) <= allowed:
        raise ValueError(
            f"unknown kwargs for optimizer '{name}': "
            f"{sorted(set(hyper) - allowed)} (accepted: {sorted(allowed)})")

    def factory(learning_rate):
        chain = []
        if clip_norm is not None:
            chain.append(optax.clip_by_global_norm(clip_norm))
        if name in ("adam", "adamw"):
            chain.append(scale_by_adam_tf1(
                b1=hyper.get("b1", 0.9), b2=hyper.get("b2", 0.999),
                eps=hyper.get("eps", 1e-8)))
            if name == "adamw":
                chain.append(optax.add_decayed_weights(
                    hyper.get("weight_decay", 1e-4)))
        elif name == "momentum":
            chain.append(optax.trace(decay=hyper.get("momentum", 0.9),
                                     nesterov=hyper.get("nesterov", False)))
        # "sgd": nothing but the lr scale
        chain.append(optax.scale_by_learning_rate(learning_rate))
        return optax.chain(*chain)

    return optax.inject_hyperparams(factory)(learning_rate=1e-4)


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def _set_lr(opt_state, lr):
    """Functionally set the injected learning-rate hyperparameter."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hyper)


def train_step(
    state: TrainState,
    images,
    label_ids,
    sample_mask,
    rng,
    learning_rate,
    l2_rate,
    keep_prob,
    *,
    optimizer: optax.GradientTransformation,
    num_classes: int,
    compute_dtype=jnp.bfloat16,
    augment_fn=None,
    use_pallas_ce: bool | None = None,
    remat: bool = False,
    grad_accum: int = 1,
    ignore_label: int | None = None,
    class_weights: tuple | None = None,
):
    """One optimization step. ``images`` NHWC uint8, ``label_ids`` NHW uint8,
    ``sample_mask`` (N,) float 0/1 — zeros mark batch-padding samples added
    to satisfy the mesh's data-axis divisibility; the masked mean makes the
    gradient *exactly* the short-batch gradient.

    ``augment_fn`` (from ``ops.augment_device.make_augment_fn``) runs
    device-resident augmentation *inside* the compiled step — VPU work that
    overlaps the conv pipeline instead of serializing on the host like the
    reference (SURVEY.md §3.2).

    ``grad_accum=A`` splits the batch into A microbatches and ``lax.scan``s
    the forward+backward over them, weighting each microbatch gradient by
    its share of real (non-padding) samples — mathematically identical to
    the full-batch gradient, with activation memory of one microbatch.
    This is how the reference's canonical batch-16 config (BASELINE.md)
    fits one chip at full 1024x2048 resolution. uint8 inputs make holding
    the whole global batch in HBM cheap; only activations shrink.

    Measured v5e @16x1024x512: accum=2 is free (220.8 vs 222.2 ms/step,
    72.5 img/s — microbatch 8 keeps the conv emitters' efficient shapes);
    accum=4 costs ~2x (442.6 ms — microbatch 4 halves conv efficiency at
    this resolution). Prefer the largest microbatch that fits.

    Returns (new_state, total_loss). Loss = mean softmax CE over all real
    pixels + l2_rate * sum(l2(decoder kernels)) (reference `:250-253`).

    ``ignore_label`` (beyond the reference, which trains void as class 0,
    `:253`): pixels whose GT id equals it are excluded from the loss mean
    and receive exactly-zero gradients — the upstream Cityscapes 255-ignore
    trainId scheme (`labels_original.py:63-97`, shipped as
    ``labels.labels_original`` + ``IDS_TO_TRAINIDS_ORIGINAL_ARRAY``). The
    Pallas CE dense path takes the per-pixel weight natively; streaming
    metrics exclude such pixels structurally (an out-of-range GT id matches
    no one-hot lane). Measured v5e @8x1024x512x19, fused step on resident
    inputs: 129.3 vs 110.1 ms/step (+17% — the dense kernel's per-pixel
    weight/label VMEM inputs relayout where the per-sample fast path keeps
    them compact; the fast path cannot mask inside its lse sum).

    ``class_weights`` (beyond the reference): an (num_classes,) weight
    vector — the loss becomes the weighted mean sum(w[label]*ce)/sum(w[label])
    (e.g. median-frequency balancing, ``ops.losses.
    median_frequency_class_weights``). Composes with ``ignore_label`` and
    rides the same dense-CE path; passed as a static tuple so it bakes into
    the executable as a constant.
    """
    # Per-step rng: fold the global step in so one key drives the run.
    step_rng = jax.random.fold_in(rng, state.step)
    if augment_fn is not None:
        aug_rng, step_rng = jax.random.split(step_rng)
        images, label_ids = augment_fn(aug_rng, images, label_ids)

    # Pallas CE (fwd kernel + narrow-XLA custom VJP) measured a 13% faster
    # full train step on v5e (159.6 vs 183.2 ms @ 8x1024x512); keeping the
    # logits in compute dtype for it (fp32 inside the kernel) saves another
    # ~4.5% (152.9 ms) by halving the biggest tensor's HBM traffic.
    use_pallas = _on_tpu() if use_pallas_ce is None else use_pallas_ce
    weighted = ignore_label is not None or class_weights is not None

    def pixel_weights(lb_, mk_):
        if class_weights is not None:
            return class_pixel_weights(lb_, mk_, class_weights, ignore_label)
        return valid_pixel_weights(lb_, mk_, ignore_label)

    def loss_for(params, im, lb, mk, dropout_rng):
        logits = apply_fcn8s(
            params,
            im,
            keep_prob=keep_prob,
            rng=dropout_rng,
            deterministic=False,
            compute_dtype=compute_dtype,
            logits_dtype=compute_dtype if use_pallas else jnp.float32,
            remat=remat,
            # NOTE: packed_final (skip the final depth-to-space, space-to-depth
            # the labels instead) measured 14% SLOWER in-process A/B on v5e
            # (145.4 vs 127.9 ms) — XLA already fuses the depth-to-space, and
            # the packed flatten degrades the CE kernel's access pattern. The
            # capability stays available on apply_fcn8s for other consumers.
        )
        if weighted:
            if use_pallas and class_weights is None:
                from ..ops.pallas_kernels import masked_softmax_cross_entropy_pallas

                # masked FAST path: neutral-row substitution riding the
                # unmasked per-sample kernel; measured 113.5 ms/step vs the
                # dense kernel's 160.7 (unmasked baseline 109.4) on v5e
                # @8x1024x512x19 — see masked_softmax_cross_entropy_pallas
                ce = masked_softmax_cross_entropy_pallas(logits, lb, mk, ignore_label)
            elif use_pallas:
                from ..ops.pallas_kernels import softmax_cross_entropy_pallas

                # dense (per-pixel-weight) kernel path for class weights; an
                # ignored id matches no lane in fwd and one-hots to zeros in bwd
                ce = softmax_cross_entropy_pallas(logits, lb, pixel_weights(lb, mk))
            else:
                ce = masked_mean_softmax_cross_entropy(logits, lb, pixel_weights(lb, mk))
        elif use_pallas:
            from ..ops.pallas_kernels import softmax_cross_entropy_pallas

            ce = softmax_cross_entropy_pallas(logits, lb, mk)
        else:
            ce_px = softmax_cross_entropy_with_ids(logits, lb)
            m = mk.reshape(mk.shape + (1,) * (ce_px.ndim - 1))
            # max(.,1): an all-padding microbatch (possible under grad_accum
            # when the batch pads up to the mesh multiple) must yield 0, not
            # 0/0 — its accumulation weight is 0 but NaN*0 is NaN.
            ce = jnp.sum(ce_px * m) / jnp.maximum(
                jnp.sum(mk) * (ce_px.size // ce_px.shape[0]), 1.0)
        reg = jnp.asarray(l2_rate, jnp.float32) * decoder_l2_loss(params["decoder"])
        return ce + reg

    if grad_accum > 1:
        n = images.shape[0]
        if n % grad_accum:
            raise ValueError(f"batch {n} not divisible by grad_accum={grad_accum}")
        b = n // grad_accum
        im_m = images.reshape(grad_accum, b, *images.shape[1:])
        lb_m = label_ids.reshape(grad_accum, b, *label_ids.shape[1:])
        mk_m = sample_mask.reshape(grad_accum, b)
        # weight each microbatch by its real-sample share: the weighted sum
        # of per-microbatch masked-mean gradients IS the full-batch masked
        # mean (every real sample covers the same pixel count). The reg
        # term rides along exactly (weights sum to 1). With ignore_label /
        # class_weights the share is each microbatch's PIXEL-WEIGHT SUM
        # (microbatches no longer carry equal weight).
        if weighted:
            w_full = pixel_weights(label_ids, sample_mask)
            counts = w_full.reshape(grad_accum, -1).sum(axis=1)
        else:
            counts = mk_m.sum(axis=1)
        weights = counts / jnp.maximum(counts.sum(), 1.0)

        def body(carry, xs):
            g_acc, loss_acc = carry
            im_i, lb_i, mk_i, w_i, idx = xs
            rng_i = jax.random.fold_in(step_rng, idx)
            loss_i, g_i = jax.value_and_grad(loss_for)(
                state.params, im_i, lb_i, mk_i, rng_i
            )
            g_acc = jax.tree.map(lambda a, g: a + w_i * g, g_acc, g_i)
            return (g_acc, loss_acc + w_i * loss_i), None

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (grads, total_loss), _ = jax.lax.scan(
            body, (zeros, jnp.zeros((), jnp.float32)),
            (im_m, lb_m, mk_m, weights, jnp.arange(grad_accum)),
        )
    else:
        total_loss, grads = jax.value_and_grad(
            lambda p: loss_for(p, images, label_ids, sample_mask, step_rng)
        )(state.params)
    opt_state = _set_lr(state.opt_state, learning_rate)
    updates, opt_state = optimizer.update(grads, opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=params, opt_state=opt_state), total_loss


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def eval_step(params, metrics_state, images, label_ids, sample_mask, *,
              num_classes: int, compute_dtype=jnp.bfloat16, use_pallas_ce: bool | None = None,
              ignore_label: int | None = None, class_weights: tuple | None = None):
    """Forward-only metric accumulation with keep_prob=1 (reference
    `_evaluate`, `fcn8s_tensorflow.py:685-689`). The confusion-matrix /
    accuracy accumulators live on device; across the 'data' axis XLA reduces
    them because the out-sharding is replicated. ``sample_mask`` excludes
    batch-padding samples exactly.

    Logits stay in ``compute_dtype`` (see ``predict_step``: the fp32 upcast
    adds no information; both CE formulations upcast internally)."""
    logits = apply_fcn8s(params, images, deterministic=True,
                         compute_dtype=compute_dtype, logits_dtype=compute_dtype)
    if use_pallas_ce is None:
        use_pallas_ce = _on_tpu()  # Pallas kernels need the TPU backend
    if ignore_label is not None or class_weights is not None:
        # masked/weighted loss mean over valid pixels only (see
        # ``train_step``); the confusion matrix below needs no change — an
        # out-of-range GT id matches no one-hot lane, so ignored pixels
        # drop out structurally
        if use_pallas_ce and class_weights is None:
            from ..ops.pallas_kernels import masked_softmax_cross_entropy_pallas

            loss = masked_softmax_cross_entropy_pallas(
                logits, label_ids, sample_mask, ignore_label)
        else:
            if class_weights is not None:
                w = class_pixel_weights(label_ids, sample_mask, class_weights,
                                        ignore_label)
            else:
                w = valid_pixel_weights(label_ids, sample_mask, ignore_label)
            if use_pallas_ce:
                from ..ops.pallas_kernels import softmax_cross_entropy_pallas

                loss = softmax_cross_entropy_pallas(logits, label_ids, w)
            else:
                loss = masked_mean_softmax_cross_entropy(logits, label_ids, w)
    elif use_pallas_ce:
        # Pallas forward-only CE: 2.9x the composite formulation on v5e
        # (eval never needs the backward).
        from ..ops.pallas_kernels import softmax_cross_entropy_pallas

        loss = softmax_cross_entropy_pallas(logits, label_ids, sample_mask)
    else:
        ce_px = softmax_cross_entropy_with_ids(logits, label_ids)
        mask = sample_mask.reshape(sample_mask.shape + (1,) * (ce_px.ndim - 1))
        loss = jnp.sum(ce_px * mask) / jnp.maximum(
            jnp.sum(sample_mask) * (ce_px.size // ce_px.shape[0]), 1.0)
    pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return update_metrics_state(
        metrics_state, loss=loss, pred_ids=pred, gt_ids=label_ids.astype(jnp.int32),
        num_classes=num_classes, sample_mask=sample_mask,
    )


def predict_step(params, images, *, argmax: bool = True, compute_dtype=jnp.bfloat16,
                 id_dtype=jnp.int32, overlay_lut=None, quantized: bool = False):
    """Inference head: argmax ids, full softmax, or a fully-composited
    RGB overlay (reference `_build_predictor`, `fcn8s_tensorflow.py:261-271`,
    plus the host-side overlay at `visualization_utils.py:7-52` moved into
    the executable — BASELINE.md's "argmax→color overlay on-TPU").

    ``id_dtype``: dtype of the argmax output; uint8 shrinks the D2H
    transfer 4× when num_classes <= 255 (the facade re-widens on host).

    ``overlay_lut``: (C, 4) float32 RGBA rows. When given, returns the
    alpha-composited uint8 RGB image ``img*(1-a) + color*a`` — the LUT
    lookup + blend fused into the same executable (as a per-class
    compare/select chain, see below), and the D2H payload is 3 uint8
    channels instead of ids + a host-side blend.

    ``quantized``: ``params`` is a ``quantize_fcn8s_params`` tree; the
    encoder runs int8 on the MXU (2x bf16 peak on v5e — ops/quantize.py).

    Logits stay in ``compute_dtype``: the final conv computes in it anyway,
    so the fp32 upcast adds no information — argmax is identical (monotonic
    cast, same tie order) and softmax upcasts per-element inside its fusion.
    Keeping the full-res logits narrow halves the biggest tensor's HBM
    traffic through the depth-to-space transpose and the argmax (measured
    v5e @8x1024x512: the f32 relayout copy alone was 3.5 ms/batch).

    When only class IDS are needed (argmax / overlay), the argmax runs in
    the PACKED subpixel layout — full-resolution C-channel logits never
    materialize (their 20-channel minor dim lane-pads 6.4x in HBM); only
    the uint-sized id maps get depth-to-spaced. Bit-identical (same class
    order per pixel, verified 1.0 agreement) and measured 37.4 -> 33.3
    ms/batch8 on v5e (-11%)."""
    want_ids = argmax or overlay_lut is not None
    apply_kwargs = dict(compute_dtype=compute_dtype, logits_dtype=compute_dtype,
                        packed_final=want_ids)
    if quantized:
        from ..ops.quantize import apply_fcn8s_int8

        logits = apply_fcn8s_int8(params, images, **apply_kwargs)
    else:
        logits = apply_fcn8s(params, images, deterministic=True, **apply_kwargs)
    if want_ids:
        pred = jnp.argmax(logits, axis=-1)  # (n, H/s, W/s, s, s)
        n, h, w, s, _ = pred.shape
        pred = jnp.transpose(pred, (0, 1, 3, 2, 4)).reshape(n, h * s, w * s)
    if overlay_lut is not None:
        # Per-class compare+select accumulation instead of a (C, 4) row
        # gather: the gather op itself costs ~19 ms at 8x1024x512 on v5e
        # (its (N,H,W,4) f32 result lane-pads 4->128), while the unrolled
        # C compares + <=4C selects fuse into the surrounding elementwise
        # chain. Measured compute-sync @8x1024x512 (benchmarks/
        # overlay_bench.py): plain argmax 55.9 ms, gather overlay 75.3,
        # THIS 61.9 (-69% overlay overhead); losing variants: four planar
        # (C,) gathers 186.6, one packed-u32 gather + bit-unpack 89.9.
        # Bit-identical to the gather formulation (same f32 ops, same
        # order — verified on-device in the bench) and trivially GSPMD-
        # partitionable (pure elementwise, no gather to re-shard).
        import numpy as np

        lut_np = np.asarray(overlay_lut, np.float32)
        zero = jnp.zeros(pred.shape, jnp.float32)
        chan = [zero, zero, zero, zero]
        for cls in range(lut_np.shape[0]):
            mask = pred == cls
            for c in range(4):
                if lut_np[cls, c] != 0.0:
                    chan[c] = jnp.where(mask, jnp.float32(lut_np[cls, c]), chan[c])
        alpha = chan[3] * (1.0 / 255.0)
        out = [
            images[..., c].astype(jnp.float32) * (1.0 - alpha) + chan[c] * alpha
            for c in range(3)
        ]
        # floor to match the host fallback's float->uint8 truncation
        return jnp.floor(jnp.stack(out, axis=-1)).astype(jnp.uint8)
    if argmax:
        return pred.astype(id_dtype)
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def compile_train_step(mesh, optimizer, num_classes, *, tensor_parallel: bool = True,
                       compute_dtype=jnp.bfloat16, example_state=None, donate: bool = True,
                       augment_fn=None, remat: bool = False, grad_accum: int = 1,
                       spatial_partition: bool = False, use_pallas_ce: bool | None = None,
                       ignore_label: int | None = None, class_weights: tuple | None = None):
    """jit the train step with mesh shardings: batch over 'data', params per
    the TP rules, carried state donated (in-place update, halves HBM).

    ``spatial_partition=True`` additionally shards the images/labels WIDTH
    dim over the 'model' axis — the training-side analog of sequence
    parallelism for this CNN (SURVEY.md §2): GSPMD inserts the conv halo
    exchanges in BOTH the forward and the backward (conv transposes are
    convs), and the loss/grad reductions ride the same collectives. Params
    replicate over 'model' (mutually exclusive with tensor_parallel). For
    training at full 1024x2048 Cityscapes resolution when one chip's
    activation HBM is the binding constraint (pairs with remat/grad_accum).
    The Pallas CE kernel is not GSPMD-partitionable over width, so this
    mode forces the composite XLA loss (same math; `use_pallas_ce=False`)."""
    from jax.sharding import NamedSharding

    from .mesh import batch_sharding, param_sharding_tree, replicated, spatial_spec

    if spatial_partition and tensor_parallel:
        raise ValueError("spatial_partition and tensor_parallel are mutually exclusive")
    rep = replicated(mesh)
    if spatial_partition:
        data = NamedSharding(mesh, spatial_spec())
        mask_sharding = batch_sharding(mesh)
        tensor_parallel = False
        use_pallas_ce = False
    else:
        data = batch_sharding(mesh)
        mask_sharding = data

    if example_state is not None:
        p_shard = param_sharding_tree(mesh, example_state.params, tensor_parallel=tensor_parallel)
        state_shardings = TrainState(
            step=rep,
            params=p_shard,
            opt_state=jax.tree.map(
                lambda _: rep, example_state.opt_state,
            ),
        )
        # Adam moments must follow the params' sharding.
        state_shardings = _match_opt_state_to_params(example_state, state_shardings, p_shard, rep)
    else:
        state_shardings = None

    fn = partial(train_step, optimizer=optimizer, num_classes=num_classes,
                 compute_dtype=compute_dtype, augment_fn=augment_fn, remat=remat,
                 grad_accum=grad_accum, use_pallas_ce=use_pallas_ce,
                 ignore_label=ignore_label, class_weights=class_weights)
    return jax.jit(
        fn,
        in_shardings=(state_shardings, data, data, mask_sharding, rep, rep, rep, rep),
        out_shardings=(state_shardings, rep),
        donate_argnums=(0,) if donate else (),
    )


def compile_multi_train_step(mesh, optimizer, num_classes, *, steps_per_dispatch: int,
                             tensor_parallel: bool = True, compute_dtype=jnp.bfloat16,
                             example_state=None, donate: bool = True, augment_fn=None,
                             remat: bool = False, grad_accum: int = 1,
                             use_pallas_ce: bool | None = None,
                             ignore_label: int | None = None,
                             class_weights: tuple | None = None):
    """``lax.scan`` of S train steps inside ONE executable — the on-device
    train-loop pattern, amortizing per-dispatch host overhead over S steps.
    Takes S-stacked batches ``(S, N, H, W, C)`` / ``(S, N, H, W)`` /
    ``(S, N)`` and returns ``(state, losses[S])``.

    MEASURED on this hardware (``benchmarks/multistep_bench.py``, full-width
    8x1024x512): 108.3/108.6 ms/step single-dispatch vs 108.4/108.5 scanned
    (S=4/S=8) — +-0.1%, i.e. NO throughput win here, because the training
    loop never syncs per step (loss D2H only on the summaries cadence), so
    XLA's async dispatch already pipelines the per-dispatch cost away. Kept
    as a steps-level API for hosts where dispatch is NOT hidden (per-step
    metric syncs, slow host Python, or very short steps); not wired into the
    facade to avoid surface for a measured non-win.

    Semantics vs S single dispatches: identical math and identical RNG
    (``train_step`` folds ``state.step`` per scanned step), EXCEPT the
    (lr, l2, keep_prob) scalars are shared by the S steps — an LR schedule
    advances per dispatch."""
    from jax.sharding import NamedSharding, PartitionSpec

    from .mesh import batch_spec, param_sharding_tree, replicated

    if steps_per_dispatch < 1:
        raise ValueError("steps_per_dispatch must be >= 1")
    rep = replicated(mesh)
    stacked = NamedSharding(mesh, PartitionSpec(None, *batch_spec()))

    if example_state is not None:
        p_shard = param_sharding_tree(mesh, example_state.params,
                                      tensor_parallel=tensor_parallel)
        state_shardings = TrainState(
            step=rep, params=p_shard,
            opt_state=jax.tree.map(lambda _: rep, example_state.opt_state),
        )
        state_shardings = _match_opt_state_to_params(
            example_state, state_shardings, p_shard, rep)
    else:
        state_shardings = None

    step_fn = partial(train_step, optimizer=optimizer, num_classes=num_classes,
                      compute_dtype=compute_dtype, augment_fn=augment_fn,
                      remat=remat, grad_accum=grad_accum,
                      use_pallas_ce=use_pallas_ce, ignore_label=ignore_label,
                      class_weights=class_weights)

    def multi(state, images_s, labels_s, mask_s, rng, learning_rate, l2_rate,
              keep_prob):
        def body(st, xs):
            im, lb, mk = xs
            st, loss = step_fn(st, im, lb, mk, rng, learning_rate, l2_rate,
                               keep_prob)
            return st, loss

        return jax.lax.scan(body, state, (images_s, labels_s, mask_s))

    return jax.jit(
        multi,
        in_shardings=(state_shardings, stacked, stacked, stacked, rep, rep, rep, rep),
        out_shardings=(state_shardings, rep),
        donate_argnums=(0,) if donate else (),
    )


def _match_opt_state_to_params(state, state_shardings, p_shard, rep):
    """Give Adam's mu/nu the same sharding as their params; scalars replicate."""

    def map_opt(opt_state):
        # optax.inject_hyperparams wraps an InjectHyperparamsState whose
        # inner_state contains ScaleByAdamState(mu=ptree, nu=ptree, count).
        def rec(node):
            if isinstance(node, dict) and set(node.keys()) == {"encoder", "decoder"}:
                return p_shard
            if hasattr(node, "_fields"):  # NamedTuple-like optax states
                return type(node)(*(rec(getattr(node, f)) for f in node._fields))
            if isinstance(node, dict):
                return {k: rec(v) for k, v in node.items()}
            if isinstance(node, (list, tuple)):
                return type(node)(rec(v) for v in node)
            return rep

        return rec(opt_state)

    return TrainState(step=rep, params=p_shard, opt_state=map_opt(state.opt_state))


def compile_eval_step(mesh, num_classes, *, tensor_parallel: bool = True, compute_dtype=jnp.bfloat16,
                      example_params=None, spatial_partition: bool = False,
                      ignore_label: int | None = None, class_weights: tuple | None = None):
    """``spatial_partition=True`` shards the images/labels width dim over
    'model' (exact — GSPMD conv halos; see ``compile_train_step``) with
    params replicated and the composite XLA loss (the Pallas CE kernel is
    not GSPMD-partitionable over width). Completes the spatial story:
    train, predict, and eval all run width-sharded for mega-resolution."""
    from jax.sharding import NamedSharding

    from .mesh import batch_sharding, param_sharding_tree, replicated, spatial_spec

    if spatial_partition and tensor_parallel:
        raise ValueError("spatial_partition and tensor_parallel are mutually exclusive")
    rep = replicated(mesh)
    if spatial_partition:
        data = NamedSharding(mesh, spatial_spec())
        mask_sharding = batch_sharding(mesh)
        tensor_parallel = False
        use_pallas = False
    else:
        data = batch_sharding(mesh)
        mask_sharding = data
        use_pallas = None
    p_shard = (
        param_sharding_tree(mesh, example_params, tensor_parallel=tensor_parallel)
        if example_params is not None
        else None
    )
    metrics_shard = rep if example_params is not None else None
    fn = partial(eval_step, num_classes=num_classes, compute_dtype=compute_dtype,
                 use_pallas_ce=use_pallas, ignore_label=ignore_label,
                 class_weights=class_weights)
    return jax.jit(
        fn,
        in_shardings=(
            (p_shard, metrics_shard, data, data, mask_sharding)
            if p_shard is not None else None
        ),
        out_shardings=metrics_shard,
        donate_argnums=(1,),
    )


def compile_predict_step(mesh, *, argmax: bool = True, tensor_parallel: bool = True,
                         compute_dtype=jnp.bfloat16, example_params=None,
                         spatial_partition: bool = False, id_dtype=jnp.int32,
                         overlay_lut=None, quantized: bool = False):
    """``spatial_partition=True`` additionally shards the width dim over the
    'model' axis (conv halo exchanges inserted by GSPMD) — for
    mega-resolution inputs that don't fit one chip's HBM. Params must then
    be replicated over 'model' (tensor_parallel is mutually exclusive).

    ``overlay_lut`` ((C, 4) RGBA rows) bakes the on-device overlay
    compositing into the executable (see ``predict_step``).

    ``quantized``: ``example_params`` is the int8 tree; its ~30 MB encoder
    replicates over 'model' (the TP fc6/fc7 name rules don't apply to the
    ``kernel_q``/``scale`` leaves and the tree is small enough not to shard)."""
    from .mesh import batch_sharding, param_sharding_tree, spatial_spec
    from jax.sharding import NamedSharding

    if spatial_partition and tensor_parallel:
        raise ValueError("spatial_partition and tensor_parallel are mutually exclusive")
    data = (
        NamedSharding(mesh, spatial_spec()) if spatial_partition else batch_sharding(mesh)
    )
    p_shard = (
        param_sharding_tree(mesh, example_params,
                            tensor_parallel=tensor_parallel and not quantized)
        if example_params is not None
        else None
    )
    fn = partial(predict_step, argmax=argmax, compute_dtype=compute_dtype,
                 id_dtype=id_dtype, overlay_lut=overlay_lut, quantized=quantized)
    return jax.jit(
        fn,
        in_shardings=(p_shard, data) if p_shard is not None else None,
        out_shardings=data,
    )


def tta_step(params, images, *, scale_hw=None, flip: bool = True,
             compute_dtype=jnp.bfloat16, quantized: bool = False):
    """Test-time-augmentation probability head for ONE scale (a capability
    beyond the reference — `fcn8s_tensorflow.py:743-770` predicts a single
    view only). Averaging class probabilities over mirrored/rescaled views
    is the standard FCN-era mIoU booster; this runs it TPU-first:

    - the horizontal mirror is CONCATENATED into the batch dim, so one
      doubled-batch forward keeps the MXU at full tilt instead of running
      two half-utilized dispatches (and under a mesh the 2N batch still
      shards evenly over 'data' — N is already a data-axis multiple);
    - the rescale (``scale_hw``, static) and the probability resize back to
      native resolution are `jax.image.resize` inside the SAME executable,
      so scaled views never round-trip to host;
    - bilinear resize is linear, so resized softmax outputs remain valid
      distributions (each output pixel is a convex combination) — no
      renormalization pass is needed.

    Returns (N, H, W, C) float32 mean probabilities at the input resolution.
    """
    n, h, w = images.shape[:3]
    x = images.astype(jnp.float32)
    if scale_hw is not None and tuple(scale_hw) != (h, w):
        sh, sw = scale_hw
        x = jax.image.resize(x, (n, sh, sw, x.shape[-1]), method="bilinear")
    if flip:
        x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
    apply_kwargs = dict(compute_dtype=compute_dtype, logits_dtype=compute_dtype,
                        packed_final=False)
    if quantized:
        from ..ops.quantize import apply_fcn8s_int8

        logits = apply_fcn8s_int8(params, x, **apply_kwargs)
    else:
        logits = apply_fcn8s(params, x, deterministic=True, **apply_kwargs)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if flip:
        fwd, mir = jnp.split(probs, 2, axis=0)
        probs = (fwd + mir[:, :, ::-1, :]) * 0.5
    if probs.shape[1:3] != (h, w):
        probs = jax.image.resize(
            probs, (n, h, w, probs.shape[-1]), method="bilinear"
        )
    return probs


def compile_tta_step(mesh, *, scale_hw=None, flip: bool = True,
                     tensor_parallel: bool = True, compute_dtype=jnp.bfloat16,
                     example_params=None, quantized: bool = False):
    """jit ``tta_step`` with mesh shardings (mirrors ``compile_predict_step``:
    batch over 'data', params per the TP rules; the int8 tree replicates)."""
    from .mesh import batch_sharding, param_sharding_tree

    data = batch_sharding(mesh)
    p_shard = (
        param_sharding_tree(mesh, example_params,
                            tensor_parallel=tensor_parallel and not quantized)
        if example_params is not None
        else None
    )
    fn = partial(tta_step, scale_hw=scale_hw, flip=flip,
                 compute_dtype=compute_dtype, quantized=quantized)
    return jax.jit(
        fn,
        in_shardings=(p_shard, data) if p_shard is not None else None,
        out_shardings=data,
    )
