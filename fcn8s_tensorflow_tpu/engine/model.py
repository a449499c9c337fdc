"""The ``FCN8s`` facade: the reference's public API, TPU-native inside.

API parity with `/root/reference/fcn8s_tensorflow.py` class ``FCN8s``:
``__init__`` (3-way load: fresh-build / full checkpoint / variables-only),
``train()``, ``evaluate()``, ``predict()``, ``predict_and_save()``,
``save()``, ``load_variables()``, ``close()`` — same argument names where
they still mean something, documented mappings where TF1 concepts
(sessions, savers, feed_dict) have no TPU analog.

TPU-native internals:

* one jit-compiled train/eval/predict executable per input shape, cached —
  the model is fully convolutional and shape buckets recompile once
  (the reference's dynamic-shape ``sess.run`` becomes XLA static shapes);
* learning rate / keep_prob / L2 rate are traced scalars: the reference's
  per-step LR-schedule callable contract holds with zero recompiles;
* input batches are device_put with the mesh's batch sharding (DP across
  chips over ICI); gradient psum is inserted by GSPMD;
* streaming metrics are an explicit device-resident accumulator pytree
  (the reference's TF1 "metric local variables" + hand-rolled reset op);
* checkpoints are self-describing msgpack+JSON with the reference's
  directory-name scheme, best-only monitoring, and max_to_keep pruning.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import deque
from functools import partial
from glob import glob
from math import ceil

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tqdm import trange

from ..models.fcn8s import init_fcn8s
from ..models.vgg16 import FC6_KERNEL
from ..ops.metrics import empty_metrics_state, finalize_metrics
from ..parallel.mesh import batch_sharding, create_mesh, replicated
from ..parallel.steps import (
    compile_eval_step,
    compile_predict_step,
    compile_train_step,
    create_train_state,
    make_optimizer,
)
from . import checkpoint as ckpt
from .summaries import SummaryLogger

_ALLOWED_METRICS = {"loss", "mean_iou", "accuracy"}


class FCN8s:
    """FCN-8s semantic segmentation model with a training/eval/inference
    runtime. See module docstring; ctor argument semantics follow the
    reference (`fcn8s_tensorflow.py:19-62`):

    Arguments:
        model_load_dir: path to a *full* self-describing checkpoint directory
            (this framework's equivalent of the reference's SavedModel reload
            path, `:72-101`); rebuilds the model from the stored config and
            restores params + optimizer state + global step.
        tags: accepted for signature parity; unused (no metagraphs here).
        vgg16_dir: path to pretrained convolutionalized-VGG-16 *encoder*
            weights (a checkpoint produced by ``tools/import_vgg16.py`` from
            the reference's SavedModel, or any checkpoint with an 'encoder'
            tree). The reference's opaque-protobuf encoder load (`:127-152`),
            as an explicit weight restore. Optional: if omitted, the encoder
            initializes randomly (the reference cannot train from scratch;
            this framework can).
        num_classes: number of segmentation classes (required unless
            ``model_load_dir`` is given).
        variables_load_dir: checkpoint directory from which to restore model
            params only (the reference's ``tf.train.Saver`` restore, `:122-125`).
        mesh: a ``jax.sharding.Mesh`` (defaults to all devices on one 'data'
            axis); tensor_parallel: shard fc6/fc7 over the 'model' axis.
        compute_dtype: activation dtype. Default None = bfloat16 for fresh
            builds (fp32 MXU accum), or the checkpoint's own recorded dtype
            when restoring via ``model_load_dir`` (a resumed fp32 run keeps
            fp32); pass a dtype explicitly to override either.
        keep_prob / l2 are per-call args like the reference's placeholders.
        ignore_label: optional GT id excluded from the loss mean (with
            exactly-zero gradients) and, structurally, from the streaming
            confusion matrix/accuracy/mIoU. Enables training the upstream
            Cityscapes 255-ignore trainId scheme (``labels.labels_original``
            with ``IDS_TO_TRAINIDS_ORIGINAL_ARRAY``:
            num_classes=NUM_TRAIN_CLASSES_ORIGINAL (19),
            ignore_label=IGNORE_LABEL (255)) — the reference can only train its modified
            void-as-class-0 scheme (`fcn8s_tensorflow.py:253`). Persisted
            in checkpoints. For device augmentation pass the same id as
            ``device_augment={'void_class_id': ...}`` so translate/scale
            border fill stays ignored.
        optimizer: ``"adam"`` (default — the reference's TF1-exact Adam,
            `fcn8s_tensorflow.py:256`) | ``"adamw"`` | ``"momentum"`` |
            ``"sgd"`` (see ``parallel.steps.make_optimizer``), or a ready
            ``optax.GradientTransformation`` built with
            ``optax.inject_hyperparams`` carrying a ``learning_rate``
            hyperparameter. ``optimizer_kwargs`` feeds the named variants
            (e.g. ``{"momentum": 0.95}``, ``{"weight_decay": 5e-4}``);
            ``clip_norm`` prepends global-norm gradient clipping. All three
            persist in checkpoints and are restored by ``model_load_dir`` /
            ``resume`` (named variants only — the optimizer state must
            deserialize into the matching transformation).
    """

    def __init__(
        self,
        model_load_dir=None,
        tags=None,
        vgg16_dir=None,
        num_classes=None,
        variables_load_dir=None,
        *,
        mesh=None,
        tensor_parallel=False,
        compute_dtype=None,
        width_mult=1.0,
        fc_channels=None,
        bilinear_deconv_init=False,
        seed=0,
        remat=False,
        variant="fcn8s",
        ignore_label=None,
        optimizer="adam",
        optimizer_kwargs=None,
        clip_norm=None,
    ):
        if model_load_dir is None and num_classes is None:
            raise ValueError(
                "You must provide either `model_load_dir` or `num_classes` "
                "(optionally with `vgg16_dir` for pretrained encoder weights)."
            )

        self.model_load_dir = model_load_dir
        self.vgg16_dir = vgg16_dir
        self.variables_load_dir = variables_load_dir
        self.mesh = mesh if mesh is not None else create_mesh()
        self.tensor_parallel = tensor_parallel
        self.remat = remat  # jax.checkpoint on encoder blocks (big batch/res)

        if model_load_dir is not None:
            meta = ckpt.load_metadata(model_load_dir)
            cfg = meta["model_config"]
            num_classes = cfg["num_classes"]
            width_mult = cfg.get("width_mult", 1.0)
            fc_channels = cfg.get("fc_channels")
            variant = cfg.get("variant", "fcn8s")
            ignore_label = cfg.get("ignore_label")
            if compute_dtype is None:
                # restore the checkpoint's own compute dtype — a resumed fp32
                # run must not silently flip to the bf16 default (pre-field
                # checkpoints were all bf16); pass compute_dtype= to override
                compute_dtype = jnp.dtype(
                    cfg.get("compute_dtype", "bfloat16")).type
            # The optimizer state in the checkpoint only deserializes into
            # the matching transformation — rebuild from the saved config
            # (pre-optimizer-config checkpoints were all TF1-Adam).
            if not isinstance(optimizer, str):
                raise ValueError(
                    "model_load_dir restores the checkpoint's own optimizer "
                    "config; a custom GradientTransformation cannot be "
                    "combined with it (use variables_load_dir to load "
                    "weights into a freshly-configured model instead)")
            optimizer = cfg.get("optimizer", "adam")
            if optimizer == "custom":
                raise ValueError(
                    "this checkpoint was trained with a user-supplied "
                    "GradientTransformation, which cannot be rebuilt from "
                    "config; construct FCN8s(num_classes=..., optimizer=<your "
                    "transformation>, variables_load_dir=...) to restore the "
                    "weights into it instead")
            optimizer_kwargs = cfg.get("optimizer_kwargs")
            clip_norm = cfg.get("clip_norm")

        self.compute_dtype = (jnp.bfloat16 if compute_dtype is None
                              else compute_dtype)
        self.num_classes = num_classes
        self.variant = variant
        self.ignore_label = ignore_label
        self.model_config = {
            "num_classes": num_classes,
            "width_mult": width_mult,
            "fc_channels": fc_channels,
            "variant": variant,
            "ignore_label": ignore_label,
            "compute_dtype": jnp.dtype(self.compute_dtype).name,
            "optimizer": optimizer if isinstance(optimizer, str) else "custom",
            "optimizer_kwargs": optimizer_kwargs,
            "clip_norm": clip_norm,
        }

        # rbg keys use the TPU hardware RNG path: measured -2.4 ms/step on
        # the full-width train step vs threefry (the dropout-mask generation
        # fusion), identical loss statistics. Supported on CPU/GPU too.
        self._rng = jax.random.key(seed, impl="rbg")
        init_rng, self._train_rng = jax.random.split(self._rng)
        # jit the whole init: one compiled executable instead of ~100 eager
        # op dispatches (each eager op costs a round-trip on the axon tunnel —
        # measured 193s eager vs seconds jitted for the full-width model).
        init_fn = jax.jit(
            lambda k: init_fcn8s(
                k,
                num_classes,
                bilinear_deconv_init=bilinear_deconv_init,
                width_mult=width_mult,
                fc_channels=fc_channels,
                variant=variant,
            )
        )
        params = init_fn(init_rng)
        if isinstance(optimizer, str):
            self.optimizer = make_optimizer(
                optimizer, clip_norm=clip_norm, **(optimizer_kwargs or {}))
        else:
            # a ready optax.GradientTransformation (must carry an
            # inject_hyperparams 'learning_rate' for the per-step schedule)
            self.optimizer = optimizer
        self.state = create_train_state(params, self.optimizer)

        restored_ema = None
        restored_observer = {}
        if model_load_dir is not None:
            example = {
                "step": self.state.step,
                "params": self.state.params,
                "opt_state": self.state.opt_state,
            }
            restored = ckpt.load_checkpoint(model_load_dir, example)
            self.state = self.state._replace(
                step=jnp.asarray(restored["step"]),
                params=restored["params"],
                opt_state=restored["opt_state"],
            )
            restored_ema = restored.get("ema")
            restored_observer = meta.get("train_observer") or {}
        else:
            # Fresh build: pretrained encoder first, then (optionally) a
            # variables restore on top — the reference's ordering
            # (`fcn8s_tensorflow.py:103-125`: build from VGG-16, then
            # `tf.train.Saver().restore` if variables_load_dir is given).
            if vgg16_dir is not None:
                self._load_vgg16(vgg16_dir)
            if variables_load_dir is not None:
                self.load_variables(variables_load_dir)

        # Bookkeeping mirroring the reference (`fcn8s_tensorflow.py:52-62`).
        self.variables_updated = False
        self.eval_dataset = None
        self.metric_names = []
        self.metric_values = []
        self.best_metric_values = []
        self.training_loss = None
        self.best_training_loss = 99999999.9
        self.g_step = int(self.state.step)

        # jit executable caches keyed by batch shape
        self._train_steps = {}
        self._eval_steps = {}
        self._predict_steps = {}
        self._tta_steps = {}
        self._summary_logger = None
        # EMA average persists in checkpoints: a resumed train(ema_decay=...)
        # continues the running average instead of restarting it from the
        # live params (tests/test_ema.py::test_ema_checkpoint_roundtrip)
        self._ema_params = restored_ema
        self._ema_fn = None
        # Plateau-annealer / early-stopping counters from an interrupted run:
        # carried in the manifest, continued by the next train() call only
        self._observer_state = dict(restored_observer)
        self._observer_pending = dict(restored_observer)

    # ------------------------------------------------------------------
    def summary(self, input_hw=(1024, 512), batch: int = 1) -> str:
        """Per-layer report: kernel/output shapes, params, forward MACs,
        activation bytes, with model totals (utils/summary.py — computed
        analytically from the param tree, no device work). Beyond the
        reference's 20 TensorBoard weight histograms
        (`fcn8s_tensorflow.py:324-369`): answers where the FLOPs and the
        activation HBM actually go at a given resolution."""
        from ..utils.summary import model_summary

        return model_summary(self.state.params, input_hw, batch)

    # ------------------------------------------------------------------
    @classmethod
    def resume(cls, save_dir: str, **kwargs) -> "FCN8s":
        """Resume from the most recent checkpoint under ``save_dir`` (the
        directory passed to ``train(save_dir=...)``). Restores params,
        optimizer state, and the global step, so LR schedules continue
        where they left off (the reference's manual recovery flow,
        SURVEY.md §5, made one call)."""
        path = ckpt.latest_checkpoint(save_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {save_dir}")
        return cls(model_load_dir=path, **kwargs)

    # ------------------------------------------------------------------
    def _load_vgg16(self, vgg16_dir: str) -> None:
        """Restore pretrained encoder weights into the param tree
        (reference `_load_vgg16`, `fcn8s_tensorflow.py:127-152` — there an
        opaque SavedModel graph load; here an explicit weight restore)."""
        restored = ckpt.load_params_only(
            vgg16_dir, {"encoder": self.state.params["encoder"]}
        )
        params = dict(self.state.params)
        params["encoder"] = restored["encoder"]
        self.state = self.state._replace(params=params)
        self._invalidate_quantized()

    # ------------------------------------------------------------------
    # compiled-step caches
    # ------------------------------------------------------------------
    @staticmethod
    def _freeze_cfg(obj):
        """Canonical hashable key for a (possibly nested) augment config."""
        if isinstance(obj, dict):
            return tuple(sorted((k, FCN8s._freeze_cfg(v)) for k, v in obj.items()))
        if isinstance(obj, (list, tuple)):
            return tuple(FCN8s._freeze_cfg(v) for v in obj)
        return obj

    # Executables are big (host program + device constants); the augment
    # keying exists so ALTERNATING configs (augmented train / plain eval-on-
    # train) stay warm, not to retain one executable per config of a long
    # sweep — bound the cache and evict least-recently-used beyond this.
    _TRAIN_STEP_CACHE_MAX = 4

    def _get_train_step(self, batch_shape):
        key = (batch_shape, self._freeze_cfg(getattr(self, "_device_augment_cfg", None)))
        if key in self._train_steps:
            self._train_steps[key] = self._train_steps.pop(key)  # mark MRU
        else:
            while len(self._train_steps) >= self._TRAIN_STEP_CACHE_MAX:
                self._train_steps.pop(next(iter(self._train_steps)))
            self._train_steps[key] = compile_train_step(
                self.mesh,
                self.optimizer,
                self.num_classes,
                tensor_parallel=(self.tensor_parallel
                                 and not getattr(self, "_train_spatial", False)),
                compute_dtype=self.compute_dtype,
                example_state=self.state,
                augment_fn=getattr(self, "_augment_fn", None),
                remat=self.remat,
                grad_accum=getattr(self, "_grad_accum", 1),
                spatial_partition=getattr(self, "_train_spatial", False),
                ignore_label=self.ignore_label,
                class_weights=getattr(self, "_class_weights", None),
            )
        return self._train_steps[key]

    def _get_eval_step(self, batch_shape, spatial_partition=False):
        key = (batch_shape, spatial_partition)
        if key not in self._eval_steps:
            self._eval_steps[key] = compile_eval_step(
                self.mesh,
                self.num_classes,
                tensor_parallel=self.tensor_parallel and not spatial_partition,
                compute_dtype=self.compute_dtype,
                example_params=self.state.params,
                spatial_partition=spatial_partition,
                ignore_label=self.ignore_label,
                class_weights=getattr(self, "_class_weights", None),
            )
        return self._eval_steps[key]

    def _get_predict_step(self, batch_shape, argmax, spatial_partition=False,
                          overlay=None, quantized=False):
        """``overlay``: (cache_key, (C,4) RGBA lut) — bakes on-device overlay
        compositing into the executable. Argmax ids travel D2H as uint8 when
        they fit (4× smaller transfer); the facade re-widens to int32."""
        overlay_key, overlay_lut = overlay if overlay is not None else (None, None)
        key = (batch_shape, argmax, spatial_partition, overlay_key, quantized)
        if key not in self._predict_steps:
            compact = argmax and overlay_lut is None and self.num_classes <= 255
            self._predict_steps[key] = compile_predict_step(
                self.mesh,
                argmax=argmax,
                tensor_parallel=self.tensor_parallel and not spatial_partition,
                compute_dtype=self.compute_dtype,
                example_params=self._quantized_params() if quantized else self.state.params,
                spatial_partition=spatial_partition,
                id_dtype=jnp.uint8 if compact else jnp.int32,
                overlay_lut=overlay_lut,
                quantized=quantized,
            )
        return self._predict_steps[key]

    def _quantized_params(self):
        """Lazily build + cache the int8 inference params (ops/quantize.py).
        Invalidated whenever training updates ``self.state`` (see
        ``_invalidate_quantized``); rebuild is one cheap jitted pass over
        the ~134 M fp32 params. Uses calibrated static activation scales
        when ``calibrate_quantization`` has run."""
        if getattr(self, "_qparams", None) is None:
            from ..ops.quantize import quantize_fcn8s_params

            absmax = getattr(self, "_act_absmax", None)
            self._qparams = jax.jit(quantize_fcn8s_params)(self.state.params, absmax)
        return self._qparams

    def calibrate_quantization(self, images, *, batch_size: int = 8):
        """Calibrate static int8 activation scales from representative
        ``images`` (N,H,W,3; a few dozen suffice). Replaces the default
        dynamic per-tensor quantization: each conv's input scale is frozen
        at max|x| seen here / 127, so the quantize step becomes a pure
        elementwise epilogue (no per-layer reduction pass). Scales persist
        across training (re-calibrate after large distribution shifts).

        Returns the layer -> absmax dict (also cached on the model)."""
        from ..ops.quantize import collect_activation_absmax

        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        fn = jax.jit(partial(collect_activation_absmax,
                             compute_dtype=self.compute_dtype))
        absmax = None
        for start in range(0, images.shape[0], batch_size):
            chunk, _ = self._prepare_images(images[start : start + batch_size])
            batch_max = fn(self.state.params, self._put_batch(chunk))
            absmax = batch_max if absmax is None else jax.tree.map(
                jnp.maximum, absmax, batch_max)
        self._act_absmax = absmax
        self._invalidate_quantized()
        # calibration CHANGES the qparams pytree structure (adds act_scale
        # leaves), so quantized predict executables compiled against the
        # dynamic-mode structure must be dropped, not just the cached params
        self._predict_steps = {
            k: v for k, v in self._predict_steps.items() if not k[-1]
        }
        self._tta_steps = {
            k: v for k, v in self._tta_steps.items() if not k[-1]
        }
        return absmax

    def _invalidate_quantized(self):
        """Training moved the params: requantize on next quantized predict
        (executables are param-free and stay cached)."""
        self._qparams = None

    # ------------------------------------------------------------------
    def _update_ema(self, decay: float):
        """One EMA step: ``ema = d*ema + (1-d)*params``, as a single jitted
        pytree pass with the EMA buffer DONATED (in-place on device, no
        extra resident copy). Seeds ``ema = params`` on the first call."""
        if self._ema_params is None:
            self._ema_params = jax.tree.map(jnp.copy, self.state.params)
            return
        if self._ema_fn is None:
            def ema_step(ema, params, d):
                return jax.tree.map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                    ema, params,
                )

            self._ema_fn = jax.jit(ema_step, donate_argnums=0)
        self._ema_params = self._ema_fn(
            self._ema_params, self.state.params, np.float32(decay)
        )

    @property
    def ema_params(self):
        """The EMA param pytree (see ``train(ema_decay=...)``)."""
        if self._ema_params is None:
            raise ValueError(
                "No EMA params: train with ema_decay=<float> first."
            )
        return self._ema_params

    def adopt_ema(self):
        """Replace the live params with the EMA params (keeps optimizer
        state — Adam moments now describe the pre-adoption trajectory,
        which is the standard finalize-for-serving move, not a resume
        point). Marks checkpoints dirty so a following ``save()`` persists
        the averaged weights; invalidates the int8 cache."""
        self.state = self.state._replace(params=self.ema_params)
        self._ema_params = None  # donated buffer now aliases live params
        self.variables_updated = True
        self._invalidate_quantized()

    def _resolve_ema(self, use_ema: bool, quantized: bool):
        """Map a ``use_ema`` flag to a params-override tree (or None for the
        live params). EMA excludes ``quantized``: the int8 scales are
        calibrated against the live params, so silently quantizing a
        different tree would serve miscalibrated activations."""
        if not use_ema:
            return None
        if quantized:
            raise ValueError(
                "use_ema and quantized are mutually exclusive: int8 "
                "activation scales are calibrated for the live params. "
                "adopt_ema() first, then recalibrate and quantize."
            )
        return self.ema_params

    def _overlay_lut(self, color_map):
        """(cache_key, lut) for a class_id -> RGBA dict (negative ids — the
        reference color maps carry a -1 licence-plate entry — are dropped;
        argmax never produces them)."""
        items = tuple(
            sorted((int(k), tuple(int(x) for x in v)) for k, v in color_map.items())
        )
        lut = np.zeros((self.num_classes, 4), np.float32)
        for class_id, rgba in items:
            if 0 <= class_id < self.num_classes:
                lut[class_id] = rgba
        return items, lut

    # ------------------------------------------------------------------
    @staticmethod
    def _labels_to_ids(labels: np.ndarray) -> np.ndarray:
        """Accept one-hot (N,H,W,C) — the reference's contract — or integer
        ID maps (N,H,W) — the efficient native contract."""
        if labels.ndim == 4:
            return np.argmax(labels, axis=-1).astype(np.uint8)
        return labels.astype(np.uint8)

    def _pad_batch_dim(self, *arrays, multiple=None):
        """Pad the batch dim up to ``multiple`` (default: the mesh's
        data-axis size) by repeating the last sample; returns
        (padded_arrays..., sample_mask). The mask makes loss/metrics exactly
        short-batch despite the padding."""
        n = arrays[0].shape[0]
        data_size = multiple if multiple is not None else self.mesh.shape["data"]
        pad = (-n) % data_size
        mask = np.ones((n + pad,), np.float32)
        if pad:
            mask[n:] = 0.0
            arrays = tuple(
                np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0) for a in arrays
            )
        return (*arrays, mask)

    def _spatial_sharding(self):
        """NamedSharding for width-over-'model' inputs (one construction
        shared by the train stream, evaluation, and predict dispatch)."""
        from jax.sharding import NamedSharding

        from ..parallel.mesh import spatial_spec

        return NamedSharding(self.mesh, spatial_spec())

    def _put_batch(self, images, label_ids=None, sample_mask=None):
        sharding = batch_sharding(self.mesh)
        out = [jax.device_put(np.ascontiguousarray(images), sharding)]
        if label_ids is not None:
            out.append(jax.device_put(np.ascontiguousarray(label_ids), sharding))
        if sample_mask is not None:
            out.append(jax.device_put(sample_mask, sharding))
        return out[0] if len(out) == 1 else tuple(out)

    # ------------------------------------------------------------------
    def train(
        self,
        train_generator,
        epochs,
        steps_per_epoch,
        learning_rate_schedule,
        keep_prob=0.5,
        l2_regularization=0.0,
        eval_dataset="train",
        eval_frequency=5,
        val_generator=None,
        val_steps=None,
        metrics={},
        save_during_training=False,
        save_dir=None,
        save_best_only=True,
        save_tags=["default"],
        save_name="",
        save_frequency=5,
        saver="saved_model",
        monitor="loss",
        record_summaries=True,
        summaries_frequency=10,
        summaries_dir=None,
        summaries_name=None,
        training_loss_display_averaging=3,
        device_augment=None,
        prefetch=2,
        gradient_accumulation=1,
        spatial_partition=False,
        ema_decay=None,
        class_weights=None,
        early_stopping=None,
        reduce_lr_on_plateau=None,
        train_log=None,
    ):
        """Train the model. Argument semantics follow the reference
        (`fcn8s_tensorflow.py:399-523`): the generator yields (images,
        ground_truth) with GT either one-hot (N,H,W,C) or ID maps (N,H,W);
        ``learning_rate_schedule`` is any ``step -> float`` callable,
        re-evaluated every step; ``metrics`` selects which of
        {'loss','mean_iou','accuracy'} to track during periodic evaluation;
        save-best-only gates checkpoints on the monitored metric improving
        (note: the reference's monitor logic has live bugs — `:624-626`,
        the 'accuracry' typo — we implement the documented behavior).

        ``device_augment`` (TPU-native extra): a dict of kwargs for
        ``ops.augment_device.make_augment_fn`` (e.g. ``{'flip': 0.5,
        'brightness': (0.8, 1.2, 0.5)}``) — augmentation runs *inside* the
        compiled step on device, overlapped with compute, instead of on the
        host like the reference's OpenCV pipeline.

        ``prefetch`` (TPU-native extra): depth of the background
        host->device input pipeline. The reference runs its generator
        serially with the training step (SURVEY.md §3.2 — "a key
        inefficiency"); here a worker thread decodes/augments/pads and
        ``device_put``s ahead, overlapping H2D DMA with compute. ``0``
        disables (synchronous, reference behavior).

        ``gradient_accumulation=A`` (TPU-native extra): each generator batch
        is split into A microbatches scanned inside the compiled step with
        exact weighted gradient accumulation (parallel/steps.py) — one-chip
        activation memory drops to a microbatch's worth, so the reference's
        canonical batch-16 config (BASELINE.md) fits at full resolution
        (pairs with ``remat=True`` for the extreme cases). Batches are
        padded (masked, exactly) to a multiple of lcm(data axis, A).

        ``spatial_partition=True`` (TPU-native extra): shard the width dim
        over the mesh's 'model' axis during TRAINING — GSPMD conv halo
        exchanges in forward and backward (parallel/steps.py). For
        mega-resolution training where one chip's activation HBM binds;
        requires a mesh with a >1 'model' axis, excludes tensor_parallel.

        ``ema_decay`` (TPU-native extra, beyond the reference): maintain an
        exponential moving average of the fp32 master params —
        ``ema = d*ema + (1-d)*params`` after every optimizer step, seeded
        with a copy of the params at the first step. The update is one
        jitted donated pytree pass (device-resident, ~1.6 GB HBM traffic
        for the 134M-param model, no host round-trip) and persists across
        ``train`` calls. Evaluate/serve the averaged weights via
        ``use_ema=True`` on predict/predict_tta/evaluate, or make them
        permanent with ``adopt_ema()`` (then ``save()`` persists them).
        The running average itself is checkpointed alongside the params,
        so ``FCN8s.resume`` / ``model_load_dir`` continue it rather than
        restarting the average from the live weights.

        ``class_weights`` (TPU-native extra, beyond the reference): an
        ``(num_classes,)`` per-class loss weight vector — the training and
        evaluation loss become the weighted mean
        ``sum(w[label]*ce)/sum(w[label])`` (composes with ``ignore_label``;
        grad-accum microbatch shares become pixel-weight sums). Use
        ``ops.losses.median_frequency_class_weights(counts)`` to derive the
        standard median-frequency-balanced vector from per-class pixel
        counts. Baked into the executable as constants; persists for
        subsequent ``evaluate`` calls so eval loss matches training loss.

        ``early_stopping`` (beyond the reference): an int patience, or a
        dict ``{"patience": int, "min_delta": float}``. Training stops
        once the ``monitor``-ed value has gone ``patience`` consecutive
        *observations* without improving by more than ``min_delta``
        (default 0). An observation is each epoch's training loss when
        ``monitor='loss'`` and loss isn't among the eval ``metrics``;
        otherwise each periodic evaluation (every ``eval_frequency``
        epochs) — epochs with no measurement don't consume patience.

        ``reduce_lr_on_plateau`` (beyond the reference): an int patience or
        a dict ``{"patience": int, "factor": float (default 0.1),
        "min_delta": float (default 0), "min_lr": float (default 0)}``.
        Whenever the monitored value stalls for ``patience`` observations
        (same observation cadence as ``early_stopping``), the learning
        rate from ``learning_rate_schedule`` is scaled by an extra
        cumulative ``factor`` — the standard plateau annealer, composing
        multiplicatively with whatever schedule is supplied. ``min_lr``
        bounds the value *immediately after a reduction* (a reduction
        never takes the current LR below it); the base schedule itself is
        never floored. Each reduction resets the stall counter. Composes
        with ``early_stopping`` (independent counters).

        Both observers' counters (cumulative LR scale, best values, stall
        counts) are written into checkpoint manifests, and the FIRST
        ``train`` call on a model restored via ``resume``/``model_load_dir``
        continues them — an interrupted plateau-annealed run resumes at its
        reduced LR, not the base schedule. Subsequent ``train`` calls start
        the counters fresh (each call is a new annealing run).

        ``train_log``: path to a JSONL file; appends one record per epoch
        (epoch, global_step, training_loss, learning_rate, any measured
        eval metrics, wall-clock time) — a grep/pandas-friendly sidecar to
        the TensorBoard streams.
        """
        # --- validation (reference `:511-529`) ---
        metrics = set(metrics)  # the reference's default `{}` is a dict literal
        if not metrics <= _ALLOWED_METRICS:
            raise ValueError(f"metrics must be a subset of {_ALLOWED_METRICS}, got {metrics}")
        if monitor not in _ALLOWED_METRICS:
            raise ValueError(f"monitor must be one of {_ALLOWED_METRICS}, got '{monitor}'")
        if eval_dataset not in {"train", "val"}:
            raise ValueError("eval_dataset must be 'train' or 'val'")
        if eval_dataset == "val" and (val_generator is None or val_steps is None):
            raise ValueError("eval_dataset == 'val' requires val_generator and val_steps")
        if save_during_training and save_dir is None:
            raise ValueError("save_during_training requires save_dir")
        if monitor != "loss" and monitor not in metrics:
            raise ValueError(f"monitor '{monitor}' requires it to be in metrics {metrics}")
        if ema_decay is not None and not (0.0 < float(ema_decay) < 1.0):
            raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
        def _observer_cfg(value, name, defaults):
            """Shared parsing for the monitored-metric observers
            (early_stopping / reduce_lr_on_plateau): int patience or a
            dict with patience + the feature's extra keys."""
            d = dict(value) if isinstance(value, dict) else {"patience": value}
            out = {"patience": int(d.pop("patience"))}
            for key, default in defaults.items():
                out[key] = float(d.pop(key, default))
            if d:
                raise ValueError(f"unknown {name} keys: {sorted(d)}")
            if out["patience"] < 1:
                raise ValueError(
                    f"{name} patience must be >= 1, got {out['patience']}")
            if monitor != "loss" and not (metrics and eval_frequency):
                raise ValueError(
                    f"{name} on an eval metric requires metrics and "
                    f"eval_frequency so the monitor is ever measured")
            return out

        # Counters staged by a checkpoint restore (train_observer manifest
        # key): the first train() call on a resumed model continues the
        # in-progress annealer/patience state; later calls start fresh
        # (consume-once — tests/test_engine.py pins both behaviors).
        pending_observer = getattr(self, "_observer_pending", None) or {}
        self._observer_pending = {}
        lr_scale = 1.0  # cumulative plateau factor; 1.0 when disabled
        if early_stopping is not None:
            es_cfg = _observer_cfg(early_stopping, "early_stopping",
                                   {"min_delta": 0.0})
            es_patience, es_min_delta = es_cfg["patience"], es_cfg["min_delta"]
            es_best = pending_observer.get("es_best")
            es_stale = int(pending_observer.get("es_stale", 0))
        if reduce_lr_on_plateau is not None:
            rp_cfg = _observer_cfg(
                reduce_lr_on_plateau, "reduce_lr_on_plateau",
                {"factor": 0.1, "min_delta": 0.0, "min_lr": 0.0})
            rp_patience, rp_factor = rp_cfg["patience"], rp_cfg["factor"]
            rp_min_delta, rp_min_lr = rp_cfg["min_delta"], rp_cfg["min_lr"]
            if not 0.0 < rp_factor < 1.0:
                raise ValueError(
                    f"reduce_lr_on_plateau factor must be in (0, 1), got {rp_factor}")
            rp_best = pending_observer.get("rp_best")
            rp_stale = int(pending_observer.get("rp_stale", 0))
            lr_scale = float(pending_observer.get("lr_scale", 1.0))

        def _improved(obs, best, delta):
            """Lower-is-better for loss, higher otherwise; first
            observation always counts as an improvement."""
            return (best is None
                    or (obs < best - delta if monitor == "loss"
                        else obs > best + delta))

        if class_weights is not None:
            cw = tuple(float(w) for w in np.asarray(class_weights).reshape(-1))
            if len(cw) != self.num_classes:
                raise ValueError(
                    f"class_weights must have length num_classes="
                    f"{self.num_classes}, got {len(cw)}")
            if any(w < 0 for w in cw):
                raise ValueError("class_weights must be non-negative")
        else:
            cw = None
        if cw != getattr(self, "_class_weights", None):
            self._train_steps.clear()  # weights bake in as constants
            self._eval_steps.clear()
        self._class_weights = cw

        if gradient_accumulation != getattr(self, "_grad_accum", 1):
            self._train_steps.clear()  # accumulation is baked into the executable
        self._grad_accum = gradient_accumulation
        if spatial_partition != getattr(self, "_train_spatial", False):
            self._train_steps.clear()  # sharding layout is baked in
        self._train_spatial = spatial_partition

        # The augment config is part of the compiled-step cache KEY (see
        # _get_train_step), so alternating augmented / plain train() calls
        # keep both executables cached instead of recompiling on each switch.
        if device_augment is not None:
            from ..ops.augment_device import make_augment_fn

            if getattr(self, "_device_augment_cfg", None) != device_augment:
                self._augment_fn = make_augment_fn(**device_augment)
            self._device_augment_cfg = device_augment
        else:
            self._device_augment_cfg = None
            self._augment_fn = None

        self.eval_dataset = eval_dataset
        self._initialize_metrics(metrics)

        logger = None
        if record_summaries:
            if summaries_dir is None:
                raise ValueError("record_summaries requires summaries_dir")
            logger = SummaryLogger(summaries_dir, summaries_name)
            self._summary_logger = logger

        g_step = int(self.state.step)  # resume from checkpointed global step

        def _lr(step):
            return float(learning_rate_schedule(step)) * lr_scale

        learning_rate = _lr(g_step)
        loss_history = deque(maxlen=training_loss_display_averaging)

        # Background input pipeline: host decode/pad + device_put ahead of
        # the step, so H2D overlaps compute (see `prefetch` in the docstring).
        train_stream = self._make_train_stream(train_generator, prefetch)

        for epoch in range(1, epochs + 1):
            tr = trange(steps_per_epoch, file=sys.stdout)
            tr.set_description(f"Epoch {epoch}/{epochs}")

            for step_i in tr:
                im_d, lb_d, mask_d = next(train_stream)
                step_fn = self._get_train_step(im_d.shape)
                self.state, loss = step_fn(
                    self.state, im_d, lb_d, mask_d, self._train_rng,
                    learning_rate, l2_regularization, keep_prob,
                )
                g_step += 1
                self.variables_updated = True
                self._qparams = None  # int8 cache now stale
                if ema_decay is not None:
                    self._update_ema(ema_decay)
                loss_history.append(loss)  # device scalar — no sync

                # Hard-sync the loss only on the summaries/display cadence
                # (and at epoch end): a per-step float(loss) D2H round-trip
                # serializes step dispatch against the tunnel RTT and defeats
                # the prefetch pipeline (ADVICE r1). Between syncs, dispatch
                # runs ahead and XLA queues the steps.
                if g_step % summaries_frequency == 0 or step_i == steps_per_epoch - 1:
                    vals = np.asarray(jnp.stack(list(loss_history)))  # one D2H
                    self.training_loss = float(vals.mean())
                    tr.set_postfix(loss=f"{self.training_loss:.4f}", lr=learning_rate)
                    if logger is not None and g_step % summaries_frequency == 0:
                        logger.log_training_step(g_step, float(vals[-1]), learning_rate)

                learning_rate = _lr(g_step)

            self.g_step = g_step

            if logger is not None:
                logger.log_weight_summaries(g_step, self.state.params)

            # --- periodic evaluation (reference `:589-608`) ---
            if metrics and epoch % eval_frequency == 0:
                if eval_dataset == "train":
                    # share the (prefetched) training stream, like the
                    # reference shares the raw iterator; its batches carry
                    # the TRAINING sharding, so the eval step must match
                    self._evaluate(
                        train_stream, metrics, steps_per_epoch,
                        description="Evaluation on training dataset",
                        device_stream=True,
                        spatial_partition=spatial_partition,
                    )
                else:
                    self._evaluate(
                        val_generator, metrics, val_steps,
                        description="Evaluation on validation dataset",
                        spatial_partition=spatial_partition,
                    )
                if logger is not None:
                    logger.log_evaluation(
                        g_step, dict(zip(self.metric_names, self.metric_values))
                    )

            evaluated = bool(metrics and eval_frequency
                             and epoch % eval_frequency == 0
                             and self.metric_values)
            # the LR the epoch actually trained with, for the train_log
            # record (the plateau annealer below may change it for the NEXT
            # epoch's steps)
            epoch_lr = learning_rate

            # --- LR plateau + early stopping (beyond the reference) ---
            # Updated BEFORE the save so the checkpoint carries THIS epoch's
            # observer state: with the old post-save ordering a resumed run's
            # annealer was one observation stale, so the plateau fired one
            # eval later than in the uninterrupted run and the LR streams
            # (and thus the params) diverged from the kill point on.
            stop_early = False
            if early_stopping is not None or reduce_lr_on_plateau is not None:
                if monitor == "loss" and "loss" not in self.metric_names:
                    obs = self.training_loss
                elif evaluated:
                    obs = float(
                        self.metric_values[self.metric_names.index(monitor)])
                else:
                    obs = None  # monitor not measured this epoch

                if obs is not None and reduce_lr_on_plateau is not None:
                    if _improved(obs, rp_best, rp_min_delta):
                        rp_best, rp_stale = obs, 0
                    else:
                        rp_stale += 1
                        if rp_stale >= rp_patience:
                            new_scale = lr_scale * rp_factor
                            base = float(learning_rate_schedule(g_step))
                            # min_lr bounds the REDUCED value only (Keras
                            # semantics): the base schedule is untouched,
                            # and a reduction never raises the scale
                            if base > 0.0 and base * new_scale < rp_min_lr:
                                new_scale = min(rp_min_lr / base, lr_scale)
                            lr_scale = new_scale
                            rp_stale = 0
                            learning_rate = _lr(g_step)
                            print(f"Plateau: '{monitor}' stalled "
                                  f"{rp_patience} observations — learning "
                                  f"rate scaled to {learning_rate:.3e}.")
                if obs is not None and early_stopping is not None:
                    if _improved(obs, es_best, es_min_delta):
                        es_best, es_stale = obs, 0
                    else:
                        es_stale += 1
                        if es_stale >= es_patience:
                            print(f"Early stopping: '{monitor}' has not "
                                  f"improved in {es_stale} observations "
                                  f"(best {es_best:.6f}).")
                            stop_early = True
                # live counters -> checkpointable state (save() persists it;
                # a restore stages it for the next train() call to continue)
                observer_state = {}
                if reduce_lr_on_plateau is not None:
                    observer_state.update(
                        lr_scale=lr_scale, rp_best=rp_best, rp_stale=rp_stale)
                if early_stopping is not None:
                    observer_state.update(es_best=es_best, es_stale=es_stale)
                self._observer_state = observer_state

            # --- periodic save (reference `:614-642`) ---
            if save_during_training and epoch % save_frequency == 0:
                should_save = True
                if save_best_only:
                    should_save = self._monitor_improved(monitor, metrics, epoch, eval_frequency)
                if should_save:
                    self.save(
                        model_save_dir=save_dir,
                        saver=saver,
                        tags=save_tags,
                        name=save_name or None,
                        block=False,  # overlap D2H + serialization with training
                    )

            # --- best-value bookkeeping (reference `:649-658`) ---
            if self.training_loss is not None and self.training_loss < self.best_training_loss:
                self.best_training_loss = self.training_loss
            for i, name in enumerate(self.metric_names):
                if i < len(self.metric_values):
                    if name == "loss":
                        if self.metric_values[i] < self.best_metric_values[i]:
                            self.best_metric_values[i] = self.metric_values[i]
                    elif self.metric_values[i] > self.best_metric_values[i]:
                        self.best_metric_values[i] = self.metric_values[i]

            if train_log:
                record = {
                    "epoch": epoch,
                    "global_step": g_step,
                    "training_loss": self.training_loss,
                    "learning_rate": float(epoch_lr),
                    "time": time.time(),
                }
                if evaluated:
                    record.update(
                        {f"eval_{n}": float(v) for n, v in
                         zip(self.metric_names, self.metric_values)})
                # short-lived append per epoch: crash/interrupt-safe (no
                # handle outlives the loop) and each record is durable
                with open(train_log, "a") as log_f:
                    log_f.write(json.dumps(record) + "\n")

            if stop_early:
                break

        if logger is not None:
            logger.flush()
        self._close_train_stream()
        self._join_pending_save()  # don't return with a checkpoint mid-write

    # ------------------------------------------------------------------
    def find_learning_rate(self, train_generator, *, min_lr=1e-7, max_lr=1.0,
                           steps=50, keep_prob=1.0, l2_regularization=0.0,
                           smoothing=0.9, divergence_factor=4.0):
        """LR range test (Smith 2015, arXiv:1506.01186 §3.3) — beyond the
        reference, whose tutorial hand-picks the 1e-4 schedule. Sweeps the
        learning rate exponentially from ``min_lr`` to ``max_lr`` over
        ``steps`` real optimizer steps, recording the loss; stops early when
        the smoothed loss diverges past ``divergence_factor`` × its best.

        A natural fit for this engine: the LR is a traced scalar in the one
        compiled train step (parallel/steps.py), so the whole sweep reuses a
        single executable — the TF1 equivalent would feed a placeholder, the
        naive JAX port would recompile per value.

        The model is left EXACTLY as found: the full ``TrainState`` (params,
        optimizer state, step) is snapshot with device-side copies before
        the sweep and restored after, so this can run on a live model at any
        point. EMA/observer state is untouched (no updates are recorded).

        Returns ``{"learning_rates": [...], "losses": [...], "smoothed":
        [...], "suggestion": float}`` — ``suggestion`` is the LR at the
        steepest descent of the smoothed curve (the usual pick; inspect the
        curve before trusting it blindly)."""
        import math

        if not (0.0 < min_lr < max_lr):
            raise ValueError(f"need 0 < min_lr < max_lr, got {min_lr}, {max_lr}")
        if steps < 2:
            raise ValueError(f"steps must be >= 2, got {steps}")
        snapshot = jax.tree.map(ckpt.jnp_copy, self.state)
        was_dirty = self.variables_updated
        stream = self._make_train_stream(train_generator, prefetch=0)
        lrs, losses, smoothed = [], [], []
        avg, best = 0.0, math.inf
        try:
            for i in range(steps):
                lr = min_lr * (max_lr / min_lr) ** (i / (steps - 1))
                im_d, lb_d, mask_d = next(stream)
                step_fn = self._get_train_step(im_d.shape)
                self.state, loss = step_fn(
                    self.state, im_d, lb_d, mask_d, self._train_rng,
                    lr, l2_regularization, keep_prob,
                )
                loss = float(loss)
                lrs.append(lr)
                losses.append(loss)
                avg = smoothing * avg + (1.0 - smoothing) * loss
                debiased = avg / (1.0 - smoothing ** (i + 1))
                smoothed.append(debiased)
                if math.isfinite(debiased):
                    best = min(best, debiased)
                if not math.isfinite(loss) or (
                        i >= 10 and debiased > divergence_factor * best):
                    break
        finally:
            self._close_train_stream()
            self.state = snapshot  # sweep leaves no trace
            self.variables_updated = was_dirty
        # steepest descent of the smoothed curve over log-spaced LRs (equal
        # log spacing -> the index of the most negative finite difference)
        diffs = [b - a for a, b in zip(smoothed, smoothed[1:])
                 if math.isfinite(a) and math.isfinite(b)]
        if diffs and min(diffs) < 0:
            idx = min(range(len(smoothed) - 1),
                      key=lambda j: (smoothed[j + 1] - smoothed[j]
                                     if math.isfinite(smoothed[j + 1] - smoothed[j])
                                     else math.inf))
            suggestion = lrs[idx]
        else:
            suggestion = min_lr  # nothing descended: sweep range is too hot
        return {"learning_rates": lrs, "losses": losses,
                "smoothed": smoothed, "suggestion": float(suggestion)}

    def _make_train_stream(self, train_generator, prefetch: int):
        """Iterator of device-resident (images, label_ids, mask) triples.

        With ``prefetch > 0`` a background thread runs the host pipeline and
        device_puts ahead (note: it reads up to ``prefetch`` batches beyond
        the last consumed one from ``train_generator``). With 0, fully
        synchronous (reference behavior)."""
        self._close_train_stream()

        # pad to lcm(data axis, grad_accum) so both the device_put sharding
        # and the in-step microbatch split divide; mask weighting keeps the
        # gradient exactly the short-batch gradient either way
        from math import gcd

        data_size = self.mesh.shape["data"]
        accum = getattr(self, "_grad_accum", 1)
        batch_multiple = data_size * accum // gcd(data_size, accum)

        def host_pipeline():
            while True:
                images, labels = next(train_generator)
                label_ids = self._labels_to_ids(np.asarray(labels))
                images_p, label_ids_p, mask = self._pad_batch_dim(
                    np.ascontiguousarray(np.asarray(images)), label_ids,
                    multiple=batch_multiple,
                )
                yield images_p, np.ascontiguousarray(label_ids_p), mask

        if getattr(self, "_train_spatial", False):
            sp = self._spatial_sharding()
            shardings = (sp, sp, batch_sharding(self.mesh))
        else:
            shardings = batch_sharding(self.mesh)

        if prefetch and prefetch > 0:
            from ..data.prefetch import DevicePrefetcher

            self._train_stream = DevicePrefetcher(
                host_pipeline(), shardings, depth=prefetch
            )
            return self._train_stream

        def sync_stream():
            sh = shardings if isinstance(shardings, tuple) else (shardings,) * 3
            for arrays in host_pipeline():
                yield tuple(jax.device_put(a, s) for a, s in zip(arrays, sh))

        self._train_stream = None
        return sync_stream()

    def _close_train_stream(self) -> None:
        stream = getattr(self, "_train_stream", None)
        if stream is not None:
            stream.close()
            self._train_stream = None

    def _monitor_improved(self, monitor, metrics, epoch, eval_frequency) -> bool:
        """Documented save-best-only semantics: save iff the monitored value
        improved on its historical best (lower for loss, higher otherwise).

        Warm-up caveat (first save wins): until the monitored metric has
        been measured at least once (i.e. before the first eval when
        ``monitor`` is an eval metric), every ``save_frequency`` epoch
        saves unconditionally — "best so far" is undefined, and losing the
        early checkpoints to a strict reading of best-only would be worse.
        Pinned by tests/test_engine.py::test_monitor_first_save_wins."""
        if monitor == "loss" and "loss" not in self.metric_names:
            return self.training_loss is not None and self.training_loss < self.best_training_loss
        if monitor not in self.metric_names:
            return True  # nothing measured yet — first save wins
        i = self.metric_names.index(monitor)
        if not self.metric_values:
            return True
        if monitor == "loss":
            return self.metric_values[i] < self.best_metric_values[i]
        return self.metric_values[i] > self.best_metric_values[i]

    def _initialize_metrics(self, metrics) -> None:
        """Select tracked metrics (reference `_initialize_metrics`,
        `fcn8s_tensorflow.py:371-397`; fixed order loss, mean_iou, accuracy)."""
        self.metric_names = [m for m in ("loss", "mean_iou", "accuracy") if m in metrics]
        self.metric_values = []
        self.best_metric_values = [
            99999999.9 if n == "loss" else -1.0 for n in self.metric_names
        ]

    # ------------------------------------------------------------------
    def _evaluate(self, data_generator, metrics, num_batches, description="Running evaluation",
                  device_stream=False, spatial_partition=False, params=None):
        """Shared evaluation core (reference `_evaluate`,
        `fcn8s_tensorflow.py:660-697`): reset accumulators, forward-only
        update per batch with keep_prob=1, finalize, print.

        ``device_stream=True`` declares that ``data_generator`` yields
        device-resident (images, label_ids, mask) triples (the internal
        train stream); user generators always yield host (images, labels)
        pairs. An explicit flag, not duck-typing: a user generator that
        happens to yield 3-tuples must not be misrouted."""
        metrics_state = jax.device_put(
            empty_metrics_state(self.num_classes), replicated(self.mesh)
        )
        sp = self._spatial_sharding() if spatial_partition else None
        tr = trange(num_batches, file=sys.stdout)
        tr.set_description(description)
        for _ in tr:
            if device_stream:
                im_d, lb_d, mask_d = next(data_generator)
            else:
                images, labels = next(data_generator)
                label_ids = self._labels_to_ids(np.asarray(labels))
                images, label_ids, mask = self._pad_batch_dim(np.asarray(images), label_ids)
                if sp is not None:
                    im_d = jax.device_put(np.ascontiguousarray(images), sp)
                    lb_d = jax.device_put(np.ascontiguousarray(label_ids), sp)
                    mask_d = jax.device_put(mask, batch_sharding(self.mesh))
                else:
                    im_d, lb_d, mask_d = self._put_batch(images, label_ids, mask)
            eval_fn = self._get_eval_step(im_d.shape, spatial_partition)
            metrics_state = eval_fn(
                self.state.params if params is None else params,
                metrics_state, im_d, lb_d, mask_d,
            )

        final = finalize_metrics(metrics_state)
        values = {k: float(v) for k, v in final.items()}
        self.metric_values = [values[name] for name in self.metric_names]
        print("  ".join(f"{n}: {v:.4f}" for n, v in zip(self.metric_names, self.metric_values)))
        return values

    def evaluate(self, data_generator, num_batches, metrics={"loss", "mean_iou", "accuracy"},
                 l2_regularization=0.0, dataset="val", spatial_partition=False,
                 use_ema=False):
        """Public evaluation (reference `evaluate`, `fcn8s_tensorflow.py:699-741`).
        ``l2_regularization`` is accepted for parity but does not affect the
        reported loss (matching the reference, whose metric tracks total loss
        with the fed l2 rate — pass 0.0 there for the same number).

        ``spatial_partition=True`` (TPU-native extra): shard the width dim
        over the mesh's 'model' axis — exact (GSPMD conv halos), for
        mega-resolution evaluation that exceeds one chip's activation HBM;
        requires a >1 'model' axis. (For offline full-res scoring without a
        multi-chip mesh, ``predict(tile=...)`` + the offline evaluators in
        ``evaluation/`` are the alternative.)

        ``use_ema=True`` evaluates the EMA-averaged weights (see
        ``train(ema_decay=...)``) instead of the live params."""
        metrics = set(metrics)
        if not metrics <= _ALLOWED_METRICS:
            raise ValueError(f"metrics must be a subset of {_ALLOWED_METRICS}")
        if dataset not in {"train", "val"}:
            raise ValueError("dataset must be 'train' or 'val'")
        self.eval_dataset = dataset
        self._initialize_metrics(metrics)
        return self._evaluate(data_generator, metrics, num_batches,
                              spatial_partition=spatial_partition,
                              params=self._resolve_ema(use_ema, False))

    # ------------------------------------------------------------------
    def _prepare_images(self, images, pad_batch_to=None):
        """Pad H/W to stride 32 and the batch dim to the mesh multiple
        (optionally to a fixed ``pad_batch_to`` so serving reuses one
        executable across short tails). Returns (padded, (n, h, w))."""
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        n, h, w = images.shape[:3]
        ph, pw = (-h) % 32, (-w) % 32
        if ph or pw:
            images = np.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="constant")
        if pad_batch_to is not None and n < pad_batch_to:
            images = np.concatenate(
                [images, np.repeat(images[-1:], pad_batch_to - n, axis=0)], axis=0
            )
        images, _ = self._pad_batch_dim(images)
        return images, (n, h, w)

    def score_benchmark(self, dataset_dir, results_dir, *, split="val",
                        id_map=None, batch_size=8, use_ema=False,
                        quantized=False, tile=None,
                        tile_overlap=128, tile_blend=False,
                        instance_level=True, quiet=True, export_file=None):
        """One-call Cityscapes-benchmark scoring: predict every ``split``
        image under ``dataset_dir``, export the benchmark-format labelId
        PNGs into ``results_dir``, and run the offline pixel-level scorer —
        the reference's two-script workflow (``predict_and_save``,
        `fcn8s_tensorflow.py:772-855`, followed by
        `evalPixelLevelSemanticLabeling.py:648-674`) as one call.

        ``dataset_dir`` must have the standard layout
        (``leftImg8bit/<split>/<city>/*_leftImg8bit.png`` +
        ``gtFine/<split>/<city>/*_gtFine_labelIds.png``; instanceIds files
        too unless ``instance_level=False``). ``id_map`` converts predicted
        ids to the benchmark's labelId space — defaults to
        ``labels.TRAINIDS_TO_IDS_ARRAY`` for the modified 20-class trainId
        scheme; required explicitly otherwise. Prediction knobs
        (``use_ema``/``quantized``/``tile``/``tile_blend``) pass through —
        ``quantized=True`` scores the int8 serving path — calibrated static
        activation scales if ``calibrate_quantization`` has run (the shipped
        serving configuration; benchmarks/int8_closed_loop.py calibrates
        first), the dynamic-scale fallback otherwise — so the int8 accuracy
        cost is measurable in the SAME closed loop as bf16. ``quiet``
        (default True) silences the whole pipeline — per-city prediction
        banners/progress bars AND the scorer's terminal report.

        Returns the scorer's result dict (``confMatrix``, ``classScores``,
        ``averageScoreClasses``, ...), also written as JSON to
        ``export_file`` (default: inside ``results_dir``). The scorer's
        per-class IoU agrees with the streaming confusion-matrix IoU on
        identical predictions (tests/test_offline_eval.py
        ``test_closed_loop_scorer_consistency``)."""
        from ..evaluation import pixel_eval

        img_root = os.path.join(dataset_dir, "leftImg8bit", split)
        if not os.path.isdir(img_root):
            raise ValueError(f"no such image root: {img_root}")
        if id_map is None:
            from ..labels import NUM_TRAIN_CLASSES, TRAINIDS_TO_IDS_ARRAY

            if self.num_classes != NUM_TRAIN_CLASSES:
                raise ValueError(
                    "id_map is required when the model's class space is not "
                    "the modified 20-class Cityscapes trainId scheme")
            id_map = TRAINIDS_TO_IDS_ARRAY

        # EvalArgs built directly (NOT via default_args(), which reads the
        # CITYSCAPES_* env vars — every env-derived field is overridden here,
        # and a stale CITYSCAPES_EXPORT_DIR must not fail an explicit call).
        args = pixel_eval.EvalArgs()
        args.cityscapes_path = dataset_dir
        args.ground_truth_search = os.path.join(
            dataset_dir, "gtFine", split, "*", "*_gtFine_labelIds.png")
        args.prediction_path = results_dir
        args.eval_inst_level_score = instance_level
        args.quiet = quiet
        args.colorized = hasattr(sys.stderr, "isatty") and sys.stderr.isatty()
        args.export_file = export_file or os.path.join(
            results_dir, "resultPixelLevelSemanticLabeling.json")
        # Validate the GT tree BEFORE the (potentially hours-long) inference
        # pass, so a misnamed/missing gtFine split fails instantly.
        ground_truths = sorted(glob(args.ground_truth_search))
        if not ground_truths:
            raise ValueError(
                f"no ground truth found under {args.ground_truth_search}")

        os.makedirs(results_dir, exist_ok=True)
        for city in sorted(os.listdir(img_root)):
            city_dir = os.path.join(img_root, city)
            if not os.path.isdir(city_dir):
                continue
            self.predict_and_save(
                results_dir, city_dir, output_format="ids", id_map=id_map,
                batch_size=batch_size, overwrite_existing=False,
                use_ema=use_ema, quantized=quantized, tile=tile,
                tile_overlap=tile_overlap,
                tile_blend=tile_blend, verbose=not quiet,
            )

        predictions = [pixel_eval.get_prediction(args, gt)
                       for gt in ground_truths]
        return pixel_eval.evaluate_img_lists(predictions, ground_truths, args)

    def _dispatch_predict(self, padded, argmax=True, spatial_partition=False, overlay=None,
                          quantized=False, params=None):
        """H2D + async device dispatch; returns the device array WITHOUT
        syncing, so callers can pipeline load/compute/D2H (the reference
        serializes one image per ``sess.run``, `fcn8s_tensorflow.py:836`).
        ``params`` overrides the live params (e.g. the EMA tree — same
        structure/shardings, so the cached executable is reused)."""
        fn = self._get_predict_step(padded.shape, argmax, spatial_partition, overlay,
                                    quantized)
        call_params = (
            params if params is not None
            else self._quantized_params() if quantized
            else self.state.params
        )
        if spatial_partition:
            im_d = jax.device_put(
                np.ascontiguousarray(padded), self._spatial_sharding()
            )
        else:
            im_d = self._put_batch(padded)
        return fn(call_params, im_d)

    def predict(self, images, argmax=True, spatial_partition=False, overlay=None,
                quantized=False, tile=None, tile_overlap=128, tile_blend=False,
                use_ema=False):
        """Predict segmentations. ``images``: list/array (N,H,W,3), any H,W
        (padded to stride-32 internally, output cropped back — the reference
        relied on TF dynamic shapes, `fcn8s_tensorflow.py:743-770`).
        Returns (N,H,W) int argmax ids, or (N,H,W,C) softmax if ``argmax=False``.

        ``overlay``: a class_id -> RGBA dict (e.g. ``TRAINIDS_TO_RGBA_DICT``);
        when given, the argmax→color-LUT→alpha-composite runs **on device**
        inside the same executable and the return is the composited uint8 RGB
        (N,H,W,3) — BASELINE.md's on-TPU overlay (`viz/overlay.py` remains
        the host fallback).

        ``spatial_partition=True`` additionally shards the width dim over the
        mesh's 'model' axis (exact — GSPMD conv halo exchange) for
        mega-resolution inputs that exceed one chip's HBM; requires a mesh
        with a >1 'model' axis.

        ``quantized=True`` runs the int8 encoder (ops/quantize.py): dynamic
        per-tensor int8 activations x per-channel int8 weights on the MXU,
        bf16 decoder. Params are quantized lazily and re-quantized after any
        training. Call ``calibrate_quantization(images)`` first to freeze
        static activation scales — measured v5e @8x1024x512 argmax predict
        (with the packed-layout argmax, parallel/steps.py): bf16 32.9 ms,
        int8 dynamic 30.9 ms, int8 calibrated-static **25.5 ms**
        (313 img/s/chip compute-side; -22% vs bf16). Argmax agreement
        >= 97% on a trained model (tests/test_quantize.py).

        ``tile=(th, tw)`` runs tiled inference: the image is covered by
        overlapping tiles of one fixed shape, each tile's prediction is
        computed by ONE shared compiled executable, and only each tile's
        non-overlapping core is pasted into the output. For arbitrarily
        large images this (a) caps activation HBM at one dispatch chunk's
        worth (tiles run in chunks of 8 per data-mesh device, two chunks
        double-buffered — so ~8 tiles of activations per device, not 1),
        (b) avoids a recompile per input shape, and (c) stays under
        compile-size limits that full mega-resolution graphs can hit.
        Approximate only within ``tile_overlap/2`` px of interior tile
        seams (the cut truncates the receptive field); raise
        ``tile_overlap`` (default 128, must be even; both tile dims must
        be multiples of 32) to tighten agreement. Measured on this env:
        full 1024x2048 Cityscapes-resolution prediction — whose whole
        graph the remote compiler rejects — runs via (512,512)/128 tiles
        in 0.76 s steady-state on one chip (host<->device-transfer
        bound).

        ``tile_blend=True`` replaces the hard core-paste with **feathered
        probability blending**: every tile contributes its full softmax,
        weighted by a linear ramp rising over ``tile_overlap/2`` px from
        each tile edge, and overlapping contributions are normalized to a
        convex combination before the (optional) argmax — the standard
        seam-suppression for tiled segmentation. Exact where one tile
        covers a pixel alone; at seams it averages the overlapping views
        instead of cutting between them. Costs the full (...,C) float32
        probability D2H per tile (C x 4 the id-map payload) plus a host
        accumulation buffer of n x H x W x C floats; incompatible with
        ``overlay`` (composite on host afterwards: ``viz.overlay``).

        ``use_ema=True`` runs the EMA-averaged weights (see
        ``train(ema_decay=...)``) instead of the live params; the cached
        executable is reused (same tree structure/shardings), so toggling
        costs no recompile. Excludes ``quantized`` (int8 scales are
        calibrated against the live params)."""
        ov = self._overlay_lut(overlay) if overlay is not None else None
        ema = self._resolve_ema(use_ema, quantized)
        if tile is not None:
            if spatial_partition:
                raise ValueError("tile and spatial_partition are mutually exclusive")
            return self._predict_tiled(images, argmax, ov, quantized,
                                       tile, tile_overlap, params=ema,
                                       blend=tile_blend)
        if tile_blend:
            raise ValueError("tile_blend requires tile=(th, tw)")
        padded, (n, h, w) = self._prepare_images(images)
        out = np.asarray(self._dispatch_predict(padded, argmax, spatial_partition, ov,
                                                quantized, params=ema))
        out = out[:n, :h, :w]
        if argmax and ov is None and out.dtype == np.uint8:
            out = out.astype(np.int32)  # ids travel D2H compact; API stays int32
        return out

    def _get_tta_step(self, batch_shape, scale_hw, flip, quantized):
        key = (batch_shape, scale_hw, flip, quantized)
        if key not in self._tta_steps:
            from ..parallel.steps import compile_tta_step

            self._tta_steps[key] = compile_tta_step(
                self.mesh,
                scale_hw=scale_hw,
                flip=flip,
                tensor_parallel=self.tensor_parallel,
                compute_dtype=self.compute_dtype,
                example_params=self._quantized_params() if quantized
                else self.state.params,
                quantized=quantized,
            )
        return self._tta_steps[key]

    def predict_tta(self, images, scales=(1.0,), flip=True, argmax=True,
                    quantized=False, use_ema=False):
        """Test-time-augmentation prediction: average class probabilities
        over the horizontal mirror and/or rescaled views — the standard
        FCN-era mIoU booster. Beyond the reference (its `predict`,
        `fcn8s_tensorflow.py:743-770`, sees a single view).

        ``scales``: iterable of resize factors. Each runs as its own
        compiled executable (static shapes; dims snap to the stride-32
        grid) whose view rescale + forward + probability resize-back all
        stay on device. ``flip=True`` folds the mirrored view into the
        same executable as a doubled batch (one full-tilt MXU dispatch,
        not two half-utilized ones — see ``parallel.steps.tta_step``).

        With ``scales=(1.0,)`` and ``flip=False`` this degenerates to
        ``predict(argmax=...)`` semantics (probabilities travel fp32 here).

        Returns (N,H,W) int32 argmax ids, or (N,H,W,C) float32 mean
        probabilities when ``argmax=False``."""
        if not scales:
            raise ValueError("predict_tta: scales must be non-empty")
        padded, (n, h, w) = self._prepare_images(images)
        ema = self._resolve_ema(use_ema, quantized)
        call_params = (
            ema if ema is not None
            else self._quantized_params() if quantized
            else self.state.params
        )
        im_d = self._put_batch(padded)
        ph, pw = padded.shape[1:3]
        acc = None
        for s in scales:
            sh = max(32, int(round(ph * float(s) / 32)) * 32)
            sw = max(32, int(round(pw * float(s) / 32)) * 32)
            scale_hw = None if (sh, sw) == (ph, pw) else (sh, sw)
            fn = self._get_tta_step(padded.shape, scale_hw, bool(flip),
                                    quantized)
            p = fn(call_params, im_d)
            acc = p if acc is None else acc + p
        probs = acc if len(scales) == 1 else acc / np.float32(len(scales))
        if argmax:
            return np.asarray(jnp.argmax(probs, axis=-1))[:n, :h, :w].astype(
                np.int32
            )
        return np.asarray(probs)[:n, :h, :w]

    @staticmethod
    def _tile_grid(size: int, t: int, overlap: int):
        """1-D tile placement: start offsets with stride t-overlap, last
        tile flush against the end; per-tile core [lo, hi) in tile-local
        coords s.t. the cores partition [0, size) exactly."""
        if t >= size:
            return [(0, 0, size)]
        stride = t - overlap
        starts = list(range(0, size - t, stride)) + [size - t]
        tiles = []
        prev_end = 0
        for i, s in enumerate(starts):
            lo = prev_end - s  # global core start = previous core's end
            hi = t if i == len(starts) - 1 else t - overlap // 2
            # keep at least half the overlap as context on the trailing edge
            hi = max(hi, lo)
            tiles.append((s, lo, hi))
            prev_end = s + hi
        assert prev_end == size, (prev_end, size)
        return tiles

    @staticmethod
    def _feather_profile(t: int, margin: float) -> np.ndarray:
        """1-D blend weight: linear ramp over ``margin`` px from both tile
        edges, flat 1.0 inside; strictly positive everywhere (pixel centers
        at idx+0.5), so single-coverage pixels normalize to exactly their
        own tile's value."""
        idx = np.arange(t, dtype=np.float32) + 0.5
        return np.minimum(np.minimum(idx, t - idx) / margin, 1.0).astype(
            np.float32)

    def _predict_tiled(self, images, argmax, ov, quantized, tile, overlap,
                       params=None, blend=False):
        th, tw = tile
        if th % 32 or tw % 32:
            raise ValueError(f"tile dims must be multiples of 32, got {tile}")
        if overlap % 2 or overlap < 0:
            raise ValueError(f"tile_overlap must be even and >= 0, got {overlap}")
        if blend and ov is not None:
            raise ValueError(
                "tile_blend composites probabilities before any overlay; "
                "predict ids first and composite on host (viz.overlay)")
        # the default overlap (sized for production tiles) auto-clamps so
        # small tiles keep a positive stride
        overlap = min(overlap, min(th, tw) - 32)
        images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        n, h, w = images.shape[:3]
        # pad up so every tile is full-size (cropped back at the end)
        hp, wp = max(h, th), max(w, tw)
        hp, wp = hp + (-hp) % 32, wp + (-wp) % 32
        padded = np.pad(images, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

        rows = self._tile_grid(hp, th, overlap)
        cols = self._tile_grid(wp, tw, overlap)
        tiles = [
            padded[:, ys : ys + th, xs : xs + tw]
            for ys, _, _ in rows
            for xs, _, _ in cols
        ]
        batch = np.concatenate(tiles, axis=0)  # (n_tiles*n, th, tw, 3)

        # one shared executable for every tile; batched in mesh-friendly
        # chunks with async dispatch (double-buffered D2H). Blend mode
        # consumes each chunk into the weighted accumulator as it lands
        # (streaming — never holds all tile probability maps at once).
        chunk_size = 8 * self.mesh.shape["data"]
        if blend:
            margin = max(overlap / 2.0, 1.0)
            wtile = (self._feather_profile(th, margin)[:, None]
                     * self._feather_profile(tw, margin)[None, :])
            acc = np.zeros((n, hp, wp, self.num_classes), np.float32)
            wsum = np.zeros((hp, wp), np.float32)
            origins = [(ys, xs) for ys, _, _ in rows for xs, _, _ in cols]
        else:
            outs = []

        def consume(dev, k, start):
            part = np.asarray(dev)[:k]  # D2H sync point
            if not blend:
                outs.append(part)
                return
            for g in range(part.shape[0]):
                ti, j = divmod(start + g, n)
                ys, xs = origins[ti]
                acc[j, ys : ys + th, xs : xs + tw] += (
                    part[g].astype(np.float32) * wtile[:, :, None])
                if j == 0:  # once per tile (identical for every image)
                    wsum[ys : ys + th, xs : xs + tw] += wtile

        pending = deque()
        for start in range(0, batch.shape[0], chunk_size):
            part = batch[start : start + chunk_size]
            # pad the tail chunk to the full chunk size: one executable total
            part_p, (pn, _, _) = self._prepare_images(part, pad_batch_to=chunk_size)
            pending.append((self._dispatch_predict(
                part_p, argmax and not blend, False, ov, quantized,
                params=params), pn, start))
            if len(pending) >= 2:
                consume(*pending.popleft())
        while pending:
            consume(*pending.popleft())

        if blend:
            probs = acc / wsum[None, :, :, None]
            out = (np.argmax(probs, axis=-1).astype(np.int32) if argmax
                   else probs)
            return out[:, :h, :w]

        out_tiles = np.concatenate(outs, axis=0)
        out_shape = (n, hp, wp) + out_tiles.shape[3:]
        out = np.zeros(out_shape, out_tiles.dtype)
        i = 0
        for ys, ylo, yhi in rows:
            for xs, xlo, xhi in cols:
                t_out = out_tiles[i * n : (i + 1) * n]
                out[:, ys + ylo : ys + yhi, xs + xlo : xs + xhi] = (
                    t_out[:, ylo:yhi, xlo:xhi]
                )
                i += 1
        out = out[:, :h, :w]
        if argmax and ov is None and out.dtype == np.uint8:
            out = out.astype(np.int32)
        return out

    def predict_and_save(
        self,
        results_dir,
        images_dir,
        color_map=None,
        resize=False,
        image_file_extension="png",
        include_unprocessed_image=False,
        arrangement="vertical",
        overwrite_existing=True,
        batch_size=8,
        on_device_overlay=True,
        tile=None,
        tile_overlap=128,
        tile_blend=False,
        output_format="overlay",
        id_map=None,
        use_ema=False,
        quantized=False,
        verbose=True,
    ):
        """Segment every image in a directory, overlay, save to disk
        (reference `fcn8s_tensorflow.py:772-855`). ``color_map`` is a dict
        class_id -> RGBA, e.g. ``TRAINIDS_TO_RGBA_DICT``.

        TPU-native serving path (vs the reference's one image per
        ``sess.run``, `:836`): images are grouped by size and processed in
        batches of ``batch_size``; device dispatch is asynchronous, so batch
        i+1's host decode + H2D overlaps batch i's compute + D2H
        (double-buffered); PNG encodes run on a writer thread pool. With
        ``on_device_overlay`` the argmax→LUT→alpha-composite runs inside the
        predict executable and only the final uint8 RGB travels D2H;
        ``False`` falls back to ids + the host compositor.

        ``tile=(th, tw)`` routes each batch through tiled inference (see
        ``predict``) — for mega-resolution directories (e.g. raw 1024×2048
        Cityscapes) where a whole-image graph would blow past compile or
        HBM limits; one fixed-shape executable serves every image size.
        ``tile_blend=True`` adds feathered probability blending at tile
        seams (see ``predict``); it forces the host-side compositor
        (ids blend before any overlay), so ``on_device_overlay`` is
        ignored in that combination.

        Measured on the axon v5e tunnel @8×1024×512: overlay compute is
        ~55 ms but its 12.6 MB RGB D2H costs ~719 ms vs 146 ms for the
        4.2 MB uint8 id maps — the tunnel's ~17–29 MB/s D2H, not the chip,
        decides which path wins there. On a direct-attached host (PCIe,
        GB/s) the on-device path wins outright; pass
        ``on_device_overlay=False`` when D2H bandwidth is the bottleneck.

        ``output_format='ids'`` writes raw class-ID PNGs instead of
        overlays — the Cityscapes *benchmark submission* format
        (`/root/reference/cityscapesscripts/evaluation/
        evalPixelLevelSemanticLabeling.py:47-67`: one uint8 labelId PNG per
        image, discovered by ``<city>_<seq>_<frame>*.png``). ``id_map`` is
        an optional 1-D LUT applied to the predicted ids before saving —
        pass ``labels.TRAINIDS_TO_IDS_ARRAY`` to convert a trainId-space
        model's output to the benchmark's labelId space. ``color_map`` is
        unused in this mode; the scorer loop is verified end-to-end
        (train -> predict_and_save(ids) -> evaluation.pixel_eval CLI ->
        streaming-confmat agreement) by
        tests/test_offline_eval.py::test_closed_loop_scorer_consistency.

        ``use_ema=True`` serves the EMA-averaged weights (see
        ``train(ema_decay=...)``) instead of the live params.
        ``quantized=True`` serves the calibrated-int8 weights (see
        ``predict(quantized=...)``; mutually exclusive with ``use_ema``).

        ``verbose=False`` suppresses the banner line and the progress bar
        (library callers that own stdout, e.g. ``score_benchmark(quiet=True)``)."""
        from concurrent.futures import ThreadPoolExecutor

        from ..viz.overlay import create_split_view, print_segmentation_onto_image

        ema = self._resolve_ema(use_ema, False)
        if quantized and use_ema:
            raise ValueError("quantized and use_ema are mutually exclusive")
        if overwrite_existing and os.path.exists(results_dir):
            shutil.rmtree(results_dir)
        os.makedirs(results_dir, exist_ok=True)

        image_paths = sorted(glob(os.path.join(images_dir, "*." + image_file_extension)))
        if verbose:
            print(f'The segmented images will be saved to "{results_dir}"')

        # Group by output size so each group shares one compiled executable
        # (PIL reads the size from the header without decoding).
        groups: dict = {}
        if resize:
            groups[tuple(resize)] = list(image_paths)
        else:
            for p in image_paths:
                with Image.open(p) as im:
                    w, h = im.size
                groups.setdefault((h, w), []).append(p)

        if tile_blend and tile is None:
            raise ValueError("tile_blend requires tile=(th, tw)")
        if output_format not in ("overlay", "ids"):
            raise ValueError(f"output_format must be 'overlay' or 'ids', got {output_format!r}")
        if output_format == "ids":
            if include_unprocessed_image:
                raise ValueError("include_unprocessed_image is incompatible with output_format='ids'")
            ov = None
        else:
            if color_map is None:
                raise ValueError("color_map is required for output_format='overlay'")
            ov = (self._overlay_lut(color_map)
                  if on_device_overlay and not (tile is not None and tile_blend)
                  else None)
        id_lut = np.asarray(id_map) if id_map is not None else None
        tr = trange(len(image_paths), file=sys.stdout, disable=not verbose)
        tr.set_description("Processing images")
        writer = ThreadPoolExecutor(max_workers=4)
        write_futures = []

        def compose_and_save(path, overlaid, image):
            if include_unprocessed_image:
                h, w = overlaid.shape[:2]
                if arrangement == "vertical":
                    out = create_split_view(
                        (2 * h, w), [overlaid, image], [(0, 0), (h, 0)], [(h, w)] * 2
                    )
                else:
                    out = create_split_view(
                        (h, 2 * w), [overlaid, image], [(0, 0), (0, w)], [(h, w)] * 2
                    )
            else:
                out = overlaid
            Image.fromarray(out).save(os.path.join(results_dir, os.path.basename(path)))

        def save_ids(path, ids):
            if id_lut is not None:
                ids = id_lut[ids]
            # Cityscapes labelIds fit uint8; id spaces beyond 255 round-trip
            # through a 16-bit grayscale PNG instead of truncating
            max_id = int(id_lut.max()) if id_lut is not None else self.num_classes - 1
            dtype = np.uint8 if max_id <= 255 else np.uint16
            Image.fromarray(np.ascontiguousarray(ids.astype(dtype))).save(
                os.path.join(results_dir, os.path.basename(path)))

        def flush(pending):
            chunk_paths, dev_out, images_host, n = pending.popleft()
            out = np.asarray(dev_out)[:n]  # D2H sync point
            h, w = images_host.shape[1:3]
            out = out[:, :h, :w]
            for j, path in enumerate(chunk_paths):
                if output_format == "ids":
                    write_futures.append(writer.submit(save_ids, path, out[j]))
                    continue
                if ov is not None:
                    overlaid = out[j]
                else:
                    overlaid = print_segmentation_onto_image(
                        images_host[j], out[j].astype(np.int32), color_map
                    )
                write_futures.append(
                    writer.submit(compose_and_save, path, overlaid, images_host[j])
                )
            tr.update(n)

        def load_chunk(chunk, gh, gw):
            imgs = []
            for p in chunk:
                image = np.asarray(Image.open(p).convert("RGB"))
                if resize:
                    import cv2

                    image = cv2.resize(image, (gw, gh), interpolation=cv2.INTER_LINEAR)
                imgs.append(image)
            return np.stack(imgs)

        chunks = [
            (grp[start : start + batch_size], gh, gw)
            for (gh, gw), grp in groups.items()
            for start in range(0, len(grp), batch_size)
        ]
        # Decode pool: PNG decode of chunk i+1..i+DECODE_AHEAD overlaps chunk
        # i's H2D + compute + D2H (the reference decodes on the critical path,
        # one image per sess.run — `fcn8s_tensorflow.py:831-836`).
        DECODE_AHEAD = 3
        reader = ThreadPoolExecutor(max_workers=4)
        decode_futs = deque(
            (chunk, reader.submit(load_chunk, chunk, gh, gw))
            for chunk, gh, gw in chunks[:DECODE_AHEAD]
        )
        next_decode = DECODE_AHEAD

        pending = deque()
        try:
            while decode_futs:
                chunk, fut = decode_futs.popleft()
                images_host = fut.result()
                if next_decode < len(chunks):
                    c, gh, gw = chunks[next_decode]
                    decode_futs.append((c, reader.submit(load_chunk, c, gh, gw)))
                    next_decode += 1
                if tile is not None:
                    # mega-resolution path: one fixed-shape tile executable,
                    # synchronous per chunk (see ``predict(tile=...)``)
                    dev, n = (
                        self._predict_tiled(images_host, True, ov, quantized,
                                            tile, tile_overlap, params=ema,
                                            blend=tile_blend),
                        images_host.shape[0],
                    )
                else:
                    padded, (n, _, _) = self._prepare_images(
                        images_host, pad_batch_to=batch_size
                    )
                    dev = self._dispatch_predict(padded, argmax=True, overlay=ov,
                                                 quantized=quantized, params=ema)
                pending.append((chunk, dev, images_host, n))
                if len(pending) >= 2:  # double-buffer: keep one in flight
                    flush(pending)
            while pending:
                flush(pending)
            for f in write_futures:
                f.result()
        finally:
            reader.shutdown(wait=True)
            writer.shutdown(wait=True)
        tr.close()

    # ------------------------------------------------------------------
    def export_serving(self, directory, *, input_hw=(1024, 512), argmax=True,
                       use_ema=False):
        """Write a portable StableHLO serving artifact (``jax.export``) —
        the JAX-native counterpart of the reference's SavedModel deployment
        artifact (`fcn8s_tensorflow.py:922-925`; the TF-ecosystem path is
        tools/tf_interop.py). Any JAX process can then run
        ``engine.export.load_serving_artifact(directory).predict(images)``
        without this package's model code; the batch dim is symbolic so one
        artifact serves every batch size. See engine/export.py."""
        from .export import export_serving_artifact

        return export_serving_artifact(self, directory, input_hw=input_hw,
                                       argmax=argmax, use_ema=use_ema)

    def save(
        self,
        model_save_dir,
        saver="saved_model",
        tags=["default"],
        name=None,
        include_global_step=True,
        include_last_training_loss=True,
        include_metrics=True,
        force_save=False,
        block=True,
    ):
        """Save a full self-describing checkpoint with the reference's
        directory naming scheme and dirty-flag skip
        (`fcn8s_tensorflow.py:857-936`). ``saver``/``tags`` accepted for
        parity; both backends map to the msgpack format.

        ``block=False`` saves asynchronously: the device state is snapshot
        with an on-device copy (async dispatch — training isn't stalled)
        and the D2H gather + serialization run on a writer thread with an
        atomic directory rename (engine/checkpoint.py
        ``save_checkpoint_async``). On this host the D2H gather of the
        ~1.6 GB state dominates save time, so periodic in-training saves
        (``train(save_during_training=True)``) use this path to overlap it
        with subsequent steps. The previous writer is joined first (one
        save in flight at a time)."""
        if not self.variables_updated and not force_save:
            print("Abort: Nothing to save, no training has been performed since the model was last saved.")
            return None
        if saver not in {"saved_model", "train_saver", "msgpack"}:
            raise ValueError(
                "Unexpected value for `saver`: Can be either 'saved_model' or "
                f"'train_saver', but received '{saver}'."
            )

        training_loss = self.training_loss if include_last_training_loss else None
        metric_values = (
            dict(zip(self.metric_names, self.metric_values))
            if include_metrics and self.metric_values
            else None
        )
        model_name = ckpt.compose_checkpoint_name(
            name=name,
            global_step=int(self.state.step) if include_global_step else None,
            training_loss=training_loss,
            eval_dataset=self.eval_dataset,
            metric_values=metric_values,
        )
        directory = os.path.join(model_save_dir, model_name)
        metadata = {
            "model_config": self.model_config,
            "global_step": int(self.state.step),
            "training_loss": self.training_loss,
            "eval_dataset": self.eval_dataset,
            "metrics": metric_values or {},
            "saved_at": time.time(),
        }
        if getattr(self, "_observer_state", None):
            # in-progress plateau/early-stopping counters, so a resumed run
            # continues the annealed LR scale and patience windows
            metadata["train_observer"] = dict(self._observer_state)
        self._join_pending_save()
        if block:
            ckpt.save_checkpoint(directory, self.state, metadata, max_to_keep=5,
                                 ema_params=self._ema_params)
        else:
            self._save_thread = ckpt.save_checkpoint_async(
                directory, self.state, metadata, max_to_keep=5,
                ema_params=self._ema_params,
            )
        self.variables_updated = False
        return directory

    def _join_pending_save(self):
        thread = getattr(self, "_save_thread", None)
        if thread is not None:
            thread.join()
            self._save_thread = None
            exc = getattr(thread, "exc", None)
            if exc is not None:
                # a failed background save must not be silent: the dirty
                # flag was already cleared, so re-arm it and surface
                self.variables_updated = True
                raise RuntimeError("async checkpoint write failed") from exc

    def load_variables(self, path):
        """Restore model params only (reference `load_variables`,
        `fcn8s_tensorflow.py:938-944`). ``path`` is a checkpoint directory."""
        params = ckpt.load_params_only(path, self.state.params)
        self.state = self.state._replace(params=params)
        self._invalidate_quantized()

    def close(self):
        """Release resources (the reference closes its tf.Session,
        `fcn8s_tensorflow.py:946-951`; here: stop the prefetch worker, join
        any in-flight async checkpoint write, and flush/close summary
        writers — device buffers are GC-managed)."""
        self._close_train_stream()
        self._join_pending_save()
        if self._summary_logger is not None:
            self._summary_logger.close()
            self._summary_logger = None
        print("The session has been closed.")
