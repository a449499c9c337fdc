"""Canonical-scale endurance run: the reference's 13k-step recipe, survived.

The reference's headline training run (`/root/reference/fcn8s_tutorial.ipynb`
cells 14-16) is ~13,000 steps at batch 16 with the piecewise LR schedule
1e-4 -> 1e-5 (@10k) -> 3e-6 (@20k). Every loop feature works in 5-minute
tests; this benchmark proves the loop SURVIVES the recipe's actual scale on
one chip — with a mid-run SIGKILL and bit-exact resume:

* 13,000 steps @ effective batch 16 at the anchor's own 256x512 training
  resolution (BASELINE.md: the tutorial downscales Cityscapes 4x per side;
  gradient_accumulation=2 keeps the accumulator in the loop) on PACKED
  synthetic data
  (``data/packed.py`` memmaps; the learnable 6-class scene generator from
  ``convergence_synthetic.py``);
* the reference tutorial LR schedule, eval cadence (every 500-step epoch),
  save-best-only checkpointing, EMA (0.999), reduce-LR-on-plateau and the
  JSONL train log ALL live;
* the orchestrator SIGKILLs the trainer once mid-epoch (~step 6,500) and
  resumes it via ``FCN8s.resume`` (it also auto-resumes if the time-shared
  TPU tunnel wedges — every incident is recorded);
* afterwards a comparator restores the pre-kill checkpoint and trains the
  SAME remaining steps uninterrupted in one process; its final
  (params + EMA + opt-state + step) fingerprint must match the killed+resumed
  run's BIT-EXACTLY. Determinism holds because the per-step batch is a pure
  function of the global step, the dropout RNG folds the global step into a
  fixed seed (parallel/steps.py), and checkpoints carry params + TF1-Adam
  moments + EMA + plateau counters (engine/checkpoint.py).

Artifacts: ``benchmarks/endurance_r04.json`` (round 4, --augment flip, the
tutorial's own recipe) and ``benchmarks/endurance_r05_fullaug.json`` (round
5, --augment full: the complete flip+brightness+fused-translate/scale device
pipeline with post-augment device label noise) — full per-epoch loss/mIoU
curve, wall time, kill/resume events, both fingerprints, bit-match verdict.

Run (real TPU, ~2-3 h):       python benchmarks/endurance_canonical.py
Orchestration smoke (~4 min): python benchmarks/endurance_canonical.py --smoke
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

THIS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(THIS_DIR)
sys.path.insert(0, REPO)
sys.path.insert(0, THIS_DIR)

import numpy as np


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# data: packed synthetic scenes + step-deterministic batching
# ---------------------------------------------------------------------------


def synth_hard_batch(rng, n, h, w):
    """Palette-jittered, clutter-heavy scenes — the endurance workload.

    ``convergence_synthetic.synth_batch``'s flat-color scenes are solved by
    step ~2k of the 13k-step recipe: pixel color alone determines the class,
    the model reaches the label-noise Bayes floor (CE ~0.25, mIoU 0.98),
    and plain Adam @1e-4 then destabilizes in the converged regime
    (measured: recurring loss spikes into the hundreds from ~step 2.6k,
    clean-eval accuracy 0.98 -> 0.86 — see TODO.md round-4 findings).
    The reference's actual run never ENTERS that regime: it UNDERFITS
    (38.2% mIoU after all 13k steps, `/root/reference/README.md:19`).

    These scenes emulate the underfitting regime: each scene draws its own
    class palette around the canonical colors (sigma 40 — overlapping, so
    color alone is ambiguous across scenes and shape/context carries the
    rest), objects are 2..6 per class at varied scales down to h/16, and
    pixel noise is +-40. A 13k-step run stays in honest descent.
    """
    from convergence_synthetic import CLASS_COLORS

    images = np.zeros((n, h, w, 3), np.int16)
    labels = np.zeros((n, h, w), np.uint8)
    # class 0 = void/background never appears in the drawn scenes
    # (CLASS_COLORS has no entry for it) — row 0 is a placeholder
    base = np.array([(0, 0, 0)] + [CLASS_COLORS[c] for c in range(1, 6)],
                    np.float32)
    for i in range(n):
        palette = np.clip(base + rng.normal(0, 40, base.shape), 0, 255)
        horizon = rng.integers(h // 4, h // 2)
        labels[i, :horizon] = 2
        images[i, :horizon] = palette[2]
        labels[i, horizon:] = 1
        images[i, horizon:] = palette[1]
        for cls in (4, 3, 5):  # buildings, cars, people (draw order)
            for _ in range(rng.integers(2, 7)):
                bh = rng.integers(h // 16, h // 3)
                bw = rng.integers(w // 20, w // 4)
                y0 = rng.integers(0, h - bh)
                x0 = rng.integers(0, w - bw)
                labels[i, y0:y0 + bh, x0:x0 + bw] = cls
                images[i, y0:y0 + bh, x0:x0 + bw] = palette[cls]
    images = np.clip(images + rng.integers(-40, 40, images.shape), 0, 255)
    return images.astype(np.uint8), labels


def prepare_packed(packed_dir: str, n: int, h: int, w: int) -> str:
    """Write ``n`` synthetic scenes as PNGs, then pack them via the real
    ``pack_dataset`` path (BatchGenerator discovery -> memmaps)."""
    if os.path.isfile(os.path.join(packed_dir, "index.json")):
        return packed_dir
    from PIL import Image

    from fcn8s_tensorflow_tpu.data.generator import BatchGenerator
    from fcn8s_tensorflow_tpu.data.packed import pack_dataset

    png_dir = packed_dir + "_png"
    img_dir = os.path.join(png_dir, "img")
    gt_dir = os.path.join(png_dir, "gt", "img")  # pairing: <gt>/<img subdir>/
    os.makedirs(img_dir, exist_ok=True), os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    images, labels = synth_hard_batch(rng, n, h, w)
    for i in range(n):
        Image.fromarray(images[i]).save(os.path.join(img_dir, f"scene_{i:04d}_img.png"))
        Image.fromarray(labels[i]).save(os.path.join(gt_dir, f"scene_{i:04d}_gt.png"))
    gen = BatchGenerator(image_dirs=[img_dir],
                         ground_truth_dirs=[os.path.join(png_dir, "gt")],
                         image_name_split_separator="_img",
                         ground_truth_suffix="_gt", num_classes=6)
    pack_dataset(gen, packed_dir)
    shutil.rmtree(png_dir)
    return packed_dir


def load_packed(packed_dir: str):
    """The whole packed dataset into RAM (64 scenes @1024x512 ~ 130 MB)."""
    images = np.load(os.path.join(packed_dir, "images.npy"))
    labels = np.load(os.path.join(packed_dir, "labels.npy"))
    return np.ascontiguousarray(images), np.ascontiguousarray(labels)


LABEL_NOISE = 0.05
NUM_CLASSES = 6

# "flip" is the canonical recipe (tutorial cell 13 trains with h-flip 0.5
# only), with HOST-side label noise (batch_for_step). "full" is the complete
# device pipeline — flip+brightness+fused translate/scale — made stable (round
# 5) by carrying the label noise ON DEVICE, *after* the geometric transforms
# (ops.augment_device.random_label_noise): round 4's full-augment failure was
# the translate/scale void borders being perfectly-separable NOISE-FREE
# pixels that pre-augment host noise cannot reach, so Adam grew their logits
# without bound. Post-augment noise covers every pixel population, borders
# included; host noise is disabled for this config (no double noising). The
# device noise key folds the global step (parallel/steps.py), so bit-exact
# kill+resume is preserved.
AUGMENT_CONFIGS = {
    "flip": {"flip": 0.5},
    "full": {"flip": 0.5, "brightness": (0.8, 1.2, 0.5),
             "translate": ((0, 16), (0, 8), 0.5),
             "scale": (0.8, 1.2, 0.5),
             "label_noise": (0.05, 4, 6)},  # (rate, block, num_classes)
}


def batch_for_step(images, labels, step: int, batch: int,
                   host_noise: bool = True):
    """The batch consumed at global step ``step`` — a PURE function of the
    step, so a resumed run replays the identical stream.

    5% pixel-iid label noise: on perfectly-separable synthetic data, Adam's
    sign-consistent updates grow the logits without bound (~lr per step —
    observed CE spiking into the hundreds by step ~1300 while accuracy kept
    climbing), which real datasets prevent via irreducible ambiguity. With
    iid label noise the optimal prediction is ~95%-confident, bounding the
    logits at ~ln(0.95*C/0.05) — a sane 13k-step loss curve — while the
    CLEAN eval set's optimal classifier (and mIoU) is unchanged.

    Noise is drawn per 4x4 BLOCK (then repeated up): statistically the same
    unlearnable regularizer, 16x fewer host RNG draws — per-pixel draws cost
    ~0.5 s/step of the 1-core host and made the run input-bound.

    ``host_noise=False`` ships CLEAN labels — used when the augment config
    carries the noise on device instead (AUGMENT_CONFIGS['full']'s
    post-augment ``label_noise``), so pixels are never noised twice."""
    rng = np.random.default_rng(77_000 + step)
    idx = rng.choice(len(images), size=batch, replace=False)
    # stack-of-slices, NOT images[idx]: numpy's fancy-index path copies this
    # 25 MB gather at ~200 MB/s on this host (116 ms) vs 5 ms for the stack
    im = np.stack([images[i] for i in idx])
    lb = np.stack([labels[i] for i in idx])
    if not host_noise:
        return im, lb
    b = 4
    bh, bw = lb.shape[1] // b, lb.shape[2] // b
    flip = rng.random((batch, bh, bw), dtype=np.float32) < LABEL_NOISE
    vals = rng.integers(0, NUM_CLASSES, (batch, bh, bw), dtype=lb.dtype)
    np.copyto(lb, np.repeat(np.repeat(vals, b, 1), b, 2),
              where=np.repeat(np.repeat(flip, b, 1), b, 2))
    return im, lb


def make_eval_batches(h: int, w: int, batch: int, n_batches: int):
    # same (hard) distribution as training, clean labels
    rng = np.random.default_rng(999)
    return [synth_hard_batch(rng, batch, h, w) for _ in range(n_batches)]


# ---------------------------------------------------------------------------
# trainer child (fresh / resume / compare)
# ---------------------------------------------------------------------------


def fingerprint(model) -> str:
    """sha256 over every param, EMA and optimizer-state leaf + the step —
    bit-exact equality of two runs' full training state."""
    import jax

    h = hashlib.sha256()
    h.update(str(int(model.state.step)).encode())
    for leaf in jax.tree.leaves(model.state.params):
        h.update(np.asarray(leaf).tobytes())
    for leaf in jax.tree.leaves(model.state.opt_state):
        h.update(np.asarray(leaf).tobytes())
    ema = model._ema_params
    for leaf in jax.tree.leaves(ema) if ema is not None else []:
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def run_child(args) -> int:
    from fcn8s_tensorflow_tpu.engine.model import FCN8s
    from fcn8s_tensorflow_tpu.engine.schedules import reference_tutorial_schedule

    images, labels = load_packed(args.packed)
    model_kwargs = {}
    if args.mode == "fresh":
        model = FCN8s(num_classes=6, seed=0, width_mult=args.width_mult,
                      fc_channels=args.fc_channels, **model_kwargs)
    elif args.mode == "resume":
        model = FCN8s.resume(args.save_dir, **model_kwargs)
    elif args.mode == "compare":
        model = FCN8s(model_load_dir=args.from_ckpt, **model_kwargs)
    else:
        raise ValueError(args.mode)

    start = int(model.state.step)
    if start % args.spe != 0:
        raise AssertionError(
            f"restored step {start} not an epoch boundary (spe={args.spe})")
    remaining_epochs = (args.total_steps - start) // args.spe
    log(f"child mode={args.mode} start_step={start} "
        f"remaining_epochs={remaining_epochs}")

    # smoke-mode throttle: tiny-model steps are near-instant, which would
    # finish the run before the orchestrator's kill can land
    throttle = float(os.environ.get("ENDURANCE_THROTTLE_S", "0") or 0)

    # when the augment config noises labels on device (post-augment), the
    # host ships clean labels — no double noising
    host_noise = "label_noise" not in AUGMENT_CONFIGS[args.augment]

    def gen():
        step = start
        while True:
            if throttle:
                time.sleep(throttle)
            yield batch_for_step(images, labels, step, args.batch,
                                 host_noise=host_noise)
            step += 1

    eval_set = make_eval_batches(images.shape[1], images.shape[2],
                                 args.batch, n_batches=2)

    def val_gen():
        while True:
            yield from eval_set

    if remaining_epochs > 0:
        model.train(
            train_generator=gen(),
            epochs=remaining_epochs,
            steps_per_epoch=args.spe,
            learning_rate_schedule=reference_tutorial_schedule(),
            keep_prob=0.5,
            l2_regularization=0.0,
            eval_dataset="val",
            eval_frequency=1,
            val_generator=val_gen(),
            val_steps=len(eval_set),
            metrics={"loss", "mean_iou", "accuracy"},
            save_during_training=True,
            save_dir=args.child_save_dir,
            save_best_only=True,
            monitor="loss",
            save_frequency=1,
            record_summaries=False,
            # the tutorial recipe trains with h-flip only (cell 13); the
            # augmentation RNG folds the global step, so it stays bit-exact
            # across resume. MEASURED FAILURE (round 4, first full-scale
            # attempt): adding translate/scale with HOST-side noise defeats
            # the label-noise regularizer — their void-filled borders (black
            # image, label 0) are perfectly-separable NOISE-FREE pixels, so
            # Adam grows their logits without bound and the run destabilizes
            # (train CE stable at 0.35 to ~step 1000, then recurring spikes
            # to the thousands; clean-eval accuracy crashed 0.98 -> 0.83).
            # RESOLVED round 5: --augment full now carries the noise ON
            # DEVICE, post-augment (AUGMENT_CONFIGS comment), covering the
            # borders too.
            device_augment=AUGMENT_CONFIGS[args.augment],
            gradient_accumulation=args.grad_accum,
            ema_decay=0.999,
            reduce_lr_on_plateau={"patience": 8, "factor": 0.5},
            train_log=args.train_log,
            prefetch=2,
        )
    # training_loss is None if a resume landed exactly at total_steps
    # (killed after the final save but before result.json was written):
    # remaining_epochs == 0 skips train() and the restored model never sets
    # it. The run is still fully successful — don't crash on float(None).
    loss = model.training_loss
    result = {"final_step": int(model.state.step),
              "fingerprint": fingerprint(model),
              "training_loss": float(loss) if loss is not None else None}
    with open(args.result, "w") as f:
        json.dump(result, f)
    log(f"child done: {result}")
    return 0


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def _child_stdout_path(out_root: str, mode: str) -> str:
    return os.path.join(out_root, f"child_{mode}_{int(time.time())}.log")


def _spawn_child(args, mode: str, out_root: str, from_ckpt: str | None = None,
                 save_dir: str | None = None, train_log: str | None = None,
                 result: str | None = None):
    cmd = [sys.executable, os.path.abspath(__file__), "--child", "--mode", mode,
           "--packed", args.packed,
           "--total-steps", str(args.total_steps), "--spe", str(args.spe),
           "--batch", str(args.batch), "--grad-accum", str(args.grad_accum),
           "--width-mult", str(args.width_mult),
           "--fc-channels", str(args.fc_channels),
           "--augment", args.augment,
           "--child-save-dir", save_dir or os.path.join(out_root, "ckpts"),
           "--save-dir", save_dir or os.path.join(out_root, "ckpts"),
           "--train-log", train_log or os.path.join(out_root, "train_log.jsonl"),
           "--result", result or os.path.join(out_root, "result.json")]
    if from_ckpt:
        cmd += ["--from-ckpt", from_ckpt]
    stdout_path = _child_stdout_path(out_root, mode)
    stdout = open(stdout_path, "w")
    proc = subprocess.Popen(cmd, stdout=stdout, stderr=subprocess.STDOUT,
                            start_new_session=True)
    proc.stdout_path = stdout_path
    return proc


def _log_last_step(train_log: str) -> int:
    last = 0
    if os.path.isfile(train_log):
        with open(train_log) as f:
            for line in f:
                try:
                    last = max(last, int(json.loads(line).get("global_step", 0)))
                except (ValueError, KeyError):
                    pass
    return last


def orchestrate(args) -> int:
    from fcn8s_tensorflow_tpu.engine.checkpoint import latest_checkpoint

    t0 = time.time()
    out_root = args.out_root
    os.makedirs(out_root, exist_ok=True)
    args.packed = prepare_packed(
        args.packed, n=args.dataset_size, h=args.height, w=args.width)
    save_dir = os.path.join(out_root, "ckpts")
    train_log = os.path.join(out_root, "train_log.jsonl")
    result_path = os.path.join(out_root, "result.json")
    for p in (train_log, result_path):
        if os.path.isfile(p):
            os.remove(p)
    if os.path.isdir(save_dir):
        shutil.rmtree(save_dir)

    events = []
    kill_at = args.kill_at_step
    killed = False
    ckpt_a = None
    resumes = 0
    fast_fails = 0

    def respawn():
        # resume from the latest checkpoint, or start fresh if none landed
        # yet (e.g. a crash before the first save)
        mode = "resume" if latest_checkpoint(save_dir) else "fresh"
        c = _spawn_child(args, mode, out_root, save_dir=save_dir,
                         train_log=train_log, result=result_path)
        log(f"trainer relaunched as '{mode}' (pid {c.pid})")
        return c, time.time()

    child = _spawn_child(args, "fresh", out_root, save_dir=save_dir,
                         train_log=train_log, result=result_path)
    child_t0 = time.time()
    log(f"trainer launched (pid {child.pid}); will SIGKILL ~step {kill_at}")
    last_progress = (0, time.time())
    # the step this child started from: until the log shows a LATER step,
    # the child is still in its checkpoint-load + compile phase and gets
    # the first-progress leash, not the steady-state stall timeout. (A
    # resume child pays the same multi-minute compile as the fresh one —
    # round-5 run observed a resume child stall-killed mid-compile in bad
    # tunnel weather, which burns max_resumes for nothing.)
    child_start_step = 0

    def alive_t(c):
        # per-step liveness: the tqdm bar updates the child's stdout log
        # every step; train_log only updates per epoch (minutes apart under
        # tunnel contention), far too coarse for the stall killer
        try:
            return os.path.getmtime(c.stdout_path)
        except OSError:
            return 0.0

    while True:
        time.sleep(args.poll_s)
        step_now = _log_last_step(train_log)
        activity = max(alive_t(child), last_progress[1])
        if step_now > last_progress[0] or activity > last_progress[1]:
            last_progress = (max(step_now, last_progress[0]), activity)
            fast_fails = 0

        rc = child.poll()
        if rc is not None:
            if rc == 0 and os.path.isfile(result_path):
                log(f"trainer finished at step {step_now}")
                break
            # unexpected death (tunnel flake, OOM, ...) -> resume
            if time.time() - child_t0 < 20:
                fast_fails += 1
                if fast_fails >= 2:
                    log(f"trainer died twice within 20s (rc={rc}) — config "
                        "error, not a flake; giving up")
                    return 1
            events.append({"event": "unexpected_exit", "rc": rc,
                           "at_step": step_now, "t": time.time() - t0})
            resumes += 1
            if resumes > args.max_resumes:
                log("too many resumes; giving up")
                return 1
            log(f"trainer exited rc={rc}; resuming ({resumes})")
            child, child_t0 = respawn()
            child_start_step = step_now
            last_progress = (step_now, time.time())
            continue

        if not killed and step_now >= kill_at:
            time.sleep(args.kill_delay_s)  # land the SIGKILL mid-epoch
            os.kill(child.pid, signal.SIGKILL)
            child.wait()
            killed = True
            latest = latest_checkpoint(save_dir)
            ckpt_a = os.path.join(out_root, "ckpt_prekill")
            if os.path.isdir(ckpt_a):
                shutil.rmtree(ckpt_a)
            shutil.copytree(latest, ckpt_a)
            events.append({"event": "sigkill", "at_step": step_now,
                           "ckpt": os.path.basename(latest),
                           "t": time.time() - t0})
            resumes += 1
            log(f"SIGKILLed trainer at logged step {step_now}; "
                f"snapshot {latest} -> ckpt_prekill; resuming")
            child, child_t0 = respawn()
            child_start_step = step_now
            last_progress = (step_now, time.time())
            continue

        # allow the slow compile (tunnel-dependent) a longer leash than
        # steady-state epochs — for the fresh child AND for every resumed
        # child until it has advanced past the step it restarted from
        stall_budget = (args.first_progress_timeout_s
                        if last_progress[0] <= child_start_step
                        else args.stall_timeout_s)
        if time.time() - last_progress[1] > stall_budget:
            events.append({"event": "stall_kill", "at_step": step_now,
                           "t": time.time() - t0})
            resumes += 1
            if resumes > args.max_resumes:
                log("too many resumes; giving up")
                return 1
            log(f"no progress for {stall_budget}s; killing + resuming")
            os.kill(child.pid, signal.SIGKILL)
            child.wait()
            child, child_t0 = respawn()
            child_start_step = step_now
            last_progress = (step_now, time.time())

    with open(result_path) as f:
        main_result = json.load(f)
    wall_main = time.time() - t0

    # --- comparator: pre-kill checkpoint -> total_steps, uninterrupted ---
    log("comparator: training uninterrupted from the pre-kill checkpoint")
    cmp_result_path = os.path.join(out_root, "result_compare.json")
    cmp_save = os.path.join(out_root, "ckpts_compare")
    if os.path.isdir(cmp_save):
        shutil.rmtree(cmp_save)
    cmp_child = _spawn_child(
        args, "compare", out_root, from_ckpt=ckpt_a, save_dir=cmp_save,
        train_log=os.path.join(out_root, "train_log_compare.jsonl"),
        result=cmp_result_path)
    rc = cmp_child.wait()
    if rc != 0 or not os.path.isfile(cmp_result_path):
        log(f"comparator failed rc={rc}")
        return 1
    with open(cmp_result_path) as f:
        cmp_result = json.load(f)

    bitmatch = (main_result["fingerprint"] == cmp_result["fingerprint"]
                and main_result["final_step"] == cmp_result["final_step"])

    history = []
    with open(train_log) as f:
        for line in f:
            history.append(json.loads(line))
    finite = all(np.isfinite(r["training_loss"]) for r in history)
    mious = [r["eval_mean_iou"] for r in history if "eval_mean_iou" in r]

    report = {
        "config": {
            "total_steps": args.total_steps, "steps_per_epoch": args.spe,
            "effective_batch": args.batch, "grad_accum": args.grad_accum,
            "resolution": [args.height, args.width],
            "dataset": f"packed synthetic x{args.dataset_size}",
            "schedule": "reference_tutorial (1e-4 -> 1e-5@10k -> 3e-6@20k)",
            "ema_decay": 0.999, "plateau": {"patience": 8, "factor": 0.5},
            "width_mult": args.width_mult, "fc_channels": args.fc_channels,
            "device_augment": AUGMENT_CONFIGS[args.augment],
            "label_noise": LABEL_NOISE,
            "label_noise_carrier": (
                "device_post_augment"
                if "label_noise" in AUGMENT_CONFIGS[args.augment]
                else "host_pre_augment"),
        },
        "wall_s_train": round(wall_main, 1),
        "wall_s_total": round(time.time() - t0, 1),
        "events": events,
        "resumes": resumes,
        "final": main_result,
        "comparator": cmp_result,
        "bitexact_resume": bitmatch,
        "all_losses_finite": finite,
        "final_miou": mious[-1] if mious else None,
        "history": history,
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    log(f"report -> {args.report}")
    log(f"bit-exact resume: {bitmatch}; finite: {finite}; "
        f"final mIoU: {report['final_miou']}; "
        f"kills: {[e['event'] for e in events]}")
    ok = bitmatch and finite and main_result["final_step"] == args.total_steps
    if mious:
        ok = ok and mious[-1] > args.miou_floor
    print(json.dumps({"endurance_ok": ok, "bitexact_resume": bitmatch,
                      "final_step": main_result["final_step"],
                      "final_miou": report["final_miou"],
                      "wall_s": report["wall_s_total"], "resumes": resumes}))
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--child", action="store_true")
    p.add_argument("--mode", default="fresh", choices=["fresh", "resume", "compare"])
    p.add_argument("--packed", default=os.path.join("/tmp", "endurance_packed"))
    p.add_argument("--out-root", default=os.path.join("/tmp", "endurance_out"))
    p.add_argument("--report", default=os.path.join(THIS_DIR, "endurance_r05.json"))
    p.add_argument("--total-steps", type=int, default=13000)
    p.add_argument("--spe", type=int, default=500, help="steps per epoch")
    p.add_argument("--batch", type=int, default=16, help="effective batch")
    p.add_argument("--grad-accum", type=int, default=2)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--dataset-size", type=int, default=2048,
                   help="packed pool size; big enough that 13k steps x16 "
                        "(~100 visits/scene) doesn't memorize the pool")
    p.add_argument("--width-mult", type=float, default=1.0)
    p.add_argument("--fc-channels", type=int, default=4096)
    p.add_argument("--augment", default="flip", choices=sorted(AUGMENT_CONFIGS))
    p.add_argument("--kill-at-step", type=int, default=6500)
    p.add_argument("--kill-delay-s", type=float, default=20.0)
    p.add_argument("--stall-timeout-s", type=float, default=720.0)
    p.add_argument("--first-progress-timeout-s", type=float, default=1500.0)
    p.add_argument("--poll-s", type=float, default=10.0)
    p.add_argument("--max-resumes", type=int, default=8)
    p.add_argument("--miou-floor", type=float, default=0.5)
    p.add_argument("--smoke", action="store_true",
                   help="tiny end-to-end orchestration check (~4 min)")
    # child-only
    p.add_argument("--from-ckpt", default=None)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--child-save-dir", default=None)
    p.add_argument("--train-log", default=None)
    p.add_argument("--result", default=None)
    args = p.parse_args()

    if args.smoke:
        args.total_steps, args.spe, args.batch = 20, 5, 4
        args.height = args.width = 64
        args.dataset_size = 16
        args.width_mult, args.fc_channels = 1 / 8, 128
        args.kill_at_step, args.kill_delay_s = 10, 1.0
        args.stall_timeout_s = 600.0
        args.first_progress_timeout_s = 900.0
        args.poll_s = 1.0
        args.miou_floor = 0.0
        args.packed += "_smoke"
        args.out_root += "_smoke"
        args.report = os.path.join(THIS_DIR, "endurance_smoke.json")
        os.environ["ENDURANCE_THROTTLE_S"] = "1.0"  # see run_child

    if args.child:
        return run_child(args)
    return orchestrate(args)


if __name__ == "__main__":
    sys.exit(main())
