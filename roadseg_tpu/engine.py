"""Training & inference engine — the TPU-native counterpart of the
reference's ``ConvolutionalModel`` (``src/tf_aerial_images.py:87-379``).

Same capability surface (``train`` / ``predict`` / ``predict_batchwise`` /
``save`` / ``restore``), redesigned for XLA's compilation model instead of
TF-1 sessions:

* **No placeholders / feed_dict.** One jitted ``train_step`` fuses the whole
  hot path — patch gather, stochastic augmentation, U-Net forward, loss,
  backward, momentum update — into a single XLA program per step.
* **On-device data pipeline.** The reference keeps NumPy patch tensors on
  the host and ships one batch through ``feed_dict`` per step
  (``tf_aerial_images.py:232-244``). Here the rotation-expanded training
  images live in HBM as uint8 (exact — PNG values are uint8) and each step
  gathers its patches with ``dynamic_slice`` from an int32 index triple
  per sample: host->device traffic per step is ~12 bytes/sample instead of
  ~28 MB.
* **Sliding-window + TTA inference is one jitted program**
  (cf. ``predict`` at ``tf_aerial_images.py:271-328``): 6-way ensemble
  expansion, mirror-extend, patch extraction, a ``lax.map`` scan over patch
  chunks through the U-Net, overlap-average reassembly and ensemble
  inversion all fuse on device; the host only sees the final masks.
  Patch-count padding is done at the *input* size (fixing the reference's
  latent pad-shape bug at ``tf_aerial_images.py:298-301``).
* **Mesh parallelism**: params/optimizer state are placed by
  ``parallel.mesh.param_shardings`` (replicated, or channel-TP with a
  ``model`` axis); batches shard over the ``data`` axis; XLA inserts the
  gradient ``psum``. The reference is single-device only
  (``tf_aerial_images.py:384-393``).
"""

from __future__ import annotations

import collections
import contextlib
import functools
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from roadseg_tpu import constants
from roadseg_tpu.config import Options
from roadseg_tpu.models import unet as unet_lib
from roadseg_tpu.ops import augment as augment_ops
from roadseg_tpu.ops import geometry, rotate
from roadseg_tpu.parallel import mesh as mesh_lib
from roadseg_tpu.train.optim import learning_rate_schedule, make_optimizer
from roadseg_tpu.utils import images_io
from roadseg_tpu.utils import checkpoint
from roadseg_tpu.utils.checkpoint import Checkpointer
from roadseg_tpu.utils.summary import Summary

NUM_CHANNELS = constants.NUM_CHANNELS


def _experiment_name() -> str:
    """Timestamped experiment name, same format as the reference
    (``tf_aerial_images.py:96``)."""
    return time.strftime("%Y-%m-%dT%Hh%Mm%Ss")


# epoch number for mid-epoch interruption checkpoints (sorts after any
# real epoch so newest-epoch restore resumes from it)
_INTERRUPT_EPOCH = 999


class TrainingDivergedError(RuntimeError):
    """Raised on non-finite loss or params so a poisoned state can never
    be checkpointed.

    Round-5 incident (seed-51 lineage): a resume right after a tunnel
    flap produced NaN loss from the first step, and the collapsed epoch
    was *saved* before the epoch-level f1==0 guard could fire — the junk
    checkpoint then shadowed the last good one for newest-epoch resume.
    The per-step loss check in ``Engine._drain_one`` aborts within a few
    steps of divergence (losses are drained lazily, ≤8 steps behind
    dispatch), and ``Engine.save`` independently refuses to persist
    non-finite params as the last line of defense."""


@contextlib.contextmanager
def _graceful_interrupt():
    """Catch SIGTERM/SIGINT during the hot loop; yields a ``flag()``.

    Beyond-parity failure recovery (SURVEY.md §5.3 — the reference has
    none): a preempted/cancelled training run checkpoints mid-epoch
    instead of losing the epoch. Handlers are restored on exit; a second
    signal falls through to the default behaviour so a wedged run can
    still be killed. No-op off the main thread (Python restricts signal
    handling to it).
    """
    import signal
    import threading

    hit = {"flag": False}
    if threading.current_thread() is not threading.main_thread():
        yield lambda: False
        return

    prev = {}

    def handler(signum, frame):
        hit["flag"] = True
        # restore immediately: next signal acts normally
        for sig, h in prev.items():
            signal.signal(sig, h)
        print(f"\nsignal {signum} received; finishing current step "
              f"(repeat to force-kill)")

    for sig in (signal.SIGTERM, signal.SIGINT):
        prev[sig] = signal.signal(sig, handler)
    try:
        yield lambda: hit["flag"]
    finally:
        for sig, h in prev.items():
            if signal.getsignal(sig) is handler:
                signal.signal(sig, h)


class Engine:
    """Builds the model + optimizer and drives training/inference.

    API mirrors the reference ``ConvolutionalModel`` so a user of the
    reference finds the same verbs: ``train`` (one epoch), ``predict``,
    ``predict_batchwise``, ``save``, ``restore``.
    """

    def __init__(self, options: Options, mesh=None,
                 experiment_name: Optional[str] = None):
        from roadseg_tpu.utils.cache import enable_persistent_cache
        enable_persistent_cache()
        self._options = options
        self.experiment_name = experiment_name or _experiment_name()

        np.random.seed(options.seed)
        self._rng = jax.random.PRNGKey(options.seed)

        self.input_size = unet_lib.input_size_needed(
            options.patch_size, options.num_layers)
        self.offset = (self.input_size - options.patch_size) // 2

        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            options.mesh)
        self._data_sharding = NamedSharding(self.mesh, P("data"))
        self._replicated = mesh_lib.replicated(self.mesh)

        dtype = jnp.bfloat16 if options.dtype == "bfloat16" else jnp.float32
        self.model = unet_lib.UNet(
            num_layers=options.num_layers,
            root_size=options.root_size,
            dilated_layers=options.dilated_layers,
            dtype=dtype,
            conv_impl=options.conv_impl,
            remat=options.remat,
        )

        params = unet_lib.init_params(self.model, self.input_size,
                                      seed=options.seed)
        self._param_shardings = mesh_lib.param_shardings(params, self.mesh)
        params = jax.device_put(params, self._param_shardings)

        self._tx = make_optimizer(options.lr, options.momentum,
                                  decay_steps=options.decay_steps)
        self._schedule = learning_rate_schedule(
            options.lr, transition_steps=options.decay_steps)
        opt_state = self._tx.init(params)
        # opt_state (momentum trace) mirrors the param tree -> same shardings.
        opt_state = jax.device_put(opt_state,
                                   self._opt_state_shardings(opt_state))
        self.state = {
            "step": jax.device_put(jnp.zeros((), jnp.int32), self._replicated),
            "params": params,
            "opt_state": opt_state,
        }

        self._summary = Summary(
            logdir=f"{options.logdir}/{self.experiment_name}",
            num_eval_images=options.num_eval_images)
        self._checkpointer = Checkpointer(options.save_path,
                                          self.experiment_name)

        # Device-resident training set (filled by prepare_training_data).
        self._ext_imgs = None       # [NA, E, E, 3] uint8
        self._ext_gt = None         # [NA, G, G] uint8
        self._index_table = None    # np.int32 [P, 3] (img, y0, x0)

        self._train_step = None     # jitted, built lazily
        self._global_step = 0       # host mirror of state["step"]
        self._pending: collections.deque = collections.deque()

    # ------------------------------------------------------------------
    # sharding helpers
    # ------------------------------------------------------------------
    def _opt_state_shardings(self, opt_state):
        """Momentum-trace leaves shard like their params; the trace tree has
        the exact param-tree structure inside ``TraceState.trace``, so we
        substitute the param shardings there and replicate everything else."""
        if self.mesh.shape.get("model", 1) == 1:
            return jax.tree.map(lambda _: self._replicated, opt_state)
        new = []
        for sub in opt_state:
            if hasattr(sub, "trace"):
                new.append(type(sub)(trace=self._param_shardings))
            else:
                new.append(jax.tree.map(lambda _: self._replicated, sub))
        return tuple(new)

    # ------------------------------------------------------------------
    # training-data pipeline (on device)
    # ------------------------------------------------------------------
    def prepare_training_data(self, train_images, train_groundtruth,
                              rotation_angles=None):
        """Expand+rotate the training set on device and build the patch index.

        Replaces the host-side ``expand_and_rotate`` + ``extract_patches``
        prep in the reference ``main()`` (``tf_aerial_images.py:404-419``):
        instead of materializing every patch, we keep the rotation-expanded
        images in HBM (uint8, exact) and gather patches per step.
        """
        opts = self._options
        angles = rotation_angles
        if angles is None:
            angles = opts.rotation_angles
        if angles is None:
            print("No --rotation_angles given; training on unrotated "
                  "originals (angle 0).")
            angles = [0]

        imgs8 = np.clip(np.asarray(train_images) * constants.PIXEL_DEPTH,
                        0, 255).round().astype(np.uint8)
        gt8 = np.clip(np.asarray(train_groundtruth) * constants.PIXEL_DEPTH,
                      0, 255).round().astype(np.uint8)

        # images expanded by the conv halo offset; groundtruth by 0
        # (tf_aerial_images.py:408, :415)
        ext_imgs = rotate.expand_and_rotate(imgs8, angles, self.offset)
        ext_gt = rotate.expand_and_rotate(gt8, angles, 0)
        self._ext_imgs = jax.device_put(ext_imgs, self._replicated)
        self._ext_gt = jax.device_put(ext_gt, self._replicated)

        h = gt8.shape[1]
        g = geometry.patches_per_side(h, opts.patch_size, opts.stride)
        starts = np.arange(g, dtype=np.int32) * opts.stride
        na = ext_gt.shape[0]
        img_idx, xi, yi = np.meshgrid(
            np.arange(na, dtype=np.int32), starts, starts, indexing="ij")
        self._index_table = np.stack(
            [img_idx.ravel(), yi.ravel(), xi.ravel()], axis=1)
        print(f"Train on {len(self._index_table)} patches of size "
              f"{self.input_size}x{self.input_size} "
              f"({na} expanded images resident on device)")
        return len(self._index_table)

    def _build_train_step(self):
        opts = self._options
        model = self.model
        tx = self._tx
        in_size, ps = self.input_size, opts.patch_size
        augment = bool(opts.image_augmentation)
        dropout_keep = float(opts.dropout)
        data_sharding = self._data_sharding

        def gather(ext_imgs, ext_gt, idx):
            def one(triple):
                i, y, x = triple[0], triple[1], triple[2]
                img = jax.lax.dynamic_slice(
                    ext_imgs, (i, y, x, 0), (1, in_size, in_size, NUM_CHANNELS)
                )[0]
                gt = jax.lax.dynamic_slice(ext_gt, (i, y, x), (1, ps, ps))[0]
                return img, gt
            return jax.vmap(one)(idx)

        accum = max(1, int(opts.grad_accum))

        def micro_grads(params, ext_imgs, ext_gt, idx, rng):
            """Gradients/loss/pixel-errors for one microbatch of indices."""
            idx = jax.lax.with_sharding_constraint(idx, data_sharding)
            patches8, gt8 = gather(ext_imgs, ext_gt, idx)
            patches = patches8.astype(jnp.float32) / constants.PIXEL_DEPTH
            # binarize at 0.5 (tf_aerial_images.py:221-222); uint8 128/255>=.5
            labels = (gt8 >= 128).astype(jnp.int32)

            rng_aug, rng_drop = jax.random.split(rng)
            if augment:
                patches, labels = augment_ops.stochastic_augment(
                    rng_aug, patches, labels)

            def loss_fn(params):
                logits = model.apply(
                    params, patches, dropout_keep=dropout_keep,
                    deterministic=(dropout_keep >= 1.0),
                    rngs={"dropout": rng_drop})
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels)
                probs = jax.nn.softmax(logits, axis=-1)[..., 1]
                cw = float(opts.class_weight_road)
                if cw != 1.0:
                    # Weight-normalized mean keeps the loss scale (and the
                    # reference lr semantics) independent of cw; road pixels
                    # (class 1) get weight cw, background 1.0.
                    w = jnp.where(labels == 1, cw, 1.0)
                    return (ce * w).sum() / w.sum(), probs
                return ce.mean(), probs

            (loss, probs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            # running pixel "errors" like tf_aerial_images.py:249-251
            errors = jnp.sum(jnp.abs(labels.astype(jnp.float32) - probs))
            return grads, loss, errors

        def step_fn(state, ext_imgs, ext_gt, idx, rng):
            if accum == 1:
                grads, loss, errors = micro_grads(
                    state["params"], ext_imgs, ext_gt, idx, rng)
            else:
                # Effective batch accum*batch_size: lax.scan over
                # microbatches keeps the compiled program one-microbatch-
                # sized (the remote compile helper rejects a monolithic
                # batch-16 fwd/bwd — docs/SCALING.md), at the cost of one
                # f32 grad buffer held across the scan.
                mb_idx = idx.reshape(accum, -1, idx.shape[-1])
                mb_rng = jax.random.split(rng, accum)

                def micro(carry, inp):
                    g_acc, loss_acc, err_acc = carry
                    g, loss, errors = micro_grads(
                        state["params"], ext_imgs, ext_gt, inp[0], inp[1])
                    return (jax.tree.map(jnp.add, g_acc, g),
                            loss_acc + loss, err_acc + errors), None

                g0 = jax.tree.map(jnp.zeros_like, state["params"])
                (g_sum, loss_sum, errors), _ = jax.lax.scan(
                    micro, (g0, jnp.float32(0), jnp.float32(0)),
                    (mb_idx, mb_rng))
                # mean-of-means == mean over the effective batch (equal
                # microbatch sizes), so the update matches a monolithic
                # batch of accum*batch_size samples exactly
                grads = jax.tree.map(lambda x: x / accum, g_sum)
                loss = loss_sum / accum

            updates, opt_state = tx.update(grads, state["opt_state"],
                                           state["params"])
            params = optax.apply_updates(state["params"], updates)
            new_state = {"step": state["step"] + 1, "params": params,
                         "opt_state": opt_state}
            return new_state, {"loss": loss, "errors": errors}

        return jax.jit(step_fn, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # training loop (one epoch, reference `train` semantics)
    # ------------------------------------------------------------------
    def train(self, imgs=None, labels=None):
        """Train one epoch over the prepared patch set.

        ``imgs``/``labels`` are the *original* (unexpanded) training images
        and groundtruth, used only for the periodic in-training evaluation
        (``tf_aerial_images.py:254-267``). Call ``prepare_training_data``
        first.

        Returns ``True`` if the epoch was cut short by SIGTERM/SIGINT
        (an interrupt checkpoint was written) — callers must stop their
        epoch loop and skip the regular per-epoch save.
        """
        opts = self._options
        if self._index_table is None:
            raise RuntimeError("call prepare_training_data() before train()")
        if self._train_step is None:
            self._train_step = self._build_train_step()

        table = self._index_table
        indices = np.arange(len(table))
        np.random.shuffle(indices)

        from roadseg_tpu.utils.profiler import StepTimer, trace
        timer = StepTimer()
        profile_ctx = trace(f"{opts.logdir}/{self.experiment_name}/profile",
                            enabled=opts.profile and self._global_step == 0)

        num_errors, total = 0.0, 0
        was_interrupted = False
        # each optimizer step consumes one effective batch (grad_accum
        # microbatches of batch_size samples)
        b = opts.batch_size * max(1, int(opts.grad_accum))
        # Per-step log cadence: the reference prints "Batch N Step M" every
        # step (tf_aerial_images.py:246) — kept on a TTY via \r overwrite,
        # but rate-limited to plain lines when stdout is redirected so a
        # 43k-step run doesn't write a megabyte of step spam to its log.
        is_tty = sys.stdout.isatty()
        log_every = int(opts.log_every) or (1 if is_tty else 100)
        log_end = "\r" if (log_every == 1 and is_tty) else "\n"
        # fixed-size batches, dropping the remainder (tf_aerial_images.py:232)
        with profile_ctx, _graceful_interrupt() as interrupted:
            for batch_i, off in enumerate(range(0, len(table) - b, b)):
                if interrupted():
                    was_interrupted = True
                    # finish cleanly: drain, checkpoint, stop the epoch —
                    # a preempted TPU run resumes from here with --resume
                    print(f"\ninterrupted at step {self._global_step}; "
                          f"saving checkpoint")
                    while self._pending:
                        num_errors, total = self._drain_one(num_errors,
                                                            total)
                    self.save(epoch=_INTERRUPT_EPOCH)
                    break
                batch_idx = table[indices[off:off + b]]
                idx_dev = jax.device_put(jnp.asarray(batch_idx),
                                         self._data_sharding)
                self._rng, step_rng = jax.random.split(self._rng)
                self.state, metrics = self._train_step(
                    self.state, self._ext_imgs, self._ext_gt, idx_dev,
                    step_rng)
                self._global_step += 1
                step = self._global_step
                timer.tick()

                self._pending.append((step, metrics, b))
                # Drain lazily so device dispatch stays ahead of host logging.
                while len(self._pending) > 8:
                    num_errors, total = self._drain_one(num_errors, total)
                if step % log_every == 0:
                    print(f"Batch {batch_i} Step {step}", end=log_end)

                if opts.eval_every > 0 and step % opts.eval_every == 0 \
                        and imgs is not None:
                    self._in_training_eval(imgs, labels, step)
                if opts.train_score_every > 0 and \
                        step % opts.train_score_every == 0 and \
                        imgs is not None:
                    self._summary.add_to_training_summary(
                        np.asarray(self.predict(imgs)), labels, step)

        while self._pending:
            num_errors, total = self._drain_one(num_errors, total)
        jax.block_until_ready(self.state["params"])
        timer.tick()
        print(f"\nepoch done: {timer.summary()}")
        self._summary.add_scalars(
            {"steps_per_sec": timer.steps_per_sec}, self._global_step)
        self._summary.flush()
        return was_interrupted

    def _drain_one(self, num_errors, total):
        step, metrics, bsz = self._pending.popleft()
        loss = float(jax.device_get(metrics["loss"]))
        if not np.isfinite(loss):
            raise TrainingDivergedError(
                f"non-finite loss {loss} at step {step}; aborting before "
                f"any checkpoint is written (resume from the last good "
                f"epoch)")
        num_errors += float(jax.device_get(metrics["errors"]))
        total += bsz
        lr = float(self._schedule(max(step - 1, 0)))
        self._summary.add_scalars({"loss": loss, "learning_rate": lr}, step)
        self._summary.add_to_pixel_misclassification_summary(
            num_errors, total * self._options.patch_size ** 2, step)
        return num_errors, total

    def _in_training_eval(self, imgs, labels, step: int):
        """Periodic full-image eval (``tf_aerial_images.py:254-264``)."""
        opts = self._options
        n = min(opts.num_eval_images, imgs.shape[0])
        try:
            masks = np.asarray(self.predict(imgs[:n]))
        except ValueError as e:  # stride doesn't tile the eval image size
            print(f"skipping in-training eval: {e}")
            return
        print()
        overlays = images_io.overlays(imgs[:n], masks)
        pred_masks = (masks > 0.5).astype(np.float32).squeeze(-1)
        true_masks = (np.asarray(labels[:n]) >= 0.5).astype(np.float32)
        self._summary.add_to_eval_summary(masks, overlays, labels, step)
        self._summary.add_to_overlap_summary(true_masks, pred_masks, step)

    def reset_scores(self):
        """Per-epoch streaming-metric reset (reference
        ``tf.local_variables_initializer`` at ``tf_aerial_images.py:428``)."""
        self._summary.reset_scores()

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=8)
    def _predict_fn(self, num_images: int, image_size: int, ensemble: bool,
                    stride: int, chunk: int):
        """Jitted end-to-end mask prediction for a fixed (N, H) shape.

        Every Options field the traced program bakes in (stride, chunk =
        batch size) is part of the cache key — mutating ``opts.stride``
        between predicts (as ``run.py --train`` does, 12→110) retraces
        instead of silently reusing a stale program.
        """
        opts = self._options
        model = self.model
        in_size, ps = self.input_size, opts.patch_size
        offset = self.offset
        data_sharding = self._data_sharding

        n_eff = num_images * (augment_ops.ENSEMBLE_SIZE if ensemble else 1)
        g = geometry.patches_per_side(image_size, ps, stride)
        per_img = g * g
        num_patches = n_eff * per_img
        num_chunks = -(-num_patches // chunk)
        pad = num_chunks * chunk - num_patches

        def fn(params, imgs):
            if ensemble:
                imgs = augment_ops.image_augmentation_ensemble(imgs)
            ext = geometry.mirror_border(imgs, offset)
            patches = geometry.extract_patches(ext, in_size, stride)
            if pad:
                patches = jnp.concatenate([
                    patches,
                    jnp.zeros((pad, in_size, in_size, NUM_CHANNELS),
                              patches.dtype)], axis=0)
            chunks = patches.reshape(
                num_chunks, chunk, in_size, in_size, NUM_CHANNELS)

            def run_chunk(p):
                p = jax.lax.with_sharding_constraint(p, data_sharding)
                logits = model.apply(params, p, deterministic=True)
                return jax.nn.softmax(logits, axis=-1)[..., 1]

            probs = jax.lax.map(run_chunk, chunks)
            probs = probs.reshape(-1, ps, ps)[:num_patches]
            masks = geometry.images_from_patches(
                probs.reshape(n_eff, per_img, ps, ps, 1), stride=stride)
            if ensemble:
                masks = augment_ops.invert_image_augmentation_ensemble(masks)
            return masks

        return jax.jit(fn)

    @functools.lru_cache(maxsize=8)
    def _predict_full_fn(self, num_images: int, image_size: int,
                         ensemble: bool, chunk: int):
        """Jitted full-image mask prediction (``Options.full_image``).

        The valid-conv U-Net is fully convolutional, so instead of the
        reference's overlapping sliding window (9 stride-110 patches of
        input 764 per 608 image — ``tf_aerial_images.py:271-328``) each
        image is predicted in ONE pass: mirror-pad to the input size of
        the smallest admissible output >= the image (608 -> output 612 /
        input 988 at 6 layers), then center-crop the output ring. ~5x
        fewer conv FLOPs per image; no overlap averaging, so masks differ
        slightly from the parity pipeline — an opt-in throughput mode.
        """
        opts = self._options
        model = self.model
        out_size = unet_lib.valid_output_size(image_size, opts.num_layers)
        in_size = unet_lib.input_size_needed(out_size, opts.num_layers)
        if (in_size - image_size) % 2:
            raise ValueError(
                f"full-image mode needs an even pad: image {image_size} "
                f"-> input {in_size}")
        offset = (in_size - image_size) // 2
        crop = (out_size - image_size) // 2
        data_sharding = self._data_sharding

        n_eff = num_images * (augment_ops.ENSEMBLE_SIZE if ensemble else 1)
        num_chunks = -(-n_eff // chunk)
        pad = num_chunks * chunk - n_eff

        def fn(params, imgs):
            if ensemble:
                imgs = augment_ops.image_augmentation_ensemble(imgs)
            ext = geometry.mirror_border(imgs, offset)
            if pad:
                ext = jnp.concatenate([
                    ext, jnp.zeros((pad, in_size, in_size, NUM_CHANNELS),
                                   ext.dtype)], axis=0)
            chunks = ext.reshape(num_chunks, chunk, in_size, in_size,
                                 NUM_CHANNELS)

            def run_chunk(p):
                p = jax.lax.with_sharding_constraint(p, data_sharding)
                logits = model.apply(params, p, deterministic=True)
                return jax.nn.softmax(logits, axis=-1)[..., 1]

            probs = jax.lax.map(run_chunk, chunks)
            probs = probs.reshape(-1, out_size, out_size)[:n_eff]
            masks = probs[:, crop:crop + image_size,
                          crop:crop + image_size, None]
            if ensemble:
                masks = augment_ops.invert_image_augmentation_ensemble(masks)
            return masks

        return jax.jit(fn)

    def predict(self, imgs):
        """Predict road-probability masks for ``imgs`` [N, H, W, 3].

        Returns [N, H, W, 1] float32. The whole pipeline (optional 6-way
        TTA, mirror-extend, overlapping patches, batched U-Net, overlap
        averaging, ensemble inversion) is one jitted XLA program. With
        ``Options.full_image`` the sliding window is replaced by one
        full-image valid-conv pass per TTA variant.
        """
        opts = self._options
        imgs = jnp.asarray(imgs, jnp.float32)
        n, h = imgs.shape[0], imgs.shape[1]
        if getattr(opts, "full_image", False):
            fn = self._predict_full_fn(
                n, h, bool(opts.ensemble_prediction),
                max(int(opts.batch_size), 1))
        else:
            fn = self._predict_fn(n, h, bool(opts.ensemble_prediction),
                                  int(opts.stride),
                                  max(int(opts.batch_size), 1))
        return fn(self.state["params"], imgs)

    def predict_batchwise(self, imgs, pred_batch_size: int):
        """Chunk images by ``pred_batch_size`` to bound device memory
        (``tf_aerial_images.py:330-341``).

        All chunk programs are dispatched asynchronously up front (device
        work for chunk i+1 overlaps host fetch/assembly of chunk i); only
        the final masks are pulled to the host.
        """
        outs = [self.predict(imgs[i * pred_batch_size:
                                  (i + 1) * pred_batch_size])
                for i in range(int(np.ceil(imgs.shape[0] / pred_batch_size)))]
        masks = [np.asarray(o) for o in outs]
        return np.concatenate(masks, axis=0) if len(masks) > 1 else masks[0]

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------
    @property
    def model_geometry(self) -> dict:
        """The architecture keys that must match between a checkpoint's
        param tree and this Engine's model (``checkpoint.GEOMETRY_KEYS``)."""
        opts = self._options
        return {"num_layers": int(opts.num_layers),
                "root_size": int(opts.root_size),
                "dilated_layers": bool(opts.dilated_layers)}

    def save(self, epoch: int = 0, light: bool = False,
             blocking: bool = True) -> Optional[str]:
        """Checkpoint the train state.

        ``light=True`` omits the optimizer state (momentum doubles the
        host fetch + disk of a 124-500 MB param tree; inference, epoch
        sweeps, SWA and ensembling only ever need params). Restoring a
        light checkpoint reinitializes momentum — keep full saves for
        the interrupt sentinel and the final epoch so ``--resume``
        continues exactly.

        ``blocking=False`` overlaps the save with subsequent work: the
        state is snapshotted on-device (``jnp.copy`` per leaf — required
        because the jitted train step *donates* its state argument, so
        the live buffers are recycled by the next step) and a worker
        thread performs the host fetch + Orbax write + SHA manifest.
        The measured epoch boundary on the tunneled v5e is ~40-70 s for
        the 124 M-param flagship (docs/SCALING.md), almost entirely
        hidden behind the next epoch's ~46 s of compute. The reference's
        TF ``Saver.save`` is synchronous (``tf_aerial_images.py:343-349``).
        At most one async save is in flight: a new ``save``/``restore``
        joins the previous one first; call :meth:`finish_saves` before
        exiting to surface worker errors."""
        self.finish_saves()
        # Hard backstop against persisting a diverged state (round-5
        # seed-51 postmortem: a NaN-collapsed epoch was saved and then
        # shadowed the last good checkpoint for newest-epoch resume).
        # One fused on-device reduce; only the final scalar crosses the
        # tunnel, so the cost is negligible next to the 124 MB+ fetch
        # the save itself performs.
        float_leaves = [l for l in jax.tree_util.tree_leaves(
                            self.state["params"])
                        if jnp.issubdtype(jnp.asarray(l).dtype,
                                          jnp.floating)]
        all_finite = functools.reduce(
            jnp.logical_and, [jnp.isfinite(l).all() for l in float_leaves])
        if not bool(jax.device_get(all_finite)):
            raise TrainingDivergedError(
                f"non-finite params at epoch {epoch}; refusing to write "
                f"a checkpoint (resume from the last good epoch)")
        state = (self.state if not light
                 else {k: self.state[k] for k in ("step", "params")})
        if blocking:
            return self._checkpointer.save(jax.device_get(state), epoch,
                                           geometry=self.model_geometry)
        snapshot = jax.tree_util.tree_map(
            lambda a: jnp.copy(a) if isinstance(a, jax.Array) else a, state)

        def _work():
            try:
                self._checkpointer.save(jax.device_get(snapshot), epoch,
                                        geometry=self.model_geometry)
            except BaseException as e:  # surfaced by finish_saves()
                self._save_error = e

        import threading
        t = threading.Thread(target=_work, name=f"save-epoch-{epoch}")
        self._save_thread = t
        t.start()
        return None

    def finish_saves(self) -> None:
        """Join any in-flight async ``save`` and re-raise its error."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
        err = getattr(self, "_save_error", None)
        if err is not None:
            self._save_error = None
            raise RuntimeError("async checkpoint save failed") from err

    def restore(self, date=None, epoch=None, file=None):
        self.finish_saves()
        template = jax.device_get(self.state)
        path = self._checkpointer.resolve(date=date, epoch=epoch, file=file)
        geo = checkpoint.read_geometry(path)
        if geo is not None and geo != self.model_geometry:
            raise ValueError(
                f"checkpoint {path} is "
                f"{checkpoint.describe_geometry(geo)}, but the model is "
                f"{checkpoint.describe_geometry(self.model_geometry)}; "
                f"pass matching --num_layers/--root_size/--dilated_layers "
                f"or pick a checkpoint of this architecture")
        state = self._checkpointer.restore(template, file=path)
        if checkpoint.is_sentinel(path):
            # resuming an interrupted run: continue saving into the same
            # experiment dir so the next completed-epoch save replaces the
            # mid-epoch sentinel (otherwise newest-epoch resolution could
            # later restore stale mid-epoch weights)
            self.experiment_name = os.path.basename(os.path.dirname(path))
            self._checkpointer.experiment_name = self.experiment_name
        if "opt_state" not in state:
            # light checkpoint (params-only): keep the freshly-initialized
            # momentum already on device; training resumed from one warms
            # momentum back up within a few steps
            print(f"checkpoint {os.path.basename(path)} is params-only; "
                  f"optimizer state reinitialized")
            opt_state = self.state["opt_state"]
        else:
            opt_state = jax.device_put(
                state["opt_state"],
                self._opt_state_shardings(state["opt_state"]))
        self.state = {
            "step": jax.device_put(jnp.asarray(state["step"]),
                                   self._replicated),
            "params": jax.device_put(state["params"], self._param_shardings),
            "opt_state": opt_state,
        }
        self._global_step = int(np.asarray(state["step"]))

    @property
    def summary(self) -> Summary:
        return self._summary

    @property
    def num_params(self) -> int:
        return unet_lib.count_params(self.state["params"])
