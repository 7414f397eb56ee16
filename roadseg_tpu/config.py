"""Configuration: the full 30-flag CLI surface of the reference, plus
TPU-native extensions.

The reference defines 30 ``tf.app.flags`` (``src/tf_aerial_images.py:15-46``)
snapshotted into a mutable ``Options`` object (``:51-84``). We reproduce the
identical flag names, defaults and semantics with a dataclass + argparse, and
add TPU-specific knobs (dtype, conv backend, mesh shape, remat) that default
to sensible TPU-first values.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from typing import List, Optional


@dataclasses.dataclass
class Options:
    """Options used by the model/engine.

    Field-for-field parity with the reference ``Options``
    (``src/tf_aerial_images.py:51-84``); ``rotation_angles`` is parsed from a
    comma-separated string exactly like the reference (``:79``).
    """

    batch_size: int = 25
    dilated_layers: bool = False
    dropout: float = 0.8  # probability to KEEP an input (TF keep_prob semantics)
    ensemble_prediction: bool = False
    eval_data_dir: Optional[str] = None
    eval_every: int = 500
    eval_train: bool = False
    gpu: int = -1  # kept for CLI parity; -1 = default device (TPU if present)
    image_augmentation: bool = False
    interactive: bool = False
    logdir: str = os.path.abspath("./logdir")
    lr: float = 0.01
    model_path: Optional[str] = None
    momentum: float = 0.9
    num_epoch: int = 5
    num_eval_images: int = 4
    num_gpu: int = 1  # parity only; TPU device count comes from the mesh
    num_layers: int = 5
    patch_size: int = 128
    pred_batch_size: int = 2
    restore_date: Optional[str] = None
    restore_epoch: Optional[int] = None
    restore_model: bool = False
    root_size: int = 64
    rotation_angles: Optional[List[int]] = None
    save_path: str = os.path.abspath("./runs")
    seed: int = 2017
    stride: int = 16
    train_data_dir: str = os.path.abspath("./data/training")
    train_score_every: int = 1000

    # ------------------------------------------------------------------
    # TPU-native extensions (not in the reference flag surface)
    # ------------------------------------------------------------------
    # Compute dtype for conv activations. Params and optimizer state stay
    # float32; bfloat16 activations keep the MXU fed at full rate.
    dtype: str = "bfloat16"
    # Convolution backend: "xla" (lax.conv_general_dilated), "pallas"
    # (hand-written fused TPU kernels, see roadseg_tpu/kernels/), or
    # "hybrid" (the measured per-shape winner on v5e — Pallas bottleneck
    # 3x3s + fused deconv2x2-concat, XLA elsewhere; docs/DESIGN.md table).
    conv_impl: str = "xla"
    # Device mesh spec, e.g. "data=8" or "data=4,model=2". Empty = 1-D data
    # mesh over all visible devices.
    mesh: str = ""
    # LR staircase transition length in optimizer steps (reference:
    # lr*0.95^(step/1000) at batch 1, tf_aerial_images.py:112-122). Set to
    # 1000//batch_size to match the reference's lr-vs-samples curve when
    # training at batch >1.
    decay_steps: int = 1000
    # Rematerialize encoder blocks in the backward pass to trade FLOPs for HBM.
    remat: bool = False
    # Gradient accumulation: each optimizer step averages grads over
    # `grad_accum` microbatches of `batch_size` (a lax.scan over the
    # microbatch fwd/bwd), giving effective batch `grad_accum*batch_size`
    # while the compiled program stays one-microbatch-sized — the route to
    # batch 16+ past the remote-compile-helper program-size limit
    # (docs/SCALING.md). 1 = off.
    grad_accum: int = 1
    # Emit a jax.profiler trace (TensorBoard-loadable) of the first epoch.
    profile: bool = False
    # Overlap per-epoch checkpoint writes with the next epoch's compute
    # (Engine.save(blocking=False): on-device state snapshot + a worker
    # thread for the host fetch/Orbax write/SHA manifest). The measured
    # boundary is 40-70 s per saved epoch for the 124M flagship over the
    # tunnel (docs/SCALING.md). The last epoch is always saved blocking.
    async_saves: bool = False
    # Cross-entropy weight on road pixels (class 1); background stays 1.0.
    # The loss is the weight-normalized mean so the loss scale (and thus
    # the reference lr semantics) is preserved. 1.0 = reference-faithful
    # unweighted mean CE (tf_aerial_images.py:103-110). <1.0 penalizes
    # road predictions less, i.e. pushes predicted road fraction DOWN —
    # the targeted lever for the measured ~+1% road-fraction bias vs the
    # 94.124 winner (docs/PARITY.md, road_frac 0.2527 vs 0.2474).
    class_weight_road: float = 1.0
    # Full-image inference: predict each test image in ONE valid-conv
    # forward pass (the U-Net is fully convolutional — 608 input maps to
    # output 612 / input 988 at 6 layers, cropped back to 608) instead of
    # the reference's overlapping stride-`stride` sliding window
    # (tf_aerial_images.py:271-328). ~5x less conv FLOPs per image; the
    # masks differ slightly (no overlap averaging), so the parity pipeline
    # keeps the sliding window and this is an opt-in throughput mode.
    full_image: bool = False
    # Per-step "Batch N Step M" log cadence. 0 = auto: every step on a TTY
    # (carriage-return overwrite, the reference's per-step print at
    # tf_aerial_images.py:246), every 100 steps as plain lines when stdout
    # is redirected (a 43k-step batch-1 run otherwise writes ~900 KB of
    # step spam that buries the epoch/val signal in the log file).
    log_every: int = 0

    def __post_init__(self):
        if isinstance(self.rotation_angles, str):
            self.rotation_angles = parse_rotation_angles(self.rotation_angles)


def parse_rotation_angles(value: Optional[str]) -> Optional[List[int]]:
    """``"15,30,45"`` -> ``[15, 30, 45]``; falsy -> ``None``.

    Mirrors ``src/tf_aerial_images.py:79``.
    """
    if not value:
        return None
    return [int(i) for i in value.split(",")]


def _str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "t", "1", "yes", "y")


def build_parser() -> argparse.ArgumentParser:
    """Argparse parser exposing the reference's 30 flags + TPU extensions.

    Flag names, help strings and defaults match the table in the reference
    ``README.md:75-110``. Boolean flags accept both ``--flag`` and
    ``--flag=true/false`` (tf.app.flags style).
    """
    d = Options()
    p = argparse.ArgumentParser(
        prog="roadseg_tpu",
        description="TPU-native U-Net road segmentation (JAX/XLA/Pallas)",
    )

    def boolean(name: str, default: bool, help_: str):
        p.add_argument(
            f"--{name}", nargs="?", const=True, default=default,
            type=_str2bool, help=help_,
        )

    p.add_argument("--batch_size", type=int, default=d.batch_size,
                   help="Batch size of training instances")
    boolean("dilated_layers", d.dilated_layers, "Add dilated CNN layers")
    p.add_argument("--dropout", type=float, default=d.dropout,
                   help="Probability to keep an input")
    boolean("ensemble_prediction", d.ensemble_prediction, "Ensemble Prediction")
    p.add_argument("--eval_data_dir", type=str, default=d.eval_data_dir,
                   help="Directory containing eval images")
    p.add_argument("--eval_every", type=int, default=d.eval_every,
                   help="Number of steps between evaluations")
    boolean("eval_train", d.eval_train, "Evaluate training data")
    p.add_argument("--gpu", type=int, default=d.gpu,
                   help="Accelerator index to run the model on (-1 = default)")
    boolean("image_augmentation", d.image_augmentation,
            "Augment training set of images with transformations")
    boolean("interactive", d.interactive, "Spawn interactive session")
    p.add_argument("--logdir", type=str, default=d.logdir,
                   help="Directory where to write logfiles")
    p.add_argument("--lr", type=float, default=d.lr, help="Initial learning rate")
    p.add_argument("--model_path", type=str, default=d.model_path,
                   help="Restore exact model path")
    p.add_argument("--momentum", type=float, default=d.momentum, help="Momentum")
    p.add_argument("--num_epoch", type=int, default=d.num_epoch,
                   help="Number of pass on the dataset during training")
    p.add_argument("--num_eval_images", type=int, default=d.num_eval_images,
                   help="Number of images to predict for an evaluation")
    p.add_argument("--num_gpu", type=int, default=d.num_gpu,
                   help="Number of available accelerators to run the model on")
    p.add_argument("--num_layers", type=int, default=d.num_layers,
                   help="Number of layers of the U-Net")
    p.add_argument("--patch_size", type=int, default=d.patch_size,
                   help="Size of the prediction image")
    p.add_argument("--pred_batch_size", type=int, default=d.pred_batch_size,
                   help="Batch size of batchwise prediction")
    p.add_argument("--restore_date", type=str, default=d.restore_date,
                   help="Restore the model from specific date")
    p.add_argument("--restore_epoch", type=int, default=d.restore_epoch,
                   help="Restore the model from specific epoch")
    boolean("restore_model", d.restore_model,
            "Restore the model from previous checkpoint")
    p.add_argument("--root_size", type=int, default=d.root_size,
                   help="Number of filters of the first U-Net layer")
    p.add_argument("--rotation_angles", type=str, default=None,
                   help="Rotation angles (comma-separated)")
    p.add_argument("--save_path", type=str, default=d.save_path,
                   help="Directory where to write checkpoints, overlays and submissions")
    p.add_argument("--seed", type=int, default=d.seed,
                   help="Random seed for reproducibility")
    p.add_argument("--stride", type=int, default=d.stride,
                   help="Sliding delta for patches")
    p.add_argument("--train_data_dir", type=str, default=d.train_data_dir,
                   help="Directory containing training images/ groundtruth/")
    p.add_argument("--train_score_every", type=int, default=d.train_score_every,
                   help="Compute training score after the given number of iterations")

    # TPU-native extensions
    p.add_argument("--dtype", type=str, default=d.dtype,
                   choices=("bfloat16", "float32"),
                   help="Compute dtype for activations")
    p.add_argument("--conv_impl", type=str, default=d.conv_impl,
                   choices=("xla", "pallas", "hybrid", "hybrid_deconv",
                            "pad8"),
                   help="Convolution backend")
    p.add_argument("--mesh", type=str, default=d.mesh,
                   help='Device mesh spec, e.g. "data=4,model=2"')
    p.add_argument("--decay_steps", type=int, default=d.decay_steps,
                   help="LR staircase transition length in optimizer steps "
                        "(1000//batch_size = reference batch-1 anneal)")
    boolean("remat", d.remat, "Rematerialize encoder blocks in backward pass")
    p.add_argument("--grad_accum", type=int, default=d.grad_accum,
                   help="Microbatches averaged per optimizer step "
                        "(effective batch = grad_accum*batch_size); 1 = off")
    boolean("profile", d.profile, "Profile the first training epoch")
    boolean("async_saves", d.async_saves,
            "Overlap per-epoch checkpoint writes with the next epoch's "
            "compute (the final epoch is always saved blocking)")
    p.add_argument("--class_weight_road", type=float, default=d.class_weight_road,
                   help="Cross-entropy weight on road pixels (1.0 = "
                        "reference-faithful unweighted; <1 lowers predicted "
                        "road fraction)")
    boolean("full_image", d.full_image,
            "Predict each image in one full-image valid-conv pass instead "
            "of the sliding window (throughput mode; masks differ slightly "
            "from the stride-window parity pipeline)")
    p.add_argument("--log_every", type=int, default=d.log_every,
                   help="Steps between per-step log lines (0 = auto: every "
                        "step on a TTY, every 100 otherwise)")
    p.add_argument("--preset", type=str, default=None,
                   help="Named report preset (vanilla/kiwi/apple/guava/"
                        "lime/mango); explicit flags override it")
    return p


def apply_preset(kwargs: dict, preset_name: Optional[str], argv=None) -> dict:
    """Merge a named preset under explicit CLI flags.

    ``kwargs`` are the parsed flag values (without the ``preset`` key);
    explicitly-passed flags (detected from ``argv``) override the preset,
    preset values override defaults."""
    if not preset_name:
        return kwargs
    from roadseg_tpu.presets import PRESETS
    if preset_name not in PRESETS:
        raise SystemExit(f"unknown --preset {preset_name!r}; "
                         f"choose from {sorted(PRESETS)}")
    argv_list = sys.argv[1:] if argv is None else list(argv)
    explicit = {tok[2:].split("=")[0] for tok in argv_list
                if tok.startswith("--")}
    merged = dict(PRESETS[preset_name])
    for key, val in kwargs.items():
        if key not in merged or key in explicit:
            merged[key] = val
    return merged


def options_from_args(argv=None) -> Options:
    args = build_parser().parse_args(argv)
    kwargs = vars(args)
    kwargs["rotation_angles"] = parse_rotation_angles(kwargs["rotation_angles"])
    kwargs = apply_preset(kwargs, kwargs.pop("preset", None), argv)
    return Options(**kwargs)
