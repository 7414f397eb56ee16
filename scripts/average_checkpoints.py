#!/usr/bin/env python3
"""Average the params of several flagship checkpoints (SWA) into a new
checkpoint.

Beyond-parity accuracy tool: the reference picks one epoch by Kaggle score
(e.g. ``model-epoch-011.chkpt`` in its run.py); uniformly averaging several
late-epoch checkpoints of the same run usually scores a bit higher at zero
training cost.

Usage:
  python scripts/average_checkpoints.py --epochs 40-47 [--date DIR]
                                        [--out_epoch 900]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.config import Options, _str2bool
from roadseg_tpu.engine import Engine
from roadseg_tpu.utils.checkpoint import (Checkpointer, average_states,
                                          parse_epoch_spec)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", required=True,
                   help='e.g. "40-47" or "30,35,40"')
    p.add_argument("--date", default=None,
                   help="experiment dir name under --save_path "
                        "(default: newest)")
    p.add_argument("--save_path", default="runs")
    p.add_argument("--out_epoch", type=int, default=900,
                   help="epoch number for the averaged checkpoint")
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--root_size", type=int, default=64)
    p.add_argument("--dilated", type=_str2bool, default=True)
    args = p.parse_args(argv)

    # Param averaging is pure host arithmetic: restore to host, mean,
    # save. Force CPU so a downed TPU tunnel can't hang it (same class
    # of hang as make_release.py — Orbax/Engine init touches the
    # backend). No-op under the CPU-forced test suite.
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized by the calling process

    save_path = os.path.abspath(args.save_path)
    if args.date is None:
        # newest run dir that actually holds checkpoints (same rule as
        # Checkpointer.resolve)
        try:
            args.date = os.path.basename(
                os.path.dirname(Checkpointer(save_path, "").resolve()))
        except FileNotFoundError:
            print("no runs found", file=sys.stderr)
            return 1

    # template state for orbax restore (flagship geometry)
    import jax
    opts = Options(num_layers=args.layers, root_size=args.root_size,
                   dilated_layers=args.dilated, patch_size=388,
                   num_epoch=0, save_path=save_path,
                   logdir=os.path.join(save_path, "logs"))
    eng = Engine(opts)
    template = jax.device_get(eng.state)

    ckpt = Checkpointer(save_path, args.date)
    epochs = parse_epoch_spec(args.epochs)
    states = []
    for e in epochs:
        path = ckpt.resolve(date=args.date, epoch=e)
        if not os.path.isdir(path):
            print(f"skipping missing {path}")
            continue
        states.append(ckpt.restore(template, file=path))
    if not states:
        print("no checkpoints restored", file=sys.stderr)
        return 1

    avg = average_states(states)
    out = ckpt.save(avg, args.out_epoch,
                    geometry={"num_layers": args.layers,
                              "root_size": args.root_size,
                              "dilated_layers": args.dilated})
    print(f"averaged {len(states)} checkpoints {epochs} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
