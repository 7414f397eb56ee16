#!/usr/bin/env python3
"""Re-materialize a git-committed ``export_npz`` weight file as an Orbax
checkpoint under ``runs/``.

Disaster-recovery tool: three VM resets have destroyed every gitignored
Orbax payload this project ever trained; the npz blobs committed to git
are the only durable weight channel. All DATE:EPOCH tooling
(``ensemble_runs``, SWA averaging, the release packager) resolves
members against ``runs/<date>/model-epoch-NNN.chkpt`` — this script
re-hydrates that layout from an npz so a destroyed lineage can rejoin
the mask-cache search and release pipeline.

The reference's analogue is re-downloading SHA-verified weights
(reference ``run.py:46-119``); here the channel is git and the format is
the single-file npz written by ``checkpoint.export_npz``.

Usage:
  python scripts/rematerialize_npz.py artifacts/release/<date>-epoch-NNN.chkpt.npz
Date/epoch are parsed from the filename, overridable via --date/--epoch.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
from roadseg_tpu.utils.checkpoint import Checkpointer, read_geometry


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("npz", help="export_npz file to re-hydrate")
    p.add_argument("--date", default=None,
                   help="experiment dir name (default: parsed from filename)")
    p.add_argument("--epoch", type=int, default=None,
                   help="epoch number (default: parsed from filename)")
    p.add_argument("--save_path", default="runs")
    args = p.parse_args(argv)

    date, epoch = args.date, args.epoch
    m = re.match(r"(.+)-epoch-0*(\d+)\.chkpt\.npz$",
                 os.path.basename(args.npz))
    if m:
        date = date or m.group(1)
        epoch = epoch if epoch is not None else int(m.group(2))
    if date is None or epoch is None:
        print("cannot parse date/epoch from filename; pass --date/--epoch",
              file=sys.stderr)
        return 1

    geo = read_geometry(args.npz)
    if geo is None:
        print(f"{args.npz} has no __geometry__ entry", file=sys.stderr)
        return 1

    # Pure host work (npz -> Orbax re-serialization): force CPU so a
    # downed TPU tunnel can't hang recovery (the moment this tool is
    # needed is exactly when the chip was just reset).
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized by the calling process

    save_path = os.path.abspath(args.save_path)
    out_path = os.path.join(save_path, date,
                            f"model-epoch-{epoch:03d}.chkpt")
    if os.path.isdir(out_path):
        print(f"already materialized: {out_path}")
        return 0

    opts = Options(patch_size=388, num_epoch=0, save_path=save_path,
                   logdir=os.path.join(save_path, "logs"), **geo)
    eng = Engine(opts)
    eng.restore(file=args.npz)
    state = jax.device_get(
        {"step": eng.state["step"], "params": eng.state["params"]})
    out = Checkpointer(save_path, date).save(state, epoch, geometry=geo)
    print(f"re-materialized {args.npz} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
