#!/usr/bin/env python3
"""Export a single Orbax checkpoint's params as a durable npz anchor.

Disaster-recovery companion to ``rematerialize_npz.py``: four VM resets
have destroyed every gitignored Orbax payload this project trained; the
git-committed ``export_npz`` blobs are the only weight channel that
survives (the reference's channel is download+sha256, reference
``run.py:46-119``). The release pipeline exports npz for its *chosen*
members at the end; this tool exists so a lineage can be anchored into
git the moment training finishes, before the slow search/verify stages
give a reset another chance to eat it.

Runs on CPU so it never competes with training for the chip.

Usage:
  python scripts/export_npz.py --ckpt runs/DATE/model-epoch-029.chkpt \
      --out artifacts/anchors/DATE-epoch-029.chkpt.npz --dtype int8
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
from roadseg_tpu.utils.checkpoint import export_npz, read_geometry


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help="Orbax checkpoint dir")
    p.add_argument("--out", required=True, help="npz path to write")
    p.add_argument("--dtype", default="int8", choices=["int8", "float16"])
    args = p.parse_args(argv)

    ckpt = os.path.abspath(args.ckpt)
    geo = read_geometry(ckpt)
    if geo is None:
        print(f"{ckpt} has no geometry sidecar", file=sys.stderr)
        return 1
    opts = Options(patch_size=388, num_epoch=0,
                   save_path=os.path.abspath("runs"), logdir="runs/logs",
                   **geo)
    eng = Engine(opts)
    eng.restore(file=ckpt)
    state = jax.device_get(
        {"step": eng.state["step"], "params": eng.state["params"]})
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    export_npz(state, args.out, geometry=geo, dtype=args.dtype)
    print(f"exported {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, {args.dtype})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
