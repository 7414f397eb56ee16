#!/usr/bin/env python3
"""Package a trained checkpoint as the repo's release model.

Counterpart of the reference's pretrained-model distribution
(``run.py:46-119``: download a zip of the winning checkpoint, verify it
with ``sha256sum``). No egress here, so a release is a local package:

    artifacts/release/
      model-epoch-NNN.chkpt/   # Orbax checkpoint + SHA256SUMS manifest
      release.json             # provenance + pinned model geometry

``run.py`` prefers this package (after verifying the manifest) when no
explicit checkpoint is given, and reads the model geometry from
release.json so the release decides dilated/non-dilated etc.

The checkpoint payload is gitignored (GB-scale); release.json and the
manifest digest are tracked, so the repo records *which* weights are the
release and how to verify a copy of them.

Usage: python scripts/make_release.py --date DIR --epoch N
           [--score-json '{"agreement": 0.97}'] [--notes "..."]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.utils.checkpoint import (Checkpointer, read_geometry,
                                          verify_manifest)

RELEASE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "release")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--save_path", default="runs")
    p.add_argument("--date", required=True,
                   help="experiment dir under --save_path")
    p.add_argument("--epoch", type=int, required=True)
    p.add_argument("--layers", type=int, default=None,
                   help="override; default: read from the checkpoint")
    p.add_argument("--root_size", type=int, default=None,
                   help="override; default: read from the checkpoint")
    p.add_argument("--dilated", default=None,
                   help="1/0 override; default: read from the checkpoint")
    p.add_argument("--score-json", default="{}",
                   help="JSON dict of quality scores to record")
    p.add_argument("--notes", default="")
    p.add_argument("--out", default=RELEASE_DIR)
    args = p.parse_args(argv)

    ckpt = Checkpointer(args.save_path, args.date)
    src = ckpt.resolve(date=args.date, epoch=args.epoch)
    if not os.path.isdir(src):
        raise SystemExit(f"checkpoint not found: {src}")
    ok = verify_manifest(src)
    if ok is False:
        raise SystemExit(f"refusing to release {src}: manifest mismatch")

    # model geometry: the checkpoint's own record, with flag overrides
    geo = read_geometry(src) or {}
    if args.layers is not None:
        geo["num_layers"] = args.layers
    if args.root_size is not None:
        geo["root_size"] = args.root_size
    if args.dilated is not None:
        geo["dilated_layers"] = args.dilated not in ("0", "false", "False")
    missing = {"num_layers", "root_size", "dilated_layers"} - set(geo)
    if missing:
        raise SystemExit(f"cannot determine model geometry ({missing}) from "
                         f"{src}; pass --layers/--root_size/--dilated")

    os.makedirs(args.out, exist_ok=True)
    # exactly one checkpoint per release
    for old in os.listdir(args.out):
        full = os.path.join(args.out, old)
        if old.endswith(".chkpt") and os.path.isdir(full):
            shutil.rmtree(full)
    dst = os.path.join(args.out, os.path.basename(src))
    shutil.copytree(src, dst)
    if verify_manifest(dst) is False:
        raise SystemExit("copy corrupted: manifest mismatch after copytree")

    manifest = os.path.join(dst, "SHA256SUMS")
    digest = hashlib.sha256(open(manifest, "rb").read()).hexdigest()
    meta = {
        "checkpoint": os.path.basename(dst),
        "source_experiment": args.date,
        "source_epoch": args.epoch,
        "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "manifest_sha256": digest,
        "model": {k: geo[k]
                  for k in ("num_layers", "root_size", "dilated_layers")},
        "scores": json.loads(getattr(args, "score_json")),
        "notes": args.notes,
    }
    with open(os.path.join(args.out, "release.json"), "w") as f:
        json.dump(meta, f, indent=2)
        f.write("\n")
    print(f"release packaged: {dst}")
    print(json.dumps(meta, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
