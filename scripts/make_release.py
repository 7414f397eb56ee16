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

An *ensemble* release packages several member checkpoints (the round-3
parity finding: independent seeds' probability-mask average beats any
single run — PARITY.md round 3):

    python scripts/make_release.py --member DATE:EPOCH --member DATE:EPOCH

``run.py`` then restores every member and averages the predicted
probability masks before quantizing, exactly like
``scripts/ensemble_runs.py``. All members must share one model geometry.
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


def _sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                return h.hexdigest()
            h.update(block)


def main(argv=None):
    # Packaging is pure file IO (copy + SHA-256 verify), but constructing
    # the Orbax Checkpointer initializes the jax backend — force CPU so a
    # downed TPU tunnel cannot hang a release build. (No-op under the
    # test suite, which already runs on CPU.)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized by the calling process
    p = argparse.ArgumentParser()
    p.add_argument("--save_path", default="runs")
    p.add_argument("--date", default=None,
                   help="experiment dir under --save_path")
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--member", action="append", default=None,
                   help="DATE:EPOCH, repeatable — package an ensemble "
                        "release instead of a single checkpoint")
    p.add_argument("--layers", type=int, default=None,
                   help="override; default: read from the checkpoint")
    p.add_argument("--root_size", type=int, default=None,
                   help="override; default: read from the checkpoint")
    p.add_argument("--dilated", default=None,
                   help="1/0 override; default: read from the checkpoint")
    p.add_argument("--npz", type=int, default=0,
                   help="also export the first N members as git-committable "
                        "fp16 .npz weight files (the Orbax payload itself "
                        "is gitignored; an npz member survives machine "
                        "resets and fresh clones — the reference "
                        "distributes weights by download, run.py:46-119; "
                        "here git is the only distribution channel)")
    p.add_argument("--npz_dtype", default="float16",
                   choices=("float16", "int8"),
                   help="npz weight payload: float16 (half size, ~1e-3 "
                        "error) or int8 per-tensor (quarter size, ~4e-3)")
    p.add_argument("--score-json", default="{}",
                   help="JSON dict of quality scores to record")
    p.add_argument("--notes", default="")
    p.add_argument("--out", default=RELEASE_DIR)
    args = p.parse_args(argv)

    if args.member:
        if args.date is not None or args.epoch is not None:
            raise SystemExit("--member and --date/--epoch are exclusive")
        members = [m.rsplit(":", 1) for m in args.member]
        members = [(d, int(e)) for d, e in members]
        if len({d for d, _ in members}) == 1 and len(members) > 1:
            print("WARNING: all release members come from ONE lineage — "
                  "consecutive epochs of one run agree 0.975-0.985 with "
                  "each other and buy little ensemble diversity (PARITY.md "
                  "round 3; VERDICT round 3 weak #2)")
    elif args.date is None or args.epoch is None:
        raise SystemExit("pass --date + --epoch, or --member DATE:EPOCH ...")
    else:
        members = [(args.date, args.epoch)]

    srcs = []
    for date, epoch in members:
        ckpt = Checkpointer(args.save_path, date)
        src = ckpt.resolve(date=date, epoch=epoch)
        if not os.path.isdir(src):
            raise SystemExit(f"checkpoint not found: {src}")
        if verify_manifest(src) is False:
            raise SystemExit(f"refusing to release {src}: manifest mismatch")
        srcs.append(src)

    # model geometry: the checkpoints' own record, with flag overrides.
    # Members MAY span geometries (e.g. non-dilated seeds + a dilated
    # run — mask averaging is architecture-agnostic); run.py rebuilds
    # its Engine per member geometry, like scripts/ensemble_runs.py.
    # The top-level "model" records the first member's geometry.
    geos = [read_geometry(s) or {} for s in srcs]
    geo = dict(geos[0])
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
    # the release holds exactly this member set, nothing stale
    for old in os.listdir(args.out):
        full = os.path.join(args.out, old)
        if old.endswith(".chkpt") and os.path.isdir(full):
            shutil.rmtree(full)
        elif old.endswith(".chkpt.npz"):
            os.remove(full)

    packaged = []
    for (date, epoch), src in zip(members, srcs):
        # member dir names carry the experiment so two runs' same-numbered
        # epochs cannot collide (Orbax restores by path, name is free-form)
        base = (os.path.basename(src) if len(members) == 1
                else f"{date}-epoch-{epoch:03d}.chkpt")
        dst = os.path.join(args.out, base)
        shutil.copytree(src, dst)
        if verify_manifest(dst) is False:
            raise SystemExit(
                "copy corrupted: manifest mismatch after copytree")
        manifest = os.path.join(dst, "SHA256SUMS")
        digest = _sha256_file(manifest)
        entry = {"checkpoint": base, "source_experiment": date,
                 "source_epoch": epoch, "manifest_sha256": digest}
        member_geo = read_geometry(dst)
        if member_geo is not None:
            entry["model"] = member_geo
        if len(packaged) < args.npz:
            import orbax.checkpoint as ocp

            from roadseg_tpu.utils.checkpoint import export_npz
            # npz export needs only params+step; drop the optimizer trace
            # (present in full, non-light checkpoints) before exporting to
            # bound host RAM at ~1x params (ADVICE round 3)
            state = ocp.PyTreeCheckpointer().restore(os.path.abspath(dst))
            state = {"params": state["params"],
                     "step": state.get("step", 0)}
            npz_path = dst + ".npz"  # <member>.chkpt.npz next to the dir
            export_npz(state, npz_path, geometry=member_geo,
                       dtype=args.npz_dtype)
            del state
            entry["npz"] = os.path.basename(npz_path)
            entry["npz_sha256"] = _sha256_file(npz_path)
            print(f"npz weight export: {npz_path} "
                  f"({os.path.getsize(npz_path) >> 20} MiB)")
        packaged.append(entry)

    meta = {
        # single-model fields kept for the 1-member case (back-compat with
        # run.py's older release.json readers); "members" is authoritative
        "checkpoint": packaged[0]["checkpoint"],
        "source_experiment": packaged[0]["source_experiment"],
        "source_epoch": packaged[0]["source_epoch"],
        "manifest_sha256": packaged[0]["manifest_sha256"],
        "members": packaged,
        "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "model": {k: geo[k]
                  for k in ("num_layers", "root_size", "dilated_layers")},
        "scores": json.loads(getattr(args, "score_json")),
        "notes": args.notes,
    }
    with open(os.path.join(args.out, "release.json"), "w") as f:
        json.dump(meta, f, indent=2)
        f.write("\n")
    print(f"release packaged: {len(packaged)} member(s) in {args.out}")
    print(json.dumps(meta, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
