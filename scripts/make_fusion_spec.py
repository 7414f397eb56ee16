#!/usr/bin/env python3
"""Package a fusion spec (``artifacts/release/fusion.json``) for
``./run.py --fuse``.

The spec lists archived submission CSVs — predictions of
earlier-generation models whose checkpoints no longer exist — that vote
alongside the current release's weight members in a weighted patch-label
majority (``scripts/label_fuse.py`` semantics, reimplemented in
``roadseg_tpu.utils.scoring`` for the product path). Each CSV is pinned
by SHA-256 so the front door verifies what it fuses, like the weight
manifests.

Usage:
  python scripts/make_fusion_spec.py \
      --csv artifacts/ensemble_final_old_r3.csv:3 \
      --csv artifacts/submission_r1_final/submission.csv:2 \
      [--member_weight 1.0] [--vote_threshold 0.5]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--csv", action="append", required=True,
                   help="repo-relative submission.csv[:weight]")
    p.add_argument("--member_weight", type=float, default=1.0)
    p.add_argument("--vote_threshold", type=float, default=0.5)
    p.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "release", "fusion.json"))
    p.add_argument("--notes", default="")
    args = p.parse_args(argv)

    votes = []
    for spec in args.csv:
        path, _, w = spec.partition(":")
        ap = path if os.path.isabs(path) else os.path.join(REPO, path)
        if not os.path.exists(ap):
            print(f"missing: {path}", file=sys.stderr)
            return 1
        with open(ap, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        votes.append({"path": os.path.relpath(ap, REPO),
                      "weight": float(w) if w else 1.0,
                      "sha256": digest})

    spec = {"csv_votes": votes,
            "member_weight": args.member_weight,
            "vote_threshold": args.vote_threshold}
    if args.notes:
        spec["notes"] = args.notes
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(spec, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out} ({len(votes)} CSV votes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
