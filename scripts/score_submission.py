#!/usr/bin/env python3
"""Score a submission CSV against the reference winner (94.124).

Writes ``parity_vs_winner.json`` next to the CSV (or to --json). Pure
CPU/host. Used by the release pipeline's front-door verifies so every
``./run.py`` output directory carries its own parity record.

Usage: python scripts/score_submission.py DIR_OR_CSV [--winner CSV]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WINNER = ("/root/reference/submissions/2017-12-17T10h55m14s_multi_rotation"
          "_stochastic_aug_6_layers_epoch_22_ensemble_dropout_1.0_94_124/"
          "submission.csv")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("target", help="submission.csv or a directory holding one")
    p.add_argument("--winner", default=WINNER)
    p.add_argument("--json", default=None,
                   help="output path (default: parity_vs_winner.json "
                        "next to the CSV)")
    args = p.parse_args(argv)

    from roadseg_tpu.utils.scoring import compare_submissions
    csv = (os.path.join(args.target, "submission.csv")
           if os.path.isdir(args.target) else args.target)
    if not os.path.exists(csv):
        print(f"no submission at {csv}", file=sys.stderr)
        return 1
    r = compare_submissions(csv, args.winner)
    out = args.json or os.path.join(os.path.dirname(csv),
                                    "parity_vs_winner.json")
    with open(out, "w") as f:
        json.dump(r, f, indent=2)
        f.write("\n")
    print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
