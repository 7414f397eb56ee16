#!/usr/bin/env python3
"""End-game parity pipeline over the populated mask cache.

One command turns cached probability masks into the shipped result:

  1. subset search over ALL cached masks (`ensemble_search.main`),
  2. re-score the winning subset through the REAL artifact pipeline
     (`ensemble_runs.main`, pure CPU when fully cached) — this is the
     oracle cross-check of the vectorized search scorer,
  3. refresh `artifacts/release/` with the winning members + score
     (`make_release.main`), so `./run.py` reproduces exactly this
     submission from SHA-verified weights.

Reference counterpart: the reference ships one hand-picked checkpoint in
``run.py:121-177``; the search-then-package flow is this repo's answer to
its winner being an unreproducible single training lottery ticket
(PARITY.md round 3).

Usage: python scripts/finalize_parity.py [--max_k 10]
           [--cache artifacts/mask_cache] [--out artifacts/ensemble_final]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cache", default="artifacts/mask_cache")
    p.add_argument("--max_k", type=int, default=10)
    p.add_argument("--out", default="artifacts/ensemble_final")
    p.add_argument("--search_json", default="artifacts/ensemble_search.json")
    p.add_argument("--skip_release", action="store_true")
    p.add_argument("--npz", type=int, default=0,
                   help="export the first N members as git-committable npz "
                        "weights (passed through to make_release; round-3 "
                        "postmortem: two VM resets destroyed every "
                        "gitignored Orbax payload — npz-per-member is the "
                        "only durable distribution channel)")
    p.add_argument("--npz_dtype", default="float16",
                   choices=("float16", "int8"))
    p.add_argument("--allow_regression", action="store_true",
                   help="package a release even if it scores below the "
                        "currently shipped one (default: refuse — the "
                        "round-3/4 silent-degradation mode, where a "
                        "rebuild from a thinner member pool quietly "
                        "shipped a worse model twice)")
    args = p.parse_args(argv)

    import ensemble_runs
    import ensemble_search

    # `_full` cache entries are full-image-mode predictions; a release
    # must be reproducible by run.py's sliding-window path, so they are
    # search-able only via ensemble_search --exclude '' (artifact runs).
    rc = ensemble_search.main(["--cache", args.cache,
                               "--max_k", str(args.max_k),
                               "--exclude", "_full",
                               "--out", args.search_json])
    if rc:
        return rc
    with open(args.search_json) as f:
        search = json.load(f)
    # Parsimonious pick: the npz-per-member release makes every member a
    # git blob (~120-240 MB) and a run.py restore+predict pass, so take
    # the SMALLEST subset within 2e-4 agreement of the best (k=10 beating
    # k=5 by +0.0001 is noise against the ~0.002 ensemble-vs-ensemble
    # spread measured in artifacts/ceiling.json).
    top = max(v["agreement"] for v in search["best_by_k"].values())
    best_k, best = min(
        ((k, v) for k, v in search["best_by_k"].items()
         if v["agreement"] >= top - 2e-4),
        key=lambda kv: int(kv[0]))
    names = best["members"]  # "<date>_epochNNN"
    members = []
    for n in names:
        date, ep = n.rsplit("_epoch", 1)
        members.append(f"{date}:{int(ep)}")
    lineages = {m.split(":")[0] for m in members}
    print(f"best subset k={best_k}: agreement {best['agreement']:.5f} "
          f"({len(lineages)} lineage(s): {sorted(lineages)})")
    if len(lineages) == 1 and len(members) > 1:
        print("WARNING: member set collapsed to ONE lineage — same-lineage "
              "late epochs agree 0.975-0.985 with each other and add little "
              "diversity (PARITY.md round 3); prefer a cross-lineage set")

    rc = ensemble_runs.main(
        [a for m in members for a in ("--member", m)]
        + ["--mask_cache", args.cache, "--out", args.out])
    if rc:
        return rc
    with open(os.path.join(args.out, "parity.json")) as f:
        parity = json.load(f)
    if abs(parity["agreement"] - best["agreement"]) > 5e-4:
        print(f"WARNING: pipeline agreement {parity['agreement']:.5f} != "
              f"search score {best['agreement']:.5f}")

    # Regression gate (VERDICT round 4, weak #1): never silently replace
    # a better release with a worse one. The shipped score lives in
    # artifacts/release/release.json ("scores"."agreement").
    if not args.skip_release:
        rel_meta = os.path.join("artifacts", "release", "release.json")
        if os.path.exists(rel_meta):
            with open(rel_meta) as f:
                shipped = json.load(f).get("scores", {}).get("agreement")
            if (shipped is not None
                    and parity["agreement"] < shipped - 1e-9):
                msg = (f"REGRESSION: new release would score "
                       f"{parity['agreement']:.5f} < shipped {shipped:.5f}")
                if not args.allow_regression:
                    print(msg + " — refusing to package "
                          "(--allow_regression overrides)", file=sys.stderr)
                    return 2
                print(msg + " — packaging anyway (--allow_regression)")

    if not args.skip_release:
        import make_release
        rc = make_release.main(
            [a for m in members for a in ("--member", m)]
            + ["--npz", str(args.npz), "--npz_dtype", args.npz_dtype]
            + ["--score-json", json.dumps(
                {"agreement": round(parity["agreement"], 5),
                 "f1_vs_ref": round(parity["f1_vs_ref"], 5)}),
               "--notes", f"best-{best_k} subset over "
                          f"{len(search['singles'])} cached masks "
                          f"(finalize_parity.py)"])
        if rc:
            return rc
    print(json.dumps({"agreement": parity["agreement"],
                      "members": members}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
