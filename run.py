#!/usr/bin/env python3
"""Submission reproduction script — counterpart of the reference ``run.py``.

The reference pins the winning config (``run.py:121-137``: 6-layer dilated
U-Net, patch 388 / input 764, stride 110, 6-way ensemble, batch 1),
downloads pretrained weights over HTTP with a SHA-256 check, restores
``model-epoch-011.chkpt`` and runs predict -> quantize -> overlays -> CSV
over ``data/test``.

This environment has no network egress, so instead of a download the
weights come from a local checkpoint:

    ./run.py                          # packaged release (possibly an
                                      # N-member ensemble), else newest
                                      # checkpoint under ./runs
    ./run.py --model <ckpt-path>      # explicit checkpoint
    ./run.py --train                  # train the pinned config first
    ./run.py <accel-id>               # parity no-op (device index arg)

An ensemble release (scripts/make_release.py --member DATE:EPOCH ...)
restores every member and averages their probability masks before
quantizing — the shipped reproduction of the round-3 parity result.

Without any checkpoint it refuses (a random-weight "submission" would be
meaningless) unless --train is given.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

from roadseg_tpu.config import Options, _str2bool
from roadseg_tpu.constants import FOREGROUND_THRESHOLD, IMG_PATCH_SIZE
from roadseg_tpu.engine import Engine
from roadseg_tpu.ops import geometry
from roadseg_tpu.utils import images_io

# The pinned winning configuration. The reference run.py pins its *dilated*
# 6-layer config (run.py:121-137, reproducing the 93.994 entry); the actual
# 94.124 Kaggle winner is the NON-dilated 6-layer model (submission dir
# `2017-12-17T10h55m14s_..._6_layers_epoch_22_ensemble_dropout_1.0_94_124`,
# PARITY.md round-2 calibration) — that is what we pin. ``--dilated 1``
# selects the reference-faithful dilated parity config. The TPU build keeps
# the model/geometry flags identical; batch sizes are TPU throughput knobs
# with no effect on the masks.
SUBMISSION_CONFIG = dict(
    num_epoch=0,
    batch_size=9,            # reference uses 1; 9 = one 3x3 window grid
    pred_batch_size=2,       # reference uses 1
    patch_size=388,
    stride=110,
    num_layers=6,
    root_size=64,
    dilated_layers=False,    # the 94.124 winner architecture
    ensemble_prediction=True,
    dropout=1.0,
)
TRAIN_CONFIG = dict(
    # The fast recipe validated to reach the reference's Kaggle band on one
    # v5e (PARITY.md round-1 study): batch 8 + linearly-scaled lr, no remat
    # (batch 4 is dispatch-bound — batch 8 halves wall-clock at identical
    # sweep quality, 0.9652 vs 0.9651 winner agreement). ~93 s/epoch.
    num_epoch=30,
    batch_size=8,
    stride=12,
    image_augmentation=True,
    rotation_angles=[0, 15, 30, 45, 60, 75, 90],
    lr=0.08,
    remat=False,
    eval_every=0, train_score_every=0,
)


RELEASE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts", "release")
# The reference run.py pins the *dilated* parity config (run.py:121-137);
# its weights are packaged separately so `--dilated 1` works from a fresh
# clone without a runs/ directory (VERDICT round 4, missing #3).
RELEASE_DIR_DILATED = RELEASE_DIR + "_dilated"


def newest_checkpoint(save_path: str, geometry=None):
    """Newest completed-epoch checkpoint under ``save_path``, optionally
    restricted to a model ``geometry`` (``checkpoint.GEOMETRY_KEYS`` dict).

    Interrupt sentinels (epoch-999) are skipped — they hold mid-epoch
    weights meant for ``--resume``, not for a submission."""
    from roadseg_tpu.utils import checkpoint as ckpt_lib
    cands = sorted(glob.glob(os.path.join(save_path, "*",
                                          "model-epoch-*.chkpt")),
                   reverse=True)
    for cand in cands:
        if ckpt_lib.is_sentinel(cand):
            continue
        if geometry is not None and ckpt_lib.read_geometry(cand) != geometry:
            continue
        return cand
    return None


def release_checkpoint(release_dir=None):
    """The packaged release model(s) (scripts/make_release.py), verified
    against their SHA-256 manifests — the reference's download-and-verify
    flow (``run.py:46-119``) without the download. Returns
    (checkpoint_paths list, metadata dict) or (None, None). An ensemble
    release (metadata "members") yields several paths; ``main`` averages
    their predicted probability masks (PARITY.md round 3: independent
    seeds' mask average beats any single run)."""
    if release_dir is None:
        release_dir = RELEASE_DIR  # module global: tests monkeypatch it
    meta_path = os.path.join(release_dir, "release.json")
    if not os.path.exists(meta_path):
        return None, None
    import hashlib
    import json

    from roadseg_tpu.utils.checkpoint import verify_manifest
    with open(meta_path) as f:
        meta = json.load(f)
    members = meta.get("members") or [meta]
    ckpts = []
    for m in members:
        ckpt = os.path.join(release_dir, m["checkpoint"])
        if os.path.isdir(ckpt):
            if verify_manifest(ckpt) is False:
                # non-fatal, like the reference's sha256 check
                # (run.py:143-149)
                print(f"WARNING: release checkpoint {ckpt} does not match "
                      f"its SHA256SUMS manifest; continuing anyway",
                      file=sys.stderr)
            ckpts.append(ckpt)
            continue
        # the Orbax payload is gitignored; a git-committed fp16 npz of the
        # same weights (make_release.py --npz) survives machine resets
        npz = os.path.join(release_dir,
                           m.get("npz", m["checkpoint"] + ".npz"))
        if os.path.exists(npz):
            if m.get("npz_sha256"):
                with open(npz, "rb") as f:
                    digest = hashlib.sha256(f.read()).hexdigest()
                if digest != m["npz_sha256"]:
                    print(f"WARNING: {npz} does not match its recorded "
                          f"sha256; continuing anyway", file=sys.stderr)
            ckpts.append(npz)
            continue
        print(f"WARNING: release member {m['checkpoint']} is missing "
              f"(no Orbax dir, no npz); skipping it", file=sys.stderr)
    if not ckpts:
        print("WARNING: no release member is present on disk; "
              "falling back to ./runs", file=sys.stderr)
        return None, None
    return ckpts, meta


def load_fusion_spec():
    """The fusion spec packaged next to the release
    (``scripts/make_fusion_spec.py``): archived submission CSVs that
    vote alongside the release members under ``--fuse``, each pinned by
    SHA-256 like the weight manifests (the reference's verify-then-use
    flow, ``run.py:143-149``). Returns the spec with absolute CSV paths
    resolved, or None when no fusion.json is packaged."""
    spec_path = os.path.join(RELEASE_DIR, "fusion.json")
    if not os.path.exists(spec_path):
        return None
    import hashlib
    import json
    with open(spec_path) as f:
        spec = json.load(f)
    root = os.path.dirname(os.path.abspath(__file__))
    for vote in spec.get("csv_votes", ()):
        ap = (vote["path"] if os.path.isabs(vote["path"])
              else os.path.join(root, vote["path"]))
        if not os.path.exists(ap):
            raise FileNotFoundError(
                f"fusion.json names {vote['path']} but it is missing")
        with open(ap, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()
        if vote.get("sha256") and digest != vote["sha256"]:
            print(f"WARNING: {vote['path']} does not match its recorded "
                  f"sha256; continuing anyway", file=sys.stderr)
        vote["abs_path"] = ap
    return spec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("accelerator", nargs="?", default=None,
                   help="accelerator index (parity arg; TPU selection is "
                        "automatic)")
    p.add_argument("--model", type=str, default=None,
                   help="checkpoint to restore (default: newest under "
                        "--save_path)")
    p.add_argument("--train", action="store_true",
                   help="train the pinned config before predicting")
    p.add_argument("--save_path", type=str,
                   default=os.path.abspath("./runs"))
    p.add_argument("--data", type=str, default=None,
                   help="data root (default: ./data or the reference mount)")
    p.add_argument("--out", type=str, default=None,
                   help="output dir (default: <save_path>/<experiment>)")
    p.add_argument("--dilated", type=_str2bool, default=None,
                   help="1 = the reference run.py's dilated parity config "
                        "(reproduces the 93.994 entry); 0 = the non-dilated "
                        "94.124 winner (default); unset = adopt whatever "
                        "the release/newest checkpoint is")
    p.add_argument("--fuse", action="store_true",
                   help="cross-generation label fusion: each release "
                        "member casts a binary patch vote (faithful "
                        "quantize per member) and the SHA-pinned archived "
                        "CSVs in artifacts/release/fusion.json vote with "
                        "their recorded weights; weighted majority wins. "
                        "Reproduces the repo's best parity submission "
                        "(PARITY.md round 3b); without --fuse the release "
                        "is the pure mask-mean ensemble")
    args = p.parse_args(argv)

    data_root = args.data or images_io.resolve_data_dir()
    config = dict(SUBMISSION_CONFIG)
    if args.dilated is not None:
        config["dilated_layers"] = args.dilated

    def build_opts():
        return Options(**config, save_path=args.save_path,
                       train_data_dir=os.path.join(data_root, "training"))

    if args.train:
        opts = build_opts()
        for key, val in TRAIN_CONFIG.items():
            setattr(opts, key, val)
        model = Engine(opts)
        imgs, gt = images_io.load_train_data(opts.train_data_dir)
        model.prepare_training_data(imgs, gt)
        for i in range(opts.num_epoch):
            print(f"==== Train epoch: {i} ====")
            model.reset_scores()
            if model.train(imgs, gt):
                print("training interrupted; stopping (resume with the "
                      "epoch-999 checkpoint)")
                return 1
            model.save(i)
        opts.num_epoch = 0
        opts.batch_size = SUBMISSION_CONFIG["batch_size"]
        opts.stride = SUBMISSION_CONFIG["stride"]
        opts.image_augmentation = False
        ensemble_ckpts = []
    else:
        from roadseg_tpu.utils import checkpoint as ckpt_lib
        ckpts, meta = ([args.model] if args.model else None), None
        if ckpts is None:
            # `--dilated 1` restores the packaged dilated release (the
            # reference run.py's pinned parity config); default/`--dilated
            # 0` restore the main (non-dilated winner) release. A release
            # whose geometry contradicts the explicit --dilated request is
            # skipped rather than silently substituted.
            rel_dir = RELEASE_DIR_DILATED if args.dilated else RELEASE_DIR
            ckpts, meta = release_checkpoint(rel_dir)
            if (meta is not None and args.dilated is not None
                    and bool(meta.get("model", {}).get("dilated_layers"))
                    != bool(args.dilated)):
                print(f"release in {rel_dir} is "
                      f"{'' if meta['model'].get('dilated_layers') else 'non-'}"
                      f"dilated; ignoring it for --dilated "
                      f"{int(args.dilated)}", file=sys.stderr)
                ckpts, meta = None, None
            if meta is not None:
                # the release decides the model geometry. A partial release
                # (some members missing on disk) may lead with a non-primary
                # member whose geometry differs from the top-level "model"
                # entry — adopt the surviving member's own geometry, and
                # label the run by the member actually restored (ADVICE
                # round 3).
                config.update(meta.get("model", {}))
                lead_geo = ckpt_lib.read_geometry(ckpts[0])
                if lead_geo is not None:
                    config.update(lead_geo)
                kind = (f"{len(ckpts)}-member ensemble" if len(ckpts) > 1
                        else f"model {os.path.basename(ckpts[0])}")
                print(f"using release {kind} "
                      f"(from {meta['source_experiment']} "
                      f"epoch {meta['source_epoch']})")
        if ckpts is None:
            # restrict the newest-checkpoint search to the pinned (or
            # --dilated-selected) architecture so a mixed runs/ population
            # can't hand us a mismatched param tree (round-2 footgun)
            want = {k: config[k] for k in ckpt_lib.GEOMETRY_KEYS}
            ckpt = newest_checkpoint(args.save_path, geometry=want)
            if ckpt is None and args.dilated is None:
                ckpt = newest_checkpoint(args.save_path)  # any architecture
            ckpts = [ckpt] if ckpt else None
        if ckpts is None:
            print("No checkpoint found. Train one first:  ./run.py --train",
                  file=sys.stderr)
            return 1
        if meta is None:
            geo = ckpt_lib.read_geometry(ckpts[0])
            if geo is not None and geo != {k: config[k]
                                           for k in ckpt_lib.GEOMETRY_KEYS}:
                if args.dilated is not None:
                    print(f"checkpoint {ckpts[0]} is "
                          f"{ckpt_lib.describe_geometry(geo)} but "
                          f"--dilated {int(args.dilated)} was requested; "
                          f"pass --model with a matching checkpoint",
                          file=sys.stderr)
                    return 1
                config.update(geo)
                print(f"adopting checkpoint geometry: "
                      f"{ckpt_lib.describe_geometry(geo)}")
        opts = build_opts()
        model = Engine(opts)
        model.restore(file=ckpts[0])
        ensemble_ckpts = ckpts[1:]

    fusion = None
    if args.fuse:
        fusion = load_fusion_spec()
        if fusion is None:
            print("--fuse requires artifacts/release/fusion.json "
                  "(scripts/make_fusion_spec.py packages one)",
                  file=sys.stderr)
            return 1

    test_dir = os.path.join(data_root, "test")
    imgs = images_io.load(test_dir)
    print(f"Running prediction on {imgs.shape[0]} test images...")
    start = time.time()

    from roadseg_tpu.utils import scoring
    member_w = float(fusion.get("member_weight", 1.0)) if fusion else 1.0

    def member_vote(m):
        """One weight-member's contribution: its own binary patch vote
        under fusion (label_fuse.py semantics), the raw probability
        mask under the default mask-mean ensemble."""
        m = np.asarray(m, np.float32)
        if fusion:
            return scoring.mask_labels(
                m, IMG_PATCH_SIZE,
                FOREGROUND_THRESHOLD).astype(np.float64) * member_w
        return m

    acc = member_vote(model.predict_batchwise(imgs, opts.pred_batch_size))
    w_total = member_w
    if ensemble_ckpts:
        from roadseg_tpu.utils import checkpoint as ckpt_lib
    for extra in ensemble_ckpts:
        # ensemble release: average the members' probability masks before
        # quantizing (scripts/ensemble_runs.py semantics). Members may
        # span architectures (mask averaging is geometry-agnostic) — the
        # Engine is rebuilt whenever the next member's geometry differs.
        geo = ckpt_lib.read_geometry(extra)
        cur = {k: config[k] for k in ckpt_lib.GEOMETRY_KEYS}
        if geo is not None and geo != cur:
            config.update(geo)
            print(f"ensemble member {os.path.basename(extra)} is "
                  f"{ckpt_lib.describe_geometry(geo)}; rebuilding engine")
            opts = build_opts()
            model = Engine(opts)
        model.restore(file=extra)
        acc = acc + member_vote(
            model.predict_batchwise(imgs, opts.pred_batch_size))
        w_total += member_w
    stop = time.time()
    print(f"Prediction time: {(stop - start) / 60:.2f} mins "
          f"({imgs.shape[0] / (stop - start):.3f} img/s)")

    if fusion:
        for vote in fusion["csv_votes"]:
            lab = scoring.submission_labels(vote["abs_path"],
                                            IMG_PATCH_SIZE)
            acc = acc + lab.astype(np.float64) * float(vote["weight"])
            w_total += float(vote["weight"])
            print(f"fused CSV vote {vote['path']} (weight {vote['weight']})")
        t = float(fusion.get("vote_threshold", 0.5))
        fused = (acc / w_total) > t - 1e-9  # ties at t -> road
        masks = scoring.labels_to_mask(fused, IMG_PATCH_SIZE)
    else:
        masks = np.asarray(geometry.quantize_mask(
            acc / w_total, threshold=FOREGROUND_THRESHOLD,
            patch_size=IMG_PATCH_SIZE))
    out_dir = args.out or os.path.abspath(
        os.path.join(opts.save_path, model.experiment_name))
    overlay_imgs = images_io.overlays(imgs, masks, fade=0.4)
    images_io.save_all(overlay_imgs, out_dir)
    images_io.save_submission_csv(masks, out_dir, IMG_PATCH_SIZE)
    return 0


if __name__ == "__main__":
    sys.exit(main())
