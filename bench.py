#!/usr/bin/env python3
"""Headline benchmark: 608x608 ensemble inference, images/sec/chip.

Reference baseline: ~6 s per 608x608 test image with the 6-way ensemble on
an Nvidia Titan X (~0.167 img/s; ``report/report.tex:254``, BASELINE.md).

Config matches what this repo ships: the packaged release's geometry
(``artifacts/release/release.json`` — the NON-dilated 6-layer 94.124-winner
architecture, per PARITY.md's round-2 calibration), patch 388 / input 764,
stride 110, 6-way TTA — 54 patches of 764x764 through the net per image,
restored from the release weights. The reference's own run.py pins its
*dilated* config (``run.py:121-137``); ``BENCH_DILATED=1`` benches that
secondary row.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMGS_PER_SEC = 1.0 / 6.0


def _init_watchdog(seconds: int = 600):
    """Hard-exit with a JSON error line if the TPU backend doesn't come
    up within ``seconds``. The axon tunnel, when it is down, hangs
    device init forever (no RPC error) — a bench that never prints is
    worse than one that reports the outage. Healthy init (including the
    tunnel claim leg) takes well under a minute; first jit compiles are
    separate and happen after the watchdog is cancelled."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "608x608 ensemble inference throughput",
            "value": 0.0, "unit": "images/sec/chip", "vs_baseline": 0.0,
            "error": f"TPU backend init exceeded {seconds}s "
                     f"(axon tunnel down?)",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    num_images = int(os.environ.get("BENCH_IMAGES", "20"))
    pred_chunk = int(os.environ.get("BENCH_PRED_BATCH", "2"))

    watchdog = _init_watchdog(
        int(os.environ.get("BENCH_INIT_TIMEOUT_S", "600")))
    import jax
    jax.devices()  # forces backend init / tunnel claim
    watchdog.cancel()

    from roadseg_tpu.config import Options
    from roadseg_tpu.engine import Engine
    from roadseg_tpu.utils import images_io

    # batch_size=36 patches/chunk empirically maximizes MXU occupancy on
    # v5e within HBM (54 crashes the remote compile helper; 27 is ~8%
    # slower; 9 is ~60% slower).
    # BENCH_FULL_IMAGE=1 switches to the full-image predict mode (one
    # valid-conv pass per TTA variant instead of the 9-patch stride-110
    # window; Options.full_image): ~5x fewer conv FLOPs per image. The
    # default stays the reference-faithful sliding-window pipeline.
    full_image = os.environ.get("BENCH_FULL_IMAGE", "0") == "1"
    dilated = os.environ.get("BENCH_DILATED", "0") == "1"
    # Bench what the repo ships: the release's model geometry (non-dilated
    # 6-layer winner architecture). BENCH_DILATED=1 selects the reference
    # run.py's dilated parity config as a secondary row.
    geometry = dict(num_layers=6, root_size=64, dilated_layers=dilated)
    release_ckpt = None
    # the dilated parity row restores the packaged dilated release
    # (artifacts/release_dilated, run.py --dilated 1's source) so both
    # bench rows measure trained, shipped weights
    release_meta_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts",
        "release_dilated" if dilated else "release", "release.json")
    if os.path.exists(release_meta_path):
        with open(release_meta_path) as f:
            release_meta = json.load(f)
        geometry.update(release_meta.get("model", {}))
        members = release_meta.get("members") or [release_meta]
        rel_dir = os.path.dirname(release_meta_path)
        for m in members:
            for cand in (os.path.join(rel_dir, m["checkpoint"]),
                         os.path.join(rel_dir, m.get(
                             "npz", m["checkpoint"] + ".npz"))):
                if os.path.exists(cand):
                    release_ckpt = cand
                    break
            if release_ckpt:
                break
    opts = Options(
        **geometry,
        patch_size=388, stride=110,
        batch_size=int(os.environ.get(
            "BENCH_CHUNK", "6" if full_image else "36")),
        conv_impl=os.environ.get("BENCH_CONV_IMPL", "xla"),
        full_image=full_image,
        ensemble_prediction=True, num_epoch=0,
        logdir="/tmp/roadseg_bench/logs", save_path="/tmp/roadseg_bench",
    )
    eng = Engine(opts)

    # Restore the shipped release weights (Orbax dir or the git-committed
    # npz) so the bench measures the artifact the repo actually ships;
    # fall back to the newest geometry-matching checkpoint under runs/.
    # Throughput doesn't depend on weight values, but "weights": "trained"
    # is part of the bench's credibility (VERDICT round 3, task 2).
    weights = "random"
    restored_name, restored_sha = None, None
    try:
        from roadseg_tpu.utils import checkpoint as ckpt_lib
        match = release_ckpt
        if match is None:
            import glob
            ckpts = sorted(glob.glob(os.path.join("runs", "*",
                                                  "model-epoch-*.chkpt")),
                           reverse=True)
            want = eng.model_geometry
            match = next((c for c in ckpts if not ckpt_lib.is_sentinel(c)
                          and ckpt_lib.read_geometry(c) == want), None)
            if match is None and ckpts:
                print(f"(bench) no checkpoint matches "
                      f"{ckpt_lib.describe_geometry(want)}; "
                      f"using random init")
        if match:
            eng.restore(file=os.path.abspath(match))
            weights = "trained"
            # Name the exact weights measured (member + npz sha) so a
            # bench number can always be tied to a release take — round 4
            # benched a member the final release no longer contained and
            # nothing recorded the drift (VERDICT round 4, weak #6).
            restored_name = os.path.basename(match)
            if os.path.isfile(match):
                import hashlib
                with open(match, "rb") as f:
                    restored_sha = hashlib.sha256(f.read()).hexdigest()
    except Exception as e:
        print(f"(bench) checkpoint restore skipped: {e}")

    try:
        imgs = images_io.load(images_io.resolve_data_dir("test"))
        imgs = imgs[:num_images]
    except FileNotFoundError:
        rng = np.random.RandomState(0)
        imgs = rng.rand(num_images, 608, 608, 3).astype(np.float32)
    if imgs.shape[0] < num_images:
        num_images = imgs.shape[0]

    # Warmup / compile on one chunk shape.
    _ = np.asarray(eng.predict(imgs[:pred_chunk]))

    start = time.time()
    masks = eng.predict_batchwise(imgs, pred_chunk)
    elapsed = time.time() - start
    assert masks.shape == (num_images, 608, 608, 1)

    import jax
    n_chips = jax.device_count()
    imgs_per_sec_per_chip = num_images / elapsed / n_chips
    print(json.dumps({
        "metric": "608x608 ensemble inference throughput",
        "value": round(imgs_per_sec_per_chip, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec_per_chip / BASELINE_IMGS_PER_SEC,
                             2),
        "weights": weights,
        "restored": restored_name,
        "restored_sha256": restored_sha,
        "mode": "full_image" if full_image else "sliding_window",
        "conv_impl": opts.conv_impl,
        "config": ("dilated" if geometry["dilated_layers"]
                   else "release (non-dilated winner)"),
    }))


if __name__ == "__main__":
    sys.exit(main())
