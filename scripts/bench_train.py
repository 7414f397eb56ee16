#!/usr/bin/env python3
"""Training-step throughput micro-benchmark for the flagship config.

Measures steps/s and model FLOP/s utilization for combinations of
{remat, conv_impl, batch} on the current device, using synthetic data of
the real training shapes (764x764 inputs, 388x388 labels).

Usage: python scripts/bench_train.py [--batch 4] [--steps 20]
                                     [--variants remat,noremat]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine

# fwd GFLOPs per 764^2 patch of the 6-layer dilated root-64 U-Net
# (see the derivation in docs/SCALING.md context; measured 867.7 GF)
FWD_GFLOPS = 867.7


def run_variant(name: str, batch: int, steps: int, *, remat: bool,
                conv_impl: str, dtype: str = "bfloat16",
                num_layers: int = 6, root_size: int = 64,
                patch_size: int = 388, dilated: bool = True,
                grad_accum: int = 1) -> dict:
    opts = Options(
        num_layers=num_layers, root_size=root_size, dilated_layers=dilated,
        patch_size=patch_size, stride=12, batch_size=batch,
        dropout=1.0, image_augmentation=True, lr=0.01,
        num_epoch=1, eval_every=0, train_score_every=0,
        remat=remat, conv_impl=conv_impl, dtype=dtype,
        grad_accum=grad_accum,
        save_path="/tmp/bench_train", logdir="/tmp/bench_train/logs",
    )
    eng = Engine(opts)
    rng = np.random.RandomState(0)
    img_size = patch_size + 12  # a few stride positions
    imgs = rng.rand(2, img_size, img_size, 3).astype(np.float32)
    gt = (rng.rand(2, img_size, img_size) > 0.7).astype(np.float32)
    eng.prepare_training_data(imgs, gt, rotation_angles=[0])

    import jax
    table = eng._index_table
    eff = batch * max(1, grad_accum)
    idx = np.tile(table, (max(1, -(-eff // len(table))), 1))[:eff]
    step_fn = eng._build_train_step()
    import jax.numpy as jnp
    idx_dev = jax.device_put(jnp.asarray(idx), eng._data_sharding)
    key = jax.random.PRNGKey(0)
    state = eng.state
    # warmup/compile
    state, m = step_fn(state, eng._ext_imgs, eng._ext_gt, idx_dev, key)
    float(jax.device_get(m["loss"]))
    # NOTE: sync each step via a device->host fetch of the loss —
    # block_until_ready does NOT actually block on the axon tunnel
    # backend, so dispatch-only timing would be fiction.
    t0 = time.time()
    for _ in range(steps):
        state, m = step_fn(state, eng._ext_imgs, eng._ext_gt, idx_dev, key)
        float(jax.device_get(m["loss"]))
    dt = (time.time() - t0) / steps
    eff_batch = batch * max(1, grad_accum)
    out = {
        "variant": name, "batch": batch, "grad_accum": grad_accum,
        "eff_batch": eff_batch, "remat": remat,
        "dilated": dilated,
        "conv_impl": conv_impl, "dtype": dtype,
        "s_per_step": round(dt, 4),
        "steps_per_s": round(1.0 / dt, 3),
        "samples_per_s": round(eff_batch / dt, 2),
    }
    if (num_layers, root_size, patch_size) == (6, 64, 388) and dilated:
        # fwd + bwd(2x) + remat re-fwd (1x when on)
        flops = FWD_GFLOPS * 1e9 * eff_batch * (4.0 if remat else 3.0)
        out["model_tflops"] = round(flops / dt / 1e12, 1)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--variants", default="remat,noremat")
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--root_size", type=int, default=64)
    p.add_argument("--patch_size", type=int, default=388)
    p.add_argument("--dilated", type=lambda v: v != "0", default=True)
    args = p.parse_args(argv)

    catalog = {
        "remat": dict(remat=True, conv_impl="xla"),
        "noremat": dict(remat=False, conv_impl="xla"),
        "pallas": dict(remat=False, conv_impl="pallas"),
        "pallas_remat": dict(remat=True, conv_impl="pallas"),
        "hybrid": dict(remat=False, conv_impl="hybrid"),
        "f32": dict(remat=False, conv_impl="xla", dtype="float32"),
        "accum2": dict(remat=False, conv_impl="xla", grad_accum=2),
        "accum4": dict(remat=False, conv_impl="xla", grad_accum=4),
        "pad8": dict(remat=False, conv_impl="pad8"),
        "hybrid_deconv": dict(remat=False, conv_impl="hybrid_deconv"),
    }
    for name in args.variants.split(","):
        try:
            r = run_variant(name, args.batch, args.steps,
                            num_layers=args.layers,
                            root_size=args.root_size,
                            patch_size=args.patch_size,
                            dilated=args.dilated, **catalog[name])
            print(json.dumps(r))
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"variant": name, "error": str(e)[:300]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
