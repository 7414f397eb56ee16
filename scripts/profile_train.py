#!/usr/bin/env python3
"""Stage-wise decomposition of the training step on the real TPU.

Answers "where does the non-MXU time go?" without needing a device-side
profiler (the axon tunnel cannot host TensorBoard's TPU trace collector):
jit each pipeline stage separately, time it with true device sync, and
read XLA's own FLOP count off the compiled executable
(``compiled.cost_analysis()``). Stages:

  prep     gather patches + normalize + stochastic augment
  fwd      U-Net forward + loss (inference path of the step)
  fwd_bwd  value_and_grad of the same (adds the backward pass)
  step     the engine's full train step (adds momentum update)

``step - fwd_bwd`` isolates the optimizer+donation cost, ``fwd_bwd -
fwd`` the backward pass, ``fwd - prep``≈0 checks prep is overlapped.
Reference counterpart: the TF reference has no profiling at all
(SURVEY.md §5.1); this plus utils/profiler.py is the observability
layer.

Usage: python scripts/profile_train.py [--batch 8] [--grad_accum 1]
           [--dilated 0] [--steps 20] [--out artifacts/profile_train.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from roadseg_tpu import constants
from roadseg_tpu.config import Options
from roadseg_tpu.engine import Engine
from roadseg_tpu.ops import augment as augment_ops


def sync(x):
    """True device sync: fetch one scalar (block_until_ready does not
    actually block over the axon tunnel)."""
    leaf = jax.tree.leaves(x)[0]
    float(jax.device_get(jnp.ravel(leaf)[0]))


def time_fn(fn, *args, steps=20):
    out = fn(*args)  # compile
    sync(out)
    t0 = time.time()
    for _ in range(steps):
        out = fn(*args)
        sync(out)
    return (time.time() - t0) / steps, out


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        costs = c.cost_analysis()
        if isinstance(costs, (list, tuple)):
            costs = costs[0]
        return float(costs.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"cost_analysis unavailable: {str(e)[:120]}", file=sys.stderr)
        return float("nan")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dilated", type=lambda v: v != "0", default=False)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--out", default="artifacts/profile_train.jsonl")
    args = p.parse_args(argv)

    opts = Options(
        num_layers=args.layers, root_size=64, dilated_layers=args.dilated,
        patch_size=388, stride=12, batch_size=args.batch,
        grad_accum=args.grad_accum,
        dropout=1.0, image_augmentation=True, lr=0.01, num_epoch=1,
        eval_every=0, train_score_every=0,
        save_path="/tmp/profile_train", logdir="/tmp/profile_train/logs",
    )
    eng = Engine(opts)
    rng = np.random.RandomState(0)
    img_size = 388 + 12
    imgs = rng.rand(2, img_size, img_size, 3).astype(np.float32)
    gt = (rng.rand(2, img_size, img_size) > 0.7).astype(np.float32)
    eng.prepare_training_data(imgs, gt, rotation_angles=[0])

    eff = args.batch * max(1, args.grad_accum)
    table = eng._index_table
    idx = np.tile(table, (max(1, -(-eff // len(table))), 1))[:eff]
    idx_dev = jax.device_put(jnp.asarray(idx), eng._data_sharding)
    mb_idx = jax.device_put(jnp.asarray(idx[:args.batch]),
                            eng._data_sharding)
    key = jax.random.PRNGKey(0)
    in_size, ps = eng.input_size, opts.patch_size
    model, state = eng.model, eng.state

    # ---- stage definitions (mirror engine._build_train_step) ----
    def gather(ext_imgs, ext_gt, idx):
        def one(triple):
            i, y, x = triple[0], triple[1], triple[2]
            img = jax.lax.dynamic_slice(
                ext_imgs, (i, y, x, 0),
                (1, in_size, in_size, constants.NUM_CHANNELS))[0]
            g = jax.lax.dynamic_slice(ext_gt, (i, y, x), (1, ps, ps))[0]
            return img, g
        return jax.vmap(one)(idx)

    def prep(ext_imgs, ext_gt, idx, rng_key):
        patches8, gt8 = gather(ext_imgs, ext_gt, idx)
        patches = patches8.astype(jnp.float32) / constants.PIXEL_DEPTH
        labels = (gt8 >= 128).astype(jnp.int32)
        return augment_ops.stochastic_augment(rng_key, patches, labels)

    def loss_of(params, patches, labels):
        import optax
        logits = model.apply(params, patches, dropout_keep=1.0,
                             deterministic=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    def fwd(params, ext_imgs, ext_gt, idx, rng_key):
        patches, labels = prep(ext_imgs, ext_gt, idx, rng_key)
        return loss_of(params, patches, labels)

    def fwd_bwd(params, ext_imgs, ext_gt, idx, rng_key):
        patches, labels = prep(ext_imgs, ext_gt, idx, rng_key)
        return jax.value_and_grad(loss_of)(params, patches, labels)

    step_fn = eng._build_train_step()

    stages = [
        ("prep", jax.jit(prep),
         (eng._ext_imgs, eng._ext_gt, mb_idx, key)),
        ("fwd", jax.jit(fwd),
         (state["params"], eng._ext_imgs, eng._ext_gt, mb_idx, key)),
        ("fwd_bwd", jax.jit(fwd_bwd),
         (state["params"], eng._ext_imgs, eng._ext_gt, mb_idx, key)),
    ]
    rows = []
    for name, fn, a in stages:
        dt, _ = time_fn(fn, *a, steps=args.steps)
        fl = flops_of(fn, *a)
        rows.append({"stage": name, "ms": round(dt * 1e3, 2),
                     "batch": args.batch,
                     "gflops": round(fl / 1e9, 1),
                     "tflops_per_s": round(fl / dt / 1e12, 1)})
        print(json.dumps(rows[-1]))

    # full engine step at the effective batch; state is donated, so
    # re-feed the returned state each call
    st, m = step_fn(eng.state, eng._ext_imgs, eng._ext_gt, idx_dev, key)
    sync(m["loss"])
    t0 = time.time()
    for _ in range(args.steps):
        st, m = step_fn(st, eng._ext_imgs, eng._ext_gt, idx_dev, key)
        sync(m["loss"])
    dt = (time.time() - t0) / args.steps
    rows.append({"stage": "step", "ms": round(dt * 1e3, 2),
                 "batch": args.batch, "grad_accum": args.grad_accum,
                 "eff_batch": eff,
                 "samples_per_s": round(eff / dt, 2)})
    print(json.dumps(rows[-1]))

    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
