#!/usr/bin/env python3
"""Per-kernel A/B micro-benchmark: Pallas vs XLA on the flagship shapes.

Times each hot op of the 6-layer U-Net (3x3 valid conv fwd, the fused
deconv2x2+crop-concat, the 1x1 head) on the real TPU at the actual
flagship decoder/encoder shapes, both backends, and prints a table.
Timing is true-sync: a tiny device fetch after each batch of iterations
(``jax.block_until_ready`` does not block on tunneled backends — see
scripts/bench_train.py).

Usage: python scripts/bench_kernels.py [--iters 20] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync_time(fn, args, iters):
    import jax
    out = fn(*args)          # compile
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.time() - t0) / iters


def rel_err(a, b):
    """max |a-b| / max|b| between two backend outputs (host-side)."""
    import jax
    a = np.asarray(jax.device_get(a), np.float32)
    b = np.asarray(jax.device_get(b), np.float32)
    denom = max(float(np.max(np.abs(b))), 1e-6)
    return float(np.max(np.abs(a - b))) / denom


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--batch", type=int, default=8,
                   help="batch for conv shapes (training batch)")
    p.add_argument("--check", action="store_true",
                   help="record max rel-err of Pallas vs XLA per shape "
                        "(the hardware numerics A/B, DESIGN.md table)")
    p.add_argument("--ops", default="conv3x3,deconv,conv1x1",
                   help="comma list of op classes to bench; running each "
                        "class in its own process isolates remote-compile-"
                        "helper crashes (they kill the whole process)")
    args = p.parse_args(argv)
    ops = set(args.ops.split(","))

    import jax
    import jax.numpy as jnp
    from jax import lax

    from roadseg_tpu.kernels.conv1x1 import conv1x1_fwd
    from roadseg_tpu.kernels.conv3x3 import conv3x3_fwd
    from roadseg_tpu.kernels.deconv2x2 import deconv2x2_fwd
    from roadseg_tpu.ops.geometry import center_crop

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    b = args.batch
    results = []

    def record(name, shape_desc, t_xla, t_pal, flops, f_xla=None,
               f_pal=None, fargs=None):
        row = {
            "op": name, "shape": shape_desc,
            "xla_ms": round(t_xla * 1e3, 3),
        }
        if isinstance(t_pal, str):       # compile/run failure: record why
            row["pallas_error"] = t_pal
            row["pallas_vs_xla"] = 0.0
        else:
            row.update({
                "pallas_ms": round(t_pal * 1e3, 3),
                "pallas_vs_xla": round(t_xla / t_pal, 3),
                "pallas_tflops": round(flops / t_pal / 1e12, 2),
            })
            if args.check and f_xla is not None:
                row["rel_err"] = round(
                    rel_err(f_pal(*fargs), f_xla(*fargs)), 6)
        results.append(row)
        print(json.dumps(row), flush=True)

    def try_time(fn, fa):
        """Time fn, or return a one-line error string (the remote compile
        helper rejects some large kernel programs — keep the table going)."""
        try:
            return sync_time(fn, fa, args.iters)
        except Exception as e:  # noqa: BLE001 - record and continue
            return " ".join(str(e).split())[:300]

    # ---- 3x3 valid convs: one per encoder level (first conv of each) ----
    # flagship (6L root 64) encoder sizes 764->760, 380->376, ...
    conv_shapes = [
        (764, 3, 64), (380, 64, 128), (188, 128, 256),
        (92, 256, 512), (44, 512, 1024), (20, 1024, 2048),
        (18, 2048, 2048),  # second bottleneck conv (hybrid-rule check)
    ]
    # Alignment-sensitivity arm (VERDICT round-4 task 5): identical kernel,
    # input H/W padded so the valid-conv OUTPUT spatial size is a multiple
    # of the 8-sublane register tile (378->384, 186->192, ...). If per-FLOP
    # throughput doesn't move, odd-size tiling is NOT the Pallas fwd gap
    # and an aligned-tile rewrite can't close it.
    if "conv3x3_aligned" in ops:
        conv_shapes = [
            (386, 64, 128), (194, 128, 256), (98, 256, 512),
            (50, 512, 1024), (26, 1024, 2048),
        ]
        ops.add("conv3x3")
    for h, cin, cout in conv_shapes:
        if "conv3x3" not in ops:
            break
        if cin < 8:
            continue  # 3-channel first conv stays on XLA by design
        x = jnp.asarray(rng.randn(b, h, h, cin), dtype)
        k = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, dtype)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)

        @jax.jit
        def f_xla(x, k, bias):
            out = lax.conv_general_dilated(
                x, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(out + bias.astype(out.dtype), 0)

        f_pal = jax.jit(lambda x, k, bias: conv3x3_fwd(x, k, bias, relu=True))
        t_x = sync_time(f_xla, (x, k, bias), args.iters)
        t_p = try_time(f_pal, (x, k, bias))
        record("conv3x3+relu", f"{b}x{h}x{h}x{cin}->{cout}", t_x, t_p,
               2 * 9 * b * (h - 2) ** 2 * cin * cout,
               f_xla, f_pal, (x, k, bias))

    # ---- fused deconv2x2 + crop-concat: each decoder level ----
    # (x_h, cin, cout, skip_h) per flagship decoder level
    deconv_shapes = [
        (16, 2048, 1024, 40), (28, 1024, 512, 88),
        (52, 512, 256, 184), (100, 256, 128, 376), (196, 128, 64, 760),
    ]
    for h, cin, cout, hs in deconv_shapes:
        if "deconv" not in ops:
            break
        x = jnp.asarray(rng.randn(b, h, h, cin), dtype)
        k = jnp.asarray(rng.randn(2, 2, cin, cout) * 0.05, dtype)
        bias = jnp.asarray(rng.randn(cout), jnp.float32)
        skip = jnp.asarray(rng.randn(b, hs, hs, cout), dtype)

        @jax.jit
        def f_xla(x, k, bias, skip):
            up = lax.conv_transpose(
                x, k, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            up = up + bias.astype(up.dtype)
            return jnp.concatenate(
                [center_crop(skip, 2 * x.shape[1], 2 * x.shape[2]), up],
                axis=-1)

        f_pal = jax.jit(
            lambda x, k, bias, skip: deconv2x2_fwd(x, k, bias, (skip,)))
        t_x = sync_time(f_xla, (x, k, bias, skip), args.iters)
        t_p = try_time(f_pal, (x, k, bias, skip))
        record("deconv2x2+concat", f"{b}x{h}x{h}x{cin}->{cout}+skip{hs}",
               t_x, t_p, 2 * 4 * b * h * h * cin * cout,
               f_xla, f_pal, (x, k, bias, skip))

    # ---- 1x1 head (388x388x64 -> 2) ----
    if "conv1x1" not in ops:
        wins = sum(1 for r in results if r["pallas_vs_xla"] >= 1.0)
        print(json.dumps({"summary": f"pallas wins {wins}/{len(results)}",
                          "dtype": args.dtype, "batch": b}))
        return 0
    x = jnp.asarray(rng.randn(b, 388, 388, 64), dtype)
    k1 = jnp.asarray(rng.randn(64, 2) * 0.05, jnp.float32)
    bias1 = jnp.asarray(rng.randn(2), jnp.float32)

    @jax.jit
    def f_xla1(x, k1, bias1):
        return (jnp.einsum("bhwc,cf->bhwf", x, k1.astype(x.dtype))
                + bias1.astype(x.dtype))

    f_pal1 = jax.jit(
        lambda x, k1, bias1: conv1x1_fwd(x, k1.astype(x.dtype), bias1))
    t_x = sync_time(f_xla1, (x, k1, bias1), args.iters)
    t_p = try_time(f_pal1, (x, k1, bias1))
    record("conv1x1 head", f"{b}x388x388x64->2", t_x, t_p,
           2 * b * 388 * 388 * 64 * 2, f_xla1, f_pal1, (x, k1, bias1))

    wins = sum(1 for r in results if r["pallas_vs_xla"] >= 1.0)
    print(json.dumps({"summary": f"pallas wins {wins}/{len(results)}",
                      "dtype": args.dtype, "batch": b}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
