"""Pallas TPU kernels for the U-Net hot path: 3x3 valid-padding conv
(+ optional dilation 2) with fused bias, forward and backward.

The native layer standing in for the reference's cuDNN-backed
``tf.layers.conv2d`` calls (``src/unet.py:34-44``), built for the MXU:
no im2col materialization — each output row-tile accumulates nine
shifted-slab matmuls ``[TH, W_out, Cin_t] x [Cin_t, Cout_t]``, one per
kernel tap, with float32 accumulation in VMEM scratch.

Grid layouts put the reduction dim LAST (fastest-varying on TPU), and the
output block's index map ignores it, so Pallas keeps the accumulator block
resident in VMEM across reduction steps (the revisiting rule).

Conv halos use the **dual row-spec** pattern: the input is passed twice
with row-block index maps ``i`` and ``min(i+1, last)`` (all dims Blocked —
Mosaic cannot prove tiling divisibility for element-granular starts on
small-channel layouts), and the kernel stitches ``rows[i*TH : i*TH+TH+2d]``
from the two blocks. The clamped second block means out-of-range rows read
*real* (wrong but finite) data that only ever feeds discarded or masked
output rows — no NaN-poisoning risk.

Backward:
* dx reuses the forward kernel — valid conv of the zero-padded cotangent
  with the spatially-flipped, io-transposed kernel;
* dw is a dedicated per-tap masked reduction kernel,
  ``[Cin_t, RH*W'] x [RH*W', Cout_t]`` accumulated over batch x row-chunks;
* db is a plain sum.
All wired through ``jax.custom_vjp`` in ``conv3x3_bias``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default 16 MB scoped-VMEM guardrail rejects the flagship
# batch-8 blocks (v5e has 128 MB VMEM); raise the per-kernel cap.
_MOSAIC_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _channel_tile(c: int) -> int:
    return 128 if c % 128 == 0 else c


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------
_VMEM_BLOCK_BUDGET = 2 * 1024 * 1024  # per input block, pre double-buffer
_MAX_MATMUL_ROWS = 2048  # Mosaic matmul row-count limit (empirical)


@functools.partial(jax.jit,
                   static_argnames=("dilation", "interpret", "row_tile",
                                    "relu"))
def conv3x3_fwd(x, k, bias, *, dilation: int = 1, interpret: bool = False,
                row_tile: int = 8, relu: bool = False):
    """3x3 valid conv + bias (+ optionally fused ReLU). x: [N, H, W, Cin],
    k: [3, 3, Cin, Cout] (same dtype as x), bias: [Cout] f32. Returns
    [N, H-2d, W-2d, Cout] in x.dtype. The ReLU fuses into the kernel's
    write-back — XLA cannot fuse elementwise ops into a custom call, so an
    unfused ReLU would cost an extra HBM round trip.

    Strategy: keep Cin un-tiled whenever the x row-slab fits VMEM (true
    for every layer of the U-Net) — then each output block is written in a
    SINGLE grid step (no revisiting), which XLA/Mosaic schedules without
    staging the whole output array in VMEM. Only pathological
    cin x width combinations fall back to a cin-reduction grid.
    """
    n, h, w, cin = x.shape
    cout = k.shape[-1]
    d = dilation
    h_out, w_out = h - 2 * d, w - 2 * d
    itemsize = x.dtype.itemsize

    th = max(min(row_tile, h_out), 2 * d)
    if (th + 2 * d) * w * cin * itemsize <= _VMEM_BLOCK_BUDGET:
        ci_t = cin  # one visit per output block
    else:
        ci_t = _channel_tile(cin)
    co_t = _channel_tile(cout)
    while 9 * ci_t * co_t * itemsize > 8 * _VMEM_BLOCK_BUDGET \
            and co_t % 2 == 0:
        co_t //= 2
    num_ci = _cdiv(cin, ci_t)
    num_th = _cdiv(h_out, th)
    num_xb = _cdiv(h, th)  # row blocks available in x
    bias2 = bias.reshape(1, cout)
    # Mosaic's matmul lowering crashes when the non-contracted row count
    # exceeds ~2k; chunk W so each per-tap dot stays under it.
    wc = min(w_out, max(128, _MAX_MATMUL_ROWS // th))

    def taps_matmul(rows, k_ref, acc):
        """acc: [th, w_out, co_t] f32 value; returns updated value."""
        cols = []
        for w0 in range(0, w_out, wc):
            cw = min(wc, w_out - w0)
            part = acc[:, w0:w0 + cw, :]
            for ky in range(3):
                for kx in range(3):
                    slab = rows[ky * d:ky * d + th,
                                kx * d + w0:kx * d + w0 + cw, :]
                    part = part + jax.lax.dot_general(
                        slab, k_ref[ky, kx],
                        dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            cols.append(part)
        return jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]

    def finish(acc, b_ref):
        out = acc + b_ref[0].astype(jnp.float32)
        if relu:
            out = jnp.maximum(out, 0.0)
        return out

    cost = pl.CostEstimate(
        flops=2 * 9 * n * h_out * w_out * cin * cout,
        bytes_accessed=(2 * x.size + k.size) * itemsize
        + n * h_out * w_out * cout * itemsize,
        transcendentals=0,
    )
    out_shape = jax.ShapeDtypeStruct((n, h_out, w_out, cout), x.dtype)

    if num_ci == 1:
        # -- single-visit path: grid (n, rows, cout); no accumulator scratch
        def kernel(xa_ref, xb_ref, k_ref, b_ref, o_ref):
            rows = jnp.concatenate([xa_ref[0], xb_ref[0, :2 * d]], axis=0)
            acc = taps_matmul(
                rows, k_ref,
                jnp.zeros((th, w_out, co_t), jnp.float32))
            o_ref[0] = finish(acc, b_ref).astype(o_ref.dtype)

        return pl.pallas_call(
            kernel,
            grid=(n, num_th, _cdiv(cout, co_t)),
            in_specs=[
                pl.BlockSpec((1, th, w, cin),
                             lambda b, i, co: (b, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, th, w, cin),
                    lambda b, i, co: (b, jnp.minimum(i + 1, num_xb - 1),
                                      0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec((3, 3, cin, co_t),
                             lambda b, i, co: (0, 0, 0, co),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co_t), lambda b, i, co: (0, co),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, th, w_out, co_t),
                lambda b, i, co: (b, i, 0, co),
                memory_space=pltpu.VMEM),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_MOSAIC_PARAMS,
            cost_estimate=cost,
        )(x, x, k, bias2)

    # -- fallback: cin-reduction grid (reduction dim last, block-resident
    #    f32 accumulator in scratch)
    def kernel(xa_ref, xb_ref, k_ref, b_ref, o_ref, acc_ref):
        ci = pl.program_id(3)

        @pl.when(ci == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        rows = jnp.concatenate([xa_ref[0], xb_ref[0, :2 * d]], axis=0)
        acc_ref[:] = taps_matmul(rows, k_ref, acc_ref[:])

        @pl.when(ci == num_ci - 1)
        def _():
            o_ref[0] = finish(acc_ref[:], b_ref).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n, num_th, _cdiv(cout, co_t), num_ci),
        in_specs=[
            pl.BlockSpec((1, th, w, ci_t),
                         lambda b, i, co, ci: (b, i, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, th, w, ci_t),
                lambda b, i, co, ci: (b, jnp.minimum(i + 1, num_xb - 1),
                                      0, ci),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci_t, co_t),
                         lambda b, i, co, ci: (0, 0, ci, co),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co_t), lambda b, i, co, ci: (0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_out, co_t),
            lambda b, i, co, ci: (b, i, 0, co),
            memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((th, w_out, co_t), jnp.float32)],
        interpret=interpret,
        compiler_params=_MOSAIC_PARAMS,
        cost_estimate=cost,
    )(x, x, k, bias2)


# ----------------------------------------------------------------------
# backward: dw
# ----------------------------------------------------------------------
@functools.partial(jax.jit,
                   static_argnames=("dilation", "interpret", "row_chunk"))
def conv3x3_dw(x, g, *, dilation: int = 1, interpret: bool = False,
               row_chunk: int = 16):
    """Kernel gradient. x: [N, H, W, Cin], g: [N, H', W', Cout] (cotangent,
    x.dtype) -> dw [3, 3, Cin, Cout] float32.

    dw[ky,kx,ci,co] = sum_{b,y,x} x[b, y+ky*d, x+kx*d, ci] * g[b,y,x,co]
    — one MXU contraction per (tap, row-chunk, batch) accumulated in VMEM.
    """
    n, h, w, cin = x.shape
    _, h_out, w_out, cout = g.shape
    d = dilation

    ci_t = _channel_tile(cin)
    co_t = _channel_tile(cout)
    rh = max(min(row_chunk, h_out), 2 * d)
    num_r = _cdiv(h_out, rh)
    num_acc = n * num_r
    num_xb = _cdiv(h, rh)
    wc = min(w_out, max(128, _MAX_MATMUL_ROWS // rh))

    def kernel(xa_ref, xb_ref, g_ref, dw_ref, acc_ref):
        step = pl.program_id(2)
        rc = step % num_r

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # mask rows beyond h_out (last partial chunk); mask BOTH operands —
        # OOB hardware reads are undefined and NaN * 0 = NaN
        valid = jnp.minimum(rh, h_out - rc * rh)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rh, 1, 1), 0)
        g_slab = jnp.where(row_ids < valid, g_ref[0],
                           jnp.zeros((), g_ref.dtype))
        # one stitched x block serves all 9 statically-unrolled taps
        rows = jnp.concatenate([xa_ref[0], xb_ref[0, :2 * d]], axis=0)
        rows = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (rh + 2 * d, 1, 1), 0)
            < valid + 2 * d, rows, jnp.zeros((), rows.dtype))
        # 2-D operands (Mosaic's matmul contracts exactly one dim), chunked
        # along W to bound the contraction extent
        for w0 in range(0, w_out, wc):
            cw = min(wc, w_out - w0)
            g2 = g_slab[:, w0:w0 + cw, :].reshape(rh * cw, -1)
            for ky in range(3):
                for kx in range(3):
                    x_slab = rows[ky * d:ky * d + rh,
                                  kx * d + w0:kx * d + w0 + cw, :]
                    x2 = x_slab.reshape(rh * cw, -1)
                    tap = ky * 3 + kx
                    acc_ref[tap] = acc_ref[tap] + jax.lax.dot_general(
                        x2, g2,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

        @pl.when(step == num_acc - 1)
        def _():
            dw_ref[:] = acc_ref[:]

    def xa_index(ci, co, step):
        b, rc = step // num_r, step % num_r
        return (b, rc, 0, ci)

    def xb_index(ci, co, step):
        b, rc = step // num_r, step % num_r
        return (b, jnp.minimum(rc + 1, num_xb - 1), 0, ci)

    def g_index(ci, co, step):
        b, rc = step // num_r, step % num_r
        return (b, rc, 0, co)

    # dw reshaped [9, Cin, Cout] so the tap axis is a plain block dim
    out = pl.pallas_call(
        kernel,
        grid=(_cdiv(cin, ci_t), _cdiv(cout, co_t), num_acc),
        in_specs=[
            pl.BlockSpec((1, rh, w, ci_t), xa_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rh, w, ci_t), xb_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rh, w_out, co_t), g_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (9, ci_t, co_t),
            lambda ci, co, step: (0, ci, co),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9, ci_t, co_t), jnp.float32)],
        interpret=interpret,
        compiler_params=_MOSAIC_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n * h_out * w_out * cin * cout,
            bytes_accessed=(2 * x.size + g.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, g)
    return out.reshape(3, 3, cin, cout)


# ----------------------------------------------------------------------
# public op with custom VJP
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_bias(x, k, bias, dilation: int = 1, interpret: bool = False,
                 relu: bool = False):
    """Fused 3x3 valid conv + bias (+ optional ReLU) with Pallas forward
    and backward.

    x: [N, H, W, Cin]; k: [3, 3, Cin, Cout] float32 params (cast to x.dtype
    for the MXU); bias: [Cout] f32. Output [N, H-2d, W-2d, Cout], x.dtype.
    """
    return conv3x3_fwd(x, k.astype(x.dtype), bias, dilation=dilation,
                       interpret=interpret, relu=relu)


def _conv3x3_bias_fwd(x, k, bias, dilation, interpret, relu):
    out = conv3x3_fwd(x, k.astype(x.dtype), bias, dilation=dilation,
                      interpret=interpret, relu=relu)
    return out, (x, k, out if relu else None)


def _conv3x3_bias_bwd(dilation, interpret, relu, res, g):
    x, k, out = res
    d = dilation
    g = g.astype(x.dtype)
    if relu:
        # d(relu)/dz mask from the saved activation (out == 0 where clipped)
        g = jnp.where(out > 0, g, jnp.zeros((), g.dtype))
    # dx: pad g by 2d, conv with spatially-flipped io-transposed kernel.
    g_pad = jnp.pad(g, ((0, 0), (2 * d, 2 * d), (2 * d, 2 * d), (0, 0)))
    k_flip = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)  # [3,3,Co,Ci]
    zeros_ci = jnp.zeros((x.shape[-1],), jnp.float32)
    dx = conv3x3_fwd(g_pad, k_flip.astype(x.dtype), zeros_ci,
                     dilation=d, interpret=interpret)
    # dw: per-tap reduction over batch x output pixels.
    dw = conv3x3_dw(x, g, dilation=d, interpret=interpret)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw.astype(k.dtype), db


conv3x3_bias.defvjp(_conv3x3_bias_fwd, _conv3x3_bias_bwd)
