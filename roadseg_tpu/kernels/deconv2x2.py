"""Pallas TPU kernels for the U-Net decoder upsample: 2x2 stride-2
VALID transpose conv with fused bias and fused crop-concat, forward and
backward.

The native layer standing in for the reference's cuDNN-backed
``tf.layers.conv2d_transpose`` (``src/unet.py:67-68``) plus the
crop/concat that follows it (``unet.py:72-85``).

TPU-first observation: a 2x2 kernel at stride 2 with VALID padding has
**zero tap overlap** — every output pixel receives exactly one kernel
tap::

    out[b, 2y+dy, 2x+dx, co] = sum_ci x[b, y, x, ci] * k[1-dy, 1-dx, ci, co]

(the spatial flip matches ``lax.conv_transpose`` / ``nn.ConvTranspose``
semantics, pinned by the A/B tests). So the whole op is four independent
channel matmuls ``[TH*W, Cin] x [Cin, Cout]`` — pure MXU work — whose
results interleave 2x2 into the output. No scatter, no halo.

Fused crop-concat: the decoder next center-crops the skip branch(es) and
concatenates them with the upsampled tensor (channel order skips...,
upsampled — ``models/unet.py:155-156``). Here the skips stay in HBM
(``pl.ANY``) and each grid step DMAs the element-offset crop window
straight into the matching rows/channels of the concatenated output
block, overlapping the copy with the deconv matmuls. The XLA path
materializes the deconv output and re-reads it for the concat; this
kernel writes each output byte exactly once.

Backward (``deconv2x2_bias`` custom VJP):
* dx — deinterleave the cotangent and contract each of the 4 parts with
  its transposed tap: one Pallas kernel, 4 matmuls per tile;
* dk — per-tap reduction ``[Cin_t, TH*W] x [TH*W, Cout_t]`` accumulated
  over batch x row-chunks in VMEM scratch (same layout as
  ``conv3x3.conv3x3_dw``);
* db — plain sum; dskips — zero-pad of the cotangent channel slabs
  (XLA pad, no compute).
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


def _row_tile(h: int, target: int) -> int:
    """Largest divisor of ``h`` that is <= target (static shapes only)."""
    for th in range(min(target, h), 0, -1):
        if h % th == 0:
            return th
    return 1


def _interleave2x2(p00, p01, p10, p11):
    """[TH, W, C] x4 -> [2TH, 2W, C] with out[2y+dy, 2x+dx] = p_{dy,dx}."""
    th, w, c = p00.shape
    row0 = jnp.stack([p00, p01], axis=2)          # [th, w, 2, c] (dx)
    row1 = jnp.stack([p10, p11], axis=2)
    full = jnp.stack([row0, row1], axis=1)        # [th, 2, w, 2, c] (dy)
    return full.reshape(2 * th, 2 * w, c)


# ----------------------------------------------------------------------
# forward (+ fused crop-concat)
# ----------------------------------------------------------------------
def deconv2x2_fwd(x, k, bias, skips=(), *, interpret: bool = False,
                  row_tile: int = 8):
    """2x2 stride-2 VALID transpose conv + bias, with optional fused
    center-crop + channel-concat of skip branches.

    x: [N, H, W, Cin]; k: [2, 2, Cin, Cout] (x.dtype); bias: [Cout] f32;
    skips: tuple of [N, Hs_j, Ws_j, F_j] arrays (x.dtype), each center-
    cropped to (2H, 2W) and placed in channel order skips..., deconv.
    Returns [N, 2H, 2W, sum(F_j) + Cout] in x.dtype.

    Skip handling is hybrid, per branch:

    * **DMA path** (F % 128 == 0 and Ws % 8 == 0 — the big decoder
      levels): the uncropped skip stays in HBM (``pl.ANY``); each grid
      step DMAs full-width rows at the (unconstrained) H crop offset
      into VMEM scratch, W-crops as a value slice, and layout-normalizes
      through an aligned scratch. Zero XLA-side materialization.
    * **Blocked path** (sub-lane channel counts Mosaic cannot DMA-slice):
      the skip is center-cropped outside (one XLA slice) and streamed as
      a regular row-blocked VMEM input.

    Both paths fuse the concat — the upsample result is never
    materialized on its own.
    """
    n, h, w, cin = x.shape
    cout = k.shape[-1]
    h2, w2 = 2 * h, 2 * w
    th = _row_tile(h, row_tile)
    num_th = h // th
    skip_feats = [s.shape[-1] for s in skips]
    c_total = sum(skip_feats) + cout
    # center-crop offsets, floor-divided (ops/geometry.py:180)
    crops = [((s.shape[1] - h2) // 2, (s.shape[2] - w2) // 2) for s in skips]
    use_dma = [s.shape[-1] % 128 == 0 and s.shape[2] % 8 == 0 for s in skips]
    dma_idx = [j for j, u in enumerate(use_dma) if u]
    skips_in = [
        s if use_dma[j]
        else jax.lax.slice(s, (0, crops[j][0], crops[j][1], 0),
                           (n, crops[j][0] + h2, crops[j][1] + w2,
                            s.shape[-1]))
        for j, s in enumerate(skips)]
    bias2 = bias.reshape(1, cout)

    def kernel(x_ref, k_ref, b_ref, *rest):
        skip_refs = rest[:len(skips)]
        o_ref = rest[len(skips)]
        scratch_it = iter(rest[len(skips) + 1:])
        scratches = {j: (next(scratch_it), next(scratch_it))
                     for j in dma_idx}
        sems = {j: next(scratch_it) for j in dma_idx}
        b = pl.program_id(0)
        i = pl.program_id(1)

        # DMA full-width skip rows: row (dim 1) offsets are free, but the
        # (8, 128)-tiled (W, C) dims forbid unaligned DMA starts — the
        # W-crop happens below as a value-level slice instead.
        dmas = {}
        for j in dma_idx:
            oy = crops[j][0]
            dma = pltpu.make_async_copy(
                skip_refs[j].at[b, pl.ds(oy + i * 2 * th, 2 * th), :, :],
                scratches[j][0], sems[j])
            dma.start()
            dmas[j] = dma

        xv = x_ref[0]                                     # [th, w, cin]
        bv = b_ref[0].astype(jnp.float32)
        parts = {}
        for dy in range(2):
            for dx in range(2):
                parts[(dy, dx)] = jax.lax.dot_general(
                    xv, k_ref[1 - dy, 1 - dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + bv
        up = _interleave2x2(parts[(0, 0)], parts[(0, 1)],
                            parts[(1, 0)], parts[(1, 1)]).astype(o_ref.dtype)
        if skips:
            pieces = []
            for j in range(len(skips)):
                if j in dmas:
                    dmas[j].wait()
                    ox = crops[j][1]
                    full, aligned = scratches[j]
                    # unaligned W-slices carry shifted vector layouts
                    # Mosaic can't concatenate; a store to an offset-0
                    # scratch normalizes the layout
                    aligned[:] = full[:, ox:ox + w2, :]
                    pieces.append(aligned[:])
                else:
                    pieces.append(skip_refs[j][0])
            # single full-block write: value-level concat avoids memref
            # slices at non-128-aligned channel offsets
            o_ref[0] = jnp.concatenate(pieces + [up], axis=-1)
        else:
            o_ref[0] = up

    in_specs = [
        pl.BlockSpec((1, th, w, cin), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 2, cin, cout), lambda b, i: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec(memory_space=pl.ANY) if use_dma[j]
        else pl.BlockSpec((1, 2 * th, w2, skip_feats[j]),
                          lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM)
        for j in range(len(skips))]

    scratch_shapes = []
    for j in dma_idx:
        scratch_shapes.append(
            pltpu.VMEM((2 * th, skips[j].shape[2], skip_feats[j]), x.dtype))
        scratch_shapes.append(pltpu.VMEM((2 * th, w2, skip_feats[j]),
                                         x.dtype))
    scratch_shapes += [pltpu.SemaphoreType.DMA(()) for _ in dma_idx]

    return pl.pallas_call(
        kernel,
        grid=(n, num_th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * th, w2, c_total),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, c_total), x.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=_MOSAIC_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * n * h * w * cin * cout,
            bytes_accessed=(x.size + k.size
                            + sum(n * h2 * w2 * f for f in skip_feats)
                            + n * h2 * w2 * c_total) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, k, bias2, *skips_in)


# ----------------------------------------------------------------------
# backward: dx
# ----------------------------------------------------------------------
def deconv2x2_dx(g, k, *, interpret: bool = False, row_tile: int = 8):
    """Input gradient. g: [N, 2H, 2W, Cout] cotangent of the deconv
    output (x.dtype), k: [2, 2, Cin, Cout] -> dx [N, H, W, Cin].

    dx[y, x, ci] = sum_{dy,dx,co} g[2y+dy, 2x+dx, co] * k[1-dy,1-dx,ci,co]
    """
    n, h2, w2, cout = g.shape
    h, w = h2 // 2, w2 // 2
    cin = k.shape[2]
    th = _row_tile(h, row_tile)
    num_th = h // th

    def kernel(g_ref, k_ref, o_ref):
        gv = g_ref[0].reshape(th, 2, w, 2, cout)      # [y, dy, x, dx, co]
        acc = jnp.zeros((th, w, cin), jnp.float32)
        for dy in range(2):
            for dx in range(2):
                acc = acc + jax.lax.dot_general(
                    gv[:, dy, :, dx, :], k_ref[1 - dy, 1 - dx],
                    dimension_numbers=(((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        o_ref[0] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n, num_th),
        in_specs=[
            pl.BlockSpec((1, 2 * th, w2, cout), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, cin, cout), lambda b, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cin), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cin), g.dtype),
        interpret=interpret,
        compiler_params=_MOSAIC_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * n * h * w * cin * cout,
            bytes_accessed=(g.size + k.size + n * h * w * cin)
            * g.dtype.itemsize,
            transcendentals=0,
        ),
    )(g, k)


# ----------------------------------------------------------------------
# backward: dk
# ----------------------------------------------------------------------
def deconv2x2_dk(x, g, *, interpret: bool = False, row_chunk: int = 16):
    """Kernel gradient. x: [N, H, W, Cin], g: [N, 2H, 2W, Cout]
    -> dk [2, 2, Cin, Cout] float32.

    dk[dy, dx, ci, co] = sum_{b,y,x} x[b,y,x,ci] * g[b,2(y)+1-dy,2(x)+1-dx,co]
    (tap (dy,dx) of the PARAM kernel feeds output sub-pixel (1-dy,1-dx)).
    One MXU contraction per (tap, row-chunk, batch), accumulated in VMEM —
    no halo needed: x rows [rh] pair exactly with g rows [2rh].
    """
    n, h, w, cin = x.shape
    cout = g.shape[-1]
    ci_t = _channel_tile(cin)
    co_t = _channel_tile(cout)
    rh = _row_tile(h, row_chunk)
    num_r = h // rh
    num_acc = n * num_r

    def kernel(x_ref, g_ref, dk_ref, acc_ref):
        step = pl.program_id(2)

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        xv = x_ref[0].reshape(rh * w, -1)                 # [rh*w, ci_t]
        gv = g_ref[0].reshape(rh, 2, w, 2, -1)            # [y, sy, x, sx, co]
        for dy in range(2):
            for dx in range(2):
                g2 = gv[:, 1 - dy, :, 1 - dx, :].reshape(rh * w, -1)
                tap = dy * 2 + dx
                acc_ref[tap] = acc_ref[tap] + jax.lax.dot_general(
                    xv, g2,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        @pl.when(step == num_acc - 1)
        def _():
            dk_ref[:] = acc_ref[:]

    def x_index(ci, co, step):
        return (step // num_r, step % num_r, 0, ci)

    def g_index(ci, co, step):
        return (step // num_r, step % num_r, 0, co)

    out = pl.pallas_call(
        kernel,
        grid=(_cdiv(cin, ci_t), _cdiv(cout, co_t), num_acc),
        in_specs=[
            pl.BlockSpec((1, rh, w, ci_t), x_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * rh, 2 * w, co_t), g_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, ci_t, co_t),
                               lambda ci, co, step: (0, ci, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, ci_t, co_t), jnp.float32)],
        interpret=interpret,
        compiler_params=_MOSAIC_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * 4 * n * h * w * cin * cout,
            bytes_accessed=(x.size + g.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, g)
    return out.reshape(2, 2, cin, cout)


# ----------------------------------------------------------------------
# public op with custom VJP
# ----------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def deconv2x2_bias(x, k, bias, skips, interpret: bool = False):
    """Fused 2x2 stride-2 transpose conv + bias + crop-concat with Pallas
    forward and backward.

    x: [N, H, W, Cin]; k: [2, 2, Cin, Cout] float32 params (cast to
    x.dtype for the MXU); bias: [Cout] f32; skips: tuple of skip-branch
    arrays, center-cropped to (2H, 2W) and concatenated ahead of the
    upsampled channels. Output [N, 2H, 2W, sum(F_j)+Cout], x.dtype.
    Reference: ``src/unet.py:67-85``.
    """
    return deconv2x2_fwd(x, k.astype(x.dtype), bias,
                         tuple(s.astype(x.dtype) for s in skips),
                         interpret=interpret)


def _deconv2x2_bias_fwd(x, k, bias, skips, interpret):
    out = deconv2x2_bias(x, k, bias, skips, interpret)
    return out, (x, k, tuple(s.shape for s in skips))


def _deconv2x2_bias_bwd(interpret, res, g):
    x, k, skip_shapes = res
    n, h2, w2 = g.shape[0], g.shape[1], g.shape[2]
    cout = k.shape[-1]
    off = g.shape[-1] - cout
    g = g.astype(x.dtype)
    g_up = g[..., off:]
    dx = deconv2x2_dx(g_up, k.astype(x.dtype), interpret=interpret)
    dk = deconv2x2_dk(x, g_up, interpret=interpret)
    db = jnp.sum(g_up.astype(jnp.float32), axis=(0, 1, 2))
    # skip gradients: un-crop (zero-pad) each channel slab back to the
    # skip's spatial shape — pure XLA pad, no compute
    dskips = []
    c0 = 0
    for shp in skip_shapes:
        f = shp[-1]
        oy, ox = (shp[1] - h2) // 2, (shp[2] - w2) // 2
        dskips.append(jnp.pad(
            g[..., c0:c0 + f],
            ((0, 0), (oy, shp[1] - h2 - oy), (ox, shp[2] - w2 - ox),
             (0, 0))))
        c0 += f
    return dx, dk.astype(k.dtype), db, tuple(dskips)


deconv2x2_bias.defvjp(_deconv2x2_bias_fwd, _deconv2x2_bias_bwd)
