"""Pallas TPU kernel for 1x1 convs: fused channel matmul + bias.

Covers the reference's 1x1 convs — the "color_space_adjust" input mix
(``src/unet.py:22-23``) and the 2-logit head (``src/unet.py:95``). A 1x1
conv is a single MXU contraction ``[TH*W, Cin] x [Cin, Cout]``; the only
kernel-level win over XLA is fusing the bias add into the matmul
write-back (XLA cannot fuse elementwise ops into a custom call, which is
also why this kernel exists at all — with ``conv_impl=pallas`` the
neighbouring 3x3/deconv ops are custom calls, so routing the 1x1 through
XLA would strand it between two fusion barriers and cost an extra HBM
round trip).

Note the honest TPU caveat, measured not assumed: for the 2/3-channel
real-model shapes the MXU runs at 2/128 lane utilization no matter who
writes the kernel — bandwidth, not FLOPs, bounds this op. The A/B bench
(``scripts/bench_kernels.py``) decides which backend the flagship uses.

Backward: dx is the same kernel with the transposed kernel matrix; dw is
a ``[Cin, TH*W] x [TH*W, Cout]`` reduction accumulated over batch x row
chunks; db a plain sum. Wired through ``jax.custom_vjp``.
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


_MAX_MATMUL_ROWS = 2048  # Mosaic matmul row-count limit (empirical)


def conv1x1_fwd(x, k, bias, *, interpret: bool = False):
    """x: [N, H, W, Cin], k: [Cin, Cout] (x.dtype), bias: [Cout] f32
    -> [N, H, W, Cout] x.dtype."""
    n, h, w, cin = x.shape
    cout = k.shape[-1]
    th = max(1, min(h, _MAX_MATMUL_ROWS // max(w, 1)))
    num_th = _cdiv(h, th)
    bias2 = bias.reshape(1, cout)

    def kernel(x_ref, k_ref, b_ref, o_ref):
        acc = jax.lax.dot_general(
            x_ref[0], k_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0].astype(jnp.float32)
        o_ref[0] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(n, num_th),
        in_specs=[
            pl.BlockSpec((1, th, w, cin), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        interpret=interpret,
        compiler_params=_MOSAIC_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * cin * cout,
            bytes_accessed=(x.size + k.size + n * h * w * cout)
            * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, k, bias2)


def conv1x1_dw(x, g, *, interpret: bool = False):
    """dw[ci, co] = sum_{b,y,x} x[b,y,x,ci] * g[b,y,x,co] -> [Cin, Cout]
    f32, accumulated over batch x row chunks in VMEM."""
    n, h, w, cin = x.shape
    cout = g.shape[-1]
    ci_t = _channel_tile(cin)
    co_t = _channel_tile(cout)
    rh = max(1, min(h, _MAX_MATMUL_ROWS // max(w, 1)))
    num_r = _cdiv(h, rh)
    num_acc = n * num_r

    def kernel(x_ref, g_ref, dw_ref, acc_ref):
        step = pl.program_id(2)

        @pl.when(step == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # mask rows beyond h (last partial chunk); mask BOTH operands —
        # OOB block reads are undefined and NaN * 0 = NaN
        rc = step % num_r
        valid = jnp.minimum(rh, h - rc * rh)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rh, 1, 1), 0)
        gv = jnp.where(row_ids < valid, g_ref[0], jnp.zeros((), g_ref.dtype))
        xv = jnp.where(row_ids < valid, x_ref[0], jnp.zeros((), x_ref.dtype))
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            xv.reshape(rh * w, -1), gv.reshape(rh * w, -1),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(step == num_acc - 1)
        def _():
            dw_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        grid=(_cdiv(cin, ci_t), _cdiv(cout, co_t), num_acc),
        in_specs=[
            pl.BlockSpec((1, rh, w, ci_t),
                         lambda ci, co, s: (s // num_r, s % num_r, 0, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rh, w, co_t),
                         lambda ci, co, s: (s // num_r, s % num_r, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ci_t, co_t), lambda ci, co, s: (ci, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((ci_t, co_t), jnp.float32)],
        interpret=interpret,
        compiler_params=_MOSAIC_PARAMS,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * cin * cout,
            bytes_accessed=(x.size + g.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv1x1_bias(x, k, bias, interpret: bool = False):
    """Fused 1x1 conv + bias with Pallas forward and backward.

    x: [N, H, W, Cin]; k: [Cin, Cout] float32 params (cast to x.dtype for
    the MXU); bias: [Cout] f32. Output [N, H, W, Cout], x.dtype.
    """
    return conv1x1_fwd(x, k.astype(x.dtype), bias, interpret=interpret)


def _conv1x1_bias_fwd(x, k, bias, interpret):
    return conv1x1_bias(x, k, bias, interpret), (x, k)


def _conv1x1_bias_bwd(interpret, res, g):
    x, k = res
    g = g.astype(x.dtype)
    zeros_ci = jnp.zeros((x.shape[-1],), jnp.float32)
    dx = conv1x1_fwd(g, k.T.astype(x.dtype), zeros_ci, interpret=interpret)
    dw = conv1x1_dw(x, g, interpret=interpret)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw.astype(k.dtype), db


conv1x1_bias.defvjp(_conv1x1_bias_fwd, _conv1x1_bias_bwd)
