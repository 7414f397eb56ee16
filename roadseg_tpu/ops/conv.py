"""Convolution backends for the U-Net hot path.

Three implementations behind one interface:

* ``impl="xla"``  — ``lax.conv_general_dilated`` (XLA's native TPU conv,
  already MXU-tiled and fusion-friendly).
* ``impl="pallas"`` — hand-written fused Pallas TPU kernels
  (``roadseg_tpu/kernels/``), the native layer standing in for the
  reference's cuDNN-backed ``tf.layers.conv2d`` (``src/unet.py:34-44``).
* ``impl="hybrid"`` — the measured per-shape winner on v5e
  (``scripts/bench_kernels.py`` table, recorded in docs/DESIGN.md):
  Pallas for the bottleneck 3x3 convs (cin >= 1024, where XLA's conv
  pads small-spatial tiles and our kernel wins 1.7x) and for every fused
  deconv2x2+crop-concat decoder block (wins 1.0-1.7x at all five
  levels); XLA for large-spatial 3x3 convs and the 1x1s (XLA wins).
* ``impl="hybrid_deconv"`` — ONLY the fused deconv2x2+crop-concat goes to
  Pallas; all convs stay on XLA. The minimal-dispatch hybrid for the
  forward-only predict path: no custom-VJP backward cost, one custom
  call per decoder level (the fewest fusion barriers), keeping just the
  fusion XLA structurally cannot do (upsample->concat across the
  conv_transpose boundary).
* ``impl="pad8"`` — XLA convs over an end-padded domain so output spatial
  dims land on 8-sublane boundaries (zero-copy: the pad is the conv's own
  padding config), sliced back to exact. Numerically identical to "xla"
  (``tests/test_pad8_impl.py``); exists to measure the roofline's tiling
  hypothesis (SCALING.md: odd valid-conv sizes tile poorly).

Parameters are created here (not via ``nn.Conv``) so both backends share the
identical pytree layout: HWIO float32 kernels + float32 bias, compute in
``dtype`` (bfloat16 by default to keep the MXU at full rate), with
``preferred_element_type=float32`` accumulation.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax


def _conv_params(module: nn.Module, name: str, kh: int, kw: int,
                 cin: int, cout: int):
    kernel = module.param(
        f"{name}_kernel", nn.initializers.xavier_uniform(), (kh, kw, cin, cout),
        jnp.float32)
    bias = module.param(f"{name}_bias", nn.initializers.zeros, (cout,),
                        jnp.float32)
    return kernel, bias


def conv2d_valid(module: nn.Module, x, features: int, *, name: str,
                 dilation: int = 1, dtype: Any = jnp.bfloat16,
                 impl: str = "xla", relu: bool = False):
    """3x3 valid-padding conv + bias (+ optional fused ReLU).
    x: [B, H, W, Cin] -> [B, H', W', Cout] with H' = H - 2*dilation."""
    kernel, bias = _conv_params(module, name, 3, 3, x.shape[-1], features)
    x = x.astype(dtype)
    k = kernel.astype(dtype)
    # Pallas path for MXU-shaped convs; the 3-channel first conv stays on
    # XLA (a 3-wide contraction would waste 125/128 lanes). Off-TPU the
    # kernels run in interpret mode when ROADSEG_PALLAS_INTERPRET=1
    # (CI coverage of the wiring), else fall back to XLA.
    # hybrid: Pallas only where it beat XLA on hardware — the bottleneck
    # convs (20x20x1024->2048: 1.7x, 18x18x2048->2048) where XLA's conv
    # wastes MXU tiles on the tiny spatial extent.
    use_pallas = (impl == "pallas" and x.shape[-1] >= 8) or \
                 (impl == "hybrid" and x.shape[-1] >= 1024)
    if use_pallas:
        import os
        on_tpu = jax.default_backend() == "tpu"
        interpret = os.environ.get("ROADSEG_PALLAS_INTERPRET") == "1"
        if on_tpu or interpret:
            from roadseg_tpu.kernels.conv3x3 import conv3x3_bias
            return conv3x3_bias(x, kernel, bias, dilation,
                                interpret and not on_tpu, relu)
    # Both operands in ``dtype`` and output in ``dtype`` (the MXU still
    # accumulates partials in float32 internally); a float32
    # ``preferred_element_type`` here would break the conv transpose rule
    # under grad (f32 cotangent vs bf16 kernel).
    if impl == "pad8":
        # Valid convs produce odd/unaligned spatial sizes (571, 285, ...)
        # that tile poorly onto the 8-sublane vregs (SCALING.md roofline:
        # the measured step runs ~2.6x above its floor and tiling is the
        # identified gap). Express an end-pad as the conv's own padding
        # config (no extra HBM copy) so the OUTPUT spatial dims land on
        # multiples of 8, then slice back — the kept outputs only ever see
        # real inputs, so this is numerically exact for a valid conv.
        d2 = 2 * dilation
        oh, ow = x.shape[1] - d2, x.shape[2] - d2
        ph, pw = -oh % 8, -ow % 8
        out = lax.conv_general_dilated(
            x, k,
            window_strides=(1, 1),
            padding=((0, ph), (0, pw)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if ph or pw:
            out = out[:, :oh, :ow, :]
    else:
        out = lax.conv_general_dilated(
            x, k,
            window_strides=(1, 1),
            padding="VALID",
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    out = (out + bias.astype(dtype)).astype(dtype)
    return nn.relu(out) if relu else out


def conv1x1(module: nn.Module, x, features: int, *, name: str,
            dtype: Any = jnp.bfloat16, impl: str = "xla"):
    """1x1 conv + bias as a channel matmul (maps straight onto the MXU).
    The Pallas path fuses the bias into the matmul write-back
    (``kernels/conv1x1.py``) — relevant under ``conv_impl=pallas`` where
    the neighbouring custom calls are fusion barriers. Under ``hybrid``
    the neighbours are XLA ops, XLA fuses the einsum+bias itself, and the
    measured table has XLA 2x faster — so hybrid keeps 1x1s on XLA."""
    kernel, bias = _conv_params(module, name, 1, 1, x.shape[-1], features)
    x = x.astype(dtype)
    if impl == "pallas":
        import os
        on_tpu = jax.default_backend() == "tpu"
        interpret = os.environ.get("ROADSEG_PALLAS_INTERPRET") == "1"
        if on_tpu or interpret:
            from roadseg_tpu.kernels.conv1x1 import conv1x1_bias
            return conv1x1_bias(x, kernel[0, 0], bias,
                                interpret and not on_tpu)
    w = kernel[0, 0].astype(dtype)
    out = jnp.einsum("bhwc,cf->bhwf", x, w)
    return (out + bias.astype(dtype)).astype(dtype)
