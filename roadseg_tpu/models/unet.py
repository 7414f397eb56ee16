"""Parametric valid-padding U-Net (flax), TPU-first.

Capability parity with the reference graph builder (``src/unet.py:12-97``):

* input shift ``X - 0.5`` + 1x1 "color_space_adjust" conv to 3 channels,
* ``num_layers`` encoder blocks of [dropout -> (optional dilated branch: two
  3x3 rate-2 valid convs + ReLU) -> two 3x3 valid convs + ReLU -> skip ->
  2x2 max-pool], filters doubling from ``root_size``,
* ``num_layers - 1`` decoder blocks of [dropout -> 2x2 stride-2 transpose
  conv -> center-crop skip(s) -> channel concat -> two 3x3 valid convs +
  ReLU],
* 1x1 conv head to 2 logits.

TPU-first differences from the TF-1 graph: pure functional flax module
(params are a pytree, no variable scopes/sessions), bfloat16 activation
compute with float32 params (MXU-friendly), optional rematerialisation of
encoder blocks, and a pluggable conv backend ("xla" |  "pallas") so the hot
3x3 valid convs can run through hand-written Pallas kernels.

Size arithmetic matches ``unet.py:100-115`` exactly (verified by tests):
output 388 needs input 572 @5 layers, 764 @6 layers, 476 @4 layers.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from roadseg_tpu.constants import NUM_LABELS
from roadseg_tpu.ops.geometry import center_crop


def input_size_needed(output_size: int, num_layers: int) -> int:
    """Input spatial size required to produce ``output_size`` output.

    Walks the decoder sizes down and the encoder sizes up, asserting the
    even-size constraint at every expand level — identical contract to the
    reference (``unet.py:100-115``), including which configs are invalid
    (e.g. the flag defaults patch_size=128 / num_layers=5 fail at level 3).
    """
    size = output_size
    for i in range(num_layers - 1):
        if size % 2 != 0:
            raise ValueError(
                f"expand layer {num_layers - i} has size {size} "
                f"not divisible by 2")
        size = (size + 4) // 2
    for _ in range(num_layers - 1):
        size = (size + 4) * 2
    return size + 4


def output_size_for_input(input_size: int, num_layers: int) -> int:
    """Forward size arithmetic: output spatial size for a given input."""
    size = input_size
    sizes = []
    for _ in range(num_layers):
        size -= 4  # two valid 3x3 convs
        sizes.append(size)
        size //= 2
    size = sizes.pop()  # bottom (pool discarded)
    for _ in range(num_layers - 1):
        size *= 2
        sizes.pop()
        size -= 4
    return size


def valid_output_size(min_output: int, num_layers: int) -> int:
    """Smallest valid output size >= ``min_output`` for this depth.

    The even-size constraint (``input_size_needed``) admits only a sparse
    set of output sizes (one per 2^(num_layers-1) stride); this finds the
    first admissible one at or above ``min_output``. Used by the
    full-image predict mode: a 608x608 test image at 6 layers maps to
    output 612 / input 988 (predict once, crop the 2-pixel ring), instead
    of 9 overlapping stride-110 patches.
    """
    stride = 2 ** (num_layers - 1)
    for out in range(min_output, min_output + stride + 1):
        try:
            input_size_needed(out, num_layers)
            return out
        except ValueError:
            continue
    raise ValueError(
        f"no valid output size in [{min_output}, {min_output + stride}] "
        f"for num_layers={num_layers}")


class UpConvBlock(nn.Module):
    """2x2 stride-2 VALID transpose conv + bias, then center-crop +
    channel-concat of the skip branch(es) (reference ``unet.py:67-85``).

    Params are identical to ``nn.ConvTranspose`` (HWIO kernel + bias,
    xavier/zeros init) so checkpoints are interchangeable between
    backends. The Pallas path (``kernels/deconv2x2.py``) fuses the whole
    block — four per-tap MXU matmuls interleaved 2x2, with the skip crop
    DMA'd from HBM straight into the concatenated output block; the XLA
    path materializes the upsample then concatenates, exactly as the
    previous ``nn.ConvTranspose`` + ``center_crop`` + ``concatenate``
    decoder did.
    """
    features: int
    dtype: Any = jnp.bfloat16
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips=()):
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (2, 2, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        x = x.astype(self.dtype)
        skips = tuple(s.astype(self.dtype) for s in skips)
        # the fused kernel won at every decoder level on hardware
        # (bench_kernels table: 1.01-1.69x) — hybrid always takes it;
        # hybrid_deconv takes ONLY this fusion (every conv stays on XLA),
        # isolating the one measured per-shape win with no custom-VJP
        # backward cost and the fewest fusion barriers
        if self.conv_impl in ("pallas", "hybrid", "hybrid_deconv"):
            import os
            on_tpu = jax.default_backend() == "tpu"
            interpret = os.environ.get("ROADSEG_PALLAS_INTERPRET") == "1"
            if on_tpu or interpret:
                from roadseg_tpu.kernels.deconv2x2 import deconv2x2_bias
                return deconv2x2_bias(x, kernel, bias, skips,
                                      interpret and not on_tpu)
        up = jax.lax.conv_transpose(
            x, kernel.astype(self.dtype), strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        up = (up + bias.astype(self.dtype)).astype(self.dtype)
        h, w = up.shape[1], up.shape[2]
        return jnp.concatenate(
            [center_crop(s, h, w) for s in skips] + [up], axis=-1)


class ConvBlock(nn.Module):
    """Two valid 3x3 convs + ReLU, optionally dilated (rate 2)."""
    features: int
    dilation: int = 1
    dtype: Any = jnp.bfloat16
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        from roadseg_tpu.ops.conv import conv2d_valid
        for name in ("conv1", "conv2"):
            x = conv2d_valid(
                self, x, self.features, name=name, dilation=self.dilation,
                dtype=self.dtype, impl=self.conv_impl, relu=True)
        return x


class UNet(nn.Module):
    """U-Net with the reference's channel plan and crop arithmetic."""
    num_layers: int = 5
    root_size: int = 64
    dilated_layers: bool = False
    dtype: Any = jnp.bfloat16
    conv_impl: str = "xla"
    remat: bool = False

    @nn.compact
    def __call__(self, x, *, dropout_keep: float = 1.0,
                 deterministic: bool = True):
        """x: [B, H, W, 3] float in [0, 1]. Returns [B, h, w, 2] logits
        (float32), h/w per the valid-conv size arithmetic.

        ``dropout_keep`` is the probability to KEEP an input (TF
        ``tf.nn.dropout`` semantics, reference ``tf_aerial_images.py:142``);
        1.0 disables dropout. ``deterministic=True`` also disables it (the
        inference path).
        """
        use_dropout = (dropout_keep < 1.0) and not deterministic

        def dropout(h):
            if not use_dropout:
                return h
            return nn.Dropout(rate=1.0 - dropout_keep, deterministic=False)(h)

        x = x.astype(self.dtype) - jnp.asarray(0.5, self.dtype)
        from roadseg_tpu.ops.conv import conv1x1
        x = conv1x1(self, x, 3, name="color_space_adjust", dtype=self.dtype,
                    impl=self.conv_impl)

        block = ConvBlock
        if self.remat:
            block = nn.remat(ConvBlock)

        skips = []
        features = self.root_size
        net = x
        for i in range(self.num_layers):
            net = dropout(net)
            if self.dilated_layers:
                dilated = block(
                    features, dilation=2, dtype=self.dtype,
                    conv_impl=self.conv_impl, name=f"conv_dilut_{i}")(net)
            net = block(features, dtype=self.dtype,
                        conv_impl=self.conv_impl, name=f"conv_{i}")(net)
            skips.append((net, dilated) if self.dilated_layers else (net,))
            if i < self.num_layers - 1:
                # (the reference also pools after the last block but then
                #  discards the pooled value — unet.py:52,57)
                net = nn.max_pool(net, (2, 2), strides=(2, 2))
            features *= 2

        features //= 2            # bottom width
        net = skips.pop()[0]

        for i in range(self.num_layers - 1):
            features //= 2
            net = dropout(net)
            net = UpConvBlock(features, dtype=self.dtype,
                              conv_impl=self.conv_impl,
                              name=f"up_conv_{i}")(net, skips.pop())
            net = block(features, dtype=self.dtype, conv_impl=self.conv_impl,
                        name=f"conv_{self.num_layers + i}")(net)

        assert not skips
        logits = conv1x1(self, net, NUM_LABELS, name="weight_output",
                         dtype=self.dtype, impl=self.conv_impl)
        return logits.astype(jnp.float32)


def init_params(model: UNet, input_size: int, seed: int = 2017,
                batch_size: int = 1):
    """Initialize parameters for the given input size."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((batch_size, input_size, input_size, 3), jnp.float32)
    return model.init({"params": rng}, dummy)


def count_params(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
