"""roadseg_tpu — a TPU-native JAX framework for aerial road segmentation.

A from-scratch rebuild of the capabilities of the reference project
``aschneuw/road-segmentation-unet`` (TensorFlow 1.4, single GPU), redesigned
TPU-first:

* all image geometry (mirror-pad, patch extraction, overlap-average
  reassembly, rotation, quantization) runs on-device as XLA-fused jnp code
  instead of host NumPy loops (reference: ``src/images.py``),
* the U-Net is a pure-functional flax model compiled once with ``jax.jit``
  (reference: ``src/unet.py`` + TF-1 placeholders/sessions),
* training/inference scale over a ``jax.sharding.Mesh`` (data parallelism on
  the patch/ensemble axis, optional channel tensor-parallelism) instead of
  the reference's single-device ``tf.device`` placement,
* hot convolutions have hand-written Pallas TPU kernels with an XLA
  reference path for A/B numerics.
"""

from roadseg_tpu import constants  # noqa: F401
from roadseg_tpu.config import Options  # noqa: F401

__version__ = "0.1.0"
