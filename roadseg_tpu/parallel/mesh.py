"""Device-mesh parallelism.

The reference is strictly single-device (``tf.device`` placement only,
``src/tf_aerial_images.py:384-393`` — no DP/TP/collectives, SURVEY.md §2.12).
The TPU-native counterpart scales through ``jax.sharding``:

* **data parallelism** over the patch/ensemble batch axis (``data`` mesh
  axis) — training batches and sliding-window/TTA inference patches are
  embarrassingly parallel; XLA inserts the gradient ``psum`` automatically
  when the loss is jitted over a sharded batch with replicated params.
* **tensor parallelism** (optional ``model`` mesh axis) — conv kernels are
  sharded on the output-channel dimension for the wide decoder/bottleneck
  layers; XLA partitions the convs and all-gathers activations where needed.

Collectives ride ICI within the mesh; everything goes through ``jax.jit``
with ``NamedSharding`` — no hand-written communication on the XLA path.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec: str = "", devices=None) -> Mesh:
    """Create a mesh from a spec like ``"data=4,model=2"``.

    Empty spec -> 1-D ``data`` mesh over all visible devices.
    """
    if devices is None:
        devices = jax.devices()
    if not spec:
        return Mesh(np.asarray(devices), ("data",))
    names, sizes = [], []
    for part in spec.split(","):
        name, _, size = part.partition("=")
        names.append(name.strip())
        sizes.append(int(size))
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"mesh {spec} needs {int(np.prod(sizes))} devices, "
            f"have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(sizes), tuple(names))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch/patch/ensemble) axis over ``data``."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _kernel_spec(shape, model_size: int) -> P:
    """Tensor-parallel spec for one param tensor.

    Conv kernels are HWIO; shard O (last axis) over ``model`` when cleanly
    divisible and wide enough that sharding pays (>= 128 per shard keeps
    full MXU lanes). Biases shard the same axis. Everything else replicates.
    """
    last = shape[-1]
    if last % model_size == 0 and last // model_size >= 128:
        return P(*([None] * (len(shape) - 1)), "model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for the model params.

    Without a ``model`` axis: fully replicated (pure DP). With one:
    output-channel TP on the wide conv kernels.
    """
    model_size = mesh.shape.get("model", 1)

    def spec_for(leaf):
        if model_size == 1:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _kernel_spec(leaf.shape, model_size))

    return jax.tree.map(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to ``param_shardings``."""
    return jax.device_put(params, param_shardings(params, mesh))
