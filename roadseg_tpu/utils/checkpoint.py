"""Checkpoint save/restore with the reference's addressing semantics.

Reference (``src/tf_aerial_images.py:343-379``): TF Saver writes
``<save_path>/<experiment>/model-epoch-{epoch:03d}.chkpt`` every epoch
(max_to_keep=100) and restores by explicit file, by date directory (newest
when None), or by epoch (newest when None).

TPU-native: Orbax checkpoints of the full train state pytree (params +
optimizer trace + step), same directory layout and resolution order.
"""

from __future__ import annotations

import glob
import hashlib
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

MAX_TO_KEEP = 100
_EPOCH_FMT = "model-epoch-{:03d}.chkpt"
_EPOCH_GLOB = "model-epoch-*.chkpt"
_MANIFEST = "SHA256SUMS"
_GEOMETRY = "geometry.json"
# epochs >= this are sentinels (interrupt checkpoints), not real epochs
_SENTINEL_EPOCH = 900
# model-geometry keys that must match between checkpoint and Engine
GEOMETRY_KEYS = ("num_layers", "root_size", "dilated_layers")


def _epoch_of(path: str) -> int:
    return int(os.path.basename(path)[len("model-epoch-"):-len(".chkpt")])


def is_sentinel(path: str) -> bool:
    """True for interrupt checkpoints (``model-epoch-999.chkpt``)."""
    try:
        return _epoch_of(path) >= _SENTINEL_EPOCH
    except ValueError:
        return False


def _checkpoint_digests(path: str) -> dict[str, str]:
    """SHA-256 of every file under an orbax checkpoint dir (relative paths).

    The manifest itself and the ``geometry.json`` sidecar are excluded:
    geometry is advisory metadata (it may be backfilled into pre-existing
    checkpoints whose manifests predate it), and a tampered sidecar is
    caught anyway by the restore-time geometry check."""
    out = {}
    for root, _, files in os.walk(path):
        for fn in sorted(files):
            if fn in (_MANIFEST, _GEOMETRY):
                continue
            full = os.path.join(root, fn)
            h = hashlib.sha256()
            with open(full, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            out[os.path.relpath(full, path)] = h.hexdigest()
    return out


def write_manifest(path: str) -> str:
    """Write a SHA256SUMS manifest into a checkpoint dir."""
    manifest = os.path.join(path, _MANIFEST)
    with open(manifest, "w") as f:
        for rel, digest in _checkpoint_digests(path).items():
            f.write(f"{digest}  {rel}\n")
    return manifest


def verify_manifest(path: str) -> bool | None:
    """Check a checkpoint against its SHA256SUMS.

    Returns True (ok), False (mismatch/missing files), or None when the
    checkpoint has no manifest. Mirrors the reference run.py's non-fatal
    model verification (``run.py:70-105``, ``:143-149``) — callers warn,
    not crash.
    """
    manifest = os.path.join(path, _MANIFEST)
    if not os.path.exists(manifest):
        return None
    want = {}
    with open(manifest) as f:
        for line in f:
            digest, _, rel = line.strip().partition("  ")
            want[rel] = digest
    return want == _checkpoint_digests(path)


def write_geometry(path: str, geometry: dict) -> str:
    """Write the ``geometry.json`` sidecar into a checkpoint dir.

    Records the model geometry the checkpoint's param tree was built with
    (``GEOMETRY_KEYS``), so auto-pickers (``run.py``/``bench.py``) and
    ``Engine.restore`` can match checkpoints to models *before* attempting
    an Orbax restore — the reference's TF Saver had the same failure mode
    (restoring into a mismatched graph) with an equally opaque error.
    """
    import json
    sidecar = os.path.join(path, _GEOMETRY)
    with open(sidecar, "w") as f:
        json.dump({k: geometry[k] for k in GEOMETRY_KEYS}, f)
        f.write("\n")
    return sidecar


def infer_geometry(path: str) -> Optional[dict]:
    """Infer model geometry from an Orbax checkpoint's param-tree metadata.

    For checkpoints saved before the ``geometry.json`` sidecar existed.
    Reads only the checkpoint *metadata* (tree structure + array shapes,
    no tensor payload): the U-Net param tree (``models/unet.py:163-199``)
    has encoder convs ``conv_0..conv_{L-1}`` and decoder convs
    ``conv_L..conv_{2L-2}`` (so ``L = (count + 1) // 2``), dilated-branch
    blocks named ``conv_dilut_*``, and ``conv_0/conv1/kernel`` with
    ``root_size`` output channels.
    """
    try:
        # orbax silently returns empty metadata for relative paths
        meta = ocp.PyTreeCheckpointer().metadata(os.path.abspath(path))
        meta = getattr(meta, "item_metadata", meta)
        tree = meta["params"]["params"]
        convs = [k for k in tree
                 if k.startswith("conv_") and not k.startswith("conv_dilut_")]
        first = tree["conv_0"]
        # leaf naming differs across save styles: flat "conv1_kernel"
        # (ops/conv self.param) vs nested "conv1"/"kernel"
        kern = (first["conv1_kernel"] if "conv1_kernel" in first
                else first["conv1"]["kernel"])
        return {
            "num_layers": (len(convs) + 1) // 2,
            "root_size": int(kern.shape[-1]),
            "dilated_layers": any(k.startswith("conv_dilut_") for k in tree),
        }
    except Exception:
        return None


def state_keys(path: str) -> Optional[set]:
    """Top-level keys of a checkpoint's state pytree, from Orbax metadata
    only (no tensor payload). Used to detect *light* checkpoints — saved
    params-only (``Engine.save(light=True)``) to halve the host fetch and
    disk per epoch — so restores can trim their template instead of
    failing on the missing ``opt_state`` subtree. None when unreadable."""
    try:
        meta = ocp.PyTreeCheckpointer().metadata(os.path.abspath(path))
        meta = getattr(meta, "item_metadata", meta)
        return set(meta.keys())
    except Exception:
        return None


def read_geometry(path: str) -> Optional[dict]:
    """Model geometry of a checkpoint: sidecar if present, else inferred
    from the Orbax metadata (or the npz ``__geometry__`` entry for
    ``export_npz`` files). None when neither works."""
    import json
    if path.endswith(".npz"):
        return _npz_geometry(path)
    sidecar = os.path.join(path, _GEOMETRY)
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as f:
                geo = json.load(f)
            return {k: geo[k] for k in GEOMETRY_KEYS}
        except (json.JSONDecodeError, KeyError):
            pass
    return infer_geometry(path)


def _keypath_str(kp) -> str:
    """jax tree keypath -> "a/b/c" (dict keys and sequence indices)."""
    parts = []
    for k in kp:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def export_npz(state: Any, path: str, geometry: Optional[dict] = None,
               dtype: str = "float16") -> str:
    """Export a train state's *params* as a single ``.npz`` file.

    Purpose: a git-committable weight distribution. The reference ships its
    winning weights as an HTTP download verified by sha256 (``run.py:46-119``);
    this environment has no egress, so the repo itself is the distribution
    channel — an Orbax directory tree is unwieldy to track, a single npz is
    not. Float leaves are stored in ``dtype`` (default float16: half the
    size; the restore-time cast error is ~1e-3 relative, far below the
    0.25 patch-quantization threshold the masks go through). Non-float
    leaves and the ``step`` counter are stored exactly.

    ``dtype="int8"`` quantizes each float leaf symmetrically per-tensor
    (stored with a float32 ``__scale__`` sidecar entry): quarter the fp32
    size at ~0.4 % worst-case relative error — for the 124 M-param
    flagship the difference between a ~250 MB and a ~119 MB git blob.
    """
    import json

    import jax
    import numpy as np
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(
            state["params"])[0]:
        arr = np.asarray(leaf)
        key = "params/" + _keypath_str(kp)
        if np.issubdtype(arr.dtype, np.floating):
            # a NaN/inf weight would silently poison the whole exported
            # tensor (NaN is truthy, so an `or 1.0` guard can't catch it);
            # fail the export loudly instead (ADVICE round 3)
            if not np.isfinite(arr).all():
                raise ValueError(
                    f"non-finite values in {key}; refusing to export")
        if np.issubdtype(arr.dtype, np.floating) and dtype == "int8":
            scale = float(np.max(np.abs(arr))) / 127.0 or 1.0
            flat[key] = np.clip(np.rint(arr / scale), -127, 127
                                ).astype(np.int8)
            flat["__scale__/" + key] = np.float32(scale)
            continue
        if np.issubdtype(arr.dtype, np.floating) and dtype:
            arr = arr.astype(dtype)
        flat[key] = arr
    flat["__step__"] = np.asarray(state.get("step", 0))
    if geometry is not None:
        flat["__geometry__"] = np.array(
            json.dumps({k: geometry[k] for k in GEOMETRY_KEYS}))
    # Atomic publish (ADVICE round 5): a VM reset mid-write must never
    # leave a non-empty partial npz at the final path — anchor scripts
    # gate on `[ -s file ]`, so a torn file would be git-committed as the
    # "durable" copy of weights that no longer exist anywhere else.
    # Write to a same-directory temp file and os.replace() into place
    # (atomic on POSIX); the temp is cleaned up on any failure.
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def _npz_geometry(path: str) -> Optional[dict]:
    import json

    import numpy as np
    try:
        with np.load(path) as z:
            if "__geometry__" not in z.files:
                return None
            geo = json.loads(str(z["__geometry__"][()]))
        return {k: geo[k] for k in GEOMETRY_KEYS}
    except Exception:
        return None


def restore_npz(template: Any, path: str) -> dict:
    """Restore a params-only state from an ``export_npz`` file.

    Returns ``{"step": ..., "params": ...}`` shaped like ``template``'s
    corresponding subtrees, each leaf cast back to the template leaf's
    dtype (fp16 payload -> fp32 params). Missing/extra keys are an error —
    same strictness as an Orbax tree-structure mismatch, but with a
    readable message."""
    import numpy as np
    with np.load(path) as z:
        payload = {k: z[k] for k in z.files}
    import jax
    leaves, treedef = jax.tree_util.tree_flatten_with_path(
        template["params"])
    want = {"params/" + _keypath_str(kp) for kp, _ in leaves}
    have = {k for k in payload if k.startswith("params/")}
    if want != have:
        missing, extra = sorted(want - have)[:3], sorted(have - want)[:3]
        raise ValueError(
            f"npz {path} does not match the model's param tree "
            f"(missing {missing}..., unexpected {extra}...)")
    def load(kp, leaf):
        key = "params/" + _keypath_str(kp)
        arr = payload[key]
        if "__scale__/" + key in payload:  # int8 per-tensor quantization
            arr = arr.astype(np.float32) * payload["__scale__/" + key]
        return np.asarray(arr, np.asarray(leaf).dtype)

    out = [load(kp, leaf) for kp, leaf in leaves]
    return {"step": payload["__step__"],
            "params": jax.tree_util.tree_unflatten(treedef, out)}


def describe_geometry(geometry: Optional[dict]) -> str:
    """``{"num_layers": 6, "root_size": 64, "dilated_layers": False}`` ->
    ``"6L root64 non-dilated"`` (for one-line mismatch errors)."""
    if geometry is None:
        return "unknown geometry"
    return (f"{geometry['num_layers']}L root{geometry['root_size']} "
            f"{'dilated' if geometry['dilated_layers'] else 'non-dilated'}")


class Checkpointer:
    def __init__(self, save_path: str, experiment_name: str):
        self.save_path = os.path.abspath(save_path)
        self.experiment_name = experiment_name
        self._ckpt = ocp.StandardCheckpointer()

    @property
    def experiment_dir(self) -> str:
        return os.path.join(self.save_path, self.experiment_name)

    def save(self, state: Any, epoch: int = 0,
             geometry: Optional[dict] = None) -> str:
        """Save train-state pytree as ``<experiment>/model-epoch-NNN.chkpt``.

        ``geometry`` (``GEOMETRY_KEYS`` dict) is recorded as a
        ``geometry.json`` sidecar so restores can match checkpoints to
        model architectures up front.

        A successful *regular* save (epoch < 900) deletes any stale
        interrupt sentinel (epoch-999) so newest-epoch resolution never
        restores mid-epoch weights from before a completed epoch, and
        prunes the oldest regular checkpoints past ``MAX_TO_KEEP`` by
        scanning the directory (so pruning also works across resumed
        processes, matching TF Saver's max_to_keep semantics)."""
        import shutil
        path = os.path.join(self.experiment_dir, _EPOCH_FMT.format(epoch))
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        if geometry is not None:
            write_geometry(path, geometry)
        write_manifest(path)
        if epoch < _SENTINEL_EPOCH:
            sentinels = [
                p for p in glob.glob(
                    os.path.join(self.experiment_dir, _EPOCH_GLOB))
                if _epoch_of(p) >= _SENTINEL_EPOCH]
            for stale in sentinels:
                shutil.rmtree(stale, ignore_errors=True)
            kept = sorted(
                p for p in glob.glob(
                    os.path.join(self.experiment_dir, _EPOCH_GLOB))
                if _epoch_of(p) < _SENTINEL_EPOCH)
            while len(kept) > MAX_TO_KEEP:
                shutil.rmtree(kept.pop(0), ignore_errors=True)
        print(f"Model saved in file: {path}")
        return path

    def resolve(self, date: Optional[str] = None,
                epoch: Optional[int] = None,
                file: Optional[str] = None) -> str:
        """Resolution order: explicit file > date dir (newest if None) >
        epoch within it (newest if None)."""
        if file is not None:
            return file
        if date is None:
            dates = [d for d in glob.glob(os.path.join(self.save_path, "*"))
                     if os.path.isdir(d)
                     and glob.glob(os.path.join(d, _EPOCH_GLOB))]
            if not dates:
                raise FileNotFoundError(
                    f"no checkpoint directories under {self.save_path}")
            exp_dir = sorted(dates)[-1]
        else:
            exp_dir = os.path.join(self.save_path, date)
        if epoch is None:
            candidates = sorted(glob.glob(os.path.join(exp_dir, _EPOCH_GLOB)))
            if not candidates:
                raise FileNotFoundError(f"no checkpoints in {exp_dir}")
            return candidates[-1]
        return os.path.join(exp_dir, _EPOCH_FMT.format(epoch))

    def restore(self, template: Any, date: Optional[str] = None,
                epoch: Optional[int] = None, file: Optional[str] = None):
        """Restore a pytree shaped like ``template`` (abstract or concrete).

        Integrity is checked against the checkpoint's SHA256SUMS manifest
        when present — non-fatally, like the reference's model verification
        (``run.py:143-149``)."""
        path = self.resolve(date=date, epoch=epoch, file=file)
        if path.endswith(".npz"):
            # git-committed weight distribution (export_npz): params-only,
            # restores like a light checkpoint
            state = restore_npz(template, path)
            print(f"Model restored from file: {path}")
            return state
        ok = verify_manifest(path)
        if ok is False:
            print(f"WARNING: checkpoint {path} does not match its "
                  f"SHA256SUMS manifest (corrupted or modified?); "
                  f"continuing anyway")
        if isinstance(template, dict):
            # light checkpoints (params-only) restore into a trimmed
            # template; callers get a state without the missing subtrees
            keys = state_keys(path)
            if keys:
                template = {k: v for k, v in template.items() if k in keys}
        state = self._ckpt.restore(path, template)
        print(f"Model restored from file: {path}")
        return state


def parse_epoch_spec(spec: str) -> list[int]:
    """``"40-42,45"`` -> [40, 41, 42, 45]. Reversed ranges are an error."""
    out = set()
    for part in spec.split(","):
        if "-" in part:
            lo, hi = (int(x) for x in part.split("-"))
            if hi < lo:
                raise ValueError(f"reversed epoch range {part!r}")
            out.update(range(lo, hi + 1))
        else:
            out.add(int(part))
    return sorted(out)


def average_states(states):
    """Uniform weight averaging (SWA) over a list of train-state pytrees.

    Beyond-parity extension: the reference selects a single epoch by Kaggle
    score; averaging the params of several late-epoch checkpoints of one run
    typically lands on a flatter minimum and scores higher. Float leaves of
    ``state['params']`` are averaged in float64 then cast back; ``step`` and
    ``opt_state`` are taken from the last state (by ``step``).
    """
    import numpy as np

    if not states:
        raise ValueError("need at least one state to average")
    states = sorted(states, key=lambda s: int(np.asarray(s["step"])))
    out = {k: states[-1][k] for k in states[-1]}

    def mean_leaf(*leaves):
        first = np.asarray(leaves[0])
        # dtype.kind == "f" misses ml_dtypes (bfloat16 registers as "V");
        # jnp.issubdtype knows both numpy and ml_dtypes float kinds.
        import jax.numpy as jnp
        if not jnp.issubdtype(first.dtype, jnp.floating):
            return leaves[-1]  # non-averaged leaves come from the newest state
        acc = np.zeros(first.shape, np.float64)
        for leaf in leaves:
            acc += np.asarray(leaf, np.float64)
        return (acc / len(leaves)).astype(first.dtype)

    import jax
    out["params"] = jax.tree.map(mean_leaf,
                                 *[s["params"] for s in states])
    return out
