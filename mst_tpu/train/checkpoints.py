"""Checkpointing: flat-keyed npz pytrees + JSON metadata sidecars.

Matches the reference's checkpoint policy (models/trainer.py:586-614):
- full checkpoints exclude the segmentation backbone,
- *delta* checkpoints store only the trainable partition (the requires_grad
  set in the reference),
- restore overlays: load base then delta, both non-strict.
Unlike the reference, hyperparameters live in a JSON sidecar instead of being
parsed out of the filename (utils/util.py:78-122) — the filename codec is
still emitted for tooling parity (mst_tpu.config.get_ckpt_name).
"""

import concurrent.futures
import json
import os
import threading

import jax
import numpy as np

from mst_tpu.train.freeze import path_to_str

# Async checkpoint IO: one background writer thread so the training loop
# never stalls on disk (the reference blocks on torch.save; orbax-style
# async without changing the npz+JSON on-disk format, which the analysis
# tooling and the reference name codec depend on). JAX arrays are
# immutable, so handing the pytree to the writer thread is race-free —
# the device->host transfer itself happens off the training thread.
_WRITER = None
_WRITER_LOCK = threading.Lock()
_PENDING = []


def _writer():
    global _WRITER
    with _WRITER_LOCK:
        if _WRITER is None:
            _WRITER = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-writer")
    return _WRITER


def submit_write(fn):
    """Queue an arbitrary checkpoint-write closure on the writer thread."""
    fut = _writer().submit(fn)
    _PENDING.append(fut)
    return fut


def wait_pending():
    """Block until every async checkpoint write has landed on disk;
    re-raises the first writer exception. Call before process exit or
    before reading back a just-written checkpoint."""
    global _PENDING
    pending, _PENDING = _PENDING, []
    for fut in pending:
        fut.result()


def flatten_tree(tree, prefix=""):
    """pytree -> {path: np.ndarray} with '/'-joined string keys."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {path_to_str(path): np.asarray(leaf) for path, leaf in flat}


def unflatten_dict(flat: dict):
    """{path: array} -> nested dict pytree."""
    out = {}
    for key, val in flat.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def save_checkpoint(path, params, metadata=None, exclude_segmentation=True,
                    block=True):
    """Save a params pytree (None leaves skipped) + JSON metadata.

    block=False queues the device->host transfer and npz write on the
    background writer thread and returns a future; wait_pending() joins.
    """
    leaves = {}
    for key_path, leaf in jax.tree_util.tree_flatten_with_path(
            params, is_leaf=lambda x: x is None)[0]:
        if leaf is None:
            continue
        k = path_to_str(key_path)
        if exclude_segmentation and k.startswith("segmentation"):
            continue  # trainer.py:596-597
        leaves[k] = leaf

    def write():
        flat = {k: np.asarray(v) for k, v in leaves.items()}
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, **flat)
        if metadata is not None:
            with open(str(path) + ".json", "w") as f:
                json.dump(metadata, f, indent=1, default=str)

    if block:
        write()
        return None
    fut = _writer().submit(write)
    _PENDING.append(fut)
    return fut


def load_checkpoint(path):
    """-> flat {path: np.ndarray} dict (appends .npz if missing)."""
    p = str(path)
    if not p.endswith(".npz") and not os.path.exists(p):
        p += ".npz"
    with np.load(p) as z:
        return {k: z[k] for k in z.files}


def overlay_checkpoint(params, flat, strict=False):
    """Overlay flat checkpoint values onto a params pytree (non-strict:
    unknown keys are ignored, missing params keep their init — the
    load_state_dict(strict=False) semantics of trainer.py:588,606-614)."""
    params_flat = flatten_tree(params)
    unknown = [k for k in flat if k not in params_flat]
    if strict and unknown:
        raise KeyError(f"unknown checkpoint keys: {unknown[:5]}...")

    def visit(node, prefix):
        if isinstance(node, dict):
            return {k: visit(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in node.items()}
        if prefix in flat:
            arr = np.asarray(flat[prefix])
            assert arr.shape == tuple(np.shape(node)), \
                f"{prefix}: ckpt {arr.shape} vs model {np.shape(node)}"
            return jax.numpy.asarray(arr, dtype=jax.numpy.result_type(node))
        return node

    return visit(params, "")


def load_separated(params, base_path, delta_path):
    """Base checkpoint then adapter delta, both non-strict
    (trainer.py:606-614)."""
    params = overlay_checkpoint(params, load_checkpoint(base_path))
    params = overlay_checkpoint(params, load_checkpoint(delta_path))
    return params
