"""Device mesh + sharding helpers.

The reference is strictly single-process single-GPU (models/trainer.py:54-58,
no distributed backend anywhere). Here scaling is a first-class
jax.sharding.Mesh: the batch axis shards over 'data', params/optimizer state
replicate, and XLA emits the gradient all-reduce over ICI. Evaluation reuses
the same axis for the folded (K-sample x batch) dimension.
"""

import math

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape=None, axis_names=("data",), devices=None):
    """Build a Mesh; default = all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    n = math.prod(mesh_shape)
    assert n <= len(devices), (mesh_shape, len(devices))
    dev_array = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def make_hybrid_mesh(n_slices=None, per_slice=None,
                     axis_names=("replica", "data"), devices=None):
    """Multi-slice (pod) mesh: 'replica' spans slices over DCN, 'data' spans
    chips within a slice over ICI.

    Batch shards over BOTH axes (data_sharding uses every mesh axis), params
    replicate, so the gradient all-reduce decomposes hierarchically: XLA
    reduce-scatters over ICI first, crosses DCN once with the per-slice
    partial, then all-gathers over ICI — the standard data-parallel pod
    recipe. On hardware with slice metadata the device order comes from
    mesh_utils.create_hybrid_device_mesh (DCN axis outermost, so 'replica'
    neighbors differ by slice, never by ICI hop); on single-slice or CPU
    meshes it degrades to a row-major reshape with identical program
    semantics (collectives just ride one fabric).
    """
    devices = devices if devices is not None else jax.devices()
    slice_ids = sorted({getattr(d, "slice_index", 0) for d in devices})
    if n_slices is None:
        n_slices = len(slice_ids)
    if per_slice is None:
        per_slice = len(devices) // n_slices
    if len(slice_ids) == n_slices > 1:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (n_slices, 1), devices=devices)
        return Mesh(dev_array, axis_names)
    n = n_slices * per_slice
    assert n <= len(devices), (n_slices, per_slice, len(devices))
    dev_array = np.asarray(devices[:n]).reshape(n_slices, per_slice)
    return Mesh(dev_array, axis_names)


def mesh_from_shape(mesh_shape):
    """CLI --mesh_shape to a Mesh: one value -> 1D 'data' mesh; two values
    -> hybrid (replica, data) multi-slice mesh; None -> no mesh."""
    if mesh_shape is None:
        return None
    shape = tuple(int(s) for s in mesh_shape)
    if len(shape) == 1:
        return make_mesh(shape)
    if len(shape) == 2:
        return make_hybrid_mesh(*shape)
    raise ValueError(f"--mesh_shape takes 1 or 2 values, got {shape}")


def data_sharding(mesh):
    """Shard axis 0 over every mesh axis (1D 'data' mesh: P('data'); hybrid
    ('replica', 'data') mesh: both, so the global batch splits
    n_slices * per_slice ways)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch: dict):
    """Place a host batch on the mesh: per-trajectory arrays shard over
    'data' on axis 0, scene-level arrays replicate."""
    if mesh is None:
        return batch
    ds = data_sharding(mesh)
    rep = replicated(mesh)
    out = {}
    for k, v in batch.items():
        if k in ("semantic", "image", "homography"):
            out[k] = jax.device_put(v, rep)
        else:
            out[k] = jax.device_put(v, ds)
    return out


def replicate_tree(mesh, tree):
    if mesh is None:
        return tree
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def pad_batch_to_multiple(batch: dict, multiple: int):
    """Pad the trajectory axis so it divides the mesh's data axis; padded
    rows carry mask=0 so they contribute nothing."""
    n = batch["traj"].shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch
    out = dict(batch)
    for k in ("traj", "mask", "meta_ids"):
        if k in batch:
            v = batch[k]
            pad_shape = (rem,) + v.shape[1:]
            out[k] = np.concatenate([v, np.zeros(pad_shape, v.dtype)], axis=0)
    return out
