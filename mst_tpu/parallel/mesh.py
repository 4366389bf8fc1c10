"""Device mesh + sharding helpers.

The reference is strictly single-process single-GPU (models/trainer.py:54-58,
no distributed backend anywhere). Here scaling is a first-class
jax.sharding.Mesh: the batch axis shards over 'data', params/optimizer state
replicate, and XLA emits the gradient all-reduce over ICI. Evaluation reuses
the same axis for the folded (K-sample x batch) dimension.
"""

import math
import warnings

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# scene-level batch keys replicate across the mesh; everything else shards
# over the batch axis. Shared by shard_batch, pad_batch_to_multiple and the
# multi-host path (parallel/hostdata.py) so the two paths can never diverge.
REPLICATED_KEYS = ("semantic", "image", "homography")


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
    recipe. On hardware with slice metadata each mesh row takes its chips
    from ONE slice (so 'replica' neighbors differ by slice, never by ICI
    hop), including sub-pod shapes that use only part of each slice; on
    single-slice or CPU meshes it degrades to a row-major reshape with
    identical program semantics (collectives just ride one fabric).
    """
    devices = devices if devices is not None else jax.devices()
    by_slice = {}
    for d in devices:
        by_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)
    slice_ids = sorted(by_slice)
    if n_slices is None:
        n_slices = len(slice_ids)
    if per_slice is None:
        per_slice = len(devices) // n_slices
    if (len(slice_ids) > 1 and n_slices <= len(slice_ids)
            and all(len(by_slice[s]) >= per_slice
                    for s in slice_ids[:n_slices])):
        # slice-aware layout: row r = the first per_slice chips of slice r,
        # so the 'replica' axis crosses slices (DCN) and 'data' stays
        # within one slice (ICI). Handles sub-pod shapes too — unlike
        # create_hybrid_device_mesh, which requires the per-slice shape to
        # cover every chip of every slice.
        dev_array = np.asarray(
            [by_slice[s][:per_slice] for s in slice_ids[:n_slices]])
        return Mesh(dev_array, axis_names)
    if len(slice_ids) > 1:
        # numerically fine, but the 'data' (meant-for-ICI) axis may now
        # span DCN — a large hidden perf cliff on pods. Make misconfigured
        # launches (per_slice > chips/slice, n_slices > real slices) loud.
        warnings.warn(
            f"make_hybrid_mesh({n_slices}x{per_slice}): devices span "
            f"{len(slice_ids)} slices but the requested shape does not "
            f"align with them (chips/slice: "
            f"{ {s: len(v) for s, v in by_slice.items()} }); falling back "
            f"to a row-major reshape whose '{axis_names[1]}' axis may "
            f"cross DCN",
            stacklevel=2)
    n = n_slices * per_slice
    assert n <= len(devices), (n_slices, per_slice, len(devices))
    dev_array = np.asarray(devices[:n]).reshape(n_slices, per_slice)
    return Mesh(dev_array, axis_names)


def make_spatial_mesh(data, space, devices=None):
    """2D ('data', 'space') mesh: the batch axis shards over 'data' and the
    scene maps' H dimension shards over 'space'.

    Spatial partitioning is this conv model's form of model parallelism
    (it has no attention/sequence axis, SURVEY §2.3): XLA GSPMD inserts
    the conv halo exchanges (collective-permutes) and reduction
    all-reduces automatically, so one scene's activation footprint splits
    `space` ways — scenes too large for one chip's HBM (e.g. resize 1.0,
    ~4200^2 maps) become tractable. 'space' must ride ICI (halo exchange
    happens every conv; the batch all-reduce only once per step), so on a
    multi-slice pod every 'data' row takes its `space` chips from ONE
    slice — unlike the hybrid mesh, several rows may share a slice (e.g.
    4x4 on a 2-slice x 8-chip pod puts two data rows in each slice). A
    shape no within-slice layout can satisfy falls back to a row-major
    reshape with a loud warning."""
    devices = devices if devices is not None else jax.devices()
    by_slice = {}
    for d in devices:
        by_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)
    slice_ids = sorted(by_slice)
    if len(slice_ids) > 1:
        rows = []
        for s in slice_ids:
            chips = by_slice[s]
            for i in range(len(chips) // space):
                if len(rows) < data:
                    rows.append(chips[i * space:(i + 1) * space])
        if len(rows) == data:
            return Mesh(np.asarray(rows), ("data", "space"))
        warnings.warn(
            f"make_spatial_mesh({data}x{space}): devices span "
            f"{len(slice_ids)} slices but no within-slice layout fits "
            f"(chips/slice: { {s: len(v) for s, v in by_slice.items()} }); "
            f"falling back to a row-major reshape whose 'space' axis may "
            f"cross DCN",
            stacklevel=2)
    n = data * space
    assert n <= len(devices), (data, space, len(devices))
    dev_array = np.asarray(devices[:n]).reshape(data, space)
    return Mesh(dev_array, axis_names=("data", "space"))


def mesh_from_shape(mesh_shape, axis_names=None):
    """CLI --mesh_shape to a Mesh: one value -> 1D 'data' mesh; two values
    -> hybrid (replica, data) multi-slice mesh, or a ('data', 'space')
    spatially-partitioned mesh when --mesh_axes says so; None -> no mesh."""
    if mesh_shape is None:
        return None
    shape = tuple(int(s) for s in mesh_shape)
    if axis_names is not None:
        names = tuple(axis_names)
        if len(names) != len(shape):
            raise ValueError(
                f"--mesh_axes {names} must match --mesh_shape {shape}")
        if names == ("data", "space"):
            return make_spatial_mesh(*shape)
        if names in (("data",), ("replica", "data")):
            axis_names = None  # the defaults below
        else:
            raise ValueError(
                f"unsupported --mesh_axes {names}: expected 'data', "
                "'replica data', or 'data space'")
    if len(shape) == 1:
        return make_mesh(shape)
    if len(shape) == 2:
        return make_hybrid_mesh(*shape)
    raise ValueError(f"--mesh_shape takes 1 or 2 values, got {shape}")


def batch_axes(mesh):
    """Mesh axes the batch dimension shards over (every axis except the
    spatial one)."""
    return tuple(a for a in mesh.axis_names if a != "space")


def batch_shard_count(mesh):
    """How many ways the batch axis splits (mesh.size without 'space')."""
    return math.prod(mesh.shape[a] for a in batch_axes(mesh))


def data_sharding(mesh):
    """Shard axis 0 over every non-spatial mesh axis (1D 'data' mesh:
    P('data'); hybrid ('replica', 'data') mesh: both, so the global batch
    splits n_slices * per_slice ways; ('data', 'space') mesh: 'data'
    only — 'space' shards the scene maps' H instead)."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated(mesh):
    return NamedSharding(mesh, P())


def scene_sharding(mesh):
    """Sharding for scene-level (N, H, W, C) maps: H over 'space' when the
    mesh has a spatial axis, replicated otherwise."""
    if "space" in mesh.axis_names:
        return NamedSharding(mesh, P(None, "space"))
    return replicated(mesh)


def check_spatial_scene(mesh, key, value):
    """Fail fast with a clear message when a scene map cannot shard over
    the mesh's 'space' axis (instead of jax's generic divisibility error
    deep inside the epoch loop). The /32 image padding guarantees
    divisibility only for power-of-two space counts <= 32."""
    if "space" not in mesh.axis_names:
        return
    s = mesh.shape["space"]
    h = np.shape(value)[1]
    if h % s != 0:
        raise ValueError(
            f"scene map '{key}' height {h} does not divide the mesh's "
            f"'space' axis ({s}); pick a space count that divides the "
            f"/32-padded scene heights (powers of two <= 32 always do)")


def shard_batch(mesh, batch: dict):
    """Place a host batch on the mesh: per-trajectory arrays shard over
    'data' on axis 0; scene-level maps replicate (or shard H over 'space'
    on a spatial mesh; the 3x3 homography always replicates)."""
    if mesh is None:
        return batch
    ds = data_sharding(mesh)
    rep = replicated(mesh)
    scene = scene_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k == "homography":
            out[k] = jax.device_put(v, rep)
        elif k in REPLICATED_KEYS:
            check_spatial_scene(mesh, k, v)
            out[k] = jax.device_put(v, scene)
        else:
            out[k] = jax.device_put(v, ds)
    return out


def replicate_tree(mesh, tree):
    if mesh is None:
        return tree
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def pad_batch_to_multiple(batch: dict, multiple: int):
    """Pad the trajectory axis so it divides the mesh's total shard count;
    padded rows carry mask=0 so they contribute nothing. Pads EVERY
    non-scene key (the same set shard_batch shards), so per-trajectory
    arrays stay aligned. NOTE: production batches are already sized by the
    batch_size round-up in trainer.prepare_data; this helper serves ad-hoc
    batches fed to the sharded steps directly."""
    n = batch["traj"].shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch
    out = dict(batch)
    for k, v in batch.items():
        if k in REPLICATED_KEYS:
            continue
        pad_shape = (rem,) + np.shape(v)[1:]
        out[k] = np.concatenate(
            [np.asarray(v), np.zeros(pad_shape, np.asarray(v).dtype)],
            axis=0)
    return out
