"""Multi-host input pipeline (pod-readiness).

The reference is single-process (SURVEY §2.3); on a pod every host must
feed only its slice of the global batch while the compiled step sees one
global jax.Array per input. Three pieces:

- ``local_slice``: which rows of a global batch this host owns (contiguous
  block partition of the 'data' axis, matching NamedSharding(P('data'))
  device order across processes);
- ``shard_batch_global``: assemble global arrays from process-local data
  (``jax.make_array_from_process_local_data``) — per-trajectory arrays
  shard over 'data', scene-level arrays replicate;
- ``prefetch_to_device``: a double-buffered iterator that enqueues the
  next batch's host->device transfers while the current step computes
  (device_put is async; depth 2 is enough to hide H2D on ICI-fed chips).

Single-process meshes degrade gracefully: local == global and
shard_batch_global matches mesh.shard_batch bit-for-bit.
"""

import collections

import numpy as np

import jax

from mst_tpu.parallel.mesh import (REPLICATED_KEYS, check_spatial_scene,
                                   data_sharding, replicated,
                                   scene_sharding)


def local_slice(n_global: int, process_index=None, process_count=None):
    """Rows [lo, hi) of a length-n_global batch axis owned by this host.

    Contiguous block partition: NamedSharding(P('data')) lays shards out in
    device order, and jax.Array assembles per-process blocks in
    process-index order, so host h owns block h. n_global must divide by
    process_count (trainer.prepare_data rounds batch_size up to
    lcm(batch_shard_count, process_count); mesh.pad_batch_to_multiple
    covers ad-hoc batches).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    assert n_global % pc == 0, (n_global, pc)
    per = n_global // pc
    return pi * per, (pi + 1) * per


def take_local(batch: dict, process_index=None, process_count=None):
    """Slice a host-materialized global batch down to this host's rows
    (scene-level arrays kept whole). On a real pod each host would only
    *load* its rows; this helper is the contract for that loader."""
    n = batch["traj"].shape[0]
    lo, hi = local_slice(n, process_index, process_count)
    out = {}
    for k, v in batch.items():
        out[k] = v if k in REPLICATED_KEYS else v[lo:hi]
    return out


def shard_batch_global(mesh, local_batch: dict, global_batch_size=None):
    """Process-local rows -> global jax.Arrays on the mesh.

    Every process calls this with ITS rows of the batch; the returned
    arrays are globally-sharded (data axis) / replicated (scene arrays)
    without any host ever materializing the full global batch.
    global_batch_size, when given, pins the assembled batch axis so a
    local/global row mismatch fails HERE with a clear message instead of
    as a downstream shape error.
    """
    if mesh is None:
        return local_batch
    ds = data_sharding(mesh)
    rep = replicated(mesh)
    scene = scene_sharding(mesh)
    out = {}
    for k, v in local_batch.items():
        v = np.asarray(v)
        if k in REPLICATED_KEYS:
            # scene maps: replicated, or H-sharded over 'space' on a
            # spatial mesh (mesh.shard_batch's scene_sharding contract);
            # the 3x3 homography always replicates
            sh = rep if k == "homography" else scene
            if k != "homography" and "space" in mesh.axis_names:
                check_spatial_scene(mesh, k, v)
                if jax.process_count() > 1:
                    # each host passes the WHOLE scene map, but
                    # make_array_from_process_local_data infers global
                    # shape as if every process contributed only its own
                    # block of a process-spanning sharded dim — assembly
                    # would silently duplicate H-slabs. Needs a per-host
                    # scene loader; refuse loudly until one exists.
                    raise NotImplementedError(
                        "multi-host spatial meshes are not supported by "
                        "shard_batch_global: the 'space' axis would span "
                        "processes and corrupt the scene-map assembly. "
                        "Run the spatial axis within one host (e.g. "
                        "'data' over hosts x 'space' over local chips is "
                        "also unsupported until a per-host scene loader "
                        "exists) or use a non-spatial mesh across hosts.")
            out[k] = jax.make_array_from_process_local_data(sh, v)
            continue
        global_shape = None
        if global_batch_size is not None:
            n_proc = jax.process_count()
            if global_batch_size % n_proc != 0:
                raise ValueError(
                    f"global_batch_size={global_batch_size} is not "
                    f"divisible by process_count={n_proc}; pad the global "
                    f"batch to a multiple of the process count first "
                    f"(pad_batch_to_multiple)")
            expect = global_batch_size // n_proc
            if v.shape[0] != expect:
                raise ValueError(
                    f"batch key '{k}': {v.shape[0]} local rows but "
                    f"global_batch_size={global_batch_size} over "
                    f"{jax.process_count()} processes expects {expect}")
            global_shape = (global_batch_size,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(ds, v, global_shape)
    return out


def prefetch_to_device(batches, put, depth: int = 2):
    """Double-buffered transfer: `put` (e.g. a shard_batch closure) runs
    `depth` batches ahead of the consumer, overlapping H2D with compute.

    `batches` is any iterable of host batches; yields device batches in
    order.
    """
    queue = collections.deque()
    it = iter(batches)
    try:
        while len(queue) < depth:
            queue.append(put(next(it)))
    except StopIteration:
        pass
    for batch in it:
        out = queue.popleft()
        queue.append(put(batch))
        yield out
    while queue:
        yield queue.popleft()
