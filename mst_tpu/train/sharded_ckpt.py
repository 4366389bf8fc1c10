"""Orbax-native sharded checkpoints for pod-scale training.

The npz+JSON format (train/checkpoints.py) is the parity format: host-local,
filename-codec compatible with the reference's tooling
(models/trainer.py:586-614). On a multi-host pod it forces a full gather to
one host. This module adds an orbax-backed format where every host writes its
own shards and restore places leaves directly onto the target mesh sharding —
no host ever materializes the full state. Use for the training-state
(optimizer + params) snapshots of large runs; final deliverable checkpoints
stay npz for tooling parity.
"""

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.Checkpointer(ocp.StandardCheckpointHandler())


def save_sharded(path, tree, force=True):
    """Write a (possibly sharded-jax.Array) pytree with orbax.

    Every process participates; shards are written by their owning hosts.
    `path` must be a fresh directory (force=True overwrites).
    """
    import orbax.checkpoint as ocp

    _checkpointer().save(path, args=ocp.args.StandardSave(tree), force=force)


def restore_sharded(path, template):
    """Restore a pytree, placing each leaf with `template`'s sharding.

    `template` is a pytree of jax.Arrays (or ShapeDtypeStructs with
    .sharding) matching the saved structure — typically the live training
    state, whose values are ignored and shardings reused.
    """
    import orbax.checkpoint as ocp

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return np.asarray(x)

    abstract = jax.tree.map(as_abstract, template)
    return _checkpointer().restore(
        path, args=ocp.args.StandardRestore(abstract))
