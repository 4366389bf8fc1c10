"""Fused multi-epoch training: whole chunks of the fine-tune loop as ONE
compiled XLA program.

The reference adapts a pretrained model with a handful of samples
(utils/train_epoch.py:8-136 driven per-epoch by models/trainer.py:222-281):
a few tiny train steps, then a validation pass, ~100 times. Run that way on
an accelerator, every step and every epoch pays a host round trip — dispatch
latency, per-epoch metric pulls, Python glue — that can rival the compute
itself at few-shot sizes. This module is the TPU-native redesign: the train
data, validation data and per-epoch batch orders are staged on device ONCE,
and `lax.scan` drives

    epochs -> (scan over permuted train batches -> scan over val batches)

inside a single jitted program per chunk of epochs. The host gets back
per-epoch metrics plus per-epoch snapshots of the (small) trainable
partition, so the existing smooth-val / early-stop / checkpoint-selection
logic (train/trainer.py) runs unchanged — and BIT-IDENTICALLY — after the
fact. One host sync per chunk replaces 4x`n_batches`+ syncs per epoch.

Numerics are the same functions as the loop path: the scan body IS the
jit=False body of steps.make_train_step / steps.make_eval_step, the batch
order replicates the trainer's per-epoch `rng.shuffle` stream exactly, and
the validation keys are the same fold_in(fold_in(key, epoch), batch_index)
chain (tests/test_fused.py pins loop == fused).

Used by `Experiment.train(--fused)` and vmapped over hyperparameters by the
grid runner (train/grid.py).
"""

import collections

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from mst_tpu.parallel import mesh as mesh_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib

# fused chunks are capped so per-chunk snapshot memory (chunk x trainable)
# and the early-stop overshoot (at most chunk-1 wasted epochs) stay small;
# 32 epochs of even a full-FT SDD YNet is well under 1 GB
MAX_CHUNK = 32


def chunk_size(save_every_n, cap=MAX_CHUNK):
    """Largest chunk <= cap that divides save_every_n, so periodic
    train-state saves (which need the optimizer state, only materialized at
    chunk ends) always land on a chunk boundary."""
    save_every_n = max(int(save_every_n), 1)
    if save_every_n <= cap:
        return save_every_n
    for c in range(cap, 0, -1):
        if save_every_n % c == 0:
            return c
    return 1


def pack_batches(batches, semantic_for, homography_for=None):
    """Stack a list of fixed-shape scene batches into one device-stageable
    struct: per-batch arrays get a leading batch-list axis, the per-scene
    semantic maps are DEDUPED into one (S, H, W, C) stack gathered per row
    by scene_idx inside the step (the same mechanism as cross-scene
    bucketed batching, data/scenes.py).

    Returns (per_batch dict of (N, ...) arrays, scenes (S, H, W, C)) or
    None when the batches cannot be fused (non-uniform shapes — multiple
    (H, W) buckets — or already-bucketed batches carrying their own
    scene_idx/semantic stacks).
    """
    if not batches:
        return None
    if any(hasattr(b, "scene_idx") for b in batches):
        return None  # cross-scene bucketed batches stage their own stacks
    shapes = {(b.trajectories.shape, b.mask.shape) for b in batches}
    if len(shapes) != 1:
        return None
    scene_order, scene_of = [], {}
    sem_shapes = set()
    for b in batches:
        if b.scene_id not in scene_of:
            scene_of[b.scene_id] = len(scene_order)
            scene_order.append(b)
    scenes = []
    for b in scene_order:
        sem = np.asarray(semantic_for(b))  # (1, H, W, C)
        sem_shapes.add(sem.shape)
        scenes.append(sem[0])
    if len(sem_shapes) != 1:
        return None
    scenes = np.stack(scenes)  # (S, H, W, C)
    B = batches[0].mask.shape[0]
    per_batch = {
        "traj": np.stack([np.asarray(b.trajectories) for b in batches]),
        "mask": np.stack([np.asarray(b.mask) for b in batches]),
        "scene_idx": np.stack([
            np.full((B,), scene_of[b.scene_id], np.int32)
            for b in batches]),
    }
    if homography_for is not None:
        per_batch["homography"] = np.stack(
            [np.asarray(homography_for(b.scene_id), np.float32)
             for b in batches])
    return per_batch, scenes


def stage_data(mesh, per_batch, scenes):
    """Place packed data on device once for the whole run: per-batch arrays
    shard their row axis (axis 1) over the mesh's batch axes, the scene
    stack replicates (or shards H over 'space' on a spatial mesh)."""
    if mesh is None:
        return (jax.tree.map(jnp.asarray, per_batch), jnp.asarray(scenes))
    axes = mesh_lib.batch_axes(mesh)
    rep = mesh_lib.replicated(mesh)
    out = {}
    for k, v in per_batch.items():
        if k == "homography":
            out[k] = jax.device_put(v, rep)
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P(None, axes)))
    mesh_lib.check_spatial_scene(mesh, "semantic", scenes)
    return out, jax.device_put(scenes, mesh_lib.scene_sharding(mesh))


def _index_batch(per_batch, scenes, i):
    """Batch i of a packed struct, as the dict the step bodies consume."""
    b = {k: v[i] for k, v in per_batch.items()}
    b["semantic"] = scenes
    return b


def make_epoch_runner(mcfg, scfg_train, scfg_val, opt_factory):
    """The fused chunk body with data and learning rate as ARGUMENTS, so
    the grid runner (mst_tpu.grid) can vmap it over a run axis (per-run
    trainables, per-run few-shot data, per-run lr/seed) and shard that
    axis over the mesh — an embarrassingly parallel sweep with zero
    collectives, one compile.

      run(trainable, frozen, state, opt_state, perms, epochs, base_key,
          lr, train_data, val_data) -> (trainable, state, opt_state), ys

    opt_factory(lr) -> optax GradientTransformation; lr is traced, so one
    compiled program serves every learning rate in the grid. perms
    (C, n_train_batches) int32: per-epoch batch orders (the trainer's
    rng.shuffle stream); epochs (C,) int32: absolute epoch indices (the
    validation fold_in chain). ys holds per-epoch step losses (C, N),
    train metric sums, val_ade/val_fde, and per-epoch snapshots of the
    trainable partition and model state for the host's smooth-val /
    early-stop / selection bookkeeping."""

    def run(trainable, frozen, state, opt_state, perms, epochs, base_key,
            lr, train_data, val_data):
        optimizer = opt_factory(lr)
        train_body = steps_lib.make_train_step(mcfg, scfg_train, optimizer,
                                               jit=False)
        eval_body = steps_lib.make_eval_step(mcfg, scfg_val, jit=False)
        train_pb, train_scenes = train_data
        val_pb, val_scenes = val_data
        n_val = val_pb["traj"].shape[0] if val_pb is not None else 0
        def one_epoch(carry, xs):
            trainable, state, opt_state = carry
            perm, e = xs

            def one_step(c, i):
                tr, st, os_ = c
                batch = _index_batch(train_pb, train_scenes, i)
                tr, st, os_, m = train_body(tr, frozen, st, os_, batch)
                return (tr, st, os_), (m["loss"], m["ade_sum"],
                                       m["fde_sum"], m["n"])

            (trainable, state, opt_state), (losses, ades, fdes, ns) = \
                jax.lax.scan(one_step, (trainable, state, opt_state), perm)

            params = freeze_lib.merge_params(trainable, frozen)
            ekey = jax.random.fold_in(base_key, e)

            def one_val(_, i):
                vb = _index_batch(val_pb, val_scenes, i)
                out = eval_body(params, state, vb,
                                jax.random.fold_in(ekey, i))
                return None, (out["ade_sum"], out["fde_sum"], out["n"])

            if n_val:
                _, (va, vf, vn) = jax.lax.scan(one_val, None,
                                               jnp.arange(n_val))
                vden = jnp.maximum(vn.sum(), 1.0)
                val_ade, val_fde = va.sum() / vden, vf.sum() / vden
            else:
                val_ade = val_fde = jnp.float32(0.0)
            ys = {
                "losses": losses,  # (n_train_batches,) per-step, for the
                # NaN guard's batch-level context (trainer.py loop parity)
                "train_ade_sum": ades.sum(), "train_fde_sum": fdes.sum(),
                "train_n": ns.sum(), "val_ade": val_ade, "val_fde": val_fde,
                "snapshot": trainable, "state_snapshot": state,
            }
            return (trainable, state, opt_state), ys

        return jax.lax.scan(one_epoch, (trainable, state, opt_state),
                            (perms, epochs))

    return run


def make_fused_epochs(mcfg, scfg_train, scfg_val, optimizer, base_key,
                      train_data, val_data, jit=True):
    """The single-run fused chunk runner used by Experiment.train(--fused):
    make_epoch_runner with the trainer's optimizer and the run's staged
    data closed over.

      run_chunk(trainable, frozen, state, opt_state, perms, epochs)
        -> (trainable, state, opt_state), ys
    """
    run = make_epoch_runner(mcfg, scfg_train, scfg_val,
                            lambda lr: optimizer)

    def run_chunk(trainable, frozen, state, opt_state, perms, epochs):
        return run(trainable, frozen, state, opt_state, perms, epochs,
                   base_key, jnp.float32(0.0), train_data, val_data)

    return jax.jit(run_chunk) if jit else run_chunk


class Selection:
    """Incremental replica of the trainer's smooth-val / early-stop /
    best-checkpoint bookkeeping (Experiment.train's finish_epoch), fed one
    (epoch, val_ade) at a time — the grid runner trains runs in lockstep
    and applies each run's selection as epochs stream out.

    After step(e, v) returns True (early stop) or the series ends:
    `best_epoch` is the reported label, `best_snap` the epoch whose
    post-update snapshot was selected (None: keep final params),
    `stopped` whether the early-stop predicate fired. live_snapshots()
    lists every epoch index a future selection could still pick, so a
    caller can discard the rest (bounded memory over long sweeps)."""

    def __init__(self, *, smooth_val, window_size, fine_tune,
                 n_early_stop):
        self.smooth_val = bool(smooth_val)
        self.window_size = int(window_size)
        self.half_window = self.window_size // 2 + 1
        self.fine_tune = bool(fine_tune)
        self.n_early_stop = int(n_early_stop)
        self.vals = []
        self.best = float("inf")
        self.best_epoch = 0
        self.best_snap = None
        self.snaps = collections.deque()
        self.stopped = False

    def step(self, e, val_ade):
        self.vals.append(float(val_ade))
        if self.smooth_val:
            current = (self.snaps.popleft()
                       if len(self.snaps) == self.half_window else None)
            self.snaps.append(e)
            if e < self.window_size:
                sel = self.best + 1
            else:
                sel = (sum(self.vals[-self.window_size:])
                       / self.window_size)
        else:
            current = e
            sel = val_ade
        if sel < self.best and current is not None:
            self.best = sel
            self.best_epoch = (e - self.half_window + 1 if self.smooth_val
                               else e)
            self.best_snap = current
        if self.fine_tune and self.vals and \
                self.best < min(self.vals[-self.n_early_stop:]):
            self.stopped = True
        return self.stopped

    def live_snapshots(self):
        live = set(self.snaps)
        if self.best_snap is not None:
            live.add(self.best_snap)
        if self.vals:
            live.add(len(self.vals) - 1)
        return live


def replay_selection(val_ades, *, smooth_val, window_size, fine_tune,
                     n_early_stop):
    """Run Selection over a completed val-ADE series. Returns
    (stop_epoch, best_epoch, best_snapshot_epoch): `stop_epoch` is the
    last epoch that ran (inclusive), `best_epoch` the reported best label,
    `best_snapshot_epoch` the epoch whose post-update snapshot was
    selected (None when no selection happened — keep the final params)."""
    sel = Selection(smooth_val=smooth_val, window_size=window_size,
                    fine_tune=fine_tune, n_early_stop=n_early_stop)
    for e, v in enumerate(val_ades):
        if sel.step(e, v):
            return e, sel.best_epoch, sel.best_snap
    return len(val_ades) - 1, sel.best_epoch, sel.best_snap
