"""Vectorized hyperparameter-grid fine-tuning: the whole seeds x lrs sweep
as ONE compiled program.

The reference runs its adaptation grids as bash loops of independent
processes (e.g. scripts/sdd/ped_to_biker/tune_mosa.sh:28-41: seeds x lr x
n_train, each a fresh `python train.py` that re-imports, re-traces and
re-compiles everything). This is the TPU-native redesign of that workflow:

- every (seed, lr) run's few-shot data, trainable partition and optimizer
  state are STACKED along a run axis,
- the fused multi-epoch runner (train/fused.py) is `jax.vmap`-ed over that
  axis — the learning rate is a traced scalar, so ONE compile serves every
  lr in the grid — and driven chunk-by-chunk by `lax.scan`,
- on a mesh, the run axis shards over 'data': runs are independent, so the
  sweep scales linearly with chips with ZERO collectives,
- per-run smooth-val / early-stop / best-checkpoint selection replays on
  the host afterwards (train/fused.py:replay_selection — the exact
  bookkeeping Experiment.train applies per epoch), each selected model is
  saved under the same experiment name `python train.py` would have used,
  and the left-out test runs per run with the same seeding discipline
  (train.py:59), so downstream tooling (log scrapers, multickpts,
  importance) is oblivious to how the grid executed.

Differences from looping train.py, by design:
- per-run early stopping cannot end a run's DEVICE work early (runs advance
  in lockstep); it is applied after the fact, so selected checkpoints and
  reported metrics match — only the wasted epochs' compute differs.
- no periodic mid-run checkpoints / --resume (grids are short few-shot
  runs; re-running a grid is one command).
- a diverged run (non-finite loss, e.g. too-high lr) is reported and
  skipped instead of aborting the sweep.
- the run axis is processed in device-sized groups: `--runs_per_program`
  caps how many runs one compiled program holds, and a group whose program
  exhausts device HBM is split in half and resumed mid-sweep — a grid
  larger than the chip degrades into sequential sub-sweeps instead of
  failing.

Usage (mirrors train.py flags, plus the grid axes):

    python -m mst_tpu.grid --config_filename sdd_shortterm_train.yaml \
        --fine_tune --train_net mosa_2 --position 0 1 2 3 4 \
        --pretrained_ckpt ckpts/base.npz --smooth_val \
        --seeds 1 2 3 --lrs 0.0005 0.001 0.005 [--n_trains 1 2 3]
        [--log_dir logs/] [--runs_per_program 8]

--n_trains values change the packed data shapes, so each n_train sweeps as
its own program (a SHAPE GROUP); seeds x lrs within one n_train share one
compile.
"""

import contextlib
import copy
import io
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mst_tpu import config as config_lib
from mst_tpu.data.splits import prepare_dataset
from mst_tpu.parallel import mesh as mesh_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import fused as fused_lib
from mst_tpu.train.trainer import Experiment
from mst_tpu.utils.seeding import set_random_seeds

# transient per-chunk snapshot-transfer budget (bytes): each chunk's
# device_get materializes R x chunk x |trainable| of per-epoch snapshots
# before the stream-and-prune bookkeeping below discards all but the
# selectable ones, so the chunk size adapts to keep that transient bounded
# (LoRA grids are ~100 KB/run and never hit this; full-FT grids do)
SNAPSHOT_BUDGET = 2 << 30


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *trees)


def _tree_bytes(tree):
    return sum(np.asarray(x).nbytes for x in jax.tree.leaves(tree))


def _shard_runs(mesh, tree):
    """Shard a stacked (R, ...) pytree's run axis over the mesh's batch
    axes — runs are independent, so this is communication-free."""
    if mesh is None:
        return jax.tree.map(jnp.asarray, tree)
    sh = NamedSharding(mesh, P(mesh_lib.batch_axes(mesh)))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _sweep_shape_group(*, gmap, runs, setups, exps, packs, rngs, mesh,
                       shard, frozen, vrun, n_epoch, snap_bytes, G0, sels,
                       hist, snaps, last_state, diverged, done,
                       force_oom_above, chunk_cap):
    """Advance one SHAPE GROUP of runs (global indices `gmap`, all sharing
    one packed-data shape) from epoch 0 to the end, in device-sized
    sub-groups of at most G0 runs. Each sub-group runs as chunks of one
    vmapped fused program; a sub-group whose program exhausts device HBM
    is split in half and resumed from the epoch it reached. Results stream
    into the caller's per-run bookkeeping lists (indexed globally)."""
    h_trainable = _tree_stack([setups[r]["trainable"] for r in gmap])
    h_opt = _tree_stack([setups[r]["opt_state"] for r in gmap])
    h_state = _tree_stack([exps[r].model_state for r in gmap])
    h_keys = np.stack([np.asarray(exps[r]._key) for r in gmap])
    h_lrs = np.asarray([runs[r][1] for r in gmap], np.float32)
    h_train = _tree_stack([packs[r][0] for r in gmap])
    h_val = _tree_stack([packs[r][1] for r in gmap])
    n_batches = packs[gmap[0]][0][0]["traj"].shape[0]

    # every epoch's batch order upfront (the trainer's per-epoch
    # rng.shuffle stream; runs that stop early simply never index the
    # tail, exactly like the loop's unconsumed draws)
    all_perms = np.empty((len(gmap), n_epoch, n_batches), np.int32)
    for i, r in enumerate(gmap):
        order = np.arange(n_batches)
        for j in range(n_epoch):
            rngs[r].shuffle(order)
            all_perms[i, j] = order

    def consume(idx, e, c, ys):
        """Fold one chunk's device results into the per-run bookkeeping.
        Rows past len(idx) are mesh-divisibility padding (duplicated last
        run) and are ignored."""
        for row, li in enumerate(idx):
            r = gmap[li]
            if done[r]:
                continue
            for j in range(c):
                ep = e + j
                losses = ys["losses"][row, j]
                if not np.isfinite(losses).all():
                    # train.py raises here and writes no final ckpt; the
                    # grid marks the run failed and moves on. Overshoot
                    # epochs past a run's early stop never reach this
                    # check, matching what train.py would have executed.
                    bi = int(np.flatnonzero(~np.isfinite(losses))[0])
                    diverged[r] = (ep, bi)
                    done[r] = True
                    break
                n = max(float(ys["train_n"][row, j]), 1)
                hist[r].append((float(ys["train_ade_sum"][row, j]) / n,
                                float(ys["train_fde_sum"][row, j]) / n,
                                float(ys["val_ade"][row, j]),
                                float(ys["val_fde"][row, j])))
                snaps[r][ep] = jax.tree.map(lambda a: np.array(a[row, j]),
                                            ys["snapshot"])
                last_state[r] = jax.tree.map(
                    lambda a: np.array(a[row, j]), ys["state_snapshot"])
                stop = sels[r].step(ep, float(ys["val_ade"][row, j]))
                live = sels[r].live_snapshots()
                for k in [k for k in snaps[r] if k not in live]:
                    del snaps[r][k]
                if stop:
                    done[r] = True
                    break

    def writeback(host, dev, idx):
        """Pull a sub-group's in-flight device state back into the host
        stacks (so a memory-driven split resumes runs mid-sweep)."""
        pulled = jax.device_get(dev)

        def wb(h, d):
            h[np.asarray(idx)] = np.asarray(d)[:len(idx)]
            return h
        jax.tree.map(wb, host, pulled)

    def sweep(idx, e0):
        """Advance runs at local positions `idx` from epoch e0 to the end
        as one vmapped device program, splitting the group in half and
        retrying when the program exhausts device memory."""
        pidx = np.asarray(idx + [idx[-1]] * ((-len(idx)) % shard))
        g = len(pidx)
        if g > len(idx):
            print(f"[grid] padding {len(idx)}-run group to {g} for the "
                  f"mesh (duplicate rows are discarded)")
        chunk = max(1, min(fused_lib.MAX_CHUNK, n_epoch,
                           SNAPSHOT_BUDGET // (g * snap_bytes)))
        if chunk_cap:
            chunk = min(chunk, chunk_cap)
        take = lambda h: jax.tree.map(lambda a: a[pidx], h)
        e = e0
        d_tr = d_st = d_op = d_keys = d_lrs = d_train = d_val = None
        try:
            d_tr = _shard_runs(mesh, take(h_trainable))
            d_st = _shard_runs(mesh, take(h_state))
            d_op = _shard_runs(mesh, take(h_opt))
            d_keys = _shard_runs(mesh, h_keys[pidx])
            d_lrs = _shard_runs(mesh, h_lrs[pidx])
            d_train = _shard_runs(mesh, take(h_train))
            d_val = _shard_runs(mesh, take(h_val))
            while e < n_epoch and not all(done[gmap[li]] for li in idx):
                if force_oom_above and g > force_oom_above and e > e0:
                    # test hook: fake a mid-sweep RESOURCE_EXHAUSTED after
                    # one successful chunk, exercising split + resume
                    raise RuntimeError(
                        "RESOURCE_EXHAUSTED (forced for test)")
                c = min(chunk, n_epoch - e)
                # d_tr/d_st/d_op keep pointing at the last GOOD chunk's
                # state until this chunk's results are safely on host —
                # an OOM surfacing at device_get (async execution) must
                # not leave them bound to poisoned output buffers
                (n_tr, n_st, n_op), ys = vrun(
                    d_tr, frozen, d_st, d_op,
                    _shard_runs(mesh, all_perms[pidx][:, e:e + c]),
                    jnp.arange(e, e + c, dtype=jnp.int32),
                    d_keys, d_lrs, d_train, d_val)
                ys = jax.device_get(ys)
                consume(idx, e, c, ys)
                e += c
                d_tr, d_st, d_op = n_tr, n_st, n_op
        except Exception as ex:  # noqa: BLE001 — filtered below
            if "RESOURCE_EXHAUSTED" not in str(ex) or len(idx) == 1:
                raise
            print(f"[grid] {len(idx)}-run program exhausted device "
                  f"memory at epoch {e}; splitting the group")
            # the failed call's inputs (= last good chunk's outputs) are
            # intact; pull them back so the halves resume from epoch e
            # (no chunk ran when e == e0 — the host stacks are current)
            if e > e0 and d_tr is not None:
                writeback(h_trainable, d_tr, idx)
                writeback(h_state, d_st, idx)
                writeback(h_opt, d_op, idx)
            # drop the failed group's device buffers before retrying so
            # they don't contend with the halves' allocations
            d_tr = d_st = d_op = d_keys = d_lrs = d_train = d_val = None
            mid = (len(idx) + 1) // 2
            sweep(idx[:mid], e)
            sweep(idx[mid:], e)

    for lo in range(0, len(gmap), G0):
        sweep(list(range(lo, min(lo + G0, len(gmap)))), 0)


def run_grid(args):
    t0 = time.time()
    seeds = list(args.seeds or [args.seed])
    lrs = [float(x) for x in (args.lrs or [args.lr])]
    n_trains = [int(x) for x in args.n_trains] if args.n_trains \
        else [args.n_train_batch]  # may be None (no few-shot cap)
    # lr-major like the grids; n_train groups stay contiguous so each
    # shape group sweeps as one block
    runs = [(s, l, nt) for nt in n_trains for l in lrs for s in seeds]
    R = len(runs)

    # ---- per-run host setup: split data, build/restore the model, pack
    # the few-shot batches (identical to what `python train.py` does up to
    # its epoch loop; Experiment._setup_training/_fused_pack are the same
    # code paths)
    exps, setups, names, tests, packs, rngs = [], [], [], [], [], []
    for seed, lr, nt in runs:
        set_random_seeds(seed)
        args_r = copy.deepcopy(args)
        args_r.seed, args_r.lr, args_r.n_train_batch = seed, lr, nt
        params = config_lib.get_params(args_r)
        image_path, data_path = config_lib.get_image_and_data_path(params)
        df_train, df_val, df_test = prepare_dataset(
            data_path, args.load_data, args.batch_size,
            args_r.n_train_batch, args.train_files, args.val_files,
            args.val_split, args.test_splits, args.shuffle,
            args.share_val_test, "train", args.show_details)
        name = config_lib.get_experiment_name(
            args_r, df_train.metaId.unique().shape[0])
        print(f"[grid] run seed={seed} lr={lr} n_train={nt}: {name}")
        exp = Experiment(params)
        if args.pretrained_ckpt is not None:
            exp.load_params(args.pretrained_ckpt)
        rng = np.random.default_rng(seed)
        setup = exp._setup_training(df_train, df_val, image_path,
                                    image_path, rng)
        tr, va, why = exp._fused_pack(setup["train_batches"],
                                      setup["val_batches"])
        if tr is None:
            raise SystemExit(f"grid runs must be fused-eligible: {why}")
        exps.append(exp)
        setups.append(setup)
        names.append(name)
        tests.append((df_test, image_path))
        packs.append((tr, va))
        rngs.append(rng)

    # ---- partition the run axis into SHAPE GROUPS: every run in a group
    # shares one vmapped program. Different --n_trains legitimately change
    # the packed shapes (train batch count); within one n_train, seeds must
    # not (that would mean seed-dependent splits/buckets)
    def _sig(r):
        return (str(jax.tree.structure(packs[r])),
                tuple(np.shape(l) for l in jax.tree.leaves(packs[r])))

    for nt in n_trains:
        if len({_sig(r) for r in range(R) if runs[r][2] == nt}) != 1:
            raise SystemExit(
                "grid runs produced differently-shaped data (seeds changed "
                "the split sizes or scene buckets); use predefined splits "
                "so every run of one --n_train_batch shares one shape")
    shape_groups = {}
    for r in range(R):
        shape_groups.setdefault(_sig(r), []).append(r)

    boundaries = {str(s["lr_boundaries"]) for s in setups}
    if len(boundaries) != 1:
        raise SystemExit("grid runs disagree on the lr schedule")
    lr_boundaries = setups[0]["lr_boundaries"]
    ratio = (optax.piecewise_constant_schedule(1.0, lr_boundaries)
             if lr_boundaries else None)

    def opt_factory(lr):
        if ratio is None:
            return optax.adam(lr)
        return optax.adam(lambda count: lr * ratio(count))

    # ---- stack the run axis HOST-side; device placement happens per
    # run-group below, so sweeps larger than one chip's HBM degrade into
    # sequential device-sized groups instead of dying
    mesh = mesh_lib.mesh_from_shape(args.mesh_shape, args.mesh_axes)
    if mesh is not None and "space" in mesh.axis_names:
        raise SystemExit("the grid shards RUNS over the mesh; use a 1D "
                         "--mesh_shape (no 'space' axis)")
    shard = mesh_lib.batch_shard_count(mesh) if mesh is not None else 1
    # the frozen base must be identical across runs for the grid to share
    # ONE copy — true when a pretrained checkpoint covering the frozen
    # partition is loaded (the grids' setting), FALSE when runs random-init
    # from their own seeds or the ckpt is a delta-only overlay; verify
    # instead of assuming, or seeds 2+ would silently train against run
    # 1's backbone
    frozen = setups[0]["frozen"]
    leaves0 = jax.tree.leaves(frozen)
    for r in range(1, R):
        for a, b in zip(leaves0, jax.tree.leaves(setups[r]["frozen"])):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                raise SystemExit(
                    "grid runs disagree on their frozen parameters (runs "
                    "share one frozen base); pass --pretrained_ckpt with a "
                    "FULL checkpoint that covers the frozen partition "
                    "(delta-only/absent ckpts leave seed-specific random "
                    "init in the base)")
    if mesh is not None:
        frozen = mesh_lib.replicate_tree(mesh, frozen)

    exp0 = exps[0]
    runner = fused_lib.make_epoch_runner(
        exp0.mcfg, exp0._step_config(),
        exp0._step_config(for_validation=True), opt_factory)
    vrun = jax.jit(jax.vmap(
        runner, in_axes=(0, None, 0, 0, 0, None, 0, 0, 0, 0)))

    p = exp0.params
    n_epoch = int(p["n_epoch"])
    snap_bytes = max(_tree_bytes(setups[0]["trainable"]), 1)
    G0 = max(1, min(int(args.runs_per_program or R), R))
    print(f"[grid] {R} runs ({len(seeds)} seeds x {len(lrs)} lrs x "
          f"{len(n_trains)} n_trains), {n_epoch} epochs, "
          f"{len(shape_groups)} shape group(s)"
          + (f", <={G0} runs/program" if G0 < R else "")
          + (f", mesh {dict(mesh.shape)}" if mesh is not None else ""))

    # ---- the sweep: scan chunks of vmapped fused epochs, streaming each
    # chunk's results through per-run incremental bookkeeping. Snapshots
    # are COPIED and pruned to the ones a future selection could still
    # pick (Selection.live_snapshots: the smooth-val window + current best
    # + last), so host memory stays O(R x half_window x |trainable|)
    # however long the sweep — not O(R x n_epoch).
    sels = [fused_lib.Selection(
        smooth_val=bool(p.get("smooth_val", False)),
        window_size=int(p.get("window_size", 9)),
        fine_tune=bool(p.get("fine_tune", False)),
        n_early_stop=int(p.get("n_early_stop", 300))) for _ in runs]
    hist = [[] for _ in runs]          # (ade, fde, val_ade, val_fde)/epoch
    snaps = [dict() for _ in runs]     # epoch -> trainable copy (bounded)
    last_state = [None] * R            # state at the last processed epoch
    diverged = [None] * R              # (epoch, batch) where loss went bad
    done = [False] * R
    force_oom_above = int(os.environ.get("MST_GRID_FORCE_OOM_ABOVE", "0"))
    chunk_cap = int(os.environ.get("MST_GRID_CHUNK_CAP", "0"))

    for gmap in shape_groups.values():
        _sweep_shape_group(
            gmap=gmap, runs=runs, setups=setups, exps=exps, packs=packs,
            rngs=rngs, mesh=mesh, shard=shard, frozen=frozen, vrun=vrun,
            n_epoch=n_epoch, snap_bytes=snap_bytes, G0=G0, sels=sels,
            hist=hist, snaps=snaps, last_state=last_state,
            diverged=diverged, done=done, force_oom_above=force_oom_above,
            chunk_cap=chunk_cap)
    # ---- per-run output + save + left-out test (the order train.py
    # prints them), each run's output also mirrored to <name>.out when
    # --log_dir is given so the log-scrape tooling works unchanged
    summary = []
    for r, (seed, lr, nt) in enumerate(runs):
        exp, name = exps[r], names[r]
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ok = _emit_run(exp, name, sels[r], hist[r], snaps[r],
                           last_state[r], diverged[r])
            if ok:
                print("############ Test leftout data ##############")
                set_random_seeds(seed)
                df_test, image_path = tests[r]
                ade, fde, _, _ = exp.test(df_test, image_path)
                summary.append((seed, lr, nt, name, ade, fde))
            else:
                summary.append((seed, lr, nt, name, float("nan"),
                                float("nan")))
        text = buf.getvalue()
        print(f"===== run seed={seed} lr={lr} n_train={nt} =====")
        print(text, end="")
        if args.log_dir:
            os.makedirs(args.log_dir, exist_ok=True)
            with open(os.path.join(args.log_dir, f"{name}.out"), "w") as f:
                f.write(text)

    print("\n[grid] summary (test minADE / minFDE):")
    for seed, lr, nt, name, ade, fde in summary:
        print(f"  seed={seed} lr={lr} n_train={nt}: ADE {ade:.4f} "
              f"FDE {fde:.4f}  ({name})")
    print(f"[grid] {R} runs in {time.time() - t0:.1f}s")
    return summary


def _emit_run(exp, name, sel, hist, snaps, state, diverged):
    """One run's epoch lines, selection and final save from the streamed
    bookkeeping. Returns False for a diverged (non-finite loss) run."""
    p = exp.params
    if diverged is not None:
        ep, bi = diverged
        print(f"[grid] run diverged: non-finite loss at epoch {ep}, "
              f"scene-batch {bi} (lr={p['lr']}); skipping")
        return False
    for e, (ta, tf, va, vf) in enumerate(hist):
        print(f"Epoch {e}: \tTrain (Top-1) ADE: {ta:.2f} "
              f"FDE: {tf:.2f} \t\tVal (Top-k) ADE: {va:.2f} "
              f"FDE: {vf:.2f}")
    stop_e = len(hist) - 1
    if sel.stopped:
        print(f"Early stop at epoch {stop_e}")
    print(f"Best epoch at {sel.best_epoch}")
    exp.val_ADE = [h[2] for h in hist]
    exp.val_FDE = [h[3] for h in hist]
    pick = (sel.best_snap
            if sel.best_epoch != 0 and sel.best_snap is not None
            else stop_e)
    exp.model_params = freeze_lib.merge_params(
        snaps[pick], freeze_lib.split_params(exp.model_params,
                                             exp._trainable_mask())[1])
    exp.model_state = state
    config_lib.ensure_dir(p["ckpt_path"])
    exp.save_params(f'{p["ckpt_path"]}/{name}.npz',
                    mask=exp._trainable_mask())
    return True


def get_parser():
    parser = config_lib.get_parser(True)
    parser.add_argument("--seeds", type=int, nargs="+", default=None,
                        help="grid seed axis (default: just --seed)")
    parser.add_argument("--lrs", type=float, nargs="+", default=None,
                        help="grid learning-rate axis (default: just --lr)")
    parser.add_argument("--log_dir", type=str, default=None,
                        help="write per-run <experiment>.out logs "
                             "(byte-compatible with the scrape tooling)")
    parser.add_argument("--n_trains", type=int, nargs="+", default=None,
                        help="grid n_train_batch axis (default: just "
                             "--n_train_batch); each value sweeps as its "
                             "own shape group")
    parser.add_argument("--runs_per_program", type=int, default=0,
                        help="cap how many runs one compiled program "
                             "holds (0 = all); the grid also auto-splits "
                             "groups that exhaust device memory")
    return parser


if __name__ == "__main__":
    run_grid(get_parser().parse_args())
