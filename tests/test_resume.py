"""Mid-run training-state checkpoint/resume (exceeds the reference, which
never saves optimizer state — SURVEY.md §5)."""

import jax
import numpy as np
import optax

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib
from mst_tpu.train.trainer import Experiment


def test_training_state_roundtrip(tmp_path):
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=6,
                                        total_len=12)
    params = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0, n_goal=3,
        n_traj=1, batch_size=4, lr=1e-3, n_epoch=1, dataset_name="sdd",
        ckpt_path=str(tmp_path), train_net="mosa_2", position=["0", "1"],
        n_round=1, seed=1, segmentation_model_fp=None))
    exp = Experiment(params, images=images)
    batches = exp.prepare_data(df, None, "val")
    batch = batches[0]
    db = exp._device_batch(batch, exp._semantic_for(batch, {}))

    mask = exp._trainable_mask()
    trainable, frozen = freeze_lib.split_params(exp.model_params, mask)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(trainable)
    step = steps_lib.make_train_step(exp.mcfg, exp._step_config(), optimizer)

    # run 3 steps, checkpoint, run 2 more
    state = exp.model_state
    for _ in range(3):
        trainable, state, opt_state, _ = step(trainable, frozen, state,
                                              opt_state, db)
    ckpt = str(tmp_path / "train_state.npz")
    exp.save_training_state(ckpt, trainable, opt_state, epoch=3,
                            val_history=[1.0, 2.0])
    cont_tr, cont_opt = trainable, opt_state
    for _ in range(2):
        cont_tr, state, cont_opt, m_direct = step(cont_tr, frozen, state,
                                                  opt_state, db)

    # restore into FRESH trees and replay the same 2 steps
    exp2 = Experiment(params, images=images)
    tr2, fz2 = freeze_lib.split_params(exp2.model_params,
                                       exp2._trainable_mask())
    opt2 = optimizer.init(tr2)
    tr2, opt2, epoch, extras = exp2.restore_training_state(ckpt, tr2, opt2)
    assert epoch == 3
    assert extras["val_ADE"] == [1.0, 2.0]
    # restored trainable equals the saved one
    def assert_eq(a, b):
        if a is None and b is None:
            return
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    jax.tree.map(assert_eq, tr2, trainable, is_leaf=lambda x: x is None)
    state2 = exp2.model_state
    r_tr, r_opt = tr2, opt2
    for _ in range(2):
        r_tr, state2, r_opt, m_resumed = step(r_tr, frozen, state2,
                                              opt_state, db)
    def assert_close(a, b):
        if a is None and b is None:
            return
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    jax.tree.map(assert_close, r_tr, cont_tr, is_leaf=lambda x: x is None)


def _lora_leaves(params):
    from mst_tpu.train.checkpoints import flatten_tree

    return {k: v for k, v in flatten_tree(params).items() if "lora" in k}


def test_kill_and_resume_bitwise_identical(tmp_path):
    """Training killed at epoch 2/4 and resumed with --resume reaches the
    SAME final trainable params as an uninterrupted 4-epoch run (same data
    order, same optimizer state, same best-ckpt tracking)."""
    df, images = make_synthetic_dataset(seed=0, n_scenes=2, n_traj=8,
                                        total_len=12)
    ids = df.metaId.unique()
    df_train = df[df.metaId.isin(ids[:10])]
    df_val = df[df.metaId.isin(ids[10:])]

    def make(n_epoch, ckpt_dir, resume=False):
        return config_lib.get_params(overrides=dict(
            obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
            encoder_channels=[8, 8, 16, 16, 16],
            decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
            loss_scale=1000, resize_factor=0.25, temperature=1.0, n_goal=3,
            n_traj=1, batch_size=4, lr=1e-3, n_epoch=n_epoch,
            dataset_name="sdd", ckpt_path=str(ckpt_dir),
            train_net="mosa_2", position=["0", "1", "2", "3", "4"],
            n_round=1, seed=1, save_every_n=2, resume=resume,
            segmentation_model_fp=None))

    # uninterrupted 4-epoch run
    exp_full = Experiment(make(4, tmp_path / "full"), images=images)
    exp_full.train(df_train, df_val, None, None, "resume_test")
    want = _lora_leaves(exp_full.model_params)

    # killed at epoch 2 (train_state saved by save_every_n=2) ...
    exp_a = Experiment(make(2, tmp_path / "int"), images=images)
    exp_a.train(df_train, df_val, None, None, "resume_test")
    # ... then resumed to epoch 4
    exp_b = Experiment(make(4, tmp_path / "int", resume=True), images=images)
    exp_b.train(df_train, df_val, None, None, "resume_test")
    got = _lora_leaves(exp_b.model_params)

    assert want.keys() == got.keys() and len(want) > 0
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_async_checkpoint_write(tmp_path):
    """block=False saves land after wait_pending and read back equal."""
    import jax.numpy as jnp

    from mst_tpu.train import checkpoints as ckpt_lib

    params = {"layer": {"weight": jnp.arange(12.0).reshape(3, 4),
                        "bias": jnp.ones(4)}}
    path = str(tmp_path / "async.npz")
    fut = ckpt_lib.save_checkpoint(path, params, metadata={"seed": 7},
                                   block=False)
    assert fut is not None
    ckpt_lib.wait_pending()
    flat = ckpt_lib.load_checkpoint(path)
    np.testing.assert_array_equal(flat["layer/weight"],
                                  np.arange(12.0).reshape(3, 4))
    import json
    assert json.load(open(path + ".json"))["seed"] == 7


def test_training_state_snapshot_window_roundtrip(tmp_path):
    """smooth_val's lagging snapshot deque persists through save/restore so
    a resumed run selects the same half-window-old `current` as an
    uninterrupted one (and an early post-resume best can never clobber the
    restored best snapshot with None)."""
    params = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0, n_goal=3,
        n_traj=1, batch_size=4, lr=1e-3, n_epoch=1, dataset_name="sdd",
        ckpt_path=str(tmp_path), train_net="mosa_2", position=["0", "1"],
        n_round=1, seed=1, segmentation_model_fp=None))
    exp = Experiment(params)
    mask = exp._trainable_mask()
    trainable, _ = freeze_lib.split_params(exp.model_params, mask)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(trainable)

    rng = np.random.default_rng(0)
    snaps = [jax.tree.map(
        lambda x: np.asarray(rng.normal(size=np.shape(x)), np.float32),
        jax.tree.map(np.asarray, trainable)) for _ in range(3)]
    ckpt = str(tmp_path / "ts.npz")
    exp.save_training_state(ckpt, trainable, opt_state, epoch=7,
                            snapshots=snaps, best_snapshot=snaps[0],
                            best_val_ade=1.5, best_epoch=2)
    _, _, epoch, extras = exp.restore_training_state(ckpt, trainable,
                                                     opt_state)
    assert epoch == 7
    assert len(extras["snapshots"]) == 3
    for want, got in zip(snaps, extras["snapshots"]):
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                     want, got)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 snaps[0], extras["best_snapshot"])


def test_load_checkpoint_appends_npz_extension(tmp_path):
    from mst_tpu.train import checkpoints as ckpt_lib

    path = str(tmp_path / "c")
    ckpt_lib.save_checkpoint(path + ".npz", {"w": np.arange(4.0)})
    flat = ckpt_lib.load_checkpoint(path)  # no extension
    np.testing.assert_array_equal(flat["w"], np.arange(4.0))
