"""End-to-end: train + multi-goal eval + checkpoints on a synthetic scene.

CPU-runnable equivalent of the reference's train.py/test.py flow, using the
identity segmentation backbone (reference ynet.py:507) with 3 'semantic'
channels = the raw image.
"""

import numpy as np
import pytest

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12
OBS_LEN = 4


def make_params(tmp_path, **over):
    params = config_lib.get_params(overrides=dict(
        obs_len=OBS_LEN, pred_len=TOTAL_LEN - OBS_LEN, waypoints=[7],
        n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=5, n_traj=1, batch_size=4, lr=3e-4, n_epoch=2,
        dataset_name="sdd", ckpt_path=str(tmp_path), train_net="train",
        network="original", n_round=1, seed=1, shuffle=False,
        save_every_n=100, segmentation_model_fp=None,
    ))
    params.update(over)
    return params


@pytest.fixture(scope="module")
def dataset():
    df, images = make_synthetic_dataset(
        seed=0, n_scenes=2, n_traj=10, total_len=TOTAL_LEN,
        img_hw=(240, 320))
    n_meta = df.metaId.nunique()
    ids = df.metaId.unique()
    df_train = df[df.metaId.isin(ids[:n_meta - 6])]
    df_val = df[df.metaId.isin(ids[n_meta - 6:n_meta - 3])]
    df_test = df[df.metaId.isin(ids[n_meta - 3:])]
    return df_train, df_val, df_test, images


def test_train_eval_loop(tmp_path, dataset):
    df_train, df_val, df_test, images = dataset
    params = make_params(tmp_path)
    exp = Experiment(params, images=images)

    val_ade, val_fde = exp.train(df_train, df_val, None, None, "e2e_test")
    assert len(val_ade) == 2
    assert all(np.isfinite(val_ade)) and all(np.isfinite(val_fde))

    ade, fde, dfs, _ = exp.test(df_test, None)
    assert np.isfinite(ade) and np.isfinite(fde)
    assert len(dfs) == 1
    assert set(dfs[0].columns) == {"metaId", "sceneId", "ade", "fde"}
    assert dfs[0].metaId.nunique() == df_test.metaId.nunique()
    # predictions are at image scale; a sane model stays within ~2 images
    assert ade < 4 * 320


def test_training_reduces_loss(tmp_path, dataset):
    """Loss should drop markedly when overfitting a few trajectories."""
    import jax

    from mst_tpu.train import freeze as freeze_lib
    from mst_tpu.train import steps as steps_lib
    import optax

    df_train, _, _, images = dataset
    params = make_params(tmp_path, lr=1e-3)
    exp = Experiment(params, images=images)
    batches = exp.prepare_data(df_train, None, "val")  # no shuffle
    batch = batches[0]
    semantic = exp._semantic_for(batch, {})
    db = exp._device_batch(batch, semantic)

    mask = exp._trainable_mask()
    trainable, frozen = freeze_lib.split_params(exp.model_params, mask)
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(trainable)
    step = steps_lib.make_train_step(exp.mcfg, exp._step_config(), optimizer)
    state = exp.model_state
    losses = []
    for _ in range(40):
        trainable, state, opt_state, metrics = step(
            trainable, frozen, state, opt_state, db)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_checkpoint_roundtrip_and_delta(tmp_path, dataset):
    df_train, df_val, df_test, images = dataset
    params = make_params(tmp_path)
    exp = Experiment(params, images=images)
    base_path = str(tmp_path / "base.npz")
    exp.save_params(base_path, train_net="train")

    # fine-tune only LoRA params, save delta, reload via overlay
    ft_params = make_params(
        tmp_path, train_net="mosa_2", position=["0", "1"], fine_tune=True,
        n_epoch=1, lr=5e-3)
    ft = Experiment(ft_params, images=images)
    ft.load_params(base_path)
    # base conv weights must equal the pretrained ones after load
    np.testing.assert_allclose(
        np.asarray(ft.model_params["encoder"]["stages"]["1"]["conv0"]
                   ["weight"]),
        np.asarray(exp.model_params["encoder"]["stages"]["1"]["conv0"]
                   ["weight"]))
    ft.train(df_train, df_val, None, None, "ft_test")
    delta_path = str(tmp_path / "ft_test.npz")
    import os
    assert os.path.exists(delta_path)
    import numpy as np_
    with np_.load(delta_path) as z:
        keys = list(z.files)
    assert keys and all("lora" in k for k in keys), keys[:5]

    # restore base + delta overlay (reference trainer.py:606-614)
    probe = Experiment(ft_params, images=images)
    probe.load_separated_params(base_path, delta_path)
    lora_b = np.asarray(
        probe.model_params["encoder"]["stages"]["0"]["conv0"]["lora_B"])
    assert np.abs(lora_b).max() > 0, "delta overlay not applied"
    ade, fde, _, _ = probe.test(df_test, None)
    assert np.isfinite(ade) and np.isfinite(fde)


def test_init_check_equivalence(tmp_path, dataset):
    """Zero-init adapters reproduce the base model's test metrics exactly
    (the reference's --init_check, train.py:47-59)."""
    df_train, df_val, df_test, images = dataset
    base = Experiment(make_params(tmp_path), images=images)
    base_path = str(tmp_path / "base_ic.npz")
    base.save_params(base_path, train_net="train")

    plain = Experiment(make_params(tmp_path), images=images)
    plain.load_params(base_path)
    adapted = Experiment(
        make_params(tmp_path, train_net="mosa_2", position=["0", "1", "2"]),
        images=images)
    adapted.load_params(base_path)

    ade_p, fde_p, _, _ = plain.test(df_test, None)
    ade_a, fde_a, _, _ = adapted.test(df_test, None)
    np.testing.assert_allclose(ade_p, ade_a, rtol=1e-5)
    np.testing.assert_allclose(fde_p, fde_a, rtol=1e-5)


def test_nonfinite_loss_fails_fast(tmp_path, dataset):
    """NaN inputs must abort training with a contextual error, not train on
    garbage (SURVEY §5 numerics guard)."""
    df_train, df_val, _, images = dataset
    df_bad = df_train.copy()
    df_bad.loc[df_bad.index[:4], "x"] = np.nan
    params = make_params(tmp_path)
    exp = Experiment(params, images=images)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        exp.train(df_bad, df_val, None, None, "nan_guard")


def test_return_samples_payload(tmp_path, dataset):
    """test(return_samples=True) returns the reference's visualization
    payload (evaluate.py:75-80,240-245): goal map + tempered sigmoid +
    per-K waypoint samples + ground truth, NHWC."""
    _, _, df_test, images = dataset
    params = make_params(tmp_path, n_round=1)
    exp = Experiment(params, images=images)
    ade, fde, dfs, list_trajs = exp.test(df_test, None, return_preds=True,
                                         return_samples=True)
    trajs = list_trajs[0]
    assert set(trajs) >= {"groundtruth", "prediction", "waypoint_sample",
                          "goal_map", "goal_sigmoid_map", "metaId"}
    n = sum(len(x) for x in trajs["metaId"])
    assert n == df_test.metaId.nunique()
    gm = trajs["goal_map"][0]
    sig = trajs["goal_sigmoid_map"][0]
    assert gm.ndim == 4 and gm.shape[-1] == params["pred_len"]
    assert sig.shape == gm.shape
    assert np.all(sig >= 0) and np.all(sig <= 1)
    ws = trajs["waypoint_sample"][0]
    # (b, n_wp, K, 2)
    assert ws.shape[1:] == (len(params["waypoints"]), params["n_goal"], 2)
    gt = trajs["groundtruth"][0]
    assert gt.shape[1:] == (TOTAL_LEN, 2)
    pred = trajs["prediction"][0]
    assert pred.shape[1:] == (params["pred_len"], 2)


def test_remat_train_step_matches(tmp_path):
    """--remat (jax.checkpoint around encoder + decoders) recomputes the
    same ops in the backward: losses and updated params match the
    non-remat step to fp-exactness."""
    import optax

    from mst_tpu.data.synthetic import make_synthetic_dataset
    from mst_tpu.train import freeze as freeze_lib
    from mst_tpu.train import steps as steps_lib
    from mst_tpu.train.trainer import Experiment

    import jax

    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=8,
                                        total_len=TOTAL_LEN)
    results = {}
    for name, remat in [("plain", False), ("remat", True)]:
        params_dict = make_params(tmp_path, remat=remat, batch_size=8)
        exp = Experiment(params_dict, images=images)
        batches = exp.prepare_data(df, None, "val")
        batch = batches[0]
        semantic = exp._semantic_for(batch, {})
        db = exp._device_batch(batch, semantic)
        scfg = exp._step_config()
        assert scfg.remat == remat
        mask = exp._trainable_mask()
        trainable, frozen = freeze_lib.split_params(exp.model_params, mask)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(trainable)
        step = steps_lib.make_train_step(exp.mcfg, scfg, optimizer)
        for _ in range(2):
            trainable, state, opt_state, metrics = step(
                trainable, frozen, exp.model_state, opt_state, db)
        results[name] = (jax.tree.map(np.asarray, trainable),
                         float(metrics["loss"]))

    np.testing.assert_allclose(results["plain"][1], results["remat"][1],
                               rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        results["plain"][0], results["remat"][0])


def test_eval_oom_fallback_shrinks_k_chunk(tmp_path, dataset, monkeypatch):
    """When the K-sample decode exhausts device memory, test() retries the
    batch with the next smaller eval_k_chunk divisor — results identical
    to the unshrunk eval (chunked decode is numerically the same)."""
    from mst_tpu.train import steps as steps_lib

    df_train, df_val, df_test, images = dataset
    params = make_params(tmp_path, n_goal=6)  # K=6: ladder 6 -> 3 -> 2 -> 1
    exp = Experiment(params, images=images)
    want_ade, want_fde, _, _ = exp.test(df_test, None)

    real_make = steps_lib.make_eval_step
    built_kcs = []

    def fake_make(mcfg, scfg, **kw):
        built_kcs.append(scfg.eval_k_chunk)
        step = real_make(mcfg, scfg, **kw)
        if scfg.eval_k_chunk == 0:  # the full-K program "OOMs"
            calls = {"n": 0}

            def oom_step(*a, **k):
                calls["n"] += 1
                raise RuntimeError("RESOURCE_EXHAUSTED: fake OOM")
            return oom_step
        return step

    # patch the memoized entry point: cached_eval_step would otherwise hand
    # back steps built before the patch (the memo is exactly the production
    # behavior; the ladder itself builds one entry per chunk size)
    monkeypatch.setattr(steps_lib, "cached_eval_step", fake_make)
    exp2 = Experiment(params, images=images)
    exp2.model_params = exp.model_params
    exp2.model_state = exp.model_state
    ade, fde, _, _ = exp2.test(df_test, None)
    monkeypatch.undo()
    # first build is the configured chunk (0 = all K), the retry is the
    # next smaller divisor of K=6
    assert built_kcs[:2] == [0, 3]
    np.testing.assert_allclose(ade, want_ade, rtol=1e-5)
    np.testing.assert_allclose(fde, want_fde, rtol=1e-5)


def test_semantic_channel_mismatch_fails_fast(tmp_path, dataset):
    """n_semantic_classes not matching the actual semantic-map channels
    must raise an actionable error, not an opaque conv-shape failure deep
    in the (packed) encoder."""
    df_train, df_val, df_test, images = dataset
    params = make_params(tmp_path, n_semantic_classes=6)  # images are RGB
    exp = Experiment(params, images=images)
    with pytest.raises(ValueError, match="n_semantic_classes"):
        exp.test(df_test, None)


class _BoomOnPull:
    """Array stand-in whose host conversion raises like an async-runtime
    OOM surfacing at pull time."""

    def __array__(self, *a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: fake pull OOM")


def test_eval_oom_at_pull_retries_current_rung_first(tmp_path, dataset,
                                                     monkeypatch):
    """A pull-time OOM first re-dispatches the batch at the CURRENT chunk
    (a pipelined batch may predate an earlier shrink); the ladder only
    drops a rung if that retry also exhausts memory."""
    from mst_tpu.train import steps as steps_lib

    df_train, df_val, df_test, images = dataset
    params = make_params(tmp_path, n_goal=6)
    exp = Experiment(params, images=images)
    want_ade, want_fde, _, _ = exp.test(df_test, None)

    real_make = steps_lib.make_eval_step
    built_kcs = []
    state = {"boomed": False}

    def fake_make(mcfg, scfg, **kw):
        built_kcs.append(scfg.eval_k_chunk)
        step = real_make(mcfg, scfg, **kw)

        def wrapped(*a, **k):
            out = dict(step(*a, **k))
            if not state["boomed"]:  # first pull of the run OOMs once
                state["boomed"] = True
                out["mask"] = _BoomOnPull()
            return out

        return wrapped

    monkeypatch.setattr(steps_lib, "cached_eval_step", fake_make)
    exp2 = Experiment(params, images=images)
    exp2.model_params = exp.model_params
    exp2.model_state = exp.model_state
    ade, fde, _, _ = exp2.test(df_test, None)
    monkeypatch.undo()
    # retry at the current rung succeeded -> the ladder never shrank
    assert built_kcs == [0]
    np.testing.assert_allclose(ade, want_ade, rtol=1e-5)
    np.testing.assert_allclose(fde, want_fde, rtol=1e-5)


def test_eval_oom_at_pull_walks_whole_ladder(tmp_path, dataset,
                                             monkeypatch):
    """Persistent pull-time OOMs at the full-K chunk walk the shrink
    ladder (not just one rung) until a chunk fits."""
    from mst_tpu.train import steps as steps_lib

    df_train, df_val, df_test, images = dataset
    params = make_params(tmp_path, n_goal=6)  # ladder 6 -> 3 -> 2 -> 1
    exp = Experiment(params, images=images)
    want_ade, want_fde, _, _ = exp.test(df_test, None)

    real_make = steps_lib.make_eval_step
    built_kcs = []

    def fake_make(mcfg, scfg, **kw):
        built_kcs.append(scfg.eval_k_chunk)
        step = real_make(mcfg, scfg, **kw)
        if scfg.eval_k_chunk in (0, 3):  # kc=all-K and kc=3 both "OOM"

            def oom_on_pull(*a, **k):
                out = dict(step(*a, **k))
                out["mask"] = _BoomOnPull()
                return out

            return oom_on_pull
        return step

    monkeypatch.setattr(steps_lib, "cached_eval_step", fake_make)
    exp2 = Experiment(params, images=images)
    exp2.model_params = exp.model_params
    exp2.model_state = exp.model_state
    ade, fde, _, _ = exp2.test(df_test, None)
    monkeypatch.undo()
    # walked two rungs, settled at kc=2 — and the still-pending batches
    # dispatched at the stale chunk retried at kc=2 WITHOUT shrinking more
    assert built_kcs == [0, 3, 2]
    np.testing.assert_allclose(ade, want_ade, rtol=1e-5)
    np.testing.assert_allclose(fde, want_fde, rtol=1e-5)


def test_eval_oom_fallback_exhausted_reraises(tmp_path, dataset,
                                              monkeypatch):
    """If no smaller chunk exists (kc=1 still OOMs), the original error
    propagates instead of looping."""
    import pytest as _pytest

    from mst_tpu.train import steps as steps_lib

    df_train, df_val, df_test, images = dataset
    params = make_params(tmp_path, n_goal=2)
    exp = Experiment(params, images=images)

    def always_oom(mcfg, scfg, **kw):
        def step(*a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: fake OOM")
        return step

    monkeypatch.setattr(steps_lib, "cached_eval_step", always_oom)
    with _pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        exp.test(df_test, None)
