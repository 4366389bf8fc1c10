"""Analysis-tool tests: comparator, importance ablations, log scraping,
plots — on the synthetic dataset with tiny models."""

import os

import numpy as np
import pandas as pd
import pytest

from mst_tpu import config as config_lib
from mst_tpu.data.synthetic import make_synthetic_dataset
from mst_tpu.train.trainer import Experiment

TOTAL_LEN = 12


def _params(tmp_path, **over):
    p = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0, n_goal=4,
        n_traj=1, batch_size=4, lr=1e-3, n_epoch=1, dataset_name="sdd",
        ckpt_path=str(tmp_path), train_net="train", network="original",
        n_round=2, seed=1, segmentation_model_fp=None))
    p.update(over)
    return p


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("eval_tools")
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=8,
                                        total_len=TOTAL_LEN)
    base = Experiment(_params(tmp), images=images)
    base_path = str(tmp / "base.npz")
    base.save_params(base_path, train_net="train")

    ft_params = _params(tmp, train_net="mosa_2", position=["0", "1"])
    ft = Experiment(ft_params, images=images)
    ft.load_params(base_path)
    # perturb a LoRA factor so tuned != base
    lb = ft.model_params["encoder"]["stages"]["0"]["conv0"]["lora_B"]
    ft.model_params["encoder"]["stages"]["0"]["conv0"]["lora_B"] = lb + 0.05
    delta_path = str(tmp / "delta.npz")
    ft.save_params(delta_path)
    return tmp, df, images, base_path, delta_path, ft_params


def test_compare_checkpoints(setup):
    from mst_tpu.evaluator.multickpts import compare_checkpoints

    tmp, df, images, base_path, delta_path, ft_params = setup
    df_result, trajs = compare_checkpoints(
        ft_params, df, None, [base_path, delta_path],
        ["OODG", "mosa_2(8)"], [False, True], n_round=2, seed=1,
        out_dir=str(tmp / "csv"), images=images)
    assert {"metaId", "sceneId", "ade_OODG", "fde_OODG",
            "ade_mosa_2(8)", "fde_mosa_2(8)"} <= set(df_result.columns)
    assert df_result.metaId.nunique() == df.metaId.nunique()
    import os
    assert any(f.endswith(".csv") for f in os.listdir(tmp / "csv"))


def test_lora_importance(setup):
    from mst_tpu.evaluator.importance import lora_importance

    tmp, df, images, base_path, delta_path, ft_params = setup
    model = Experiment(dict(ft_params, n_round=1), images=images)
    model.load_separated_params(base_path, delta_path)
    out = lora_importance(model, df, None, max_combo=1)
    assert set(out.columns) == {"zeroed", "ade", "fde"}
    # none + 2 single layers... (stage 0 has 1 conv, stage 1 has 2) + all
    assert (out.zeroed == "none").any() and (out.zeroed == "all").any()
    assert np.isfinite(out.ade).all()


def test_swap_importance(setup):
    from mst_tpu.evaluator.importance import swap_importance
    from mst_tpu.train.checkpoints import flatten_tree, load_checkpoint

    tmp, df, images, base_path, delta_path, ft_params = setup
    model = Experiment(dict(ft_params, n_round=1), images=images)
    model.load_separated_params(base_path, delta_path)
    tuned = flatten_tree(model.model_params)
    pretrained = dict(tuned)
    for k in pretrained:
        if "lora" in k:
            pretrained[k] = np.zeros_like(pretrained[k])
    out = swap_importance(model, df, None, pretrained, tuned, depth=1)
    assert {"group", "n_param", "ade", "fde"} <= set(out.columns)
    assert len(out) >= 3
    # n_param counts the SWAPPED group's parameters, not the whole model
    by_group = out.set_index("group").n_param
    assert by_group["none"] == 0
    total = sum(int(np.asarray(v).size) for v in tuned.values())
    assert 0 < by_group["encoder"] < total
    assert by_group["all"] == total  # every path swapped at depth 1
    # the swap must preserve subtrees absent from the flat checkpoints
    assert isinstance(model.model_params, dict)


def test_compare_checkpoints_viz(setup):
    from mst_tpu.evaluator.multickpts import (compare_checkpoints,
                                              plot_prediction_overlays)

    tmp, df, images, base_path, delta_path, ft_params = setup
    df_result, trajs = compare_checkpoints(
        ft_params, df, None, [base_path, delta_path],
        ["OODG", "mosa_2(8)"], [False, True], n_round=1, seed=1,
        images=images)
    out_dir = str(tmp / "viz")
    plot_prediction_overlays(df_result, trajs, images, ft_params,
                             out_dir=out_dir)
    import os
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == df.sceneId.nunique()


def test_log_scrapers():
    from mst_tpu.evaluator.logs import (
        extract_epoch_curve,
        extract_test_metrics,
        extract_train_metrics,
    )

    text = (
        "Experiment Seed_1__x__mosa_1__original has started\n"
        "The number of trainable parameters: 123\n"
        "Epoch 0: \tTrain (Top-1) ADE: 10.50 FDE: 20.25 \t\t"
        "Val (Top-k) ADE: 9.00 FDE: 15.00\n"
        "Early stop at epoch 7\n"
        "Average performance (by 3): \nTest ADE: 32.5 \nTest FDE: 60.125\n")
    t = extract_test_metrics(text)
    assert t.iloc[0].ade == 32.5 and t.iloc[0].fde == 60.125
    tr = extract_train_metrics(text)
    assert tr.iloc[0].n_param == 123 and tr.iloc[0].n_epoch == 7
    c = extract_epoch_curve(text)
    assert c.iloc[0].val_ade == 9.0


def test_metrics_logger(tmp_path):
    from mst_tpu.evaluator.logs import MetricsLogger

    log = MetricsLogger(tmp_path / "m.jsonl")
    log.log(step=1, loss=2.0)
    log.log(step=2, loss=1.5)
    df = log.read()
    assert list(df.step) == [1, 2]


def test_plots(tmp_path, rng):
    from mst_tpu.evaluator import visualization as viz

    df = pd.DataFrame({
        "n_train": [10, 10, 30, 30], "train_net": ["mosa"] * 4,
        "ade": [5.0, 5.5, 4.0, 4.2]})
    p1 = viz.plot_fewshot_curves(df, str(tmp_path))
    img = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    trajs = rng.uniform(5, 60, size=(3, 12, 2))
    p2 = viz.plot_trajectories_on_scene(img, trajs, str(tmp_path), "scene",
                                        obs_len=4, preds=trajs + 2)
    p3 = viz.plot_goal_map(rng.uniform(size=(32, 32)), str(tmp_path), "gm",
                           points=[[4, 5], [10, 12]])
    imp = pd.DataFrame({"group": ["none", "a", "b"],
                        "ade": [5.0, 6.0, 5.2]})
    p4 = viz.plot_importance(imp, str(tmp_path))
    p5 = viz.plot_training_curves([5, 4, 3], [9, 8, 7], str(tmp_path))
    p6 = viz.plot_input_space(rng.uniform(size=(32, 32, 3)),
                              rng.uniform(size=(32, 32, 4)), str(tmp_path))
    import os
    for p in (p1, p2, p3, p4, p5, p6):
        assert os.path.exists(p)


def test_forward_test_probe(tmp_path):
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=4,
                                        total_len=TOTAL_LEN)
    exp = Experiment(_params(tmp_path), images=images)
    gl, tl, sem = exp.forward_test(df, None, set_input=(), decision="loss")
    assert np.isfinite(float(gl)) and np.isfinite(float(tl))
    gm, tm, sem = exp.forward_test(df, None, set_input=("semantic",),
                                   noisy_std_frac=0.05, decision="map")
    assert gm.shape[-1] == 8 and np.isfinite(np.asarray(gm)).all()


def test_forward_test_input_grads(tmp_path):
    """Saliency path: grads of the probe loss wrt scene / semantic / traj
    inputs (reference trainer.py:468-484 requires_grad semantics)."""
    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=4,
                                        total_len=TOTAL_LEN)
    exp = Experiment(_params(tmp_path), images=images)
    gl, tl, sem, grads = exp.forward_test(
        df, None, set_input=("scene", "semantic", "traj"),
        decision="loss", input_grads=True)
    assert set(grads) == {"scene", "semantic", "traj"}
    for name, g in grads.items():
        assert np.isfinite(g).all(), name
        assert np.abs(g).sum() > 0, name
    # identity backbone: scene and semantic grads agree
    np.testing.assert_allclose(grads["scene"], grads["semantic"],
                               rtol=1e-5, atol=1e-7)


def test_saliency_and_new_plot_families(tmp_path):
    from mst_tpu.evaluator import visualization as viz

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(48, 64, 3)).astype(np.float32)

    # saliency
    grad = rng.normal(size=(1, 48, 64, 3)).astype(np.float32)
    ps = viz.plot_saliency_maps(img[None], grad, "loss saliency", "sal",
                                out_dir=str(tmp_path / "sal"),
                                best_point=(10, 12))
    # feature space (+ diff evolution)
    feats = {
        ckpt: {"scene": {
            "encoder_0": rng.normal(size=(2, 16, 16, 4)).astype(np.float32),
            "goal_decoder_0": rng.normal(
                size=(2, 8, 8, 4)).astype(np.float32),
            "metaId": [11, 22]}}
        for ckpt in ("OODG", "FT")}
    pf = viz.plot_feature_space(feats, out_dir=str(tmp_path / "fs"))
    pfe, csv_path = viz.plot_feature_space_diff_evolution(
        feats, out_dir=str(tmp_path / "fsd"))
    pd_ov = viz.plot_decoder_overlay(img, feats,
                                     out_dir=str(tmp_path / "dec"))
    # filters
    params = {"encoder": {"stages": {"0": {"conv0": {
        "weight": rng.normal(size=(3, 3, 4, 6)).astype(np.float32),
        "bias": np.zeros(6, np.float32)}}}}}
    params2 = {"encoder": {"stages": {"0": {"conv0": {
        "weight": params["encoder"]["stages"]["0"]["conv0"]["weight"] + 0.1,
        "bias": np.ones(6, np.float32)}}}}}
    pflt = viz.plot_filters({"OODG": params, "FT": params2},
                            out_dir=str(tmp_path / "filters"))
    pfd = viz.plot_filters_diff_evolution(
        {"OODG": params, "FT": params2}, out_dir=str(tmp_path / "fd"))
    # activations
    pact = viz.plot_activation(
        {"encoder/0": rng.normal(size=(1, 16, 16, 4))},
        out_dir=str(tmp_path / "act"), scene_img=img)
    # overlays
    gt = np.cumsum(rng.normal(size=(3, TOTAL_LEN, 2)), 1) + 20
    po = viz.plot_obs_pred_trajs(
        img, {"gt": gt, "FT": gt[:, 4:] + 1.0},
        out_dir=str(tmp_path / "pred"), obs_len=4)
    pm = viz.plot_multiple_predictions(
        img, gt[0], gt[None, 0, 4:] + rng.normal(size=(5, 8, 2)),
        out_dir=str(tmp_path / "pred"), obs_len=4)
    pg = viz.plot_goal_map_with_samples(
        img, rng.uniform(size=(48, 64)), {"FT": rng.uniform(0, 40, (4, 2))},
        out_dir=str(tmp_path / "goal"))
    dfp = pd.DataFrame({"x": rng.uniform(0, 64, 20),
                        "y": rng.uniform(0, 48, 20),
                        "metaId": np.repeat([1, 2], 10)})
    pov = viz.plot_trajectories_scenes_overlay(
        img, dfp, dfp, out_dir=str(tmp_path / "ov"))

    import os
    flat = (list(ps) + list(pf) + [pfe, csv_path] + list(pd_ov) + list(pflt)
            + list(pfd) + list(pact) + [po, pm, pg, pov])
    assert flat and all(os.path.exists(p) for p in flat)


def test_create_few_shot_plot_from_csv_tree(tmp_path):
    from mst_tpu.evaluator import visualization as viz

    results = tmp_path / "csv" / "exp" / "mosa" / "eval"
    for seed in ("1", "2"):
        for num, ade in ((10, 3.0), (20, 2.5)):
            d = results / "mosa_2" / seed
            d.mkdir(parents=True, exist_ok=True)
            pd.DataFrame({"ade": [ade + 0.1 * int(seed)]}).to_csv(
                d / f"{num}.csv", index=False)
    p = viz.create_few_shot_plot(str(results), str(tmp_path / "figs"))
    import os
    assert os.path.exists(p)


def test_training_curve_extraction_and_plot(tmp_path):
    from mst_tpu.evaluator import curves

    def fake_run(name, seed, n, ade, fde):
        lines = [f"Experiment {name} has started"]
        for e in range(n):
            lines.append(
                f"Epoch {e}: \tTrain (Top-1) ADE: {10 - 0.1 * e:.2f} "
                f"FDE: {12 - 0.1 * e:.2f} \t\tVal (Top-k) "
                f"ADE: {9 - 0.05 * e:.2f} FDE: {11 - 0.05 * e:.2f}")
        lines.append(f"Best epoch at {n - 2}")
        lines.append(f"Average performance (by 3): \nTest ADE: {ade} "
                     f"\nTest FDE: {fde}")
        return "\n".join(lines)

    log = "\n".join([
        fake_run("Seed_1__filter_synth__mosa_2__Pos_0_1__TrN_20__lr_0.003",
                 1, 12, 5.31, 9.87),
        fake_run("Seed_2__filter_synth__train__TrN_40__lr_0.0005",
                 2, 15, 4.9, 9.1)])
    log_path = tmp_path / "train.out"
    log_path.write_text(log)

    runs = curves.split_runs(log)
    assert len(runs) == 2
    assert runs[0]["seed"] == 1 and runs[0]["ade"] == 5.31
    assert runs[0]["position"] == "0_1"
    assert len(runs[0]["curve"]) == 12 and runs[1]["n_train"] == 40

    out, runs2 = curves.extract_and_plot(
        [str(log_path)], str(tmp_path / "curve.png"), val_window=5,
        show_raw_val=True, show_train=True)
    import os
    assert os.path.exists(out) and len(runs2) == 2

    # history-mode moving average: trailing window
    ma = curves.moving_average(np.arange(10.0), 3, box_loc="history")
    np.testing.assert_allclose(ma[4], np.mean([2.0, 3.0, 4.0]))


def test_swap_importance_numeric_oracle(setup):
    """Oracle for the swap deltas (not just smoke): when tuned differs
    from pretrained in exactly ONE group, swapping that group must equal
    the pretrained model's own eval, and swapping any other group must
    equal the tuned eval bitwise (same seed, deterministic device eval)."""
    from mst_tpu.evaluator.importance import swap_importance
    from mst_tpu.train.checkpoints import unflatten_dict
    from mst_tpu.train.checkpoints import flatten_tree
    from mst_tpu.utils.seeding import set_random_seeds

    tmp, df, images, base_path, delta_path, ft_params = setup
    model = Experiment(dict(ft_params, n_round=1), images=images)
    model.load_separated_params(base_path, delta_path)
    tuned = flatten_tree(model.model_params)

    # pretrained differs ONLY in group 'traj_decoder' (perturb predictor)
    pretrained = dict(tuned)
    target_keys = [k for k in tuned if k.startswith("traj_decoder/")]
    for k in target_keys:
        pretrained[k] = np.asarray(tuned[k]) + 0.01

    # direct evals of both endpoints (same seed as swap_importance uses)
    model.model_params = unflatten_dict(dict(tuned))
    set_random_seeds(1)
    ade_tuned, fde_tuned, _, _ = model.test(df, None)
    model.model_params = unflatten_dict(dict(pretrained))
    set_random_seeds(1)
    ade_pre, fde_pre, _, _ = model.test(df, None)
    assert ade_pre != ade_tuned  # the perturbation must matter

    model.model_params = unflatten_dict(dict(tuned))
    out = swap_importance(model, df, None, pretrained, tuned, depth=1,
                          seed=1)
    by_group = out.set_index("group")
    # baseline row == tuned eval; 'all' row == pretrained eval
    assert by_group.loc["none", "ade"] == ade_tuned
    assert by_group.loc["all", "ade"] == ade_pre
    # swapped goal_decoder == pretrained eval exactly
    assert by_group.loc["traj_decoder", "ade"] == ade_pre
    assert by_group.loc["traj_decoder", "fde"] == fde_pre
    # every other group swap changes nothing
    others = [g for g in by_group.index
              if g not in ("none", "all", "traj_decoder")]
    assert others
    for g in others:
        assert by_group.loc[g, "ade"] == ade_tuned, g


class TestGoalOutputFigures:
    """plot_goal_output family (reference visualization.py:128-257,576-611)."""

    def test_hollow_cmap_transparent_middle(self):
        from mst_tpu.evaluator.visualization import get_hollow_cmap
        cmap = get_hollow_cmap(0.2)
        assert cmap.N == 256
        colors = cmap(np.linspace(0, 1, 256))
        # the |x| < threshold band is fully transparent...
        assert (colors[120:136, 3] == 0).all()
        # ...and the extremes are the most opaque of their wing
        assert colors[0, 3] > 0.5 and colors[-1, 3] > 0.5

    def test_hollow_cmap_rejects_bandwidth_half_or_more(self):
        # >= 0.5 leaves no colored wings (n_color <= 0): a clear error
        # instead of matplotlib's opaque resample failure / blank figures
        import pytest

        from mst_tpu.evaluator.visualization import get_hollow_cmap
        with pytest.raises(ValueError, match="inhance_threshold"):
            get_hollow_cmap(0.5)
        with pytest.raises(ValueError, match="inhance_threshold"):
            get_hollow_cmap(0.6)
        with pytest.raises(ValueError, match="inhance_threshold"):
            get_hollow_cmap(-0.1)

    def test_ordinary_cmap_diverges(self):
        from mst_tpu.evaluator.visualization import get_ordinary_cmap
        colors = get_ordinary_cmap()(np.linspace(0, 1, 256))
        # Blues_r half then Oranges half, fully opaque
        assert (colors[:, 3] == 1).all()
        assert colors[40, 2] > colors[40, 0]   # blue wing
        assert colors[215, 0] > colors[215, 2]  # orange wing

    def test_adjust_cmap_band(self):
        import matplotlib as mpl
        from mst_tpu.evaluator.visualization import adjust_cmap
        cmap = adjust_cmap(mpl.colormaps["viridis"], 0.1)
        colors = cmap(np.linspace(0, 1, 256))
        assert (colors[118:138, 3] == 0).all()
        assert colors[0, 3] == 1 and colors[-1, 3] == 1

    def test_plot_goal_output_writes_figures(self, tmp_path):
        from mst_tpu.evaluator.visualization import plot_goal_output
        rng = np.random.default_rng(0)
        hooks = {
            name: {"goal_decoder.predictor_output":
                   rng.normal(size=(2, 16, 24, 12)).astype(np.float32)}
            for name in ("OODG", "FT")
        }
        index = [(1, "scene_0"), (2, "scene_0")]
        df = pd.DataFrame({
            "metaId": np.repeat([1, 2], 20),
            "x": rng.uniform(0, 96, 40), "y": rng.uniform(0, 64, 40)})
        images = {"scene_0":
                  rng.uniform(0, 1, size=(64, 96, 3)).astype(np.float32)}
        paths = plot_goal_output(hooks, index, df, images, 0.25,
                                 out_dir=str(tmp_path))
        assert len(paths) == 2  # 2 samples x 1 non-base ckpt
        assert all(os.path.exists(p) for p in paths)
        assert "FT__goal_decoder.predictor_output__diff_single__scene" in \
            paths[0]
        # hollow single-panel variant with window zoom
        paths2 = plot_goal_output(
            hooks, index, df, images, 0.25, out_dir=str(tmp_path),
            display_scene_img=False, inhance_threshold=0.1,
            window=(50, 30, 40, 0.8, "portrait"))
        assert len(paths2) == 2 and all(os.path.exists(p) for p in paths2)
        assert paths2[0].endswith("__0.1.png")

    def test_base_img_plot_semantic_classes(self):
        import matplotlib.pyplot as plt
        from mst_tpu.evaluator.visualization import base_img_plot
        sem = np.zeros((8, 10, 3), np.float32)
        sem[2, 2, 1] = 1.0
        sem[3, 3, 2] = 1.0
        fig, ax = plt.subplots()
        im = base_img_plot(ax, None, semantic_img=sem)
        arr = im.get_array()
        assert arr[2, 2] == 0.5 and arr[3, 3] == 0.0 and arr[0, 0] == 1.0
        plt.close(fig)


def test_activations_cli_goal_output(tmp_path, monkeypatch):
    """The activations CLI end-to-end with --goal_output: restores two
    checkpoints, captures activations through the real probe forward, and
    writes the per-sample goal-decoder diff figures (reference
    plot_goal_output, visualization.py:128-257)."""
    import glob
    import sys

    import cv2
    import yaml

    from mst_tpu.evaluator import activations as act_cli
    from mst_tpu.train.checkpoints import save_checkpoint

    df, images = make_synthetic_dataset(seed=0, n_scenes=1, n_traj=6,
                                        total_len=TOTAL_LEN,
                                        img_hw=(96, 128))
    root = tmp_path
    # on-disk world: config + images (use_raw_data False layout) + pkls
    ddir = root / "data" / "sdd" / "filter" / "synth"
    ddir.mkdir(parents=True)
    df.to_pickle(ddir / "test.pkl")
    df.to_pickle(ddir / "train.pkl")
    df.to_pickle(ddir / "val.pkl")
    img_dir = root / "data" / "sdd" / "raw" / "annotations" / "synth_0"
    img_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "reference.jpg"),
                (images["synth_0"] * 255).astype(np.uint8))
    cfg = dict(obs_len=4, pred_len=TOTAL_LEN - 4, waypoints=[7],
               n_semantic_classes=3, encoder_channels=[8, 8, 16, 16, 16],
               decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
               loss_scale=1000, resize_factor=0.25, temperature=1.0,
               n_goal=4, n_traj=1, use_raw_data=False,
               data_dir=str(root / "data") + "/", dataset_name="sdd")
    cfg_path = root / "synth_eval.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    # two tiny ckpts (different seeds -> nonzero diff maps)
    import jax

    from mst_tpu import config as config_lib
    from mst_tpu.models import ynet as ynet_lib

    params_dict = config_lib.get_params(
        config_filename=str(cfg_path),
        overrides=dict(segmentation_model_fp=None))
    mcfg = config_lib.ynet_config(params_dict)
    ckpts = []
    for seed in (0, 1):
        p, _ = ynet_lib.init_ynet(jax.random.PRNGKey(seed), mcfg)
        path = root / f"ckpt_{seed}.npz"
        save_checkpoint(str(path), p)
        ckpts.append(str(path))

    out_dir = root / "figs"
    monkeypatch.setattr(sys, "argv", [
        "activations", "--config_filename", str(cfg_path),
        "--seed", "1", "--batch_size", "4", "--dataset_path", "filter/synth",
        "--load_data", "predefined",
        "--ckpts", ckpts[0], ckpts[1], "--ckpts_name", "OODG", "FT",
        "--given_meta_ids", str(int(df.metaId.iloc[0])),
        "--out_dir", str(out_dir), "--goal_output",
        "--inhance_threshold", "0.1",
    ])
    act_cli.main()
    figs = glob.glob(str(out_dir / "**" / "*diff_single*"), recursive=True)
    assert figs, "no goal_output figures written"


def test_importance_csv_tree_and_analysis_plots(setup, tmp_path):
    """--per_traj_dir writes the reference-format per-trajectory csv tree
    (OODG/FT/FT__layer), and plot_importance_analysis turns it into the
    per-layer + per-scene ablation figures."""
    from mst_tpu.evaluator import visualization as viz
    from mst_tpu.evaluator.importance import swap_importance
    from mst_tpu.train.checkpoints import flatten_tree

    tmp, df, images, base_path, delta_path, ft_params = setup
    model = Experiment(dict(ft_params, n_round=1), images=images)
    model.load_separated_params(base_path, delta_path)
    tuned = flatten_tree(model.model_params)
    pretrained = dict(tuned)
    for k in pretrained:
        if "lora" in k:
            pretrained[k] = np.zeros_like(pretrained[k])
    tree_dir = tmp_path / "csv_tree"
    swap_importance(model, df, None, pretrained, tuned, depth=1,
                    per_traj_dir=str(tree_dir), tag="FT")
    n = df.metaId.nunique()
    files = sorted(f.name for f in tree_dir.glob("*.csv"))
    assert f"FT__N{n}.csv" in files and f"OODG__N{n}.csv" in files
    assert any(f.startswith(f"FT__N{n}__") for f in files)
    d = pd.read_csv(tree_dir / f"FT__N{n}.csv")
    assert {"metaId", "sceneId", "ade", "fde"} <= set(d.columns)

    paths = viz.plot_importance_analysis(str(tree_dir),
                                         out_dir=str(tmp_path / "figs"),
                                         n_test=n, depth=1)
    assert paths and all(os.path.exists(p) for p in paths)
    # the tree carries sceneId, so per-scene breakdowns are produced too
    assert any(os.sep + "scenes" + os.sep in p for p in paths)


def test_overlay_and_prediction_plot_drivers(tmp_path, rng):
    """plot_given_trajectories_scenes_overlay (label-colored per-scene
    batch) and plot_prediction (per-agent multi-checkpoint overlay)."""
    from mst_tpu.evaluator import visualization as viz

    images = {"s0": rng.uniform(size=(64, 80, 3)).astype(np.float32)}
    df = pd.DataFrame({
        "x": rng.uniform(0, 80, 40), "y": rng.uniform(0, 64, 40),
        "metaId": np.repeat(np.arange(4), 10),
        "sceneId": "s0",
        "label": np.repeat(["Pedestrian", "Biker"], 20),
    })
    p1 = viz.plot_given_trajectories_scenes_overlay(
        images, df, out_dir=str(tmp_path / "ov"))
    assert len(p1) == 1 and os.path.exists(p1[0])

    obs_len, pred_len = 4, 8
    gt = rng.uniform(0, 60, size=(2, obs_len + pred_len, 2))
    trajs = {name: {
        "metaId": np.array([7, 9]), "sceneId": np.array(["s0", "s0"]),
        "groundtruth": gt,
        "prediction": gt[:, obs_len:] + i,
    } for i, name in enumerate(["OODG", "FT"])}
    p2 = viz.plot_prediction(images, trajs, out_dir=str(tmp_path / "pred"),
                             obs_len=obs_len)
    assert len(p2) == 2 and all(os.path.exists(p) for p in p2)
