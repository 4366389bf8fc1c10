"""Variation-factor analysis tail: long-tail filters, distribution figures,
scene-balanced group equalization, and the small split helpers — each checked
against the ACTUAL reference implementation (tests/reference_loader.py) where
one exists.

Reference anchors: utils/data_utils.py:367-374 (convert_df_to_dict),
:468-517 (reduce_group_size), :542-753 (plot family + filters),
:816-820 (dataset_split_given_scenes); utils/dataloader.py:53-56
(separate_data_label).
"""

import copy
import os

import numpy as np
import pandas as pd
import pytest

from mst_tpu.data import splits, trajectories
from mst_tpu.evaluator import varf_viz
from tests.reference_loader import load_reference


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _group_dict(rng, n=60, n_scene=4, labels=("Pedestrian", "Biker")):
    """A style-group dict like convert_df_to_dict emits: one entry per
    unique trajectory."""
    scene_ids = [f"scene{i}_0" for i in range(n_scene)]
    # uneven scene sizes so the water-fill has real work to do
    weights = rng.dirichlet(np.ones(n_scene) * 0.7)
    scenes = rng.choice(scene_ids, size=n, p=weights)
    return {
        "metaId": list(range(n)),
        "sceneId": list(scenes),
        "label": list(rng.choice(labels, size=n)),
    }


def _windowed_df(rng, n_meta=24, length=5, n_scene=3):
    rows = []
    for m in range(n_meta):
        scene = f"scene{m % n_scene}_0"
        label = ["Pedestrian", "Biker"][m % 2]
        for t in range(length):
            rows.append((m, t, 10.0 * m + t + rng.normal(),
                         5.0 * m - t, scene, label))
    return pd.DataFrame(
        rows, columns=["metaId", "frame", "x", "y", "sceneId", "label"])


def _varf_table(rng, n=80):
    df = pd.DataFrame({
        "metaId": np.arange(n),
        "label": rng.choice(["Pedestrian", "Biker", "Cart"], size=n),
        "sceneId": rng.choice(["hyang_0", "coupa_1", "quad_2"], size=n),
        "avg_vel": np.abs(rng.normal(2.0, 1.0, size=n)),
        "max_acc": np.abs(rng.normal(1.0, 0.5, size=n)),
    })
    df["scene"] = df.sceneId.str.split("_").str[0]
    return df


class TestLongTailFilters:
    def test_arr_matches_reference(self, ref):
        rng = np.random.default_rng(0)
        arr = rng.normal(5.0, 2.0, size=300)
        arr[::17] = 0.0
        arr[5] = np.nan
        arr[9] = np.inf
        got, got_stats = varf_viz.filter_long_tail_arr(arr.copy())
        want, want_stats = ref.data_utils.filter_long_tail_arr(arr.copy())
        np.testing.assert_array_equal(got, want)
        assert tuple(got_stats) == tuple(want_stats)

    def test_series_matches_reference(self, ref):
        rng = np.random.default_rng(1)
        s = pd.Series(rng.normal(3.0, 1.5, size=200),
                      index=np.arange(1000, 1200))
        s.iloc[::23] = 0.0
        s.iloc[3] = np.inf
        got = varf_viz.filter_long_tail_series(s.copy())
        want = ref.data_utils.filter_long_tail_series(s.copy())
        assert got.equals(want)

    def test_df_matches_reference(self, ref):
        rng = np.random.default_rng(2)
        df = _varf_table(rng)
        got, got_p = varf_viz.filter_long_tail_df(
            df.copy(), ["avg_vel", "max_acc"])
        want, want_p = ref.data_utils.filter_long_tail_df(
            df.copy(), ["avg_vel", "max_acc"])
        pd.testing.assert_frame_equal(got, want)
        assert got_p == want_p

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            varf_viz.filter_long_tail_arr(np.array([np.nan, np.inf]))


class TestVarfFigures:
    def test_histogram_families(self, tmp_path, ref):
        rng = np.random.default_rng(3)
        df = _varf_table(rng)
        paths = varf_viz.plot_varf_histograms(
            df[["metaId", "label", "sceneId", "scene", "avg_vel"]],
            str(tmp_path))
        names = {os.path.basename(p) for p in paths}
        # same filenames as the reference family (data_utils.py:542-552)
        assert names == {"Pedestrian_avg_vel.png", "Biker_avg_vel.png",
                         "Mixed_avg_vel.png"}
        assert all(os.path.getsize(p) > 0 for p in paths)

    def test_obs_and_complete(self, tmp_path):
        rng = np.random.default_rng(4)
        df = _varf_table(rng)
        df["avg_vel_obs"] = df["avg_vel"] * 1.1
        df = df[["metaId", "label", "scene", "avg_vel_obs", "avg_vel"]]
        paths = varf_viz.plot_varf_hist_obs_and_complete(df, str(tmp_path))
        names = {os.path.basename(p) for p in paths}
        assert "Mixed_avg_vel_obs_element_diff.png" in names
        assert "Mixed_avg_vel_obs_distr_diff.png" in names

    @pytest.mark.parametrize("label", ["Mixed", "All", "Pedestrian"])
    def test_pairplot(self, tmp_path, label):
        rng = np.random.default_rng(5)
        df = _varf_table(rng)
        path = varf_viz.plot_pairplot(df, ["avg_vel", "max_acc"], label,
                                      "varf", str(tmp_path), kind="scatter")
        assert os.path.exists(path) and label in os.path.basename(path)

    def test_jointplot(self, tmp_path):
        rng = np.random.default_rng(6)
        df = _varf_table(rng)
        paths = varf_viz.plot_jointplot(df, ["avg_vel", "max_acc"], "Mixed",
                                        "varf", str(tmp_path), hue="scene",
                                        kind="scatter")
        assert len(paths) == 1 and os.path.exists(paths[0])

    def test_figure_level_plots_close_their_figures(self, tmp_path):
        """seaborn's pairplot/jointplot open their OWN figure; both must be
        closed after saving or long analysis sweeps leak figures (the
        reference leaks them, data_utils.py:628-629)."""
        import matplotlib.pyplot as plt

        plt.close("all")
        rng = np.random.default_rng(13)
        df = _varf_table(rng)
        varf_viz.plot_pairplot(df, ["avg_vel", "max_acc"], "All", "t",
                               str(tmp_path), kind="scatter")
        varf_viz.plot_jointplot(df, ["avg_vel", "max_acc"], "All", "t",
                                str(tmp_path), hue="scene", kind="scatter")
        assert plt.get_fignums() == []

    def test_jointplot_kde_fallback_is_per_pair(self, tmp_path,
                                                monkeypatch):
        """One singular KDE pair must not downgrade later pairs to scatter
        (deviation from the reference, whose `kind` mutation sticks —
        data_utils.py:648)."""
        import seaborn as sns

        rng = np.random.default_rng(14)
        df = _varf_table(rng)
        df["avg_den"] = np.abs(rng.normal(3.0, 1.0, size=len(df)))
        real = sns.jointplot
        calls = {"n": 0}

        def flaky(*a, **kw):
            calls["n"] += 1
            if calls["n"] == 1 and kw.get("kind") == "kde":
                raise np.linalg.LinAlgError("singular")
            return real(*a, **{**kw, "kind": "scatter"})

        monkeypatch.setattr(sns, "jointplot", flaky)
        paths = varf_viz.plot_jointplot(
            df, ["avg_vel", "max_acc", "avg_den"], "All", "t",
            str(tmp_path), hue="scene", kind="kde")
        names = [os.path.basename(p) for p in paths]
        assert "_scatter_" in names[0]          # pair 1 fell back
        assert all("_kde_" in n for n in names[1:])  # later pairs kept kde

    def test_scene_grid_excludes_quad(self, tmp_path):
        rng = np.random.default_rng(7)
        df = _varf_table(rng)
        path = varf_viz.plot_scene_w_numeric(df, "avg_vel", "sdd",
                                             str(tmp_path))
        assert os.path.exists(path)
        assert "noquad" in os.path.basename(path)


class TestGroupEqualization:
    def test_convert_df_to_dict_matches_reference(self, ref):
        rng = np.random.default_rng(8)
        df = _windowed_df(rng)
        got = trajectories.convert_df_to_dict(df.groupby("label"))
        want = ref.data_utils.convert_df_to_dict(df.groupby("label"))
        assert got.keys() == want.keys()
        for k in got:
            assert got[k] == want[k]

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("min_frac", [0.3, 0.6, 0.95])
    def test_reduce_group_size_matches_reference(self, ref, seed, min_frac):
        rng = np.random.default_rng(seed)
        group = _group_dict(rng)
        min_n = max(1, int(min_frac * len(group["metaId"])))
        got = trajectories.reduce_group_size(
            copy.deepcopy(group), "g", min_n)
        # the reference mutates its group dict; hand it its own deep copy
        want = ref.data_utils.reduce_group_size(
            copy.deepcopy(group), "g", min_n)
        np.testing.assert_array_equal(got, np.asarray(want))
        assert got.sum() == min_n

    def test_same_group_size_builder(self, tmp_path, rng=None):
        rng = np.random.default_rng(9)
        df = _windowed_df(rng, n_meta=30)
        out = tmp_path / "agent_type"
        trajectories.create_dataset_by_agent_type(
            df, ["Pedestrian", "Biker"], str(out), same_group_size=True)
        sizes = {f: pd.read_pickle(out / f).metaId.nunique()
                 for f in os.listdir(out)}
        assert set(sizes) == {"Pedestrian.pkl", "Biker.pkl"}
        assert len(set(sizes.values())) == 1  # equalized

    def test_same_group_size_with_no_matching_labels(self, tmp_path):
        rng = np.random.default_rng(15)
        df = _windowed_df(rng)
        out = tmp_path / "empty"
        trajectories.create_dataset_by_agent_type(
            df, ["Cartwheel"], str(out), same_group_size=True)
        assert os.listdir(out) == []

    def test_statistic_only_prints_and_writes_nothing(self, tmp_path,
                                                      capsys):
        rng = np.random.default_rng(10)
        df = _windowed_df(rng)
        out = tmp_path / "stats"
        trajectories.create_dataset_by_agent_type(
            df, ["Pedestrian", "Biker"], str(out), statistic_only=True)
        captured = capsys.readouterr().out
        assert "Statistics:" in captured and "# total:" in captured
        assert os.listdir(out) == []


class TestSplitHelpers:
    def test_dataset_split_given_scenes(self, tmp_path, ref):
        rng = np.random.default_rng(11)
        df = _windowed_df(rng)
        df.to_pickle(tmp_path / "a.pkl")
        got = splits.dataset_split_given_scenes(
            str(tmp_path), ["a.pkl"], ["scene0_0", "scene2_0"])
        want = ref.data_utils.dataset_split_given_scenes(
            str(tmp_path), ["a.pkl"], ["scene0_0", "scene2_0"])
        pd.testing.assert_frame_equal(got, want)

    def test_separate_data_label(self):
        rng = np.random.default_rng(12)
        df = _windowed_df(rng)
        df["vel_range"] = np.where(df.metaId % 2 == 0, "0.5_3.5", "4_8")
        parts = splits.separate_data_label(df)
        assert [p.vel_range.unique().tolist() for p in parts] == \
            [["0.5_3.5"], ["4_8"]]
        assert sum(len(p) for p in parts) == len(df)


class TestFilterByVarfTable:
    """filter_by_varf_table vs the reference's filter_by_avg_vel
    (reference utils/filter_dataset.py:5-18), incl. the one-sided-bound
    cases the preprocessing pipelines use (--lower_bound 0.2 only)."""

    @pytest.mark.parametrize("bounds", [(0.2, None), (None, 3.0),
                                        (0.5, 2.5), (None, None)])
    def test_matches_reference(self, tmp_path, ref, bounds):
        rng = np.random.default_rng(13)
        df = _windowed_df(rng, n_meta=30)
        varf = pd.DataFrame({
            "metaId": np.arange(40),  # superset of the data's ids
            "avg_vel": rng.uniform(0, 4, size=40),
        })
        lower, upper = bounds
        for sub, fn in (("got", None), ("want", None)):
            d = tmp_path / sub
            d.mkdir()
            df.to_pickle(d / "data.pkl")
            varf.to_pickle(d / "varf.pkl")
        splits.filter_by_varf_table(
            str(tmp_path / "got" / "data.pkl"),
            str(tmp_path / "got" / "varf.pkl"), lower, upper)
        ref.filter_dataset.filter_by_avg_vel(
            str(tmp_path / "want" / "data.pkl"),
            str(tmp_path / "want" / "varf.pkl"), lower, upper)
        got = pd.read_pickle(tmp_path / "got" / "data_filter.pkl")
        want = pd.read_pickle(tmp_path / "want" / "data_filter.pkl")
        pd.testing.assert_frame_equal(got, want)
        if lower is not None and upper is not None:
            kept = varf[(varf.avg_vel >= lower) & (varf.avg_vel <= upper)]
            assert set(got.metaId) == set(kept.metaId) & set(df.metaId)
