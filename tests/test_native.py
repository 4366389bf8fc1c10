"""Native trajwin kernel vs the pandas reference pipeline."""

import numpy as np
import pandas as pd
import pytest

from mst_tpu.data import trajectories as T
from mst_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load_lib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    return lib


def _df(rng, n_tracks=7, max_len=60, gap_prob=0.1):
    rows = []
    for m in range(n_tracks):
        f = 0
        for _ in range(rng.integers(5, max_len)):
            rows.append(dict(metaId=m, frame=f, x=rng.uniform(0, 100),
                             y=rng.uniform(0, 100), sceneId="s", label="P"))
            f += 1 + (rng.uniform() < gap_prob) * rng.integers(1, 4)
    return pd.DataFrame(rows)


@pytest.mark.parametrize("split,step,window,stride", [
    (True, 2, 5, 5), (True, 3, 4, 2), (False, 2, 5, 5), (True, 1, 8, 8),
])
def test_matches_pandas_pipeline(lib, rng, split, step, window, stride):
    df = _df(rng)
    want = df.copy()
    if split:
        want = T.split_fragmented(want)
    want = T.downsample(want, step)
    want = T.filter_short_trajectories(want, window)
    want = T.sliding_window(want, window, stride)

    got = native.load_and_window_native(df, step, window, stride,
                                        split_fragments=split)
    assert got is not None
    assert len(got) == len(want)
    np.testing.assert_array_equal(got.metaId.to_numpy(),
                                  want.metaId.to_numpy())
    np.testing.assert_allclose(got.x.to_numpy(), want.x.to_numpy())
    np.testing.assert_array_equal(got.frame.to_numpy(),
                                  want.frame.to_numpy())


def test_gather_xy(lib, rng):
    x = rng.uniform(size=100)
    y = rng.uniform(size=100)
    idx = rng.integers(0, 100, size=(6, 10))
    got = native.gather_xy(x, y, idx)
    want = np.stack([x[idx], y[idx]], axis=-1).astype(np.float32)
    np.testing.assert_allclose(got, want)


def test_speedup_at_scale(lib, rng):
    """The native path should beat pandas comfortably on a large table."""
    import time

    n_tracks, track_len = 400, 120
    meta = np.repeat(np.arange(n_tracks), track_len)
    frame = np.tile(np.arange(track_len), n_tracks)
    df = pd.DataFrame({"metaId": meta, "frame": frame,
                       "x": rng.uniform(size=len(meta)),
                       "y": rng.uniform(size=len(meta)),
                       "sceneId": "s", "label": "P"})
    meta_arr = df["metaId"].to_numpy()
    frame_arr = df["frame"].to_numpy()
    native.window_trajectories(meta_arr, frame_arr, 2, 20, 20)  # warm .so
    t0 = time.perf_counter()
    native.window_trajectories(meta_arr, frame_arr, 2, 20, 20)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    T.sliding_window(T.filter_short_trajectories(
        T.downsample(T.split_fragmented(df), 2), 20), 20, 20)
    t_pandas = time.perf_counter() - t0
    # the kernel itself (index extraction) should win by a wide margin;
    # 2x headroom keeps the test robust under load
    assert t_native * 2 < t_pandas, (t_native, t_pandas)
