"""Native (C++) data-loader kernels with ctypes bindings.

`window_trajectories` fuses split_fragmented -> downsample -> filter_short ->
sliding_window into one linear scan (trajwin.cc); the pure-pandas path in
mst_tpu.data.trajectories remains the reference implementation and the
fallback when no compiler is available.
"""

import ctypes
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SO = _DIR / "libtrajwin.so"
_SRC = _DIR / "trajwin.cc"
_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO)]
    subprocess.run(cmd, check=True, capture_output=True)


def load_lib():
    """Load (building on first use) the native library, or None.

    A failed build is cached too (sentinel False) so per-call users don't
    re-spawn the compiler on every invocation of the numpy fallback."""
    global _lib
    if _lib is False:
        return None
    if _lib is not None:
        return _lib
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_SO))
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        _lib = False
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.trajwin_count.restype = ctypes.c_int64
    lib.trajwin_count.argtypes = [i64p, i64p, ctypes.c_int64,
                                  ctypes.c_int32, ctypes.c_int64,
                                  ctypes.c_int64, ctypes.c_int64]
    lib.trajwin_fill.restype = None
    lib.trajwin_fill.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64, i64p]
    lib.trajwin_gather_xy.restype = None
    lib.trajwin_gather_xy.argtypes = [f64p, f64p, i64p, ctypes.c_int64,
                                      ctypes.c_int64, f32p]
    _lib = lib
    return _lib


def _i64(a):
    return np.ascontiguousarray(a, np.int64)


def window_trajectories(meta_ids, frames, step, window_size, stride,
                        split_fragments=True):
    """One-pass window extraction.

    Args:
      meta_ids, frames: int arrays, rows grouped by metaId in appearance
        order, frames ascending within a group.
      step: downsample stride; window_size/stride: sliding-window params.
      split_fragments: start a new track at frame gaps (SDD yes, inD no).

    Returns:
      (row_indices (n_win, window_size) int64, n_win) — window w's rows, with
      new metaId == w (appearance-order factorization, identical to the
      pandas pipeline). Returns None if the native library is unavailable.
    """
    lib = load_lib()
    if lib is None:
        return None
    meta = _i64(meta_ids)
    frame = _i64(frames)
    n = len(meta)
    pm = meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    pf = frame.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    n_win = lib.trajwin_count(pm, pf, n, int(split_fragments), step,
                              window_size, stride)
    out = np.empty((n_win, window_size), np.int64)
    lib.trajwin_fill(pm, pf, n, int(split_fragments), step, window_size,
                     stride, out.ctypes.data_as(
                         ctypes.POINTER(ctypes.c_int64)))
    return out, int(n_win)


def gather_xy(x, y, row_indices):
    """(n_win, window) row indices -> (n_win, window, 2) float32 tensor."""
    lib = load_lib()
    xx = np.ascontiguousarray(x, np.float64)
    yy = np.ascontiguousarray(y, np.float64)
    idx = _i64(row_indices)
    n_win, window = idx.shape
    if lib is None:
        return np.stack([xx[idx], yy[idx]], axis=-1).astype(np.float32)
    out = np.empty((n_win, window, 2), np.float32)
    lib.trajwin_gather_xy(
        xx.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        yy.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_win, window,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def load_and_window_native(df, step, window_size, stride,
                           split_fragments=True):
    """DataFrame-level fast path equivalent to the pandas pipeline
    split_fragmented+downsample+filter_short+sliding_window. Returns a new
    DataFrame with re-factorized metaIds, or None if unavailable."""
    res = window_trajectories(df["metaId"].to_numpy(),
                              df["frame"].to_numpy(), step, window_size,
                              stride, split_fragments)
    if res is None:
        return None
    idx, n_win = res
    out = df.iloc[idx.reshape(-1)].copy()
    out["metaId"] = np.repeat(np.arange(n_win, dtype=np.int64), window_size)
    return out.reset_index(drop=True)
