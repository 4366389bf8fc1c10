"""Tracing / throughput observability (SURVEY.md §5).

The reference has no profiling beyond wall-clock prints (train.py:70-71).
Here: a jax.profiler trace context (view with TensorBoard or Perfetto) and a
throughput meter that reports the north-star scenes/sec and
trajectories/sec counters.
"""

import contextlib
import time


@contextlib.contextmanager
def trace(logdir=None):
    """Capture a device trace when a logdir is given, else no-op."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Counts trajectories / scene-batches per second over a window."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.n_traj = 0.0
        self.n_batches = 0

    def update(self, n_traj, n_batches=1):
        self.n_traj += float(n_traj)
        self.n_batches += n_batches

    @property
    def elapsed(self):
        return time.perf_counter() - self._t0

    def rates(self):
        dt = max(self.elapsed, 1e-9)
        return {"traj_per_sec": self.n_traj / dt,
                "batches_per_sec": self.n_batches / dt,
                "seconds": dt}
