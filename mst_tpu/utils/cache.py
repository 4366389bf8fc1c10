"""Persistent XLA compilation cache.

The tunneled-TPU remote compile path is slow (minutes for the full eval/train
programs); the on-disk cache turns every repeat compile — across processes,
epochs and bench runs — into a ~0.1s load. Safe on CPU too.
"""

import os

_ENABLED = False


def _host_cpu_fingerprint():
    """Short hash of this host's CPU feature flags.

    XLA:CPU AOT artifacts embed the compile machine's features; loading
    them on a host with different features makes cpu_aot_loader spam
    'could lead to SIGILL' errors for every cache hit (and falls back to
    recompiling). The per-BACKEND split below isolates the remote-TPU
    compile service's artifacts, but rounds run on heterogeneous driver
    hosts, so the CPU cache itself must also be per-host-CPU-type."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    import hashlib

                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return platform.machine() or "nofp"


def enable_compilation_cache(cache_dir=None):
    global _ENABLED
    if _ENABLED:
        return
    import jax

    base = cache_dir or os.environ.get(
        "MST_JAX_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    try:
        # per-backend cache dir: the tunneled-TPU path remote-compiles on a
        # different host, and its CPU AOT artifacts must not be loaded by
        # local CPU runs (mismatched machine features -> SIGILL risk).
        # The host fingerprint applies to EVERY backend dir: a TPU-session
        # process still host-compiles CPU programs (init under
        # default_device(cpu), constant folding) into the same dir, and
        # those artifacts are machine-feature specific even though the
        # TPU ones are not.
        backend = jax.default_backend()
        cache_dir = f"{base}-{backend}-{_host_cpu_fingerprint()}"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
    except Exception:
        pass
