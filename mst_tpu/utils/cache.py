"""Persistent XLA compilation cache.

The tunneled-TPU remote compile path is slow (minutes for the full eval/train
programs); the on-disk cache turns every repeat compile — across processes,
epochs and bench runs — into a ~0.1s load. Safe on CPU too.
"""

import os

_ENABLED = False


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
        # local CPU runs (mismatched machine features -> SIGILL risk)
        cache_dir = f"{base}-{jax.default_backend()}"
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _ENABLED = True
    except Exception:
        pass
