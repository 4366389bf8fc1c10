"""Persistent XLA compilation cache.

The tunneled-TPU remote compile path is slow (minutes for the full eval/train
programs); the on-disk cache turns every repeat compile — across processes,
epochs and bench runs — into a ~0.1s load. Safe on CPU too.
"""

import contextlib
import os
import threading

_ENABLED = False

# XLA's cpu_aot_loader logs a multi-KB "could lead to ... SIGILL" ERROR
# for EVERY persistent-cache hit on this stack: the serialized CPU
# executable embeds LLVM *tuning* pseudo-features (+prefer-no-scatter /
# +prefer-no-gather), and the load-time check compares them against
# llvm::sys::getHostCPUFeatures(), which never reports tuning flags — so
# even artifacts this same host compiled moments earlier "mismatch".
# (Genuinely foreign artifacts are kept out by the per-host cache-dir
# fingerprint below; XLA also falls back to recompiling on a real
# mismatch, so the message is noise either way.)
_KNOWN_BENIGN_STDERR = (b"cpu_aot_loader.cc",)


@contextlib.contextmanager
def scrub_known_benign_stderr():
    """Drop known-benign XLA C++ stderr lines (fd-level, line-wise).

    The driver-run entry points (__graft_entry__.dryrun_multichip,
    bench.py) report their tail as a round artifact; without this, a
    warm compile cache buries the one summary line under pages of the
    cpu_aot_loader pseudo-feature warning. Only lines containing the
    pinned substrings are dropped — real errors pass through verbatim.
    """
    import sys

    sys.stderr.flush()
    real = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    def pump():
        buf = b""
        try:
            while True:
                try:
                    chunk = os.read(r, 1 << 16)
                except OSError:
                    break
                if not chunk:
                    break
                buf += chunk
                *lines, buf = buf.split(b"\n")
                for ln in lines:
                    if not any(p in ln for p in _KNOWN_BENIGN_STDERR):
                        os.write(real, ln + b"\n")
            if buf and not any(p in buf for p in _KNOWN_BENIGN_STDERR):
                os.write(real, buf)
        except OSError:
            pass  # real closed under us (see the leak note below)
        os.close(r)

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        yield
    finally:
        sys.stderr.flush()
        os.dup2(real, 2)  # detaches the pipe from fd 2 -> pump sees EOF
        t.join(timeout=5)
        # if a subprocess inherited the pipe write end and outlived the
        # block, the pump never sees EOF: leak `real` (the pump still
        # holds it for the child's future lines) rather than close it
        # out from under a live writer
        if not t.is_alive():
            os.close(real)


def _host_cpu_fingerprint():
    """Short hash of this host's CPU feature flags.

    XLA:CPU AOT artifacts embed the compile machine's features; loading
    them on a host with different features makes cpu_aot_loader spam
    'could lead to SIGILL' errors for every cache hit (and falls back to
    recompiling). The per-BACKEND split below isolates the remote-TPU
    compile service's artifacts, but rounds run on heterogeneous driver
    hosts, so the CPU cache itself must also be per-host-CPU-type.

    Hash the ENTIRE first processor block, not just the 'flags' line:
    LLVM's tuning pseudo-features (+prefer-no-scatter/+prefer-no-gather,
    driven by the 'bugs'/microcode mitigations) differ between hosts
    whose 'flags' lines are byte-identical, and a flags-only hash was
    observed to collide across such hosts."""
    stable = ("vendor_id", "cpu family", "model", "model name", "stepping",
              "microcode", "flags", "Features", "bugs", "CPU implementer",
              "CPU part")
    try:
        block = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # first processor block only
                if line.split(":")[0].strip() in stable or \
                        line.startswith(("flags", "Features", "bugs")):
                    block.append(line)
        if block:
            import hashlib

            return hashlib.sha1("".join(block).encode()).hexdigest()[:8]
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
