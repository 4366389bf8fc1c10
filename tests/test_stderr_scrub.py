"""utils/cache.py stderr scrubber + host fingerprint.

The driver records the output tail of bench.py / dryrun_multichip as round
artifacts; scrub_known_benign_stderr drops exactly the known-benign XLA
cpu_aot_loader pseudo-feature warning (emitted on every warm persistent-
cache hit on this stack) and passes everything else through at the fd
level — including writes from C extensions / subprocesses that bypass
sys.stderr.
"""

import os
import subprocess
import sys

from mst_tpu.utils.cache import (_host_cpu_fingerprint,
                                 scrub_known_benign_stderr)


def _run(code):
    """Run code in a child and return its stderr (the scrubber redirects
    fd 2, which pytest's capture also owns — a child keeps them apart)."""
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr
    return proc.stderr


def test_scrubber_drops_only_the_pinned_lines():
    err = _run(
        "import os, sys\n"
        "from mst_tpu.utils.cache import scrub_known_benign_stderr\n"
        "with scrub_known_benign_stderr():\n"
        "    sys.stderr.write('real error line\\n')\n"
        "    sys.stderr.flush()\n"
        "    os.write(2, b'E0000 cpu_aot_loader.cc:210] Loading XLA:CPU "
        "AOT result. SIGILL noise\\n')\n"
        "    os.write(2, b'fd-level real line\\n')\n"
        "sys.stderr.write('after restore\\n')\n")
    assert "real error line" in err
    assert "fd-level real line" in err
    assert "after restore" in err
    assert "cpu_aot_loader" not in err


def test_scrubber_restores_fd_on_exception():
    err = _run(
        "import sys\n"
        "from mst_tpu.utils.cache import scrub_known_benign_stderr\n"
        "try:\n"
        "    with scrub_known_benign_stderr():\n"
        "        raise RuntimeError('boom')\n"
        "except RuntimeError:\n"
        "    pass\n"
        "sys.stderr.write('fd works after exception\\n')\n")
    assert "fd works after exception" in err


def test_scrubber_passes_partial_last_line():
    # C loggers can exit mid-line; the trailing unterminated chunk must
    # still reach the real stderr
    err = _run(
        "import os\n"
        "from mst_tpu.utils.cache import scrub_known_benign_stderr\n"
        "with scrub_known_benign_stderr():\n"
        "    os.write(2, b'no trailing newline')\n")
    assert "no trailing newline" in err


def test_host_fingerprint_stable_and_short():
    a, b = _host_cpu_fingerprint(), _host_cpu_fingerprint()
    assert a == b
    assert 1 <= len(a) <= 16
