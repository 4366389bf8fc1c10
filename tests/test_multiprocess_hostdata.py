"""REAL multi-process hostdata execution (2 jax.distributed processes).

parallel/hostdata.py's >1-process branches (per-host slicing, cross-
process jax.Array assembly, divisibility errors) previously only ran
with process_count == 1, where local == global trivially. This test
spawns TWO actual processes joined by jax.distributed on the CPU
backend (2 virtual devices each -> a 4-device process-spanning 'data'
mesh), runs tests/hostdata_worker.py in both, and asserts: the
assembled global arrays round-trip exactly, both error branches fire,
and a real jitted train step over the spanning mesh produces the SAME
finite loss on both hosts (XLA's grad all-reduce crossing the process
boundary).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_hostdata_pipeline():
    port = _free_port()
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    import tempfile

    ckpt_dir = os.path.join(tempfile.mkdtemp(prefix="mp_ckpt_"), "state")
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "hostdata_worker.py"),
         str(i), str(N_PROC), str(port), ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(N_PROC)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = []
    for i, out in enumerate(outs):
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"worker {i} printed no RESULT:\n{out[-4000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))

    for i, r in enumerate(results):
        assert r["process_count"] == N_PROC, r
        assert r["n_devices"] == 2 * N_PROC, r  # mesh spans processes
        assert r["roundtrip"] == "ok", r
        assert r["divisibility_error"] == "raised", r
        assert r["rowcount_error"] == "raised", r
        # per-host orbax shard writes + restore onto the spanning mesh
        assert r.get("sharded_ckpt") == "ok", r
    # both hosts computed the identical global loss through the
    # process-spanning all-reduce
    assert results[0]["train_loss"] == pytest.approx(
        results[1]["train_loss"], rel=1e-6)
    assert results[0]["train_loss"] > 0
