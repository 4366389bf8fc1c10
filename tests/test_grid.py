"""Grid runner (python -m mst_tpu.grid) == looping `python train.py`.

One vectorized sweep (vmapped fused epochs, one compile for every
(seed, lr)) must reproduce each individual train.py run: the same selected
checkpoint and the same left-out test metrics, with per-run .out logs the
scrape tooling can parse. Runs in the scripts-e2e synthetic sandbox.
"""

import os
import pathlib
import re
import subprocess
import sys

import numpy as np
import pytest

from mst_tpu.utils import scripts_e2e

COMMON = [
    "--fine_tune", "--config_filename", "sdd_shortterm_train.yaml",
    "--batch_size", "4", "--n_epoch", "2", "--n_early_stop", "100",
    "--n_round", "1",
    "--dataset_path", "filter/shortterm/agent_type/deathCircle_0/Biker",
    "--network", "original", "--load_data", "predefined",
    "--pretrained_ckpt", "ckpts/sdd__ynet__ped.npz",
    "--train_net", "mosa_1", "--position", "0", "1", "2", "3", "4",
    "--n_train_batch", "1", "--steps", "20", "--smooth_val",
]
SEEDS = (1, 2)
_AVG = re.compile(r"Average performance \(by 1\): \nTest ADE: ([\d.]+) \n"
                  r"Test FDE: ([\d.]+)")


@pytest.fixture(scope="module")
def sandbox(tmp_path_factory):
    sb = tmp_path_factory.mktemp("grid_sandbox")
    scripts_e2e.build_sandbox(sb)
    return sb


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = scripts_e2e.REPO_ROOT + os.pathsep + env.get(
        "PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run([sys.executable] + args, cwd=str(cwd), env=env,
                          timeout=1500, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    assert proc.returncode == 0, proc.stdout[-3000:]
    return proc.stdout


def _load_ckpts(path):
    out = {}
    for f in pathlib.Path(path).glob("*.npz"):
        if f.name.endswith("__meta.json"):
            continue
        out[f.name] = dict(np.load(f))
    return out


def test_grid_matches_individual_runs(sandbox, tmp_path):
    grid_out = _run(
        ["-m", "mst_tpu.grid", *COMMON,
         "--ckpt_path", str(tmp_path / "grid_ckpts"),
         "--seeds", *map(str, SEEDS), "--lrs", "0.003",
         "--log_dir", str(tmp_path / "logs")],
        sandbox)
    grid_metrics = _AVG.findall(grid_out)
    assert len(grid_metrics) == len(SEEDS), grid_out[-2000:]

    solo_metrics = []
    for seed in SEEDS:
        out = _run(
            [os.path.join(scripts_e2e.REPO_ROOT, "train.py"), *COMMON,
             "--ckpt_path", str(tmp_path / "solo_ckpts"),
             "--seed", str(seed), "--lr", "0.003"],
            sandbox)
        solo_metrics.extend(_AVG.findall(out))

    got = np.asarray(grid_metrics, np.float64)
    want = np.asarray(solo_metrics, np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

    # the selected delta checkpoints match run-for-run under the SAME
    # experiment names train.py would have used
    grid_ckpts = _load_ckpts(tmp_path / "grid_ckpts")
    solo_ckpts = _load_ckpts(tmp_path / "solo_ckpts")
    # train.py also writes __train_state/__epoch files; compare the final
    # per-experiment ckpts the grid produces
    assert set(grid_ckpts) <= set(solo_ckpts)
    assert len(grid_ckpts) == len(SEEDS)
    for name, tree in grid_ckpts.items():
        for k, v in tree.items():
            np.testing.assert_allclose(v, solo_ckpts[name][k], rtol=2e-4,
                                       atol=2e-4, err_msg=f"{name}:{k}")

    # per-run logs are scrapeable (evaluator/logs.py regex family)
    logs = list((tmp_path / "logs").glob("*.out"))
    assert len(logs) == len(SEEDS)
    assert re.search(r"Epoch 1: \tTrain \(Top-1\) ADE",
                     logs[0].read_text())


def test_grid_mesh_sharded_runs_match(sandbox, tmp_path):
    """The run axis sharded over a 2-device mesh (zero collectives) gives
    the same per-run metrics as the unsharded grid."""
    env = dict(os.environ)
    env["PYTHONPATH"] = scripts_e2e.REPO_ROOT + os.pathsep + env.get(
        "PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    outs = []
    for tag, mesh in (("nomesh", []), ("mesh", ["--mesh_shape", "2"])):
        proc = subprocess.run(
            [sys.executable, "-m", "mst_tpu.grid", *COMMON,
             "--ckpt_path", str(tmp_path / tag),
             "--seeds", "1", "2", "--lrs", "0.003", *mesh],
            cwd=str(sandbox), env=env, timeout=1500,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        assert proc.returncode == 0, proc.stdout[-3000:]
        outs.append(np.asarray(_AVG.findall(proc.stdout), np.float64))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3, atol=1e-3)


def test_grid_memory_split_resumes_mid_sweep(sandbox, tmp_path):
    """A run group whose program exhausts device memory splits in half and
    resumes from the epoch it reached — metrics and saved checkpoints must
    match the unsplit sweep. (MST_GRID_FORCE_OOM_ABOVE fakes the OOM after
    one chunk; MST_GRID_CHUNK_CAP=1 forces a mid-sweep boundary.)"""
    outs, ckpts = [], []
    for tag, extra_env in (("plain", {}),
                           ("split", {"MST_GRID_FORCE_OOM_ABOVE": "1",
                                      "MST_GRID_CHUNK_CAP": "1"})):
        env = dict(os.environ)
        env["PYTHONPATH"] = scripts_e2e.REPO_ROOT + os.pathsep + env.get(
            "PYTHONPATH", "")
        env.setdefault("JAX_PLATFORMS", "cpu")
        env.update(extra_env)
        proc = subprocess.run(
            [sys.executable, "-m", "mst_tpu.grid", *COMMON,
             "--ckpt_path", str(tmp_path / tag),
             "--seeds", "1", "2", "--lrs", "0.003"],
            cwd=str(sandbox), env=env, timeout=1500,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        assert proc.returncode == 0, proc.stdout[-3000:]
        if tag == "split":
            assert "splitting the group" in proc.stdout
        outs.append(np.asarray(_AVG.findall(proc.stdout), np.float64))
        ckpts.append(_load_ckpts(tmp_path / tag))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3, atol=1e-3)
    assert set(ckpts[0]) == set(ckpts[1]) and len(ckpts[0]) == 2
    for name in ckpts[0]:
        for k, v in ckpts[0][name].items():
            np.testing.assert_allclose(v, ckpts[1][name][k], rtol=1e-5,
                                       atol=1e-6, err_msg=f"{name}:{k}")


def test_grid_rejects_seed_specific_frozen_base(sandbox, tmp_path):
    """Without a full pretrained ckpt each seed random-inits its own
    frozen base; sharing run 0's would silently corrupt runs 2+ — the
    grid must refuse."""
    args = [a for a in COMMON if a != "--pretrained_ckpt"
            and a != "ckpts/sdd__ynet__ped.npz"]
    env = dict(os.environ)
    env["PYTHONPATH"] = scripts_e2e.REPO_ROOT + os.pathsep + env.get(
        "PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "mst_tpu.grid", *args,
         "--ckpt_path", str(tmp_path / "ck"),
         "--seeds", "1", "2", "--lrs", "0.003"],
        cwd=str(sandbox), env=env, timeout=900, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    assert proc.returncode != 0
    assert "frozen" in proc.stdout
