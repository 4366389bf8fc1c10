"""Experiment-suite scripts, executed end-to-end on synthetic data.

Every suite script runs the REAL train.py/test.py CLIs from a sandbox
built by mst_tpu.utils.scripts_e2e (miniature raw trees + filtered pkls +
tiny pretrained ckpts) with a reduced grid sourced via MST_GRID_OVERRIDES.

By default a representative subset runs (one script per flag family:
generalize eval, MoSA fine-tune, parallel adapters, encoder tuning,
ynetmod S-position, sequential pretrain with --augment, inD long-term,
rank sweep). Set MST_SCRIPTS_E2E=all for the full 91-suite sweep (also
available as scripts/run_all_synthetic.sh, which writes a summary JSON).

Reference anchors: scripts/sdd/ped_to_biker/tune_mosa.sh:28-41,
scripts/inD/preprocessing.sh (SURVEY §2 C36).
"""

import os
import re

import pytest

from mst_tpu.utils import scripts_e2e

# one per flag family the grids encode
REPRESENTATIVE = [
    "scripts/sdd/ped_to_biker/generalize.sh",       # eval CLI, monolithic ckpt
    "scripts/sdd/ped_to_biker/tune_mosa.sh",        # LoRA fine-tune + smooth_val
    "scripts/sdd/ped_to_biker/tune_pa.sh",          # parallel adapters
    "scripts/sdd/ped_to_biker/tune_enc.sh",         # encoder positions
    "scripts/sdd/ped_to_biker_modular/tune_mosa_S.sh",  # ynetmod branch position
    "scripts/sdd/ped_to_biker/pretrain.sh",         # sequential load + augment
    "scripts/inD/scene1_car_to_truck/ynetmod/tune_mosa_S_A_F.sh",  # inD ynetmod
    "scripts/inD/sdd_to_inD/generalize.sh",         # cross-dataset eval
    "scripts/sdd/biker_low_to_high/tune_mosa_S.sh", # dc_013 avg_vel bucket path
]


def _selected():
    mode = os.environ.get("MST_SCRIPTS_E2E", "subset")
    if mode == "all":
        return scripts_e2e.experiment_scripts()
    return REPRESENTATIVE


@pytest.fixture(scope="session")
def sandbox(tmp_path_factory):
    # reuse a prebuilt sandbox when given (the sweep runner's, typically)
    pre = os.environ.get("MST_SWEEP_SANDBOX")
    if pre and os.path.exists(os.path.join(pre, "overrides.sh")):
        return pre
    sb = tmp_path_factory.mktemp("script_sandbox")
    scripts_e2e.build_sandbox(sb)
    return str(sb)


@pytest.mark.parametrize("script", _selected())
def test_suite_script_runs_green(sandbox, script):
    rc, out = scripts_e2e.run_script(script, sandbox, timeout=1700)
    assert rc == 0, f"{script} rc={rc}\n{out[-3000:]}"
    n_avg = len(re.findall(r"Average performance \(by ", out))
    want = scripts_e2e.expected_runs(script)
    assert n_avg >= want, (
        f"{script}: {n_avg} 'Average performance' blocks, expected >= "
        f"{want}\n{out[-3000:]}")


def test_preprocessing_pipelines(sandbox):
    """Both offline builder pipelines run green on miniature raw trees and
    write their filtered pkls."""
    results = scripts_e2e.run_preprocessing(sandbox, timeout=900)
    for rel, (rc, out) in results.items():
        assert rc == 0, f"{rel} rc={rc}\n{out[-3000:]}"
    prep = os.path.join(sandbox, "prep")
    # every terminal artifact the reference pipelines produce, with
    # non-empty train splits where split_dataset ran (reference
    # scripts/{sdd,inD}/preprocessing.sh stage-for-stage)
    import pandas as pd
    for rel in (
            "sdd/filter/shortterm/agent_type/deathCircle_0/Biker/train.pkl",
            "sdd/filter/shortterm/agent_type/multiscene_easy/Biker/train.pkl",
            "sdd/filter/shortterm/avg_vel/dc_013/Biker/0.5_3.5/train.pkl",
            "sdd/filter/shortterm/avg_vel/dc_013/Biker/4_8/train.pkl",
            "sdd/filter/longterm/agent_type/Pedestrian_filter/train.pkl",
            "inD-dataset-v1.0/filter/longterm/agent_type/scene1/pedestrian/train.pkl",
            "inD-dataset-v1.0/filter/longterm/agent_type/scene234/pedestrian/train.pkl",
            "inD-dataset-v1.0/filter/longterm/agent_type/scene124/pedestrian/train.pkl",
            "inD-dataset-v1.0/filter/longterm/agent_type/scene134/pedestrian/train.pkl",
            "inD-dataset-v1.0/filter/shortterm/agent_type/scene1/car_filter/train.pkl",
            "inD-dataset-v1.0/filter/shortterm/agent_type/scene1/truck_bus_filter/train.pkl",
            "inD-dataset-v1.0/filter/shortterm/agent_type/scene1/pedestrian_filter/train.pkl",
            "inD-dataset-v1.0/filter/shortterm/agent_type/scene1234/pedestrian.pkl",
    ):
        path = os.path.join(prep, "data", rel)
        assert os.path.exists(path), rel
        assert pd.read_pickle(path).metaId.nunique() > 0, rel
