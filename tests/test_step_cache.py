"""cached_eval_step memo semantics: the analysis tools (importance sweeps,
multi-checkpoint comparison) rely on Experiment.test returning the SAME
jitted eval callable across calls so jax's executable cache hits instead of
re-tracing per call (train/steps.py:cached_eval_step)."""

import jax
import jax.numpy as jnp
import numpy as np

from mst_tpu import config as config_lib
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.train import steps as steps_lib


def _cfgs(**overrides):
    params = config_lib.get_params(
        config_filename="sdd_shortterm_train.yaml",
        overrides=dict(train_net="mosa_2", position=["0"],
                       segmentation_model_fp=None, batch_size=2,
                       n_goal=3, **overrides))
    mcfg = config_lib.ynet_config(params)
    scfg = steps_lib.StepConfig(
        obs_len=params["obs_len"], pred_len=params["pred_len"],
        waypoints=tuple(params["waypoints"]), template_size=64, kernlen=31,
        nsig=4.0, loss_scale=1000.0, resize_factor=0.25, temperature=1.0,
        n_goal=3, n_traj=1)
    return params, mcfg, scfg


def test_same_config_shares_step_and_executable():
    _, mcfg, scfg = _cfgs()
    a = steps_lib.cached_eval_step(mcfg, scfg)
    b = steps_lib.cached_eval_step(mcfg, scfg)
    assert a is b
    # different scfg (chunked decode) and collect_samples get their own
    assert steps_lib.cached_eval_step(
        mcfg, scfg._replace(eval_k_chunk=1)) is not a
    assert steps_lib.cached_eval_step(mcfg, scfg, True) is not a


def test_ind_cws_config_stays_memoizable():
    """Every inD yaml carries CWS_params (a dict in the raw config); the
    trainer must normalize it to the hashable CWSParams or the memo is
    silently disabled for all inD runs."""
    from mst_tpu.train.trainer import Experiment

    params = config_lib.get_params(
        config_filename="inD_longterm_eval.yaml",
        overrides=dict(segmentation_model_fp=None, batch_size=2, n_goal=3))
    assert isinstance(params.get("CWS_params"), dict)  # raw config shape
    exp = Experiment(params)
    scfg = exp._step_config()
    assert isinstance(scfg.cws_params, steps_lib.CWSParams)
    hash(scfg)  # must not raise
    a = steps_lib.cached_eval_step(exp.mcfg, scfg)
    assert steps_lib.cached_eval_step(exp.mcfg, scfg) is a


def test_unhashable_scfg_falls_back_to_uncached():
    """An unhashable StepConfig field (e.g. a caller passing a list of
    waypoints or a raw dict) must degrade to uncached construction, not
    raise."""
    _, mcfg, scfg = _cfgs()
    weird = scfg._replace(cws_params={"sigma_factor": 6, "ratio": 2,
                                      "rot": True})
    a = steps_lib.cached_eval_step(mcfg, weird)
    b = steps_lib.cached_eval_step(mcfg, weird)
    assert a is not b  # no memo, but both are working steps
    assert callable(a.forward)


def test_param_swap_hits_compiled_executable():
    """Swapping checkpoints (same tree structure) must not re-trace."""
    params_dict, mcfg, scfg = _cfgs()
    step = steps_lib.cached_eval_step(mcfg, scfg)
    k = jax.random.PRNGKey(0)
    p1, state = ynet_lib.init_ynet(jax.random.PRNGKey(1), mcfg)
    p2 = jax.tree.map(lambda x: x + 0.01, p1)
    rng = np.random.default_rng(0)
    total = params_dict["obs_len"] + params_dict["pred_len"]
    batch = {
        "semantic": jnp.asarray(rng.normal(size=(2, 64, 96, 6)),
                                jnp.float32),
        "traj": jnp.asarray(rng.uniform(10, 50, size=(2, total, 2)),
                            jnp.float32),
        "mask": jnp.ones(2, jnp.float32),
    }
    out1 = step(p1, state, batch, k)
    n_traces = step.forward._cache_size()
    out2 = step(p2, state, batch, k)
    assert step.forward._cache_size() == n_traces  # no re-trace
    assert np.isfinite(float(out1["ade_sum"]))
    assert float(out1["ade_sum"]) != float(out2["ade_sum"])
