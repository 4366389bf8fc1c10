"""Hybrid (replica x data) mesh + orbax sharded checkpoints, CPU-simulated.

A real pod has multiple slices joined by DCN; here the 8 virtual CPU devices
stand in as 2 slices x 4 chips. The compiled programs are identical to the
hardware ones (the collectives just ride one fabric), so these tests pin the
program semantics: hybrid-mesh steps match the 1D-mesh and single-device
results, and sharded checkpoints round-trip without gathering to one host.
"""

import jax
import numpy as np
import optax
import pytest

from mst_tpu import config as config_lib
from mst_tpu.models import ynet as ynet_lib
from mst_tpu.parallel import mesh as mesh_lib
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib

TOTAL_LEN = 12


def _setup(n_goal=4):
    params_dict = config_lib.get_params(overrides=dict(
        obs_len=4, pred_len=8, waypoints=[7], n_semantic_classes=3,
        encoder_channels=[8, 8, 16, 16, 16],
        decoder_channels=[16, 16, 16, 8, 8], kernlen=31, nsig=4,
        loss_scale=1000, resize_factor=0.25, temperature=1.0,
        n_goal=n_goal, n_traj=1, train_net="mosa_2",
        position=["0", "1", "2", "3", "4"], segmentation_model_fp=None))
    mcfg = config_lib.ynet_config(params_dict)
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    scfg = steps_lib.StepConfig(
        obs_len=4, pred_len=8, waypoints=(7,), template_size=128,
        kernlen=31, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.0, n_goal=n_goal, n_traj=1)
    rng = np.random.default_rng(0)
    batch = {
        "semantic": rng.normal(size=(1, 64, 96, 3)).astype(np.float32),
        "traj": rng.uniform(10, 50, size=(8, TOTAL_LEN, 2)).astype(
            np.float32),
        "mask": np.ones(8, np.float32),
    }
    return mcfg, scfg, params, state, batch


def test_hybrid_mesh_shape_and_axes():
    mesh = mesh_lib.make_hybrid_mesh(n_slices=2, per_slice=4)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)
    # data_sharding spans both axes: batch splits 8 ways
    sh = mesh_lib.data_sharding(mesh)
    x = jax.device_put(np.arange(16.0), sh)
    assert len(x.addressable_shards) == 8
    assert all(s.data.shape == (2,) for s in x.addressable_shards)


def test_hybrid_train_step_matches_1d_mesh():
    """Same update whether the batch shards over ('data',) x8 or
    ('replica', 'data') 2x4 — the hierarchical all-reduce is numerically
    the same reduction."""
    mcfg, scfg, params, state, batch = _setup()
    mask = freeze_lib.trainable_mask(params, "mosa_2",
                                     ["0", "1", "2", "3", "4"])
    results = {}
    for name, mesh in [("1d", mesh_lib.make_mesh((8,))),
                       ("hybrid", mesh_lib.make_hybrid_mesh(2, 4))]:
        trainable, frozen = freeze_lib.split_params(params, mask)
        trainable = mesh_lib.replicate_tree(mesh, trainable)
        frozen = mesh_lib.replicate_tree(mesh, frozen)
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(trainable)
        step = steps_lib.make_train_step(mcfg, scfg, optimizer)
        db = mesh_lib.shard_batch(mesh, batch)
        for _ in range(2):
            trainable, new_state, opt_state, metrics = step(
                trainable, frozen, state, opt_state, db)
        results[name] = (jax.tree.map(np.asarray, trainable),
                         float(metrics["loss"]))
    np.testing.assert_allclose(results["1d"][1], results["hybrid"][1],
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        results["1d"][0], results["hybrid"][0])


def test_hybrid_eval_step_runs():
    mcfg, scfg, params, state, batch = _setup(n_goal=8)
    mesh = mesh_lib.make_hybrid_mesh(2, 4)
    db = mesh_lib.shard_batch(mesh, batch)
    params_r = mesh_lib.replicate_tree(mesh, params)
    eval_step = steps_lib.make_eval_step(mcfg, scfg)
    out = eval_step(params_r, state, db, jax.random.PRNGKey(0))
    assert np.isfinite(float(out["ade_sum"]))
    assert out["ade"].shape == (8,)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Orbax sharded save/restore preserves values AND shardings for a
    mixed (replicated params + sharded batch-like) training state."""
    from mst_tpu.train import sharded_ckpt

    mesh = mesh_lib.make_hybrid_mesh(2, 4)
    rng = np.random.default_rng(0)
    tree = {
        "params": {"w": rng.normal(size=(16, 8)).astype(np.float32)},
        "opt": {"mu": rng.normal(size=(16, 8)).astype(np.float32)},
        "per_row": rng.normal(size=(16, 4)).astype(np.float32),
    }
    rep = mesh_lib.replicated(mesh)
    ds = mesh_lib.data_sharding(mesh)
    live = {
        "params": {"w": jax.device_put(tree["params"]["w"], rep)},
        "opt": {"mu": jax.device_put(tree["opt"]["mu"], rep)},
        "per_row": jax.device_put(tree["per_row"], ds),
    }
    path = str(tmp_path / "state")
    sharded_ckpt.save_sharded(path, live)
    restored = sharded_ckpt.restore_sharded(path, live)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  tree["params"]["w"])
    np.testing.assert_array_equal(np.asarray(restored["per_row"]),
                                  tree["per_row"])
    assert restored["per_row"].sharding == live["per_row"].sharding
    assert len(restored["per_row"].addressable_shards) == 8


class _FakeDevice:
    """Stand-in for a TPU device carrying pod slice metadata.

    The CPU mesh used everywhere else in this suite has a single slice, so
    the slice-aware branch of make_hybrid_mesh (parallel/mesh.py) never
    fires there; these fakes exercise it without hardware.
    """

    def __init__(self, did, slice_index):
        self.id = did
        self.slice_index = slice_index

    def __repr__(self):
        return f"FakeDev({self.id}, slice={self.slice_index})"


def _fake_pod(n_slices, chips_per_slice):
    return [_FakeDevice(s * chips_per_slice + c, s)
            for s in range(n_slices) for c in range(chips_per_slice)]


@pytest.fixture
def captured_mesh(monkeypatch):
    """Capture the device layout make_hybrid_mesh builds, without asking
    jax.sharding.Mesh to accept fake device objects."""
    captured = {}

    def fake_mesh(dev_array, axis_names):
        captured["devices"] = np.asarray(dev_array)
        captured["axis_names"] = tuple(axis_names)
        return captured

    monkeypatch.setattr(mesh_lib, "Mesh", fake_mesh)
    return captured


def test_slice_aware_layout_full_pod(captured_mesh):
    devs = _fake_pod(2, 4)
    mesh_lib.make_hybrid_mesh(devices=devs)
    arr = captured_mesh["devices"]
    assert captured_mesh["axis_names"] == ("replica", "data")
    assert arr.shape == (2, 4)
    # each 'data' row must live entirely inside one slice (ICI), and the
    # 'replica' axis must cross slices (DCN)
    for r in range(2):
        assert {d.slice_index for d in arr[r]} == {r}


def test_slice_aware_layout_subpod(captured_mesh):
    # 2x2 mesh on a 2-slice x 8-chip pod: only part of each slice is used,
    # but rows still must not mix slices (the create_hybrid_device_mesh
    # helper can't even express this shape)
    devs = _fake_pod(2, 8)
    mesh_lib.make_hybrid_mesh(n_slices=2, per_slice=2, devices=devs)
    arr = captured_mesh["devices"]
    assert arr.shape == (2, 2)
    for r in range(2):
        assert {d.slice_index for d in arr[r]} == {r}
    # and the chips chosen are the leading chips of each slice
    assert [d.id for d in arr[0]] == [0, 1]
    assert [d.id for d in arr[1]] == [8, 9]


def test_slice_aware_layout_four_slices(captured_mesh):
    devs = _fake_pod(4, 4)
    mesh_lib.make_hybrid_mesh(devices=devs)
    arr = captured_mesh["devices"]
    assert arr.shape == (4, 4)
    for r in range(4):
        assert {d.slice_index for d in arr[r]} == {r}


def test_misaligned_shape_warns_and_falls_back(captured_mesh):
    # per_slice=8 exceeds the 4 chips per slice: the slice-aware layout is
    # impossible, so the flat reshape must be taken WITH a warning (the
    # 'data' axis may cross DCN -- ADVICE r2: make that cliff visible)
    devs = _fake_pod(2, 4)
    with pytest.warns(UserWarning, match="may cross DCN"):
        mesh_lib.make_hybrid_mesh(n_slices=1, per_slice=8, devices=devs)
    assert captured_mesh["devices"].shape == (1, 8)


def test_single_slice_fallback_does_not_warn(captured_mesh, recwarn):
    # CPU / single-slice: flat reshape is the correct layout, no warning
    devs = _fake_pod(1, 8)
    mesh_lib.make_hybrid_mesh(n_slices=2, per_slice=4, devices=devs)
    assert captured_mesh["devices"].shape == (2, 4)
    assert not [w for w in recwarn if "DCN" in str(w.message)]


def test_spatial_mesh_is_slice_aware(captured_mesh):
    """make_spatial_mesh reuses the slice-aware layout: each 'data' row is
    one slice, so the per-conv 'space' halo exchanges ride ICI and only
    the once-per-step grad all-reduce crosses DCN."""
    devs = _fake_pod(2, 4)
    mesh_lib.make_spatial_mesh(2, 4, devices=devs)
    arr = captured_mesh["devices"]
    assert captured_mesh["axis_names"] == ("data", "space")
    assert arr.shape == (2, 4)
    for r in range(2):
        assert {d.slice_index for d in arr[r]} == {r}


def test_spatial_mesh_misaligned_warns_space_axis(captured_mesh):
    # the fallback warning names the axis that may cross DCN — 'space'
    # here, not the hybrid mesh's 'data'
    devs = _fake_pod(2, 4)
    with pytest.warns(UserWarning, match="'space' axis may cross DCN"):
        mesh_lib.make_spatial_mesh(1, 8, devices=devs)
    assert captured_mesh["devices"].shape == (1, 8)


def test_spatial_mesh_multiple_rows_per_slice(captured_mesh):
    """Unlike the hybrid mesh (one 'replica' row per slice), the spatial
    layout may put several 'data' rows in one slice: 4x4 on a 2-slice x
    8-chip pod is valid (two rows per slice) and must NOT warn."""
    import warnings as w
    devs = _fake_pod(2, 8)
    with w.catch_warnings():
        w.simplefilter("error")
        mesh_lib.make_spatial_mesh(4, 4, devices=devs)
    arr = captured_mesh["devices"]
    assert arr.shape == (4, 4)
    for r in range(4):
        assert len({d.slice_index for d in arr[r]}) == 1
    assert [d.id for d in arr[0]] == [0, 1, 2, 3]
    assert [d.id for d in arr[2]] == [8, 9, 10, 11]
