"""Worker process for tests/test_multiprocess_hostdata.py.

Runs as one of N real processes joined by jax.distributed over the CPU
backend (2 virtual devices per process), exercising the multi-host
branches of parallel/hostdata.py that a single-process test can never
reach: process-local take_local slicing, shard_batch_global's
make_array_from_process_local_data assembly across processes (data-axis
AND replicated scene arrays), its divisibility/row-count error paths,
and a real jitted train step over the process-spanning mesh.

Prints one JSON line per check; the parent asserts both workers agree.
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=n_proc, process_id=pid)
    assert jax.process_count() == n_proc
    n_devices = len(jax.devices())

    from mst_tpu.parallel import hostdata
    from mst_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh((n_devices,))
    out = {"pid": pid, "n_devices": n_devices,
           "process_count": jax.process_count()}

    # the SAME deterministic global batch on every process; each host
    # contributes only its rows (the real pod loader contract)
    B, T, H, W = 4 * n_proc, 6, 16, 24
    rng = np.random.default_rng(0)
    batch = {
        "semantic": rng.normal(size=(2, H, W, 3)).astype(np.float32),
        "traj": rng.uniform(2, 12, size=(B, T, 2)).astype(np.float32),
        "mask": np.ones(B, np.float32),
        "scene_idx": (np.arange(B) % 2).astype(np.int32),
    }
    local = hostdata.take_local(batch)
    assert local["traj"].shape[0] == B // n_proc
    db = hostdata.shard_batch_global(mesh, local, global_batch_size=B)

    # round trip: replicate the assembled global arrays and compare with
    # the full host batch — proves each host's rows landed in ITS block
    rep = mesh_lib.replicated(mesh)
    for k in ("traj", "mask", "scene_idx", "semantic"):
        back = jax.device_get(
            jax.jit(lambda x: x, out_shardings=rep)(db[k]))
        np.testing.assert_array_equal(back, batch[k], err_msg=k)
    out["roundtrip"] = "ok"

    # error branches: non-divisible global batch, wrong local row count
    try:
        hostdata.shard_batch_global(mesh, local, global_batch_size=B + 1)
        out["divisibility_error"] = "MISSED"
    except ValueError as e:
        out["divisibility_error"] = "raised" if "divisible" in str(e) \
            else f"wrong message: {e}"
    try:
        bad = dict(local)
        bad["traj"] = local["traj"][:-1]
        hostdata.shard_batch_global(mesh, bad, global_batch_size=B)
        out["rowcount_error"] = "MISSED"
    except ValueError as e:
        out["rowcount_error"] = "raised" if "local rows" in str(e) \
            else f"wrong message: {e}"

    # a real jitted train step over the process-spanning mesh: params
    # replicated, batch sharded across processes, XLA all-reduce over the
    # 'data' axis that now spans both processes
    import optax

    from mst_tpu import config as config_lib
    from mst_tpu.models import ynet as ynet_lib
    from mst_tpu.train import freeze as freeze_lib
    from mst_tpu.train import steps as steps_lib

    mcfg = ynet_lib.YNetConfig(
        obs_len=2, pred_len=4, n_semantic_classes=3,
        encoder_channels=(4, 4, 8), decoder_channels=(8, 4, 4),
        waypoints=(3,), train_net="mosa_2",
        position=("0", "1", "2"))
    params, state = ynet_lib.init_ynet(jax.random.PRNGKey(0), mcfg)
    mask = freeze_lib.trainable_mask(params, "mosa_2", ("0", "1", "2"))
    trainable, frozen = freeze_lib.split_params(params, mask)
    trainable = mesh_lib.replicate_tree(mesh, trainable)
    frozen = mesh_lib.replicate_tree(mesh, frozen)
    optimizer = optax.adam(1e-3)
    scfg = steps_lib.StepConfig(
        obs_len=2, pred_len=4, waypoints=(3,), template_size=100,
        kernlen=5, nsig=4.0, loss_scale=1000.0, resize_factor=0.25,
        temperature=1.0, n_goal=2, n_traj=1)
    step = steps_lib.make_train_step(mcfg, scfg, optimizer)
    _, _, _, metrics = step(trainable, frozen, state,
                            optimizer.init(trainable), db)
    loss = float(jax.device_get(
        jax.jit(lambda x: x, out_shardings=rep)(metrics["loss"])))
    out["train_loss"] = loss

    # orbax sharded checkpoint ACROSS the two processes (train/
    # sharded_ckpt.py): each host writes only its shards of a
    # data-sharded tree; restore places leaves back onto the mesh
    # sharding, and the replicated readback equals the global values
    if len(sys.argv) > 4:
        from mst_tpu.train import sharded_ckpt

        ckpt_dir = sys.argv[4]
        ds = mesh_lib.data_sharding(mesh)
        tree = {"traj": db["traj"],
                "step": jax.device_put(np.int64(7), rep)}
        sharded_ckpt.save_sharded(ckpt_dir, tree)
        restored = sharded_ckpt.restore_sharded(ckpt_dir, tree)
        assert restored["traj"].sharding == ds
        back = jax.device_get(
            jax.jit(lambda x: x, out_shardings=rep)(restored["traj"]))
        np.testing.assert_array_equal(back, batch["traj"])
        assert int(restored["step"]) == 7
        out["sharded_ckpt"] = "ok"
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
