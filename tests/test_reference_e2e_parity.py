"""END-TO-END parity against the reference's own train/eval loops.

Runs the ACTUAL reference utils/train_epoch.py and utils/evaluate.py (with
the real models.ynet.YNet, identity segmentation) on a synthetic scene and
compares against mst_tpu's train step / eval step on the converted weights:

- training is fully deterministic (no sampling in the loss path), so one
  epoch of reference train_epoch + torch.Adam must match our jitted train
  step + optax.adam parameter-for-parameter;
- evaluation is stochastic (torch.multinomial vs Gumbel top-k — identical
  Plackett-Luce distributions, different streams), so the min-over-K
  ADE/FDE parity is statistical over rounds (BASELINE.md protocol).
"""

import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp
import optax

from mst_tpu.models import ynet as jynet
from mst_tpu.models.convert import convert_torch_ynet
from mst_tpu.train import freeze as freeze_lib
from mst_tpu.train import steps as steps_lib
from mst_tpu.train.checkpoints import overlay_checkpoint
from tests.reference_loader import load_reference

ref = load_reference()

OBS, PRED, NSEM = 4, 8, 3
TOTAL = OBS + PRED
ENC = [8, 8, 16, 16, 16]
DEC = [16, 16, 16, 8, 8]
H, W = 64, 96
WAYPOINTS = [7]
TEMPLATE = 400  # template big enough that every patch slice stays in-bounds
BATCH = 4
N_TRAJ = 8
LR = 1e-3
LOSS_SCALE = 1000.0
RESIZE = 0.25


def _scene_df(rng):
    rows = []
    for m in range(N_TRAJ):
        x = np.clip(rng.uniform(15, W - 15) + np.cumsum(
            rng.normal(0, 1.5, TOTAL)), 2, W - 3)
        y = np.clip(rng.uniform(15, H - 15) + np.cumsum(
            rng.normal(0, 1.5, TOTAL)), 2, H - 3)
        for t in range(TOTAL):
            rows.append((t, m, x[t], y[t], "synth", m))
    return pd.DataFrame(rows, columns=["frame", "trackId", "x", "y",
                                       "sceneId", "metaId"])


def _build_reference(seed=0):
    torch.manual_seed(seed)
    model = ref.ynet.YNet(
        obs_len=OBS, pred_len=PRED, segmentation_model_fp=None,
        n_semantic_classes=NSEM, encoder_channels=ENC, decoder_channels=DEC,
        n_waypoints=len(WAYPOINTS), train_net="train", position=[],
        network="original")
    return model


def _loader_and_images(df, image):
    from torch.utils.data import DataLoader

    from utils.dataloader import SceneDataset, scene_collate

    ds = SceneDataset(df, resize=1.0, total_len=TOTAL)
    loader = DataLoader(ds, batch_size=1, collate_fn=scene_collate,
                        shuffle=False)
    images = {"synth": torch.tensor(image).permute(2, 0, 1)}
    return loader, images


def _jax_setup(tmodel):
    flat, _ = convert_torch_ynet(
        {k: v.detach() for k, v in tmodel.state_dict().items()})
    cfg = jynet.YNetConfig(
        obs_len=OBS, pred_len=PRED, n_semantic_classes=NSEM,
        encoder_channels=ENC, decoder_channels=DEC, waypoints=WAYPOINTS,
        train_net="train", network="original")
    params, state = jynet.init_ynet(jax.random.PRNGKey(0), cfg)
    params = overlay_checkpoint(params, flat, strict=True)
    return cfg, params, state


def _scfg(**over):
    kw = dict(obs_len=OBS, pred_len=PRED, waypoints=tuple(WAYPOINTS),
              template_size=TEMPLATE, kernlen=31, nsig=4.0,
              loss_scale=LOSS_SCALE, resize_factor=RESIZE, temperature=1.0,
              n_goal=20, n_traj=1)
    kw.update(over)
    return steps_lib.StepConfig(**kw)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    df = _scene_df(rng)
    image = rng.normal(size=(H, W, NSEM)).astype(np.float32)
    tmodel = _build_reference()
    return df, image, tmodel


def test_train_epoch_parity_vs_reference(setup):
    """One epoch of the reference's train_epoch (real torch code) == our
    jitted train step sequence on the same batches: same loss, same
    train-ADE/FDE, same updated parameters.

    Both sides use SGD: Adam's first step is update = lr*sign(grad), and
    sign() of near-zero gradients flips on fp noise across frameworks,
    making cross-framework parameter comparison chaotic by construction.
    SGD updates are Lipschitz in the gradient, so the whole-epoch loop
    mechanics (batching order, loss, backprop, update application) are
    checked deterministically; optimizer-formula parity is covered by
    the gradient test above plus the matching loss trajectory."""
    df, image, tmodel0 = setup
    from utils.train_epoch import train_epoch

    tmodel = _build_reference()
    tmodel.load_state_dict(tmodel0.state_dict())
    cfg, params, state = _jax_setup(tmodel)

    loader, images = _loader_and_images(df, image)
    gt_template = torch.tensor(ref.image_utils.create_gaussian_heatmap_template(
        size=TEMPLATE, kernlen=31, nsig=4, normalize=False)).float()
    input_template = torch.tensor(
        ref.image_utils.create_dist_mat(size=TEMPLATE)).float()
    criterion = nn.BCEWithLogitsLoss()
    optimizer = torch.optim.SGD(
        [p for p in tmodel.parameters() if p.requires_grad], lr=LR)

    t_ade, t_fde, t_loss = train_epoch(
        tmodel, loader, images, optimizer, criterion, LOSS_SCALE,
        torch.device("cpu"), "sdd", None, gt_template, input_template,
        WAYPOINTS, 0, OBS, PRED, BATCH, e_unfreeze=10000,
        resize_factor=RESIZE, network="original")

    # ---- mst_tpu side: same batches in the same order
    mask = freeze_lib.trainable_mask(params, "train", ())
    trainable, frozen = freeze_lib.split_params(params, mask)
    opt = optax.sgd(LR)
    opt_state = opt.init(trainable)
    step = steps_lib.make_train_step(cfg, _scfg(), opt)

    traj_all = df.sort_values(["metaId", "frame"])[["x", "y"]].to_numpy(
        np.float32).reshape(N_TRAJ, TOTAL, 2)
    semantic = jnp.asarray(image[None])
    loss_sum = 0.0
    ade_parts, fde_parts, n_parts = [], [], []
    for b in range(0, N_TRAJ, BATCH):
        batch = {"semantic": semantic,
                 "traj": jnp.asarray(traj_all[b:b + BATCH]),
                 "mask": jnp.ones(min(BATCH, N_TRAJ - b), jnp.float32)}
        trainable, state, opt_state, metrics = step(
            trainable, frozen, state, opt_state, batch)
        loss_sum += float(metrics["loss"])
        ade_parts.append(float(metrics["ade_sum"]))
        fde_parts.append(float(metrics["fde_sum"]))
        n_parts.append(float(metrics["n"]))

    j_ade = sum(ade_parts) / sum(n_parts)
    j_fde = sum(fde_parts) / sum(n_parts)
    np.testing.assert_allclose(loss_sum, float(t_loss), rtol=1e-4)
    np.testing.assert_allclose(j_ade, float(t_ade), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(j_fde, float(t_fde), rtol=1e-3, atol=1e-3)

    # updated parameters match across frameworks
    updated = freeze_lib.merge_params(trainable, frozen)
    flat_after, _ = convert_torch_ynet(
        {k: v.detach() for k, v in tmodel.state_dict().items()})
    from mst_tpu.train.checkpoints import flatten_tree

    ours_after = flatten_tree(updated)
    n_checked = 0
    for k, want in flat_after.items():
        got = ours_after[k]
        scale = max(float(np.abs(want).max()), 1e-3)
        np.testing.assert_allclose(got, want, rtol=1e-3,
                                   atol=1e-4 * scale, err_msg=k)
        n_checked += 1
    assert n_checked > 30


def test_train_gradient_parity_vs_reference(setup):
    """d(loss)/d(params) of the reference's training math (torch autograd)
    == our jax.grad on the same batch — the optimizer-independent core of
    training parity."""
    df, image, tmodel0 = setup
    from utils.image_utils import get_patch

    tmodel = _build_reference()
    tmodel.load_state_dict(tmodel0.state_dict())
    cfg, params, state = _jax_setup(tmodel)

    traj_all = df.sort_values(["metaId", "frame"])[["x", "y"]].to_numpy(
        np.float32).reshape(N_TRAJ, TOTAL, 2)
    trajectory = torch.tensor(traj_all[:BATCH])
    gt_template = torch.tensor(ref.image_utils.create_gaussian_heatmap_template(
        size=TEMPLATE, kernlen=31, nsig=4, normalize=False)).float()
    input_template = torch.tensor(
        ref.image_utils.create_dist_mat(size=TEMPLATE)).float()
    criterion = nn.BCEWithLogitsLoss()

    scene_image = torch.tensor(image).permute(2, 0, 1)[None]
    observed = trajectory[:, :OBS].reshape(-1, 2).numpy()
    observed_map = torch.stack(get_patch(input_template, observed, H, W)
                               ).reshape(-1, OBS, H, W)
    gt_future = trajectory[:, OBS:]
    gt_future_map = torch.stack(get_patch(
        gt_template, gt_future.reshape(-1, 2).numpy(), H, W)
    ).reshape(-1, PRED, H, W)
    gt_way = gt_future[:, WAYPOINTS]
    gt_way_map = torch.stack(get_patch(
        input_template, gt_way.reshape(-1, 2).numpy(), H, W)
    ).reshape(-1, len(WAYPOINTS), H, W)

    sem = scene_image.expand(BATCH, -1, -1, -1)
    feats = tmodel.pred_features(sem, observed_map)
    pgm = tmodel.pred_goal(feats)
    goal_loss = criterion(pgm, gt_future_map) * LOSS_SCALE
    downs = [nn.AvgPool2d(2**i, 2**i)(gt_way_map)
             for i in range(1, len(feats))]
    ti = [torch.cat([f, g], dim=1)
          for f, g in zip(feats, [gt_way_map] + downs)]
    ptm = tmodel.pred_traj(ti)
    loss = goal_loss + criterion(ptm, gt_future_map) * LOSS_SCALE
    loss.backward()
    tgrads = {k: p.grad.detach() for k, p in tmodel.named_parameters()
              if p.grad is not None}
    tgrads_flat, _ = convert_torch_ynet(tgrads)

    # ---- jax side
    mask = freeze_lib.trainable_mask(params, "train", ())
    trainable, frozen = freeze_lib.split_params(params, mask)
    opt = optax.sgd(1.0)
    step = steps_lib.make_train_step(cfg, _scfg(), opt)
    batch = {"semantic": jnp.asarray(image[None]),
             "traj": jnp.asarray(traj_all[:BATCH]),
             "mask": jnp.ones(BATCH, jnp.float32)}
    new_tr, _, _, _ = step(trainable, frozen, state, opt.init(trainable),
                           batch)
    # grads = (old - new) / lr with lr=1.0
    from mst_tpu.train.checkpoints import flatten_tree

    old_flat = flatten_tree(trainable)
    new_flat = flatten_tree(new_tr)
    n_checked = 0
    for k, want in tgrads_flat.items():
        got = old_flat[k] - new_flat[k]
        # atol floor: the (old - new) reconstruction loses f32 resolution
        # relative to the WEIGHT magnitude (~|w| * 2^-23), on top of the
        # gradient-scale noise
        w_scale = float(np.abs(old_flat[k]).max())
        atol = 1e-3 * float(np.abs(want).max()) + 4e-7 * w_scale + 1e-9
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=atol,
                                   err_msg=k)
        n_checked += 1
    assert n_checked > 30


def test_evaluate_parity_vs_reference(setup):
    """The reference's evaluate() (real torch code: multinomial goal
    sampling, per-sample decode loop) and our eval step agree on mean
    min-over-K ADE/FDE over rounds — statistical parity per BASELINE.md
    (the RNG streams differ by construction; both sample the same
    Plackett-Luce distribution)."""
    df, image, tmodel = setup
    from utils.evaluate import evaluate

    cfg, params, state = _jax_setup(tmodel)
    loader, images = _loader_and_images(df, image)
    input_template = torch.tensor(
        ref.image_utils.create_dist_mat(size=TEMPLATE)).float()

    n_rounds = 4
    t_ades, t_fdes = [], []
    for r in range(n_rounds):
        torch.manual_seed(r)
        ade, fde, _, _ = evaluate(
            tmodel, loader, images, torch.device("cpu"), "sdd", None,
            input_template, WAYPOINTS, "test", n_goal=20, n_traj=1,
            obs_len=OBS, batch_size=BATCH, resize_factor=RESIZE,
            temperature=1.0, use_TTST=False, use_CWS=False)
        t_ades.append(ade)
        t_fdes.append(fde)

    eval_step = steps_lib.make_eval_step(cfg, _scfg())
    traj_all = df.sort_values(["metaId", "frame"])[["x", "y"]].to_numpy(
        np.float32).reshape(N_TRAJ, TOTAL, 2)
    batch = {"semantic": jnp.asarray(image[None]),
             "traj": jnp.asarray(traj_all),
             "mask": jnp.ones(N_TRAJ, jnp.float32)}
    j_ades, j_fdes = [], []
    for r in range(n_rounds):
        out = eval_step(params, state, batch, jax.random.PRNGKey(r))
        j_ades.append(float(out["ade_sum"]) / float(out["n"]))
        j_fdes.append(float(out["fde_sum"]) / float(out["n"]))

    t_ade, j_ade = np.mean(t_ades), np.mean(j_ades)
    t_fde, j_fde = np.mean(t_fdes), np.mean(j_fdes)
    # statistical tolerance: min-over-20 of matched distributions, 8 trajs
    # x 4 rounds; spread of the reference's own rounds bounds the noise
    tol = max(0.08 * t_ade, 2.5 * np.std(t_ades))
    assert abs(j_ade - t_ade) < tol, (j_ade, t_ade, t_ades, j_ades)
    tol_f = max(0.10 * t_fde, 2.5 * np.std(t_fdes))
    assert abs(j_fde - t_fde) < tol_f, (j_fde, t_fde, t_fdes, j_fdes)
