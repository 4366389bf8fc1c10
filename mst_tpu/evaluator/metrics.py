"""Metric helpers + ETH/UCY world-coordinate conversion."""

import numpy as np
import pandas as pd


def min_ade_fde(gt_future, trajs_samples, goal_samples, resize_factor):
    """NumPy oracle of the eval metric (reference evaluate.py:276-291).

    gt_future (B, T, 2), trajs_samples (K, B, T, 2), goal_samples (K, B, 2).
    Returns (ade (B,), fde (B,)) in raw-image pixels.
    """
    diff = (gt_future[None] - trajs_samples) / resize_factor
    ade_k = np.sqrt((diff**2).sum(-1)).mean(-1)
    gdiff = (gt_future[None, :, -1] - goal_samples) / resize_factor
    fde_k = np.sqrt((gdiff**2).sum(-1))
    return ade_k.min(0), fde_k.min(0)


def image2world(image_coords, scene, homo_mat, resize):
    """Pixel -> world coordinates via homography (reference
    utils/image_utils.py:138-162). image_coords (..., T, 2) ndarray."""
    coords = np.array(image_coords, dtype=np.float64)
    shape = coords.shape
    traj = coords.reshape(-1, shape[-2], 2)
    if scene in ("eth", "hotel"):
        traj = traj[..., ::-1]
    traj = traj / resize
    ones = np.ones((*traj.shape[:-1], 1))
    homog = np.concatenate([traj, ones], axis=-1).reshape(-1, 3)
    world = (np.asarray(homo_mat[scene]) @ homog.T).T
    world = world / world[:, 2:]
    return world[:, :2].reshape(shape)


def metrics_dataframe(meta_ids, scene_ids, ade, fde):
    """Per-trajectory metric table (reference evaluate.py:297-307)."""
    return pd.DataFrame({"metaId": meta_ids, "sceneId": scene_ids,
                         "ade": ade, "fde": fde})
