"""Scene-grouped, fixed-shape batching for XLA.

The reference iterates a DataLoader(batch_size=1) yielding *one scene's
entire trajectory set* per step, then mini-batches in Python
(utils/dataloader.py:8-50, utils/train_epoch.py:44, utils/evaluate.py:109).
Under jit we need static shapes: trajectories are grouped per scene, padded
to the configured batch size with a validity mask, and scenes are keyed by
their padded image shape so each (H, W, B) bucket compiles exactly once.
"""

import dataclasses
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


@dataclasses.dataclass
class SceneBatch:
    scene_id: str
    image: np.ndarray  # (H, W, C) preprocessed scene image
    trajectories: np.ndarray  # (B, total_len, 2) resized pixel coords
    mask: np.ndarray  # (B,) float32, 1.0 = real trajectory
    meta_ids: np.ndarray  # (B,) int64, -1 = padding

    @property
    def shape_key(self):
        return (self.image.shape, self.trajectories.shape[0])


def split_trajectories_by_scene(df: pd.DataFrame, total_len: int):
    """sceneId -> (n_traj, total_len, 2) float32 array + metaIds.

    reference dataloader.py:30-39 (row order within metaId is preserved).
    """
    out = {}
    for scene_id, g in df.groupby("sceneId", sort=True):
        xy = g[["x", "y"]].to_numpy(dtype=np.float32)
        assert len(xy) % total_len == 0, \
            f"scene {scene_id}: {len(xy)} rows not divisible by {total_len}"
        trajs = xy.reshape(-1, total_len, 2)
        metas = g["metaId"].to_numpy()[::total_len]
        out[scene_id] = (trajs, metas)
    return out


def make_scene_batches(
    df: pd.DataFrame,
    images: Dict[str, np.ndarray],
    total_len: int,
    batch_size: int,
    resize_factor: float,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> List[SceneBatch]:
    """Build fixed-shape batches: per scene, chunks of `batch_size` trajs.

    Trajectories are scaled by resize_factor to image scale
    (reference dataloader.py:19). The final chunk of each scene is padded and
    masked rather than shortened, so every batch in a scene shares one
    compiled program.
    """
    per_scene = split_trajectories_by_scene(df, total_len)
    scene_ids = list(per_scene)
    if shuffle and rng is None:
        rng = np.random.default_rng()  # one generator for BOTH shuffles
    if shuffle:
        rng.shuffle(scene_ids)

    batches = []
    for scene_id in scene_ids:
        trajs, metas = per_scene[scene_id]
        trajs = trajs * resize_factor
        if shuffle:
            perm = rng.permutation(len(trajs))
            trajs, metas = trajs[perm], metas[perm]
        img = images[scene_id]
        n = len(trajs)
        for start in range(0, n, batch_size):
            chunk = trajs[start:start + batch_size]
            meta_chunk = metas[start:start + batch_size]
            b = len(chunk)
            if b < batch_size:
                pad = batch_size - b
                chunk = np.concatenate(
                    [chunk, np.zeros((pad, total_len, 2), np.float32)])
                meta_chunk = np.concatenate(
                    [meta_chunk, -np.ones(pad, np.int64)])
            mask = np.zeros(batch_size, np.float32)
            mask[:b] = 1.0
            batches.append(SceneBatch(scene_id, img, chunk, mask,
                                      meta_chunk.astype(np.int64)))
    return batches


def bucket_by_shape(batches: List[SceneBatch]):
    """Group batches by compiled-program key (image shape, batch size)."""
    buckets = {}
    for b in batches:
        buckets.setdefault(b.shape_key, []).append(b)
    return buckets
