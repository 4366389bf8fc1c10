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


# ---------------------------------------------------------------------------
# cross-scene shape-bucketed batching
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BucketedBatch:
    """A batch whose rows may come from multiple scenes sharing one padded
    (H, W) image shape.

    The reference's DataLoader(batch_size=1) heritage pins every batch to
    one scene (utils/dataloader.py:8-50, models/trainer.py:574-576), so
    each scene's last chunk is padding and B never exceeds the scene's
    trajectory count. Here trajectories from all scenes of a shape bucket
    fill every batch completely: the <= S distinct semantic maps are
    stacked and each row gathers its map by scene_idx inside the step.
    """
    scene_ids: tuple  # (S,) distinct scene ids of this batch's bucket slice
    images: np.ndarray  # (S, H, W, C) preprocessed scene images
    scene_idx: np.ndarray  # (B,) int32 row -> slot in images/scene_ids
    trajectories: np.ndarray  # (B, total_len, 2) resized pixel coords
    mask: np.ndarray  # (B,) float32, 1.0 = real trajectory
    meta_ids: np.ndarray  # (B,) int64, -1 = padding

    @property
    def shape_key(self):
        return (self.images.shape, self.trajectories.shape[0])

    # duck-typing with SceneBatch for the trainer's cache/device plumbing
    @property
    def scene_id(self):
        return self.scene_ids

    @property
    def image(self):
        return self.images


def make_bucketed_batches(
    df: pd.DataFrame,
    images: Dict[str, np.ndarray],
    total_len: int,
    batch_size: int,
    resize_factor: float,
    shuffle: bool = False,
    rng: Optional[np.random.Generator] = None,
    max_scenes_per_batch: int = 8,
) -> List[BucketedBatch]:
    """Cross-scene batches: rows from scenes sharing a padded (H, W) image
    shape fill each batch completely (only each scene-group's final batch
    can carry padding — one partial batch per <= max_scenes_per_batch
    scenes instead of one per scene).

    Within a group every batch stacks the SAME <= max_scenes_per_batch
    scene images in the same slot order, so the trainer's semantic cache
    (keyed on the scene-ids tuple) transfers/segments the stack ONCE per
    group, and one program per (image shape, S, B) compiles.
    max_scenes_per_batch bounds the stacked-semantic memory (a 30-scene
    pretrain bucket must not put 30 full maps in every batch).
    """
    per_scene = split_trajectories_by_scene(df, total_len)
    if shuffle and rng is None:
        rng = np.random.default_rng()

    # bucket scenes by padded image shape
    buckets: Dict[tuple, List[str]] = {}
    for scene_id in per_scene:
        buckets.setdefault(images[scene_id].shape, []).append(scene_id)

    batches: List[BucketedBatch] = []
    bucket_keys = sorted(buckets, key=str)
    if shuffle:
        rng.shuffle(bucket_keys)
    for shape in bucket_keys:
        bucket_scenes = sorted(buckets[shape])
        if shuffle:
            rng.shuffle(bucket_scenes)
        for g0 in range(0, len(bucket_scenes), max_scenes_per_batch):
            scene_ids = tuple(bucket_scenes[g0:g0 + max_scenes_per_batch])
            stack = np.stack([images[s] for s in scene_ids])
            rows_traj, rows_meta, rows_idx = [], [], []
            for slot, scene_id in enumerate(scene_ids):
                trajs, metas = per_scene[scene_id]
                rows_traj.append(trajs * resize_factor)
                rows_meta.append(metas)
                rows_idx.append(np.full(len(trajs), slot, np.int32))
            trajs = np.concatenate(rows_traj)
            metas = np.concatenate(rows_meta).astype(np.int64)
            idx = np.concatenate(rows_idx)
            if shuffle:
                perm = rng.permutation(len(trajs))
                trajs, metas, idx = trajs[perm], metas[perm], idx[perm]
            n = len(trajs)
            for start in range(0, n, batch_size):
                chunk = trajs[start:start + batch_size]
                meta_chunk = metas[start:start + batch_size]
                idx_chunk = idx[start:start + batch_size]
                b = len(chunk)
                if b < batch_size:
                    pad = batch_size - b
                    chunk = np.concatenate(
                        [chunk, np.zeros((pad, total_len, 2), np.float32)])
                    meta_chunk = np.concatenate(
                        [meta_chunk, -np.ones(pad, np.int64)])
                    idx_chunk = np.concatenate(
                        [idx_chunk, np.zeros(pad, np.int32)])
                mask = np.zeros(batch_size, np.float32)
                mask[:b] = 1.0
                batches.append(BucketedBatch(
                    scene_ids, stack, idx_chunk.astype(np.int32), chunk,
                    mask, meta_chunk))
    return batches
