"""Synthetic micro-dataset: CPU-runnable end-to-end fixture.

Generates a deterministic toy "drone scene": a random RGB-like image plus
smooth random-walk trajectories in the reference DataFrame schema
(x, y, frame, trackId, sceneId, metaId, label). Used by the e2e tests and
bench warm-up; real SDD/inD data flows through the identical pipeline.
"""

import numpy as np
import pandas as pd


def make_synthetic_scene_df(rng, scene_id="synth_0", n_traj=16, total_len=20,
                            img_hw=(240, 320), label="Pedestrian",
                            speed=6.0):
    H, W = img_hw
    rows = []
    for t in range(n_traj):
        start = np.array([rng.uniform(0.2, 0.8) * W,
                          rng.uniform(0.2, 0.8) * H])
        heading = rng.uniform(0, 2 * np.pi)
        pos = start.copy()
        for f in range(total_len):
            heading += rng.normal(0, 0.15)
            pos = pos + speed * np.array([np.cos(heading), np.sin(heading)])
            pos[0] = np.clip(pos[0], 8, W - 8)
            pos[1] = np.clip(pos[1], 8, H - 8)
            rows.append(dict(x=pos[0], y=pos[1], frame=f, trackId=t,
                             sceneId=scene_id, metaId=t, label=label))
    return pd.DataFrame(rows)


def make_synthetic_dataset(seed=0, n_scenes=2, n_traj=16, total_len=20,
                           img_hw=(240, 320), n_channels=3):
    """Returns (df, images dict of float32 HWC in [0, 1))."""
    rng = np.random.default_rng(seed)
    dfs, images = [], {}
    meta_offset = 0
    for s in range(n_scenes):
        scene_id = f"synth_{s}"
        df = make_synthetic_scene_df(rng, scene_id, n_traj, total_len, img_hw)
        df["metaId"] = df["metaId"] + meta_offset
        meta_offset = df["metaId"].max() + 1
        dfs.append(df)
        images[scene_id] = rng.uniform(
            0, 1, size=(*img_hw, n_channels)).astype(np.float32)
    return pd.concat(dfs, ignore_index=True), images
