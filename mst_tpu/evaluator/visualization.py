"""Plot library (reference evaluator/visualization.py, re-built lean).

Covers the analysis figures the reference tooling produces: few-shot ADE
curves, trajectory/prediction overlays on scene images, goal-map heatmaps,
importance bars, training curves. Matplotlib with the Agg backend; every
function writes png files under out_dir and returns the figure paths.
"""

import os
import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _save(fig, out_dir, name, fmt="png"):
    pathlib.Path(out_dir).mkdir(parents=True, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.{fmt}")
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return path


def plot_fewshot_curves(df, out_dir, metric="ade",
                        x_col="n_train", hue_col="train_net",
                        title="few-shot adaptation"):
    """ADE/FDE vs number of adaptation samples, one line per strategy
    (reference visualization.py:34-81)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for name, g in df.groupby(hue_col):
        g = g.sort_values(x_col)
        agg = g.groupby(x_col)[metric].agg(["mean", "std"])
        ax.errorbar(agg.index, agg["mean"], yerr=agg["std"].fillna(0),
                    marker="o", capsize=3, label=str(name))
    ax.set_xlabel("# adaptation samples")
    ax.set_ylabel(metric.upper())
    ax.set_title(title)
    ax.legend()
    return _save(fig, out_dir, f"fewshot_{metric}")


def plot_trajectories_on_scene(image, trajectories, out_dir, name,
                               obs_len=None, preds=None, gt_color="C0",
                               pred_color="C3"):
    """Observed/GT trajectories (and optional predictions) over the scene
    image (reference plot_given_trajectories_scenes_overlay /
    plot_prediction, visualization.py:966-1151)."""
    fig, ax = plt.subplots(figsize=(7, 7))
    img = np.asarray(image)
    if img.ndim == 3 and img.shape[-1] == 3:
        ax.imshow(img[..., ::-1] if img.dtype == np.uint8 else img)
    else:
        ax.imshow(img, cmap="gray")
    for i, traj in enumerate(np.asarray(trajectories)):
        ax.plot(traj[:, 0], traj[:, 1], "-", color=gt_color, lw=1.2,
                label="groundtruth" if i == 0 else None)
        if obs_len:
            ax.plot(traj[:obs_len, 0], traj[:obs_len, 1], "-", color="k",
                    lw=1.2, label="observed" if i == 0 else None)
        ax.scatter(traj[-1, 0], traj[-1, 1], s=12, color=gt_color)
    if preds is not None:
        for i, traj in enumerate(np.asarray(preds)):
            ax.plot(traj[:, 0], traj[:, 1], "--", color=pred_color, lw=1.2,
                    label="prediction" if i == 0 else None)
    ax.legend(loc="upper right")
    ax.set_axis_off()
    return _save(fig, out_dir, name)


def plot_goal_map(goal_map, out_dir, name, points=None):
    """Sigmoid goal-probability heatmap with optional sampled points
    (reference visualize_activation.py:66-106)."""
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(np.asarray(goal_map), cmap="viridis")
    if points is not None:
        pts = np.asarray(points).reshape(-1, 2)
        ax.scatter(pts[:, 0], pts[:, 1], s=10, c="r", marker="x")
    ax.set_axis_off()
    return _save(fig, out_dir, name)


def plot_importance(df, out_dir, name="importance", group_col="group",
                    metric="ade", baseline_group="none"):
    """Bar chart of metric change per swapped/zeroed parameter group
    (reference visualization.py:1386-1547)."""
    base = df[df[group_col] == baseline_group][metric]
    base = float(base.iloc[0]) if len(base) else 0.0
    rest = df[df[group_col] != baseline_group]
    fig, ax = plt.subplots(figsize=(max(6, 0.5 * len(rest)), 4))
    ax.bar(rest[group_col].astype(str), rest[metric] - base)
    ax.axhline(0, color="k", lw=0.8)
    ax.set_ylabel(f"Δ{metric.upper()} vs {baseline_group} ({base:.2f})")
    ax.tick_params(axis="x", rotation=75)
    return _save(fig, out_dir, name)


def plot_training_curves(val_ade, val_fde, out_dir, name="training_curve",
                         window=1):
    """Val metric curves, optionally moving-averaged (reference
    utils/extract_training_curve.py:33-120)."""
    fig, ax = plt.subplots(figsize=(6, 4))

    def smooth(xs):
        xs = np.asarray(xs, float)
        if window <= 1:
            return xs
        kernel = np.ones(window) / window
        return np.convolve(xs, kernel, mode="valid")

    ax.plot(smooth(val_ade), label="val ADE")
    ax.plot(smooth(val_fde), label="val FDE")
    ax.set_xlabel("epoch")
    ax.legend()
    return _save(fig, out_dir, name)


def plot_input_space(semantic, observed_map, out_dir, name="input_space"):
    """Tile the semantic channels + motion heatmap channels (reference
    plot_input_space, visualization.py:83+)."""
    sem = np.asarray(semantic)
    obs = np.asarray(observed_map)
    n = sem.shape[-1] + obs.shape[-1]
    cols = min(n, 6)
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(2.2 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for i in range(sem.shape[-1]):
        axes[i].imshow(sem[..., i])
        axes[i].set_title(f"sem[{i}]", fontsize=7)
    for j in range(obs.shape[-1]):
        axes[sem.shape[-1] + j].imshow(obs[..., j])
        axes[sem.shape[-1] + j].set_title(f"obs[{j}]", fontsize=7)
    for ax in axes:
        ax.set_axis_off()
    return _save(fig, out_dir, name)
