"""NumPy oracles re-implementing the reference's host-side numeric recipes.

These are *test-only* reimplementations of the formulas in
reference utils/image_utils.py (template construction + patch slicing) used
to validate the on-device rasterizers. They intentionally follow the
template-then-slice construction so the device kernels are checked against an
independent computation path.
"""

import numpy as np


def gkern(kernlen=31, nsig=4):
    """Gaussian kernel grid (reference: utils/image_utils.py:7-12)."""
    ax = np.linspace(-(kernlen - 1) / 2.0, (kernlen - 1) / 2.0, kernlen)
    xx, yy = np.meshgrid(ax, ax)
    kernel = np.exp(-0.5 * (np.square(xx) + np.square(yy)) / np.square(nsig))
    return kernel / np.sum(kernel)


def gaussian_heatmap_template(size, kernlen=31, nsig=4, normalize=False):
    """reference: utils/image_utils.py:15-27."""
    template = np.zeros([size, size])
    kernel = gkern(kernlen=kernlen, nsig=nsig)
    m = kernel.shape[0]
    x_low = size // 2 - int(np.floor(m / 2))
    x_up = size // 2 + int(np.ceil(m / 2))
    template[x_low:x_up, x_low:x_up] = kernel
    if normalize:
        template = template / template.max()
    return template


def dist_mat_template(size, normalize=True):
    """reference: utils/image_utils.py:30-37."""
    middle = size // 2
    dist = np.linalg.norm(
        np.indices([size, size]) - np.array([middle, middle])[:, None, None],
        axis=0)
    if normalize:
        dist = dist / dist.max() * 2
    return dist


def get_patch(template, traj, H, W):
    """reference: utils/image_utils.py:40-63."""
    x = np.round(traj[:, 0]).astype("int")
    y = np.round(traj[:, 1]).astype("int")
    x_low = template.shape[1] // 2 - x
    x_up = template.shape[1] // 2 + W - x
    y_low = template.shape[0] // 2 - y
    y_up = template.shape[0] // 2 + H - y
    return np.stack([
        template[y_l:y_u, x_l:x_u]
        for x_l, x_u, y_l, y_u in zip(x_low, x_up, y_low, y_up)
    ])


def softargmax2d_oracle(logits, eps=1e-6):
    """reference: utils/softargmax.py:55-81 (normalized_coordinates=False)."""
    b, c, h, w = logits.shape
    x = logits.reshape(b, c, -1)
    exp_x = np.exp(x - x.max(axis=-1, keepdims=True))
    inv = 1.0 / (exp_x.sum(axis=-1, keepdims=True) + eps)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos_x = xs.reshape(-1)
    pos_y = ys.reshape(-1)
    ex = ((pos_x * exp_x) * inv).sum(axis=-1)
    ey = ((pos_y * exp_x) * inv).sum(axis=-1)
    return np.stack([ex, ey], axis=-1)
