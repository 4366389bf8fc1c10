"""Scene-image pipeline (host-side cv2 load; deterministic preprocessing).

Matches the reference image path (utils/image_utils.py:66-107,
utils/data_utils.py:248-263): load per-scene reference image, resize by
factor (INTER_AREA), pad bottom/right to a multiple of the encoder's
division factor, normalize with the segmentation backbone's imagenet stats.

Note on channel order: the reference feeds cv2's BGR image straight into
smp's (RGB-trained) preprocessing (image_utils.py:66-82 never swaps
channels); we reproduce that behavior for checkpoint parity.
"""

import os

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def scene_image_path(image_path, scene, image_file, use_raw_data=False):
    """reference data_utils.py:248-263."""
    if use_raw_data:
        scene_name, scene_idx = scene.split("_")
        return os.path.join(image_path, scene_name, f"video{scene_idx}",
                            image_file)
    return os.path.join(image_path, scene, image_file)


def load_images(scenes, image_path, image_file="reference.jpg",
                use_raw_data=False, seg_mask=False):
    images = {}
    for scene in scenes:
        p = scene_image_path(image_path, scene, image_file, use_raw_data)
        im = cv2.imread(p, 0) if seg_mask else cv2.imread(p)
        if im is None:
            raise FileNotFoundError(p)
        images[scene] = im
    return images


def resize_images(images, factor, seg_mask=False):
    """reference image_utils.py:85-92 (INTER_AREA / NEAREST for masks)."""
    interp = cv2.INTER_NEAREST if seg_mask else cv2.INTER_AREA
    return {k: cv2.resize(im, (0, 0), fx=factor, fy=factor,
                          interpolation=interp)
            for k, im in images.items()}


def pad_images(images, division_factor=32):
    """Bottom/right zero pad to a multiple (image_utils.py:95-107)."""
    out = {}
    for k, im in images.items():
        H, W = im.shape[:2]
        Hn = int(np.ceil(H / division_factor) * division_factor)
        Wn = int(np.ceil(W / division_factor) * division_factor)
        out[k] = cv2.copyMakeBorder(im, 0, Hn - H, 0, Wn - W,
                                    cv2.BORDER_CONSTANT)
    return out


def normalize_for_segmentation(images, seg_mask=False, classes=6):
    """imagenet normalization / one-hot for masks (image_utils.py:66-82).

    Returns float32 HWC arrays (NHWC layout for TPU; the reference
    transposes to CHW for torch).
    """
    out = {}
    for k, im in images.items():
        if seg_mask:
            im = np.stack([(im == v) for v in range(classes)], axis=-1)
            im = im.astype(np.float32)
        else:
            im = im.astype(np.float32)
            if im.max() > 1:
                im = im / 255.0
            im = (im - IMAGENET_MEAN) / IMAGENET_STD
        out[k] = np.ascontiguousarray(im, np.float32)
    return out


def preprocess_scene_images(images, resize_factor, division_factor=32,
                            seg_mask=False, classes=6):
    images = resize_images(images, resize_factor, seg_mask)
    images = pad_images(images, division_factor)
    return normalize_for_segmentation(images, seg_mask, classes)


def swap_pavement_terrain(semantic_img):
    """Swap semantic channels 1 and 2, NHWC (image_utils.py:165-173)."""
    perm = list(range(semantic_img.shape[-1]))
    perm[1], perm[2] = perm[2], perm[1]
    return semantic_img[..., perm]


# ---------------------------------------------------------------------------
# augmentation (reference data_utils.py:115-233)
# ---------------------------------------------------------------------------

# one cv2 call per quarter-turn count (a k-times ROTATE_90 loop pays k full
# image passes for the same result)
_ROT_CODES = {1: cv2.ROTATE_90_COUNTERCLOCKWISE, 2: cv2.ROTATE_180,
              3: cv2.ROTATE_90_CLOCKWISE}


def rot_df_image(df, image, k=1):
    """Rotate image + coordinates CCW by k*90 deg (data_utils.py:115-144)."""
    xy = df.copy()
    y0, x0 = image.shape[:2]
    xy["x"] = xy["x"] - x0 / 2
    xy["y"] = xy["y"] - y0 / 2
    c, s = np.cos(-k * np.pi / 2), np.sin(-k * np.pi / 2)
    R = np.array([[c, s], [-s, c]])
    xy[["x", "y"]] = xy[["x", "y"]].to_numpy() @ R
    if k % 4:
        image = cv2.rotate(image, _ROT_CODES[k % 4])
    y0, x0 = image.shape[:2]
    xy["x"] = xy["x"] + x0 / 2
    xy["y"] = xy["y"] + y0 / 2
    return xy, image


def fliplr_df_image(df, image):
    """Horizontal flip of image + coordinates (data_utils.py:147-173)."""
    xy = df.copy()
    y0, x0 = image.shape[:2]
    xy["x"] = x0 / 2 - (xy["x"] - x0 / 2)
    image = cv2.flip(image, 1)
    return xy, image


def augment_data(data, images):
    """rot90 x {1,2,3} + fliplr pseudo-scenes (data_utils.py:176-233).

    Args:
      data: trajectory df (x, y, metaId, sceneId columns).
      images: dict sceneId -> raw image (will be extended in place).
    Returns (augmented df, images dict).
    """
    import pandas as pd

    k2rot = {1: "_rot90", 2: "_rot180", 3: "_rot270"}
    data_orig = data.copy()
    # pieces are collected and concatenated ONCE per phase: the reference's
    # concat-inside-the-loop (data_utils.py:186,208) re-copies the growing
    # frame per scene; the metaId offsets only depend on the running max,
    # which is tracked as a scalar, so the row order and ids are identical
    pieces = [data]
    meta_max = data["metaId"].max()
    for k in (1, 2, 3):
        k_pieces = []
        for scene in data_orig.sceneId.unique():
            df_rot, im_rot = rot_df_image(
                data_orig[data_orig.sceneId == scene], images[scene], k)
            new_scene = scene + k2rot[k]
            images[new_scene] = im_rot
            df_rot["sceneId"] = new_scene
            df_rot["metaId"] = df_rot["metaId"] + meta_max + 1
            k_pieces.append(df_rot)
        pieces.extend(k_pieces)
        if k_pieces:
            meta_max = max(p["metaId"].max() for p in k_pieces)
    data = pd.concat(pieces, axis=0)

    meta_max = data["metaId"].max()
    flip_pieces = [data]
    for scene in list(data.sceneId.unique()):
        df_flip, im_flip = fliplr_df_image(
            data[data.sceneId == scene], images[scene])
        df_flip["sceneId"] = df_flip["sceneId"] + "_fliplr"
        df_flip["metaId"] = df_flip["metaId"] + meta_max + 1
        flip_pieces.append(df_flip)
        images[scene + "_fliplr"] = im_flip
    return pd.concat(flip_pieces, axis=0), images
