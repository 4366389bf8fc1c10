"""Adaptation-strategy parameter partitioning.

The reference implements its train_net/position freeze matrix by mutating
requires_grad over nn.Module parameters (models/trainer.py:112-195). Here the
same matrix is a pure predicate over pytree paths; params split into a
(trainable, frozen) pair, the optimizer and the delta checkpoints see only
the trainable part (trainer.py:599-604 saves exactly the requires_grad set).

Strategy vocabulary (reference anchors):
- 'train' / 'all'                     -> everything but segmentation (trainer.py:116)
- 'encoder' [+ position levels]       -> trainer.py:120-127
- 'serial*' / 'parallel*'             -> adapter params only (trainer.py:129-135)
- 'mosa_<r>'                          -> params with 'lora' in name (trainer.py:137-139)
- 'semantic_<k>x<k>'                  -> semantic adapter conv (trainer.py:141-143)
- fusion combos scene/motion/fusion   -> Y-Net-Mod branch stages (trainer.py:145-171)
- 'biasEncoder'/'biasGoal'/'biasTraj'/'bias' -> trainer.py:173-180
- 'segmentation_{head,bias,bn,<layer>}' -> inside backbone (trainer.py:182-190)
- ynet_bias flag (additive)           -> trainer.py:194-195
"""

import re

import jax
import jax.numpy as jnp


def path_to_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


_FUSION_BRANCHES = {
    "scene": ("scene_stages",),
    "motion": ("motion_stages",),
    "fusion": ("fusion_stages",),
    "scene_fusion": ("scene_stages", "fusion_stages"),
    "motion_fusion": ("motion_stages", "fusion_stages"),
    "scene_motion": ("scene_stages", "motion_stages"),
}


def make_trainable_predicate(train_net: str, position=(), network=None,
                             ynet_bias: bool = False):
    """Return fn(path_str) -> bool, mirroring trainer.py:112-195."""
    position = [str(p) for p in position]

    def is_ynet_bias(p):
        return (p.endswith("/bias")
                and (p.startswith("encoder/") or p.startswith("goal_decoder/")
                     or p.startswith("traj_decoder/")))

    def base(p: str) -> bool:
        if train_net in ("all", "train"):
            return not p.startswith("segmentation")
        if train_net == "encoder" and not position:
            return p.startswith("encoder/")
        if train_net == "encoder" and position:
            # reference matches param_name.split('.')[1] against position —
            # i.e. the stage index (trainer.py:124-127)
            m = re.match(r"encoder/stages/(\w+)/", p)
            return bool(m) and m.group(1) in position
        if "serial" in train_net:
            return p.startswith("encoder/") and "serial" in p
        if "parallel" in train_net:
            return p.startswith("encoder/") and "parallel" in p
        if "mosa" in train_net:
            return p.startswith("encoder/") and "lora" in p
        if "semantic" in train_net:
            return "semantic_adapter" in p
        if network == "fusion" and train_net in _FUSION_BRANCHES:
            return any(p.startswith(f"encoder/{b}/")
                       for b in _FUSION_BRANCHES[train_net])
        if network == "fusion" and train_net == "scene_motion_fusion":
            return p.startswith("encoder/")
        if train_net == "biasEncoder":
            return p.startswith("encoder/") and p.endswith("/bias")
        if train_net == "biasGoal":
            return p.startswith("goal_decoder/") and p.endswith("/bias")
        if train_net == "biasTraj":
            return p.startswith("traj_decoder/") and p.endswith("/bias")
        if train_net == "bias":
            return is_ynet_bias(p)
        if train_net.startswith("segmentation"):
            layer = train_net.split("_")[1]
            if not p.startswith("segmentation/"):
                return False
            if layer in ("head", "bias", "bn"):
                return layer in p
            return re.search(rf"decoder/blocks/\d+/{layer}", p) is not None
        raise NotImplementedError(f"train_net={train_net}")

    def pred(p: str) -> bool:
        if p.startswith("segmentation") and not \
                train_net.startswith("segmentation"):
            return False  # backbone always frozen (trainer.py:113-114)
        if base(p):
            return True
        if ynet_bias and is_ynet_bias(p):
            return True
        return False

    return pred


def trainable_mask(params, train_net, position=(), network=None,
                   ynet_bias=False):
    """Boolean mask pytree: True where the strategy marks a leaf trainable."""
    pred = make_trainable_predicate(train_net, position, network, ynet_bias)
    return jax.tree_util.tree_map_with_path(
        lambda path, _: pred(path_to_str(path)), params)


def split_params(params, mask):
    """Partition params into (trainable, frozen); None marks absent leaves."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def merge_params(trainable, frozen):
    """Inverse of split_params."""
    return jax.tree.map(
        lambda a, b: b if a is None else a, trainable, frozen,
        is_leaf=lambda x: x is None)


def count_trainable(mask, params) -> int:
    flat_m = jax.tree_util.tree_leaves(mask)
    flat_p = jax.tree_util.tree_leaves(params)
    return sum(int(jnp.size(p)) for m, p in zip(flat_m, flat_p) if m)
