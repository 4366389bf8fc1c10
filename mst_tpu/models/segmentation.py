"""Semantic-segmentation backbone (U-Net / ResNet101, smp-compatible).

The reference ships the backbone as a *pickled torch module*
(models/ynet.py:495-507, torch.load of an smp Unet('resnet101')). Here it is
a functional JAX U-Net whose parameters are converted ONCE from the released
.pth into a plain array pytree (mst_tpu.models.convert) — weights as data,
never pickled code. The backbone is always frozen during Y-Net training
(reference trainer.py:113-114) unless a 'segmentation_*' strategy selects
parts of it.

Until converted weights are present, `load_params` accepts .npz pytrees; an
absent file (or segmentation_model_fp=None) falls back to the identity
backbone, matching the reference's nn.Identity path (ynet.py:507).
"""

import os

import numpy as np


def load_params(path):
    """Load converted backbone weights (.npz flat pytree) or None.

    Device-resident on return: the backbone is called once per scene from
    the host path, and numpy leaves would re-stage the full ~170 MB
    parameter set on EVERY call (measured 0.30 s/call over the tunneled
    v5e vs 0.57 ms with device-put params — the transfer, not the
    ResNet101 compute, was the cost)."""
    from mst_tpu.train.checkpoints import load_checkpoint, unflatten_dict

    if path is None or not os.path.exists(path):
        return None
    import jax

    return jax.device_put(unflatten_dict(load_checkpoint(path)))


_jit_apply = None


def apply(params, image, use_features_only=False, bn_state=None,
          train=False):
    """(B, H, W, 3) preprocessed image -> (B, H, W, n_classes) logits.

    Identity when params is None (reference ynet.py:507). bn_state/train
    drive the e_unfreeze BN-adaptation mode (see unet.unet_apply); with
    train=True returns (out, bn_updates).

    Jitted: the host-side per-scene path (trainer._semantic_for) calls
    this directly, and an unjitted ResNet101 is ~350 op-by-op dispatches
    — measured 5.7 s/scene over the tunneled v5e vs ~milliseconds as one
    program. Inside already-jitted programs (in-step segmentation) the
    nested jit is inlined and free.
    """
    if params is None:
        return (image, {}) if train else image
    global _jit_apply
    if _jit_apply is None:
        import jax

        from mst_tpu.models.unet import unet_apply

        _jit_apply = jax.jit(
            unet_apply, static_argnames=("use_features_only", "train"))
    return _jit_apply(params, image, use_features_only=use_features_only,
                      bn_state=bn_state, train=train)
