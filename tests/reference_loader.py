"""Import the ACTUAL reference source at /root/reference as a test oracle.

The reference depends on two packages this image does not ship:

- ``loralib`` (0.1.1): only ``loralib.Conv2d`` is used (reference
  models/ynet.py:4,141-144). We vendor a minimal functional stub below with
  the public loralib semantics (factored ``lora_B @ lora_A`` merged-weight
  conv, scaling = alpha / r, zero-init B) — enough to instantiate the real
  ``YNet`` and export state dicts with the real parameter names.
- ``segmentation_models_pytorch``: only needed when
  ``segmentation_model_fp`` is not None; parity tests pass ``None`` so the
  backbone is ``nn.Identity`` (reference models/ynet.py:495-507).

``load_reference()`` installs the stub, puts /root/reference on sys.path and
returns a namespace of the reference modules. All parity tests go through
this so any drift between mst_tpu and the real reference code fails loudly.
"""

import math
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

os.environ.setdefault("MPLBACKEND", "Agg")


def _build_loralib_stub():
    import torch.nn as nn
    import torch.nn.functional as F

    class Conv2d(nn.Conv2d):
        """Minimal loralib.Conv2d: base conv (frozen) + low-rank update.

        Matches loralib's factor shapes — lora_A (r*k, in*k),
        lora_B (out*k, r*k) — and its effective weight
        W + (B @ A).view(W.shape) * (alpha / r), so converted checkpoints
        exercise the exact name mapping and merge formula.
        """

        def __init__(self, in_channels, out_channels, kernel_size, r=0,
                     lora_alpha=1, lora_dropout=0.0, merge_weights=True,
                     **kwargs):
            super().__init__(in_channels, out_channels, kernel_size, **kwargs)
            assert isinstance(kernel_size, int)
            self.r = r
            self.lora_alpha = lora_alpha
            self.merged = False
            if r > 0:
                self.lora_A = nn.Parameter(self.weight.new_zeros(
                    (r * kernel_size, in_channels * kernel_size)))
                self.lora_B = nn.Parameter(self.weight.new_zeros(
                    (out_channels // self.groups * kernel_size,
                     r * kernel_size)))
                self.scaling = self.lora_alpha / self.r
                self.weight.requires_grad = False
                nn.init.kaiming_uniform_(self.lora_A, a=math.sqrt(5))
                nn.init.zeros_(self.lora_B)

        def forward(self, x):
            if self.r > 0 and not self.merged:
                w = self.weight + (
                    self.lora_B @ self.lora_A).view(self.weight.shape
                                                    ) * self.scaling
                return F.conv2d(x, w, self.bias, self.stride, self.padding,
                                self.dilation, self.groups)
            return super().forward(x)

    mod = types.ModuleType("loralib")
    mod.Conv2d = Conv2d
    return mod


def _build_smp_stub():
    """Minimal segmentation_models_pytorch.encoders.get_preprocessing_fn.

    Only used by the reference's preprocess_image_for_segmentation
    (utils/image_utils.py:66-82, function-local import). The real smp
    preprocessing for (resnet101, imagenet) is pretrainedmodels'
    preprocess_input with input_space='RGB' (no channel swap),
    input_range=(0, 1) (divide by 255 when max > 1), then the imagenet
    mean/std normalization — reproduced verbatim here so the reference
    trainer's full prepare_data path can run as an oracle.
    """
    import numpy as np

    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])

    def get_preprocessing_fn(encoder, pretrained="imagenet"):
        def preprocess(x):
            x = np.asarray(x, dtype=np.float64)
            if x.max() > 1:
                x = x / 255.0
            return (x - mean) / std

        return preprocess

    mod = types.ModuleType("segmentation_models_pytorch")
    encoders = types.ModuleType("segmentation_models_pytorch.encoders")
    encoders.get_preprocessing_fn = get_preprocessing_fn
    mod.encoders = encoders
    sys.modules["segmentation_models_pytorch.encoders"] = encoders
    return mod


_cache = None


def load_reference():
    """Returns a namespace with the reference's modules (singleton)."""
    global _cache
    if _cache is not None:
        return _cache

    if "loralib" not in sys.modules:
        sys.modules["loralib"] = _build_loralib_stub()
    if "segmentation_models_pytorch" not in sys.modules:
        try:
            import segmentation_models_pytorch  # noqa: F401
        except ImportError:
            sys.modules["segmentation_models_pytorch"] = _build_smp_stub()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import utils.data_utils as ref_data_utils
    import utils.evaluate as ref_evaluate
    import utils.extract_log as ref_extract_log
    import utils.filter_dataset as ref_filter_dataset
    import utils.image_utils as ref_image_utils
    import utils.kmeans as ref_kmeans
    import utils.softargmax as ref_softargmax
    import utils.train_epoch as ref_train_epoch
    import utils.dataloader as ref_dataloader
    import models.trainer as ref_trainer
    import models.ynet as ref_ynet

    ns = types.SimpleNamespace(
        data_utils=ref_data_utils,
        evaluate=ref_evaluate,
        extract_log=ref_extract_log,
        filter_dataset=ref_filter_dataset,
        image_utils=ref_image_utils,
        kmeans=ref_kmeans,
        softargmax=ref_softargmax,
        train_epoch=ref_train_epoch,
        dataloader=ref_dataloader,
        trainer=ref_trainer,
        ynet=ref_ynet,
    )
    _cache = ns
    return ns
