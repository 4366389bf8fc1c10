#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


# Convert released reference checkpoints (torch) into npz pytrees.
# Requires the reference's data bundle (scripts/get_pretrained_model_and_data.sh
# in the reference repo) and, for the segmentation backbone, a torch env with
# segmentation_models_pytorch to unpickle + export the state dict.
for f in ckpts/*.pt; do
  python -m mst_tpu.models.convert ynet "$f" "${f%.pt}.npz"
done
python -m mst_tpu.models.convert segmentation \
  data/sdd/sdd_segmentation_state_dict.pt data/sdd/sdd_segmentation.npz
