#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


# Build inD style-bucket datasets (reference scripts/inD/preprocessing.sh)
python -m mst_tpu.data.ind --raw_data_dir data/inD-dataset-v1.0/data \
  --filter_data_dir data/inD-dataset-v1.0/filter/longterm \
  --step 25 --window_size 35 --stride 35 --obs_len 5 \
  --varf agent_type --labels pedestrian car truck_bus \
  --selected_scenes scene1 scene2 scene3 scene4
