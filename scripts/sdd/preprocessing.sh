#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


# Build SDD style-bucket datasets (reference scripts/sdd/preprocessing.sh)
python -m mst_tpu.data.sdd --raw_data_dir data/sdd/raw \
  --filter_data_dir data/sdd/filter/shortterm \
  --step 12 --window_size 20 --stride 20 --obs_len 8 \
  --varf agent_type --labels Pedestrian Biker \
  --selected_scenes deathCircle_0
python -m mst_tpu.data.sdd --reload --raw_data_dir data/sdd/raw \
  --filter_data_dir data/sdd/filter/shortterm \
  --step 12 --window_size 20 --stride 20 --obs_len 8 \
  --varf avg_vel --labels Biker
