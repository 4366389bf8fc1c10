#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
# counterpart of reference scripts/inD/scene1_car_to_truck/ynet/pretrain.sh — same constants,
# checkpoints as .npz pytrees, no GPU pinning (TPU runtime)
set -e

list_train_seed=(1)
batch_size=10
n_epoch=300
n_early_stop=3000
n_round=3
config_filename=inD_shortterm_train.yaml
ckpt_path=ckpts
network=original
train_net=train
dataset_path=filter/shortterm/agent_type/scene1/car_filter
load_data=predefined

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for train_seed in ${list_train_seed[@]}; do
  python train.py --config_filename $config_filename --seed $train_seed \
    --batch_size $batch_size --n_epoch $n_epoch \
    --n_early_stop $n_early_stop --n_round $n_round \
    --dataset_path $dataset_path --network $network \
    --load_data $load_data --train_net $train_net --ckpt_path $ckpt_path \
    --augment
done
