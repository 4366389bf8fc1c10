#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


batch_size=10
n_round=3
network=fusion
load_data=sequential
dataset_path=filter/shortterm/agent_type
extra_flags="--n_fusion 2"
list_seed=(1 2 3)
config_filename=sdd_shortterm_train.yaml
train_files=Pedestrian.pkl
val_files=Pedestrian.pkl
val_split=0.1
test_splits=1500
n_epoch=100
n_early_stop=5
ckpt_path=ckpts

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for seed in ${list_seed[@]}; do
  python train.py --config_filename $config_filename --seed $seed \
    --batch_size $batch_size --n_epoch $n_epoch \
    --n_early_stop $n_early_stop --n_round $n_round \
    --dataset_path $dataset_path --network $network --load_data $load_data \
    --train_files $train_files --val_files $val_files \
    --val_split $val_split --test_splits $test_splits \
    --train_net train --ckpt_path $ckpt_path --augment $extra_flags
done
