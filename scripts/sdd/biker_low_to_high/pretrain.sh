#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


batch_size=10
n_epoch=100
n_early_stop=5
n_round=3
network=fusion
load_data=predefined
dataset_path=filter/shortterm/avg_vel/dc_013/Biker/0.5_3.5
extra_flags="--n_fusion 2"
list_seed=(1)
config_filename=sdd_shortterm_train.yaml
ckpt_path=ckpts/sdd/biker_low_to_high

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for seed in ${list_seed[@]}; do
  python train.py --config_filename $config_filename --seed $seed \
    --batch_size $batch_size --n_epoch $n_epoch \
    --n_early_stop $n_early_stop --n_round $n_round \
    --dataset_path $dataset_path --network $network --load_data $load_data \
    --train_net train --ckpt_path $ckpt_path --augment $extra_flags
done
