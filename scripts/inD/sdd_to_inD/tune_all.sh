#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


batch_size=10
n_round=3
network=original
load_data=predefined
dataset_path=filter/shortterm/agent_type/scene1/pedestrian_filter_s1_t524
extra_flags=""
list_seed=(1 2 3)
config_filename=inD_shortterm_train.yaml
n_epoch=300
n_early_stop=300
steps=20
pretrained_ckpt=ckpts/sdd__ynet__ped.npz
ckpt_path=ckpts/inD/sdd_to_inD
list_train_net=(train)
list_position=("0 1 2 3 4")
list_n_train_batch=(2 4 8)
list_lr=(0.00005)

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for seed in ${list_seed[@]}; do
  for lr in ${list_lr[@]}; do
    for n_train_batch in ${list_n_train_batch[@]}; do
      for train_net in ${list_train_net[@]}; do
        for position in "${list_position[@]}"; do
          python train.py --fine_tune --config_filename $config_filename \
            --seed $seed --batch_size $batch_size --n_epoch $n_epoch \
            --n_early_stop $n_early_stop --n_round $n_round \
            --dataset_path $dataset_path --network $network \
            --load_data $load_data --pretrained_ckpt $pretrained_ckpt \
            --train_net $train_net --position $position \
            --ckpt_path $ckpt_path --n_train_batch $n_train_batch \
            --lr $lr --steps $steps --smooth_val $extra_flags
        done
      done
    done
  done
done
