#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


batch_size=10
n_round=3
network=fusion
load_data=predefined
dataset_path=filter/shortterm/agent_type/deathCircle_0/Biker
extra_flags="--n_fusion 2"
list_seed=(1 2 3)
config_filename=sdd_shortterm_train.yaml
n_epoch=100
n_early_stop=100
steps=20
pretrained_ckpt=ckpts/sdd__ynetmod__ped.npz
ckpt_path=ckpts/sdd/ped_to_biker_modular
list_train_net=(mosa_3)
list_position=("motion")
list_n_train_batch=(3)
list_lr=(0.001)

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
