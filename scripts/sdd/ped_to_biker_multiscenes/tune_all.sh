#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
# counterpart of reference scripts/sdd/ped_to_biker_multiscenes/tune_all.sh — same constants,
# checkpoints as .npz pytrees, no GPU pinning (TPU runtime)
set -e

list_train_seed=(2 3)
batch_size=10
n_epoch=100
n_round=3
config_filename=sdd_shortterm_train.yaml
n_early_stop=30
steps=20
network=original
pretrained_ckpt=ckpts/sdd__ynet__ped.npz
ckpt_path=ckpts/sdd/ped_to_biker_scenes
dataset_path=filter/shortterm/agent_type/multiscene_easy/Biker
load_data=predefined
train_net=all
list_n_train_batch=(2)
list_lr=(0.00005)

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for train_seed in ${list_train_seed[@]}; do
  for lr in ${list_lr[@]}; do
    for n_train_batch in ${list_n_train_batch[@]}; do
      python train.py --fine_tune --config_filename $config_filename \
        --seed $train_seed --batch_size $batch_size --n_epoch $n_epoch \
        --n_early_stop $n_early_stop --n_round $n_round \
        --dataset_path $dataset_path --network $network \
        --load_data $load_data --pretrained_ckpt $pretrained_ckpt \
        --train_net $train_net --ckpt_path $ckpt_path \
        --n_train_batch $n_train_batch --lr $lr --steps $steps
    done
  done
done
