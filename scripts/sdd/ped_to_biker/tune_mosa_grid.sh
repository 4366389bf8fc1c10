#!/usr/bin/env bash
# tune_mosa.sh's seeds x lrs x n_trains sweep as ONE vectorized program
# (mst_tpu.grid): the whole grid vmaps into a single compile (each
# n_train its own shape group), shards over the mesh with zero
# collectives, auto-splits if it exceeds device HBM, and writes the same
# per-run checkpoints and scrapeable logs as looping train.py
# (tests/test_grid.py pins parity).
set -e


batch_size=10
n_round=3
network=original
load_data=predefined
dataset_path=filter/shortterm/agent_type/deathCircle_0/Biker
extra_flags=""
list_seed=(1 2 3 4 5)
config_filename=sdd_shortterm_train.yaml
n_epoch=100
n_early_stop=30
steps=20
pretrained_ckpt=ckpts/sdd__ynet__ped.npz
ckpt_path=ckpts/sdd/ped_to_biker
log_dir=logs/sdd/ped_to_biker
list_train_net=(mosa_1)
list_position=("0 1 2 3 4")
list_n_train_batch=(3)
list_lr=(0.003)

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for train_net in ${list_train_net[@]}; do
  for position in "${list_position[@]}"; do
    python -m mst_tpu.grid --fine_tune --config_filename $config_filename \
      --batch_size $batch_size --n_epoch $n_epoch \
      --n_early_stop $n_early_stop --n_round $n_round \
      --dataset_path $dataset_path --network $network \
      --load_data $load_data --pretrained_ckpt $pretrained_ckpt \
      --train_net $train_net --position $position \
      --ckpt_path $ckpt_path --steps $steps --smooth_val \
      --log_dir $log_dir --seeds ${list_seed[@]} --lrs ${list_lr[@]} \
      --n_trains ${list_n_train_batch[@]} $extra_flags
  done
done
