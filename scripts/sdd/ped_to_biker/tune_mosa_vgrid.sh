#!/usr/bin/env bash
# tune_mosa's seeds x lrs x n_trains sweep as ONE vectorized program
# (python -m mst_tpu.grid): every run vmapped over a run axis — one
# compile + one process for the whole grid, run axis shardable over a
# mesh — instead of a bash loop of fresh train.py processes. Per-run
# checkpoints/logs/test metrics match tune_mosa.sh run-for-run
# (tests/test_grid.py).
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
list_n_train_batch=(3)
list_lr=(0.003)

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

python -m mst_tpu.grid --fine_tune --config_filename $config_filename \
  --batch_size $batch_size --n_epoch $n_epoch \
  --n_early_stop $n_early_stop --n_round $n_round \
  --dataset_path $dataset_path --network $network \
  --load_data $load_data --pretrained_ckpt $pretrained_ckpt \
  --train_net mosa_1 --position 0 1 2 3 4 \
  --ckpt_path $ckpt_path --steps $steps --smooth_val $extra_flags \
  --seeds ${list_seed[@]} --lrs ${list_lr[@]} \
  --n_trains ${list_n_train_batch[@]}
