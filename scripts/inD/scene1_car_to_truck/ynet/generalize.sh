#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
# counterpart of reference scripts/inD/scene1_car_to_truck/ynet/generalize.sh — same constants,
# checkpoints as .npz pytrees, no GPU pinning (TPU runtime)
set -e

list_eval_seed=(1)
batch_size=10
n_round=3
config_filename=inD_shortterm_eval.yaml
network=original
ckpts=ckpts/inD__ynet__car.npz
ckpts_name=OODG
dataset_path=filter/shortterm/agent_type/scene1/truck_bus_filter
load_data=predefined

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for eval_seed in ${list_eval_seed[@]}; do
  python test.py --config_filename $config_filename --seed $eval_seed \
    --batch_size $batch_size --dataset_path $dataset_path \
    --network $network --load_data $load_data --n_round $n_round \
    --ckpts $ckpts --ckpts_name $ckpts_name
done
