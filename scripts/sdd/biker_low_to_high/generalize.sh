#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
set -e


batch_size=10
n_round=3
network=fusion
load_data=predefined
dataset_path=filter/shortterm/avg_vel/dc_013/Biker/4_8
extra_flags="--n_fusion 2"
list_seed=(1)
config_filename=sdd_shortterm_eval.yaml
ckpts=ckpts/sdd__ynetmod__biker_low.npz

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for seed in ${list_seed[@]}; do
  python test.py --config_filename $config_filename --seed $seed \
    --batch_size $batch_size --n_round $n_round \
    --dataset_path $dataset_path --network $network --load_data $load_data \
    --ckpts $ckpts --ckpts_name OODG $extra_flags
done
