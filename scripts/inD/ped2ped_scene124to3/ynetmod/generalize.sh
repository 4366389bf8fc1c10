#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
# counterpart of reference scripts/inD/ped2ped_scene124to3/ynetmod/generalize.sh — same constants,
# checkpoints as .npz pytrees, no GPU pinning (TPU runtime)
set -e

list_eval_seed=(1)
batch_size=10
n_round=3
config_filename=inD_longterm_eval.yaml
network=fusion
n_fusion=2
ckpts=ckpts/inD__ynetmod__ped2ped_scene124to3.npz
ckpts_name=OODG
dataset_path=filter/longterm/agent_type/scene3/pedestrian
load_data=predefined

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for eval_seed in ${list_eval_seed[@]}; do
  python test.py --config_filename $config_filename --seed $eval_seed \
    --batch_size $batch_size --dataset_path $dataset_path \
    --network $network --n_fusion $n_fusion --load_data $load_data \
    --n_round $n_round --ckpts $ckpts --ckpts_name $ckpts_name
done
