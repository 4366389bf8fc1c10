#!/usr/bin/env bash
# mst_tpu experiment grid (reference-parity protocol)
# counterpart of reference scripts/sdd/ped_to_biker_multiscenes/generalize.sh — same constants,
# checkpoints as .npz pytrees, no GPU pinning (TPU runtime)
set -e

list_eval_seed=(1 2 3)
batch_size=10
n_round=3
config_filename=sdd_shortterm_eval.yaml
network=original
ckpts=ckpts/sdd__ynet__ped.npz
ckpts_name=OODG
dataset_path=filter/shortterm/agent_type/multiscene_easy/Biker
load_data=predefined

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

for eval_seed in ${list_eval_seed[@]}; do
  python test.py --config_filename $config_filename --seed $eval_seed \
    --batch_size $batch_size --n_round $n_round \
    --dataset_path $dataset_path --network $network \
    --load_data $load_data --ckpts $ckpts --ckpts_name $ckpts_name
done
