#!/usr/bin/env bash
# One-command reference-parity runbook (docs/parity.md "With the released
# data + checkpoints", automated).
#
# Given the reference's data bundle (fetched by
# scripts/get_pretrained_model_and_data.sh on a networked machine and
# placed under ./data and ./ckpts), this script:
#   1. converts every released .pt checkpoint + both segmentation backbones
#      into npz pytrees (skipping ones already converted),
#   2. runs the five CoRL22 experiments' generalize + tune suites through
#      the real CLIs, logging to parity_logs/,
#   3. scrapes every suite log (per-round AND per-run metrics) into
#      parity_report.csv with mean/SE/CI columns, and
#   4. if a reference-run table is given (csv: suite,ade,fde and
#      optionally ade_se,fde_se), applies the TOST equivalence rule
#      (mst_tpu/evaluator/parity_stats.py, docs/parity.md): exit 0 =
#      every suite SHOWN within 1%, exit 1 = a suite demonstrably
#      exceeds 1%, exit 2 = underpowered (see mdd_pct per suite).
#
# Usage: scripts/run_parity.sh [reference_table.csv]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
REF_TABLE="${1:-}"
LOG_DIR="parity_logs"
export PYTHONPATH="$REPO:${PYTHONPATH:-}"

# ---- 0. bundle sanity --------------------------------------------------
if [ ! -d data/sdd ] || ! ls ckpts/*.pt >/dev/null 2>&1; then
  echo "ERROR: data bundle not found (need ./data/sdd and ./ckpts/*.pt)." >&2
  echo "Fetch it with scripts/get_pretrained_model_and_data.sh on a" >&2
  echo "networked machine, then re-run from the bundle directory." >&2
  exit 1
fi

# ---- 0.5. converter coverage gate ---------------------------------------
# dry-run every family's key/shape manifest through the converters before
# touching the real artifacts: a naming/shape mismatch fails HERE with a
# leaf-level report instead of mid-conversion (mst_tpu/models/manifests.py)
echo "[parity] converter manifest check"
python -m mst_tpu.models.convert --check-manifest

# ---- 1. convert checkpoints -------------------------------------------
for f in ckpts/*.pt; do
  [ -f "${f%.pt}.npz" ] && continue
  echo "[parity] converting $f"
  python -m mst_tpu.models.convert ynet "$f" "${f%.pt}.npz"
done
for ds in sdd inD-dataset-v1.0; do
  sd="data/$ds"
  for pth in "$sd"/*segmentation*.pth; do
    [ -e "$pth" ] || continue
    npz="${pth%.pth}.npz"; npz="${npz/_state_dict/}"
    [ -f "$npz" ] && continue
    sdict="${pth%.pth}_state_dict.pt"
    if [ ! -f "$sdict" ]; then
      # the bundle ships a PICKLED module; exporting its state dict needs
      # torch + segmentation_models_pytorch (both in this image)
      python - "$pth" "$sdict" <<'PY'
import sys, torch
m = torch.load(sys.argv[1], map_location="cpu", weights_only=False)
torch.save(m.state_dict(), sys.argv[2])
PY
    fi
    echo "[parity] converting $pth"
    python -m mst_tpu.models.convert segmentation "$sdict" "$npz"
  done
done

# ---- 2. the five experiments' suites ----------------------------------
SUITES=(
  # SDD agent-type transfer (ped -> biker), Y-Net + Y-Net-Mod
  scripts/sdd/ped_to_biker/generalize.sh
  scripts/sdd/ped_to_biker/tune_mosa.sh
  scripts/sdd/ped_to_biker/tune_all.sh
  scripts/sdd/ped_to_biker_modular/generalize.sh
  scripts/sdd/ped_to_biker_modular/tune_mosa.sh
  # SDD speed-regime transfer (low -> high biker)
  scripts/sdd/biker_low_to_high/generalize.sh
  scripts/sdd/biker_low_to_high/tune_mosa.sh
  # inD agent-type transfer (car -> truck_bus, scene1)
  scripts/inD/scene1_car_to_truck/ynetmod/generalize.sh
  scripts/inD/scene1_car_to_truck/ynetmod/tune_mosa_S_A_F.sh
  # inD scene transfer (ped scenes 2,3,4 -> 1)
  scripts/inD/ped2ped_scene234to1/ynet/generalize.sh
  scripts/inD/ped2ped_scene234to1/ynet/tune_mosa.sh
  # cross-dataset transfer (SDD -> inD)
  scripts/inD/sdd_to_inD/generalize.sh
  scripts/inD/sdd_to_inD/tune_mosa.sh
)

mkdir -p "$LOG_DIR"
for suite in "${SUITES[@]}"; do
  name="$(echo "$suite" | sed 's#scripts/##; s#/#__#g; s#\.sh$##')"
  log="$LOG_DIR/$name.out"
  echo "[parity] running $suite -> $log"
  bash "$REPO/$suite" 2>&1 | tee "$log"
done

# ---- 3+4. scrape + statistical decision rule ---------------------------
# per-suite mean +/- SE/CI from the n_round rounds (and the seed-grid
# spread on tune suites), then the TOST equivalence gate — see
# mst_tpu/evaluator/parity_stats.py and docs/parity.md for the rule
python -m mst_tpu.evaluator.parity_stats "$LOG_DIR" \
  ${REF_TABLE:+"$REF_TABLE"} --out parity_report.csv
