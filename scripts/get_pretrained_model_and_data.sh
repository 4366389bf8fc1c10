#!/usr/bin/env bash
# Fetch the reference's released data + checkpoints bundle and convert the
# torch checkpoints to npz pytrees. Mirrors the reference
# scripts/get_pretrained_model_and_data.sh (gdown of a zip with data/ and
# ckpts/); requires network access + gdown.
set -e
pip show gdown >/dev/null 2>&1 || pip install gdown
gdown 1u7RVfcRkPBCDh2HeQ8nFk9o7rIYxIBBi -O mst_data.zip || {
  echo "Download failed — fetch the bundle from the reference repo's"
  echo "get_pretrained_model_and_data.sh and unzip to ./data + ./ckpts"; exit 1; }
unzip -o mst_data.zip
bash scripts/convert_reference_ckpts.sh
