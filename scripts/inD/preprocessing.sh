#!/usr/bin/env bash
# inD dataset construction — stage-for-stage counterpart of the
# reference scripts/inD/preprocessing.sh (scene images, long-term build,
# ped scene splits/combinations, short-term build, cars-to-trucks with
# avg_vel>=0.2 filters, four-scene pedestrians).
set -e

# split sizes (reference values; the synthetic e2e harness overrides
# them to fit its miniature fixtures)
prep_s1ped_val=20
prep_s1ped_test=114
prep_s2ped_val=80
prep_s2ped_test=252
prep_s3ped_val=80
prep_s3ped_test=750
prep_truck_val=40
prep_truck_test=97
prep_stped_val=100
prep_stped_test=524

# harness hook: reduced-grid overrides for the synthetic e2e sweep
# (mst_tpu/utils/scripts_e2e.py; no-op outside the harness)
[ -n "${MST_GRID_OVERRIDES:-}" ] && source "$MST_GRID_OVERRIDES"

# Prepare images
mkdir -p data/inD-dataset-v1.0/images/scene1 data/inD-dataset-v1.0/images/scene2 \
         data/inD-dataset-v1.0/images/scene3 data/inD-dataset-v1.0/images/scene4

cp data/inD-dataset-v1.0/data/00_background.png data/inD-dataset-v1.0/images/scene1/reference.png
cp data/inD-dataset-v1.0/data/07_background.png data/inD-dataset-v1.0/images/scene2/reference.png
cp data/inD-dataset-v1.0/data/18_background.png data/inD-dataset-v1.0/images/scene3/reference.png
cp data/inD-dataset-v1.0/data/30_background.png data/inD-dataset-v1.0/images/scene4/reference.png

# Construct long-term data (writes data_5_30_1fps.pkl + varf_5_30_1fps.pkl)
python -m mst_tpu.data.ind

# Experiment: inD ped to ped, from scenes=2,3,4 to scenes=1
python -m mst_tpu.data.ind --reload --labels pedestrian --selected_scenes scene1 \
  --filter_data_dir data/inD-dataset-v1.0/filter/longterm
python -m mst_tpu.data.ind --reload --labels pedestrian \
  --selected_scenes scene2 scene3 scene4 \
  --filter_data_dir data/inD-dataset-v1.0/filter/longterm

mv data/inD-dataset-v1.0/filter/longterm/agent_type/scene2__scene3__scene4 \
   data/inD-dataset-v1.0/filter/longterm/agent_type/scene234
rm -r data/inD-dataset-v1.0/filter/longterm/agent_type/scene2 \
      data/inD-dataset-v1.0/filter/longterm/agent_type/scene3 \
      data/inD-dataset-v1.0/filter/longterm/agent_type/scene4

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/longterm/agent_type/scene1 \
  --data_filename pedestrian.pkl --val_split $prep_s1ped_val \
  --test_split $prep_s1ped_test --seed 1

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/longterm/agent_type/scene234 \
  --data_filename pedestrian.pkl --val_split 0.1 --test_split 0.2 --seed 1

# Experiment: inD ped to ped, other scene combinations
python -m mst_tpu.data.ind --reload --labels pedestrian \
  --selected_scenes scene1 scene2 scene4 \
  --filter_data_dir data/inD-dataset-v1.0/filter/longterm
python -m mst_tpu.data.ind --reload --labels pedestrian \
  --selected_scenes scene1 scene3 scene4 \
  --filter_data_dir data/inD-dataset-v1.0/filter/longterm

mv data/inD-dataset-v1.0/filter/longterm/agent_type/scene1__scene2__scene4 \
   data/inD-dataset-v1.0/filter/longterm/agent_type/scene124
mv data/inD-dataset-v1.0/filter/longterm/agent_type/scene1__scene3__scene4 \
   data/inD-dataset-v1.0/filter/longterm/agent_type/scene134

# (the scene124/scene134 runs re-created the per-scene scene2/scene3
# bucket dirs the first rm removed — the builder writes per-scene AND
# combined pkls, reference data_utils.py:395-412)
python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/longterm/agent_type/scene2 \
  --data_filename pedestrian.pkl --val_split $prep_s2ped_val \
  --test_split $prep_s2ped_test --seed 1

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/longterm/agent_type/scene3 \
  --data_filename pedestrian.pkl --val_split $prep_s3ped_val \
  --test_split $prep_s3ped_test --seed 1

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/longterm/agent_type/scene134 \
  --data_filename pedestrian.pkl --val_split 0.1 --test_split 0.2 --seed 1

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/longterm/agent_type/scene124 \
  --data_filename pedestrian.pkl --val_split 0.1 --test_split 0.2 --seed 1

# Construct short-term data (writes data_8_12_2_5fps.pkl + varf_8_12_2_5fps.pkl)
python -m mst_tpu.data.ind --raw_data_filename data_8_12_2_5fps.pkl \
  --step 10 --window_size 20 --stride 20 --obs_len 8 --labels pedestrian \
  --filter_data_dir data/inD-dataset-v1.0/filter/shortterm

# Experiment: cars to trucks
python -m mst_tpu.data.ind --reload --raw_data_filename data_8_12_2_5fps.pkl \
  --step 10 --window_size 20 --stride 20 --obs_len 8 \
  --labels car truck_bus --selected_scenes scene1 \
  --filter_data_dir data/inD-dataset-v1.0/filter/shortterm

python -m mst_tpu.data.filter_dataset \
  --data_path data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1/car.pkl \
  --varf_path data/inD-dataset-v1.0/data/varf_8_12_2_5fps.pkl --lower_bound 0.2

python -m mst_tpu.data.filter_dataset \
  --data_path data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1/truck_bus.pkl \
  --varf_path data/inD-dataset-v1.0/data/varf_8_12_2_5fps.pkl --lower_bound 0.2

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1 \
  --data_filename car_filter.pkl --val_split 0.1 --test_split 0.2 --seed 1

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1 \
  --data_filename truck_bus_filter.pkl --val_split $prep_truck_val \
  --test_split $prep_truck_test --seed 1

# Experiment: pedestrians
python -m mst_tpu.data.ind --reload --additional_data_dir data/inD-dataset-v1.0/data \
  --raw_data_dir data/inD-dataset-v1.0/data --raw_data_filename data_8_12_2_5fps.pkl \
  --filter_data_dir data/inD-dataset-v1.0/filter/shortterm \
  --step 10 --window_size 20 --stride 20 --obs_len 8 --labels pedestrian \
  --selected_scenes scene1 scene2 scene3 scene4

mv data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1__scene2__scene3__scene4 \
   data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1234

python -m mst_tpu.data.filter_dataset \
  --data_path data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1/pedestrian.pkl \
  --varf_path data/inD-dataset-v1.0/data/varf_8_12_2_5fps.pkl --lower_bound 0.2

python -m mst_tpu.data.split_dataset \
  --data_dir data/inD-dataset-v1.0/filter/shortterm/agent_type/scene1 \
  --data_filename pedestrian_filter.pkl --val_split $prep_stped_val \
  --test_split $prep_stped_test --seed 1
