#!/usr/bin/env bash
# Stage 1 + 4-5: per-scene NGP, feature extraction, instance field
# (parity with the torch-ngp submodule recipe, README.md:55-65).
set -xe
SCENE=${SCENE:-/path/to/scene}
OUT=${OUT:-./out/field}
# --encoding fast = TPU-native brick-grid encoding (~196k rays/s on v5e
# vs 26.6k for the reference-parity hash encoding; BENCH_NOTES.md)
ENC=${ENC:-fast}

# radiance field
python -m instance_nerf_tpu.cli.run_instance_field --mode train \
  --encoding ${ENC} --scene ${SCENE} --steps 20000 --save_path ${OUT}

# detector features (stage-1 export)
python -m instance_nerf_tpu.cli.run_instance_field --mode extract_features \
  --encoding ${ENC} --checkpoint ${OUT} --resolution 160 \
  --out_features ${OUT}/features.npz --scene ${SCENE}

# instance field from matched 2D masks (after match_seg)
python -m instance_nerf_tpu.cli.run_instance_field --mode train_instance \
  --encoding ${ENC} --scene ${SCENE} --masks_dir ${SCENE}/masks_matched \
  --steps 10000 --checkpoint ${OUT} --save_path ${OUT}

# novel-view rgb + instance renders
python -m instance_nerf_tpu.cli.run_instance_field --mode render \
  --encoding ${ENC} --scene ${SCENE} --checkpoint ${OUT} --save_path ${OUT}/renders
