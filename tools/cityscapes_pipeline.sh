#!/usr/bin/env bash
# One-command real-data path: raw Cityscapes -> preprocessed trees ->
# pretrained-checkpoint staging -> exp-210 semi-supervised training (with
# periodic validation + best-checkpoint export).
#
# Usage:
#   CITYSCAPES_DIR=/data/cityscapes SDT_OUT_DIR=/results \
#     tools/cityscapes_pipeline.sh [exp-id]
#
# Expects under $CITYSCAPES_DIR the standard Cityscapes packages:
#   leftImg8bit/ gtFine/ leftImg8bit_sequence/   (see reference README.md:34-57)
# Reference SDE checkpoints (.pth, from the gdrive registry in
# utils/gdrive.py) may be staged under $SDT_MODEL_DIR/<name>/ — they are
# converted to Flax on load (engine/torch_interop.py); with network access
# they are fetched automatically. ImageNet weights go to
# $SDT_MODEL_DIR/imnet/resnet{18,101}.pth (torchvision state dicts).
set -euo pipefail

EXP="${1:-210}"
: "${CITYSCAPES_DIR:?set CITYSCAPES_DIR to the Cityscapes root}"
export SDT_OUT_DIR="${SDT_OUT_DIR:-results}"

echo "== 1/3 preprocess: downscale to _small (1024x512) and _tiny (512x256) trees"
for pair in "leftImg8bit:0.5" "leftImg8bit_sequence:0.5"; do
  tree="${pair%%:*}"; scale="${pair##*:}"
  if [ -d "$CITYSCAPES_DIR/$tree" ] && [ ! -d "$CITYSCAPES_DIR/${tree}_small" ]; then
    python -m improving_segmentation_with_selfsupervised_depth_tpu.data.prepare_cityscapes \
      --in-dir "$CITYSCAPES_DIR/$tree" --out-dir "$CITYSCAPES_DIR/${tree}_small" \
      --scale "$scale" --repair
  fi
done
if [ ! -d "$CITYSCAPES_DIR/leftImg8bit_tiny" ]; then
  python -m improving_segmentation_with_selfsupervised_depth_tpu.data.prepare_cityscapes \
    --in-dir "$CITYSCAPES_DIR/leftImg8bit" --out-dir "$CITYSCAPES_DIR/leftImg8bit_tiny" \
    --scale 0.25 --repair
fi

echo "== 2/3 checkpoints: verify/convert pretrained SDE weights"
# The experiment generator names the checkpoint; apply_pretraining
# (engine/checkpoints.py) converts .pth -> Flax on first use and the offline
# depth estimator writes pseudo-depth PNGs on trainer startup (idempotent).
python - <<'PY'
import os
from improving_segmentation_with_selfsupervised_depth_tpu.config.machine import MachineConfig
MachineConfig("ws")
base = MachineConfig.DOWNLOAD_MODEL_DIR
name = "mono_cityscapes_1024x512_r101dil_aspp_dec6_lr5_fd2_crop512x512bs4"
path = os.path.join(base or ".", name)
have = os.path.isdir(path) and any(f.endswith((".pth", ".msgpack")) for f in os.listdir(path))
print(f"SDE checkpoint dir: {path}  present={have}")
if not have:
    print("  -> will be fetched from the gdrive registry on first use "
          "(or stage the reference's .pth files there manually)")
PY

echo "== 3/3 train: exp-$EXP (validation + best-ckpt inside the run)"
if [ -n "${SDT_SMOKE:-}" ]; then
  # CI/dry-run mode (exercised by tests/test_pipeline_script.py against a
  # fake tree): 2-iter trials, tiny model, no pretrained weights, fail fast.
  # Trial 0 is the from-scratch variant (no mono checkpoint dependencies).
  python test_experiments.py --machine ws --exps "$EXP" --fake-data --strict \
    --runs "${SDT_SMOKE_RUNS:-0}"
else
  python run_experiments.py --machine ws --exp "$EXP"
fi
echo "done; logs + checkpoints under $SDT_OUT_DIR (see metrics.jsonl / tensorboard)"
