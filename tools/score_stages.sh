#!/bin/bash
# Scoring stages of tools/quality_battery.sh, runnable standalone against
# an already-trained battery dir (the training stages are resumable via
# RESUME=1, but the score stages print to stdout only — if the driving
# shell dies mid-battery the trained artifacts survive and only scores
# are lost; this re-runs exactly those). HARD=1 applies the same
# compound held-out-intervention flags as the hard battery.
set -e
cd "$(dirname "$0")/.."
D=${1:?usage: score_stages.sh <battery-dir>}
HARD=${HARD:-0}
SHIFT_FLAGS=()
CF_SHIFT=()
if [ "$HARD" = "1" ]; then
  SHIFT_FLAGS=(--target-shift "${TARGET_SHIFT:-1.5}")
  CF_SHIFT=(--held-out-shift "${SHIFT_T:-1.5}" "${SHIFT_I:-32}" "${SHIFT_S:-0.4}")
fi

echo "=== BiGAN CF score ==="
python mnist_bigan_score.py --data-dir "$D" --model-dir "$D" --limit 2048 \
  "${CF_SHIFT[@]}"
echo "=== BiGAN CF score (fine-tuned encoder) ==="
python mnist_bigan_score.py --data-dir "$D" --model-dir "$D" --limit 2048 \
  -m "$D"/mnist-bigan-finetuned-mse.tar "${CF_SHIFT[@]}"
echo "=== VAE CF score ==="
python mnist_vae_score.py --data-dir "$D" --model-dir "$D" --limit 2048 \
  "${CF_SHIFT[@]}"
echo "=== generator scores ==="
python mnist_generator_score.py --model-dir "$D" --n 2048
python mnist_vae_generator_score.py --model-dir "$D" --n 2048
echo "=== measured CF parity ==="
python mnist_gan_measured_cf.py --data-dir "$D" --model-dir "$D" --limit 256 \
  --workers 1 "${SHIFT_FLAGS[@]}"
python mnist_vae_measured_cf.py --data-dir "$D" --model-dir "$D" --limit 256 \
  --workers 1 "${SHIFT_FLAGS[@]}"
