#!/bin/bash
# MNIST quality battery with a real training budget (VERDICT round-1
# item 6: BiGAN CF digit accuracy must meet/beat the VAE baseline).
# Runs on the TPU; synthesis is host-side. Artifacts land in
# .battery_data/ (git-ignored).
set -e
cd "$(dirname "$0")/.."
# HARD=1 runs the de-saturated variant (VERDICT r2 item 8): additive pixel
# noise at synthesis + a held-out thickness-intervention magnitude, so the
# accuracy metrics sit in the ~0.8-0.95 band where regressions are visible
# (the clean battery saturates at 0.99+).
HARD=${HARD:-0}
if [ "$HARD" = "1" ]; then
  D=${1:-.battery_data_hard}
  NOISE=(--noise-std "${NOISE_STD:-32}")
  SHIFT=(--target-shift "${TARGET_SHIFT:-1.5}")
  # compound held-out intervention for the CF *digit* scores: noise alone
  # cannot move the VAE off 0.9985 (r3 hard battery), because a digit-only
  # swap keeps the render on the training manifold. Shifting all three
  # continuous attrs past the training range at the same time puts both
  # models in extrapolation, where the metric discriminates (VERDICT r3
  # item 9).
  CF_SHIFT=(--held-out-shift "${SHIFT_T:-1.5}" "${SHIFT_I:-32}" "${SHIFT_S:-0.4}")
else
  D=${1:-.battery_data}
  NOISE=()
  SHIFT=()
  CF_SHIFT=()
fi
# FUSED=1 trains the BiGAN in the opt-in throughput mode (fused D steps +
# fused EG-phase D forwards + bf16 Adam first moment, +28-32% steps/s,
# docs/PERF.md "capturing the headroom") so its quality deltas vs the
# reference-exact defaults are measured, not assumed (VERDICT r3 weak
# item 3). Defaults to its own artifact dir; synthesis is seeded, so the
# data is bit-identical to the default-mode dir's.
FUSED=${FUSED:-0}
THROUGHPUT_FLAG=()
if [ "$FUSED" = "1" ]; then
  [ -n "${1:-}" ] || D="${D}_fused"
  THROUGHPUT_FLAG=(--throughput)
fi
EPOCHS=${EPOCHS:-600}
mkdir -p "$D"
# A battery measures a FRESH training run: unless RESUME=1, clear any
# artifacts from a previous run so --resume (which exists for the
# watchdog's mid-run retries) cannot silently score a stale model.
if [ "${RESUME:-0}" != "1" ]; then
  rm -f "$D"/mnist-bigan.tar "$D"/mnist-vae.tar "$D"/mnist-clf.tar \
    "$D"/mnist-attribute-scm.tar "$D"/mnist-bigan-finetuned-*.tar
fi

if [ ! -f "$D/mnist-x-train.npy" ]; then
  python create_train_dataset.py --synthetic 8192 --out-dir "$D" "${NOISE[@]}"
  python create_test_dataset.py --synthetic 2048 --out-dir "$D" "${NOISE[@]}"
fi

bash tools/tpu_stage.sh "$D/bigan_stage.log" -- \
  python -u train_mnist_image_scm.py --data-dir "$D" --steps "$EPOCHS" \
  --d-updates-per-g-update 3 --save-images-every 200 --output-path "$D" \
  --resume "${THROUGHPUT_FLAG[@]}"
tail -3 "$D/bigan_stage.log"
python finetune_mnist_bigan.py --data-dir "$D" --steps 60 \
  --model-file "$D/mnist-bigan.tar"
mv mnist-bigan-finetuned-mse.tar "$D/"  # finetune writes to CWD
python train_mnist_attribute_scm.py --data-dir "$D" --steps 2000 --output-path "$D"
python train_mnist_clf.py --data-dir "$D" --epochs 20 --output-path "$D"
python train_mnist_vae.py --data-dir "$D" --steps 100 --output-path "$D"

echo "=== BiGAN CF score ==="
python mnist_bigan_score.py --data-dir "$D" --model-dir "$D" --limit 2048 \
  "${CF_SHIFT[@]}"
echo "=== BiGAN CF score (fine-tuned encoder) ==="
# the whale battery showed the SSIM fine-tune is worth +0.13 CF accuracy
# there; score the MNIST fine-tuned encoder too so the battery tracks it
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
  --workers 1 "${SHIFT[@]}"
python mnist_vae_measured_cf.py --data-dir "$D" --model-dir "$D" --limit 256 \
  --workers 1 "${SHIFT[@]}"
