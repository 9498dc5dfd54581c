#!/bin/bash
# ESRF 512^2 quality battery at a real training budget (round-3: this
# family had throughput/memory benchmarks but no at-budget training run).
# Trains the full-width BiGAN at the reference's batch 64 on the synthetic
# stand-in (pass WAV_DIR/LABEL_CSV to reproduce on a real station archive),
# then runs tools/esrf_quality.py: validation reconstruction MSE/SSIM and
# the classifier-free do(has_boat) rumble-band energy metric (the
# reference ships no scorer for this domain). Artifacts in .esrf_battery/.
#
# Intended publication run: RECORDINGS=100 EPOCHS=900 INIT_STD=0.01
# (~440 train windows, ~6.3k steps; at ~2.1 steps/s with remat that is
# ~55 min of device time). INIT_STD=0.01 is a documented deviation from
# the reference's 0.001 init (esrf_acoustic.py:24-27), which spends ~20k
# steps with every D logit ~0 before learning starts — unaffordable at
# 2 steps/s; leave INIT_STD empty for the faithful init.
set -e
cd "$(dirname "$0")/.."
D=${1:-.esrf_battery}
EPOCHS=${EPOCHS:-900}
WIDTH=${WIDTH:-64}
BATCH=${BATCH:-64}          # reference parity (train_esrf_bigan.py:17-35)
RECORDINGS=${RECORDINGS:-100}
INIT_STD=${INIT_STD:-}
CKPT_EVERY=${CKPT_EVERY:-100}
WAV_DIR=${WAV_DIR:-}
LABEL_CSV=${LABEL_CSV:-}
DATA_FLAGS=(--synthetic-recordings "$RECORDINGS")
if [ -n "$WAV_DIR" ]; then
  if [ -z "$LABEL_CSV" ]; then
    echo "error: WAV_DIR requires LABEL_CSV (the station label table)" >&2
    exit 1
  fi
  DATA_FLAGS=(--wav-dir "$WAV_DIR" --label-csv "$LABEL_CSV")
fi
INIT_FLAG=()
if [ -n "$INIT_STD" ]; then INIT_FLAG=(--init-std "$INIT_STD"); fi
STAGE="bash tools/tpu_stage.sh"
mkdir -p "$D"
# A battery measures a FRESH run: unless RESUME=1, clear prior artifacts
# so --resume (needed for the watchdog's mid-run retries) cannot
# silently score a stale model.
if [ "${RESUME:-0}" != "1" ]; then
  rm -f "$D"/esrf-bigan.tar "$D"/esrf-bigan-finetuned-*.tar
fi

$STAGE "$D/bigan_stage.log" -- \
  python -u train_esrf_bigan.py "${DATA_FLAGS[@]}" --steps "$EPOCHS" \
  --d "$WIDTH" --batch-size "$BATCH" --checkpoint-every "$CKPT_EVERY" \
  --output-path "$D" --resume "${INIT_FLAG[@]}"
tail -3 "$D/bigan_stage.log"

echo "=== ESRF quality (recon + rumble-band CF, base encoder) ==="
$STAGE "$D/quality_base.log" -- \
  python -u tools/esrf_quality.py --model-dir "$D" "${DATA_FLAGS[@]}" --batch-size 16
tail -8 "$D/quality_base.log"

# round-4 finding: the base 512^2 encoder reconstructs poorly (SSIM 0.032)
# and do(has_boat) bleeds into the 1-2 kHz control band; the whale family's
# identical symptom was cured by the SSIM encoder fine-tune (CF 0.872->1.0).
FT_EPOCHS=${FT_EPOCHS:-40}
echo "=== encoder fine-tune (ssim, $FT_EPOCHS epochs) ==="
$STAGE "$D/finetune_stage.log" -- \
  python -u finetune_esrf_bigan.py "${DATA_FLAGS[@]}" --steps "$FT_EPOCHS" \
  --model-file "$D/esrf-bigan.tar" --output-path "$D" --metric ssim \
  --batch-size 16
tail -3 "$D/finetune_stage.log"

echo "=== ESRF quality (fine-tuned encoder) ==="
$STAGE "$D/quality_ft.log" -- \
  python -u tools/esrf_quality.py --model-dir "$D" "${DATA_FLAGS[@]}" \
  --bigan esrf-bigan-finetuned-ssim.tar --batch-size 16
tail -8 "$D/quality_ft.log"
