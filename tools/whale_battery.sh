#!/bin/bash
# Whale-call quality battery at a real training budget (round-3: the
# 256^2 family had throughput benchmarks but no at-budget quality run).
# BiGAN + VAE + call-type classifier trained at full d=64 width on the
# synthetic stand-in (pass --nocall-dir/--shotgun-dir/--upcall-dir via
# WHALE_DIRS to reproduce the reference's setup on a real archive), then
# the CF-effectiveness and generation scores for both model families and
# the SSIM encoder fine-tune. Artifacts land in .whale_battery/
# (git-ignored).
#
# NOTE: the intended publication run is SYNTH_CLIPS=560 EPOCHS=1000
# (see RESULTS.md); smaller values keep an exploratory run affordable
# but will NOT reproduce it.
set -e
cd "$(dirname "$0")/.."
D=${1:-.whale_battery}
EPOCHS=${EPOCHS:-2000}
VAE_EPOCHS=${VAE_EPOCHS:-400}
WIDTH=${WIDTH:-64}   # published numbers use the full d=64 width
WHALE_DIRS=${WHALE_DIRS:-}   # NOTE: word-split on purpose; paths must not contain spaces
# size of the synthetic stand-in when no real archive dirs are given; the
# default 32 clips/class gives only ~76 train windows (2 steps/epoch at
# batch 32) — far too few total steps to escape the reference init's
# D=0.5 incubation at any sane epoch count. The published run uses 560.
SYNTH_CLIPS=${SYNTH_CLIPS:-32}
WHALE_DIRS="$WHALE_DIRS --synthetic-clips $SYNTH_CLIPS"
# PAUSE: seconds to idle between stages. The single-tenant axon tunnel on
# the dev host sometimes wedges a client that connects immediately after
# the previous one disconnects; a few minutes of settle time avoids it.
PAUSE=${PAUSE:-0}
# periodic checkpoint cadence for the two long (resumable) stages; with
# the stall watchdog a wedge costs at most one cadence of progress
CKPT_EVERY=${CKPT_EVERY:-250}
# optional conv-init override for the BiGAN (e.g. INIT_STD=0.01 escapes
# the reference init's D=0.5 incubation immediately; documented deviation)
INIT_STD=${INIT_STD:-}
INIT_FLAG=()
if [ -n "$INIT_STD" ]; then INIT_FLAG=(--init-std "$INIT_STD"); fi
STAGE="bash tools/tpu_stage.sh"
mkdir -p "$D"
# A battery measures a FRESH training run: unless RESUME=1, clear any
# artifacts from a previous run so --resume (which exists for the
# watchdog's mid-run retries) cannot silently score a stale model.
if [ "${RESUME:-0}" != "1" ]; then
  rm -f "$D"/whale-bigan.tar "$D"/whale-vae.tar "$D"/whale-clf.tar \
    "$D"/whale-bigan-finetuned-*.tar
fi

# periodic checkpoints (cadence CKPT_EVERY above) are safe since
# save_checkpoint fetches the ~1.75 GB d=64 state in 32 MB chunks — a
# monolithic device_get of it wedges the axon relay (round-3 finding);
# serialization on this 1-core host still costs minutes per save
$STAGE "$D/bigan_stage.log" -- \
  python -u train_whale_bigan.py $WHALE_DIRS --steps "$EPOCHS" --d "$WIDTH" \
  --checkpoint-every "$CKPT_EVERY" --output-path "$D" --resume "${INIT_FLAG[@]}"
tail -3 "$D/bigan_stage.log"
sleep "$PAUSE"
python -u train_whale_clf.py $WHALE_DIRS --epochs 60 --output-path "$D"
sleep "$PAUSE"
$STAGE "$D/vae_stage.log" -- \
  python -u train_whale_vae.py $WHALE_DIRS --steps "$VAE_EPOCHS" --d "$WIDTH" \
  --checkpoint-every "$CKPT_EVERY" --output-path "$D" --resume
tail -3 "$D/vae_stage.log"
sleep "$PAUSE"
python -u finetune_whale_bigan.py $WHALE_DIRS --metric ssim --steps 40 \
  --model-file "$D/whale-bigan.tar"
mv whale-bigan-finetuned-ssim.tar "$D/"  # finetune writes to CWD
sleep "$PAUSE"

echo "=== BiGAN CF scores (base + fine-tuned encoder) ==="
python -u whale_cf_score.py $WHALE_DIRS --model-dir "$D" \
  --bigan-ft whale-bigan-finetuned-ssim.tar
sleep "$PAUSE"
echo "=== VAE CF score ==="
python -u whale_cf_score.py $WHALE_DIRS --model-dir "$D" --vae whale-vae.tar
sleep "$PAUSE"
echo "=== generator score ==="
python -u whale_generator_score.py --model-dir "$D"
