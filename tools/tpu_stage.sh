#!/bin/bash
# Run one TPU stage command with stall detection and retry.
#
#   tools/tpu_stage.sh <logfile> -- <cmd> [args...]
#
# The single-tenant axon tunnel on the dev host can wedge mid-run (the
# client blocks forever in a futex wait with no bytes arriving); a long
# training stage then needs outside help. This wrapper tails the stage's
# log: if it stops growing for STALL_SECS (default 360) the stage's
# process group is killed (by PID group, never by name pattern), the
# tunnel is given SETTLE_SECS to recover, a small health probe must
# succeed, and the command is re-run — commands should therefore be
# resumable (e.g. train_whale_bigan.py --resume). Gives up after
# MAX_RETRIES (default 4) stall-kills.
#
# Ordinary nonzero exits are NOT stalls: a deterministic crash would
# burn MAX_RETRIES x (SETTLE_SECS + probes) before surfacing, so plain
# crashes retry at most CRASH_RETRIES times (default 1 — enough to ride
# out a one-off tunnel hiccup that killed the client with an exception;
# CRASH_RETRIES=0 makes short deterministic stages fail immediately).
# The settle+probe still runs after a crash: a client that died with an
# exception can leave the single-tenant axon server wedged for the NEXT
# client (verify SKILL.md), so re-running immediately would hang.
set -u
LOG=$1; shift
[ "$1" = "--" ] && shift
STALL_SECS=${STALL_SECS:-360}
SETTLE_SECS=${SETTLE_SECS:-300}
MAX_RETRIES=${MAX_RETRIES:-4}
CRASH_RETRIES=${CRASH_RETRIES:-1}
POLL_SECS=${POLL_SECS:-60}
HEALTH_CMD=${HEALTH_CMD:-}
# a wedged tunnel client still trickles ~4 B/s of keepalives, so only IO
# deltas at least this large (bytes per poll) count as real progress
IO_DELTA_MIN=${IO_DELTA_MIN:-1048576}

health() {
  # one shot, bounded; a hung probe means the tunnel is still down
  if [ -n "$HEALTH_CMD" ]; then $HEALTH_CMD >> "$LOG.health" 2>&1; return $?; fi
  timeout 150 python -u -c "
import jax, jax.numpy as jnp
y = (jnp.ones((256,256)) @ jnp.ones((256,256))).sum()
jax.block_until_ready(y)
print('probe ok', flush=True)
import os; os._exit(0)" >> "$LOG.health" 2>&1
}

attempt=0
stalls=0
crashes=0
while true; do
  attempt=$((attempt + 1))
  echo "[tpu_stage] attempt $attempt: $*" >> "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  PGID=$!
  last_io=""
  last_activity=$(date +%s)
  while true; do
    sleep "$POLL_SECS"
    if ! kill -0 "$PGID" 2>/dev/null; then
      wait "$PGID"; rc=$?
      if [ "$rc" -eq 0 ]; then
        echo "[tpu_stage] done (attempt $attempt)" >> "$LOG"
        exit 0
      fi
      crashes=$((crashes + 1))
      if [ "$crashes" -gt "$CRASH_RETRIES" ]; then
        echo "[tpu_stage] exited rc=$rc ($crashes crash(es), not a stall); giving up" >> "$LOG"
        exit "$rc"
      fi
      echo "[tpu_stage] exited rc=$rc; retrying (crash $crashes/$CRASH_RETRIES)" >> "$LOG"
      break
    fi
    # activity = log growth OR process IO progress. The IO check keeps
    # legitimately silent phases alive (multi-GB checkpoint fetch/write,
    # long jit compiles stream bytes without printing); a wedged tunnel
    # client is the one state where rchar+wchar freeze entirely.
    now=$(date +%s)
    # printf %.0f: awk's default print switches to scientific notation for
    # sums beyond ~2^31 ("3.56946e+09"), which is a fatal syntax error in
    # the bash arithmetic below — the watchdog then aborts WITHOUT killing
    # the stage (observed once the chunked checkpoint fetch pushed a
    # trainer's io counters past 2 GB)
    io=$(awk -F': ' '/^(rchar|wchar)/{s+=$2} END{printf "%.0f", s+0}' "/proc/$PGID/io" 2>/dev/null)
    log_age=$(( now - $(stat -c %Y "$LOG") ))
    if [ "$log_age" -le "$POLL_SECS" ]; then
      last_activity=$now
    elif [ -n "$last_io" ] && [ -n "$io" ] && [ $(( io - last_io )) -ge "$IO_DELTA_MIN" ]; then
      last_activity=$now
    fi
    last_io=$io
    if [ $(( now - last_activity )) -gt "$STALL_SECS" ]; then
      echo "[tpu_stage] no log/io activity for $(( now - last_activity ))s; killing pgid $PGID" >> "$LOG"
      kill -TERM -"$PGID" 2>/dev/null; sleep 5
      kill -KILL -"$PGID" 2>/dev/null
      stalls=$((stalls + 1))
      if [ "$stalls" -gt "$MAX_RETRIES" ]; then
        echo "[tpu_stage] giving up after $stalls stall-kills" >> "$LOG"
        exit 2
      fi
      break
    fi
  done
  echo "[tpu_stage] settling ${SETTLE_SECS}s" >> "$LOG"
  sleep "$SETTLE_SECS"
  probes=0
  until health; do
    probes=$((probes + 1))
    if [ "$probes" -ge 10 ]; then
      echo "[tpu_stage] tunnel did not recover after $probes probes" >> "$LOG"
      exit 3
    fi
    sleep 120
  done
done
