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
# MAX_RETRIES (default 4) attempts.
set -u
LOG=$1; shift
[ "$1" = "--" ] && shift
STALL_SECS=${STALL_SECS:-360}
SETTLE_SECS=${SETTLE_SECS:-300}
MAX_RETRIES=${MAX_RETRIES:-4}
POLL_SECS=${POLL_SECS:-60}
HEALTH_CMD=${HEALTH_CMD:-}

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
while [ "$attempt" -le "$MAX_RETRIES" ]; do
  attempt=$((attempt + 1))
  echo "[tpu_stage] attempt $attempt: $*" >> "$LOG"
  setsid "$@" >> "$LOG" 2>&1 &
  PGID=$!
  while true; do
    sleep "$POLL_SECS"
    if ! kill -0 "$PGID" 2>/dev/null; then
      wait "$PGID"; rc=$?
      if [ "$rc" -eq 0 ]; then
        echo "[tpu_stage] done (attempt $attempt)" >> "$LOG"
        exit 0
      fi
      echo "[tpu_stage] exited rc=$rc; retrying" >> "$LOG"
      break
    fi
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL_SECS" ]; then
      echo "[tpu_stage] stalled ${age}s; killing pgid $PGID" >> "$LOG"
      kill -TERM -"$PGID" 2>/dev/null; sleep 5
      kill -KILL -"$PGID" 2>/dev/null
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
echo "[tpu_stage] giving up after $MAX_RETRIES retries" >> "$LOG"
exit 2
