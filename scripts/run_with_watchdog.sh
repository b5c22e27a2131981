#!/usr/bin/env bash
# Stall-watchdog launcher for long TPU drives on a flaky device tunnel.
#
# The axon tunnel's remote-compile RPC occasionally never returns (observed:
# a trivial truncated_normal init compile hanging with 0 CPU for 10+ min).
# This wrapper restarts the command whenever its log stops growing for
# STALL_SECS; training runs resume from ckpt_last automatically
# (trainer.py preemption-resume contract), so a restart costs only the
# re-compile.
#
# Usage: scripts/run_with_watchdog.sh LOGFILE STALL_SECS MAX_RESTARTS CMD...
# If RESUME_CKPT is set and that directory exists at (re)start time,
# "--weight $RESUME_CKPT" is appended to CMD (train.py resume flag).
set -u
LOG=$1; STALL=$2; MAX=$3; shift 3

attempt=0
while :; do
  attempt=$((attempt + 1))
  extra=()
  if [ -n "${RESUME_CKPT:-}" ] && [ -e "$RESUME_CKPT" ]; then
    extra=(--weight "$RESUME_CKPT")
  fi
  "$@" "${extra[@]}" >> "$LOG" 2>&1 &
  PID=$!
  echo "[watchdog] attempt $attempt pid $PID" >> "$LOG"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -ge "$STALL" ]; then
      echo "[watchdog] no log progress for ${age}s -> restarting" >> "$LOG"
      kill -9 "$PID" 2>/dev/null
      wait "$PID" 2>/dev/null
      break
    fi
  done
  if kill -0 "$PID" 2>/dev/null; then :; else
    wait "$PID" 2>/dev/null
    rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "[watchdog] completed ok after $attempt attempt(s)" >> "$LOG"
      exit 0
    fi
    echo "[watchdog] exit rc=$rc" >> "$LOG"
  fi
  if [ "$attempt" -ge "$MAX" ]; then
    echo "[watchdog] giving up after $attempt attempts" >> "$LOG"
    exit 1
  fi
  # a hung client wedges the whole device tunnel and the remote side
  # needs a beat after the kill; don't relaunch until a trivial device
  # op round-trips again
  probe=0
  while :; do
    probe=$((probe + 1))
    sleep 20
    if timeout 90 python -c "
import jax, jax.numpy as jnp
jax.block_until_ready(jax.jit(lambda x: x + 1)(jnp.zeros(8)))
print('probe ok')" >> "$LOG" 2>&1; then
      break
    fi
    echo "[watchdog] tunnel probe $probe failed; waiting" >> "$LOG"
    if [ "$probe" -ge 20 ]; then
      echo "[watchdog] tunnel never recovered" >> "$LOG"
      exit 2
    fi
  done
done
