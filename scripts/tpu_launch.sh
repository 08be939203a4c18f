#!/bin/bash
# Watchdog launcher for TPU jobs behind the flaky axon claim.
#
# The sitecustomize axon register() either completes within a few minutes or
# hangs forever at ~0 CPU (the claim-contention failure mode bench.py works
# around with fresh-interpreter retries).  This wrapper starts the command,
# requires a SENTINEL file to appear within STARTUP_S seconds (proof the
# interpreter got past register and into the script body), and otherwise
# kills the exact process group and retries after a backoff.
#
# Usage: tpu_launch.sh SENTINEL STARTUP_S TOTAL_TIMEOUT_S CMD...
set -u
sentinel=$1; startup_s=$2; total_s=$3; shift 3
fast_fails=0
for attempt in 1 2 3 4 5; do
  rm -f "$sentinel"
  setsid "$@" &
  pid=$!
  waited=0
  died=0
  while [ $waited -lt "$startup_s" ]; do
    sleep 15; waited=$((waited + 15))
    [ -e "$sentinel" ] && break
    kill -0 $pid 2>/dev/null || { died=1; break; }
  done
  if [ $died -eq 1 ] && [ ! -e "$sentinel" ]; then
    # Child exited on its own before the sentinel: a real error (bad flag,
    # import failure) or a fast axon-init failure — NOT the register hang
    # this wrapper exists for.  Retry once (flaky init happens), then bail
    # instead of burning the full 5-attempt backoff on a deterministic bug.
    wait $pid; ec=$?
    echo "[tpu_launch] attempt $attempt: child exited rc=$ec after ${waited}s (before sentinel)"
    fast_fails=$((fast_fails + 1))
    if [ $fast_fails -ge 2 ]; then
      echo "[tpu_launch] two pre-sentinel exits: deterministic failure, giving up (rc=$ec)"
      exit $ec
    fi
    sleep 60
    continue
  fi
  if [ -e "$sentinel" ]; then
    echo "[tpu_launch] attempt $attempt: started (sentinel after ${waited}s)"
    remaining=$((total_s))
    while [ $remaining -gt 0 ]; do
      kill -0 $pid 2>/dev/null || { wait $pid; ec=$?; echo "[tpu_launch] done rc=$ec"; exit $ec; }
      sleep 30; remaining=$((remaining - 30))
    done
    echo "[tpu_launch] attempt $attempt: exceeded ${total_s}s, killing group"
    kill -- -$pid 2>/dev/null
    exit 124
  fi
  echo "[tpu_launch] attempt $attempt: no sentinel after ${waited}s, killing group and backing off"
  kill -- -$pid 2>/dev/null
  sleep $((120 * attempt))
done
echo "[tpu_launch] all attempts failed"
exit 1
