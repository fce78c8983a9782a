#!/bin/sh
# Round-3 relay waiter: poll the TPU relay until it answers, then run the
# full measurement-debt pipeline (scripts/on_relay_return.sh).  Designed to
# run in the background for hours.
#
#   sh scripts/relay_waiter.sh [max_wait_seconds]
#
# Liveness is two-stage: a cheap TCP connect to the relay daemon port
# (fails fast while the daemon is down) and, once that opens, a real
# jax.devices() probe (the daemon can listen before the pool is usable).
# Results land in /tmp/r3_measure/; the script exits 0 after a completed
# measurement run, 2 on max-wait expiry.
cd "$(dirname "$0")/.." || exit 1
mkdir -p /tmp/r3_measure
MAX_WAIT="${1:-41400}"   # default 11.5 h
START=$(date +%s)
N=0
while :; do
  NOW=$(date +%s)
  ELAPSED=$((NOW - START))
  [ "$ELAPSED" -ge "$MAX_WAIT" ] && {
    echo "relay never returned within ${MAX_WAIT}s" | tee /tmp/r3_measure/WAITER_EXPIRED
    exit 2
  }
  N=$((N + 1))
  # stage 1: cheap TCP probe of the relay daemon port
  if timeout 5 sh -c 'exec 3<>/dev/tcp/127.0.0.1/8113' 2>/dev/null; then
    echo "$(date -u +%FT%TZ) tcp 8113 open after ${ELAPSED}s (probe $N)" >> /tmp/r3_measure/waiter.log
    # stage 2: real backend probe (daemon can be up before the pool is)
    if timeout 300 python -c "import jax; print(jax.devices())" \
        > /tmp/r3_measure/probe_jax.log 2>&1; then
      echo "$(date -u +%FT%TZ) jax.devices OK — running measurement pipeline" >> /tmp/r3_measure/waiter.log
      sh scripts/on_relay_return.sh > /tmp/r3_measure/pipeline.log 2>&1
      echo "$(date -u +%FT%TZ) pipeline rc=$?" >> /tmp/r3_measure/waiter.log
      touch /tmp/r3_measure/MEASURED
      exit 0
    fi
    echo "$(date -u +%FT%TZ) tcp open but jax probe failed/hung" >> /tmp/r3_measure/waiter.log
    sleep 120
  else
    # every ~10 min also try a full jax probe in case the relay moved ports
    if [ $((N % 20)) -eq 0 ]; then
      if timeout 120 python -c "import jax; print(jax.devices())" \
          > /tmp/r3_measure/probe_jax.log 2>&1; then
        echo "$(date -u +%FT%TZ) jax probe OK (tcp 8113 closed!) — running pipeline" >> /tmp/r3_measure/waiter.log
        sh scripts/on_relay_return.sh > /tmp/r3_measure/pipeline.log 2>&1
        touch /tmp/r3_measure/MEASURED
        exit 0
      fi
    fi
    sleep 30
  fi
done
