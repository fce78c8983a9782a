#!/bin/sh
# Round-5 measurement battery, gated on HBM headroom per stage.
#
# The v5e is time-shared; co-tenant pressure can leave <2 GB free for
# hours, failing every config-5-scale program with async
# ResourceExhausted/InvalidArgument.  Before EACH stage this script
# waits until a 6 GB probe allocation succeeds; stages that complete
# (rc=0) are marked in /tmp/battery_done and not re-run, so the script
# is safe to restart.
#
#   sh scripts/measure_when_free.sh [max_wait_minutes]

cd "$(dirname "$0")/.." || exit 1
MAXMIN=${1:-240}
DONE=/tmp/battery_done
mkdir -p "$DONE"
START=$(date +%s)

have_mem() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
a = jnp.zeros(((3 << 29),), jnp.float32) + 1.0   # 6 GB
float(a[-1])" >/dev/null 2>&1
}

wait_mem() {
  while :; do
    have_mem && return 0
    now=$(date +%s)
    [ $(((now - START) / 60)) -ge "$MAXMIN" ] && return 1
    echo "HBM tight ($(date -u +%H:%M:%SZ)); sleeping 180 s"
    sleep 180
  done
}

run_stage() {
  name=$1; shift
  [ -e "$DONE/$name" ] && return 0
  wait_mem || { echo "gave up waiting for HBM before $name"; return 1; }
  echo "=== stage $name start $(date -u +%H:%M:%SZ) ==="
  "$@"
  rc=$?
  echo "=== stage $name rc=$rc ==="
  [ "$rc" -eq 0 ] && touch "$DONE/$name"
  return 0
}

run_stage trace    timeout 1800 python scripts/trace_config5.py
run_stage abhead   timeout 3000 python scripts/ab_head_radix.py
run_stage gates    timeout 3000 python scripts/gate_sweep_smallc.py
run_stage benchall timeout 3000 python scripts/bench_all.py
run_stage shardpod timeout 1200 python scripts/sharded_compiled_tpu.py --pod
echo "battery pass complete; done stages:"; ls "$DONE"
