#!/bin/sh
# Round-5 measurement battery, gated on HBM headroom.
#
# The v5e is time-shared; co-tenant pressure can leave <2 GB free for
# hours, failing every config-5-scale program with async
# ResourceExhausted/InvalidArgument.  This script polls until a 4 GB
# probe allocation succeeds, then runs the battery in sequence (each
# stage is itself subprocess-isolated).
#
#   sh scripts/measure_when_free.sh [max_wait_minutes]

cd "$(dirname "$0")/.." || exit 1
MAXMIN=${1:-120}
i=0
while [ "$i" -lt "$MAXMIN" ]; do
  if timeout 120 python - <<'EOF'
import jax, jax.numpy as jnp
a = jnp.zeros((1 << 30,), jnp.float32) + 1.0   # 4 GB
float(a[-1])
EOF
  then
    echo "=== HBM headroom OK; running battery ==="
    timeout 1800 python scripts/trace_config5.py
    echo "=== trace rc=$? ==="
    timeout 3000 python scripts/ab_head_radix.py
    echo "=== abhead rc=$? ==="
    timeout 3000 python scripts/gate_sweep_smallc.py
    echo "=== gates rc=$? ==="
    timeout 3000 python scripts/bench_all.py
    echo "=== bench_all rc=$? ==="
    timeout 1200 python scripts/sharded_compiled_tpu.py --pod
    echo "=== sharded pod rc=$? ==="
    exit 0
  fi
  echo "HBM still tight ($(date -u +%H:%M:%SZ)); sleeping 180 s"
  sleep 180
  i=$((i + 3))
done
echo "gave up after ${MAXMIN} minutes"
exit 1
