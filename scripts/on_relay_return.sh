#!/bin/sh
# Run the full round-2 measurement debt in priority order the moment the
# TPU relay responds.  Each stage is independently timed out and logged to
# /tmp/r2_measure/ so a relay relapse mid-sequence loses only that stage.
#
#   sh scripts/on_relay_return.sh
cd "$(dirname "$0")/.." || exit 1
mkdir -p /tmp/r2_measure

echo "== stage 0: liveness"
timeout 300 python -c "import jax; print(jax.devices())" \
  > /tmp/r2_measure/00_liveness.log 2>&1 || { echo "relay still dead"; exit 1; }
cat /tmp/r2_measure/00_liveness.log

echo "== stage 1: bench.py (driver headline)"
timeout 590 python bench.py > /tmp/r2_measure/01_bench.log 2>&1
tail -2 /tmp/r2_measure/01_bench.log

echo "== stage 2: config-5 A/B sweep"
sh scripts/ab_config5.sh > /tmp/r2_measure/02_ab_config5.log 2>&1
cat /tmp/r2_measure/02_ab_config5.log

echo "== stage 3: full config sweep -> BENCH_EXTRA.json"
timeout 590 python scripts/bench_all.py > /tmp/r2_measure/03_bench_all.log 2>&1
tail -8 /tmp/r2_measure/03_bench_all.log

echo "== stage 4: flagship layout A/B (std layout bench for comparison)"
timeout 590 env BBCAT_DSP_PERM_LAYOUT=0 python bench.py \
  > /tmp/r2_measure/04_bench_stdlayout.log 2>&1
tail -2 /tmp/r2_measure/04_bench_stdlayout.log

echo "== done; logs in /tmp/r2_measure/"
