#!/bin/sh
# Hardware A/B of the round-2 tail-transform options at config #5.
# Each variant runs in a fresh process (env is read at trace time and jit
# caches are per-process).  Prints one labelled JSON line per variant.
#
#   sh scripts/ab_config5.sh
cd "$(dirname "$0")/.." || exit 1

run () {
  label="$1"; shift
  echo "== $label"
  timeout 580 env "$@" python -c "
import sys, json
sys.path.insert(0, 'scripts')
from bench_all import bench_config5
print(json.dumps(bench_config5()))
" 2>&1 | tail -2
}

run perm_auto            BBCAT_DSP_PERM_LAYOUT=auto
run std_layout           BBCAT_DSP_PERM_LAYOUT=0
run perm_pallas_fft      BBCAT_DSP_PALLAS_PERMFFT=1
run perm_karatsuba       BBCAT_DSP_CMATMUL=karatsuba
run perm_fft_kara        BBCAT_DSP_PALLAS_PERMFFT=1 BBCAT_DSP_CMATMUL=karatsuba
run perm_radix16         BBCAT_DSP_PERM_RADIX=16
run perm_r16_fft_kara    BBCAT_DSP_PERM_RADIX=16 BBCAT_DSP_PALLAS_PERMFFT=1 BBCAT_DSP_CMATMUL=karatsuba
run perm_r32_fft_kara    BBCAT_DSP_PERM_RADIX=32 BBCAT_DSP_PALLAS_PERMFFT=1 BBCAT_DSP_CMATMUL=karatsuba
