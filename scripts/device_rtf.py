"""Device-attributed real-time factor of the headline config.

The TPU here is time-shared with other tenants through a relay, so
wall-clock RTF (bench.py) is bounded by CURRENT contention.  This script
captures a profiler trace and reports the duration attributed to our
program alone — the true full-chip cost.

    python scripts/device_rtf.py
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from bbcat_dsp_tpu.convolve import (
        NonUniformConvolver,
        nonuniform_render_looped,
    )

    fs = 48000.0
    C, N, B, ratio = 64, 32768, 512, 8
    T = B * 48
    rng = np.random.default_rng(0)
    irs = (rng.standard_normal((C, N)) * np.exp(-np.arange(N) / 4000.0)
           ).astype(np.float64)
    reps = 8
    # distinct signal per render — see nonuniform_render_looped: repeating
    # one x lets XLA hoist the forward DFTs out of the loop
    xs = jnp.asarray(rng.standard_normal((reps, C, T)).astype(np.float32))
    conv = NonUniformConvolver(irs, block=B, ratio=ratio)
    state, Hh, Ht = conv.state, conv.H_head, conv.H_tail
    state, tails = nonuniform_render_looped(state, Hh, Ht, xs, B,
                                            tail_slot0=0)
    float(jnp.sum(tails))

    tdir = "/tmp/device_rtf_trace"
    import shutil

    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    state, tails = nonuniform_render_looped(state, Hh, Ht, xs, B,
                                            tail_slot0=0)
    float(jnp.sum(tails))
    jax.profiler.stop_trace()
    f = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    tr = json.load(gzip.open(f))
    dur = sum(e["dur"] * 1e-6 for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e
              and e.get("name", "").startswith("jit_"))
    audio = reps * T / fs
    print(json.dumps({
        "metric": "device_rtf_64ch_32ktap_48kHz_full_chip",
        "value": round(audio / dur, 1),
        "unit": "x_realtime_device_attributed",
        "device_seconds_per_render": dur / reps,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
