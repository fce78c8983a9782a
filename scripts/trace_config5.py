"""Per-op device-time attribution for config #5 (1024 ch x 64k taps).

Captures a jax.profiler trace of one pod-config render group and prints the
top HLO ops by total device duration, so the next optimization lever is
chosen from hardware data, not the analytic roofline (which at this config
has twice disagreed with measurement — see docs/PERFORMANCE.md).

    python scripts/trace_config5.py            # std layout default
    BBCAT_DSP_PERM_LAYOUT=auto python scripts/trace_config5.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

FS = 48000.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from bbcat_dsp_tpu.convolve import NonUniformConvolver
    from bbcat_dsp_tpu.convolve.nonuniform import nonuniform_render_pinned

    rng = np.random.default_rng(0)
    C, N, B, ratio = 1024, 65536, 512, 8
    SB = B * ratio
    irs = (rng.standard_normal((C, N)) * np.exp(-np.arange(N) / 8000.0)
           ).astype(np.float32)
    conv = NonUniformConvolver(irs, block=B, ratio=ratio)
    T = SB * conv.tail_parts
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    state = conv.state

    # compile + warm
    state2, y = nonuniform_render_pinned(state, conv.H_head, conv.H_tail,
                                         x, B, tail_slot0=0)
    float(jnp.sum(y))

    tdir = "/tmp/trace_config5"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    state3, y = nonuniform_render_pinned(state2, conv.H_head, conv.H_tail,
                                         x, B, tail_slot0=0)
    float(jnp.sum(y))
    jax.profiler.stop_trace()

    f = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    tr = json.load(gzip.open(f))
    events = [e for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # device-side op events live on TPU pids; host threads carry python
    # frames.  Identify device pids from process_name metadata.
    pid_names = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}

    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if dev_pids and e["pid"] not in dev_pids:
            continue
        name = e.get("name", "?")
        if name.startswith(("jit_", "XLA Modules", "Steal")):
            continue
        agg[name] += e["dur"] * 1e-6
        cnt[name] += 1
        total += e["dur"] * 1e-6

    audio = T / FS
    print(json.dumps({"audio_s": audio, "device_total_s": round(total, 5),
                      "device_rtf": round(audio / total, 1) if total else None,
                      "trace": f}))
    rowsorted = sorted(agg.items(), key=lambda kv: -kv[1])
    for name, dur in rowsorted[:40]:
        print(f"{dur * 1e3:9.3f} ms  x{cnt[name]:<5d} {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
