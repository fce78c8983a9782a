"""Device-attributed PER-BLOCK latency of the latency engine.

The throughput numbers (device_rtf.py, bench.py) chain many blocks into
one dispatch — right for offline/bulk rendering, but a live renderer
(the reference's per-block host-application contract,
`/root/reference/README:38-44`) cares about the cost of ONE block
against its real-time deadline (B/fs seconds).  This script measures the
device time of a single `convolver_step` dispatch for the latency engine
(`BlockConvolver`, one-block I/O granularity) at two configs and reports
the deadline headroom.  Wall latency through a relay/host adds dispatch
RTT on top — that is deployment-topology, not engine, cost.

    python scripts/device_latency.py
"""

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

FS = 48000.0


def one_block_device_seconds(C, N, B, nwarm=3, nmeas=20):
    import jax
    import jax.numpy as jnp

    from bbcat_dsp_tpu.convolve import BlockConvolver

    rng = np.random.default_rng(0)
    irs = (rng.standard_normal((C, N)) * np.exp(-np.arange(N) / 4000.0)
           ).astype(np.float32)
    conv = BlockConvolver(irs if C > 1 else irs[0], block=B)
    blocks = [jnp.asarray(rng.standard_normal((C, B)).astype(np.float32))
              for _ in range(nwarm + nmeas)]
    for b in blocks[:nwarm]:
        float(jnp.sum(conv.process_block(b)))

    tdir = "/tmp/device_latency_trace"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    for b in blocks[nwarm:]:
        y = conv.process_block(b)
    float(jnp.sum(y))
    jax.profiler.stop_trace()
    f = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    tr = json.load(gzip.open(f))
    dur = sum(e["dur"] * 1e-6 for e in tr.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e
              and e.get("name", "").startswith("jit_"))
    return dur / nmeas


def main() -> int:
    for label, C, N, B in [
        ("config1_mono_4096tap", 1, 4096, 512),
        ("headline_64ch_32ktap", 64, 32768, 512),
    ]:
        dt = one_block_device_seconds(C, N, B)
        deadline = B / FS
        print(json.dumps({
            "metric": f"device_block_latency_{label}",
            "value": round(dt * 1e6, 1),
            "unit": "us_per_block_device_attributed",
            "deadline_us": round(deadline * 1e6, 1),
            "headroom_x": round(deadline / dt, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
