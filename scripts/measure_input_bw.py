"""Measure HOST -> DEVICE input bandwidth on the live TPU (VERDICT r3 #4).

The config-#5 deployment model's input-delivery ceiling rests on a link
bandwidth parameter; everything else in ``parallel.comms.CommEnv`` is an
order-of-magnitude public figure.  This script measures the one axis that
IS measurable in this environment — the host->device transfer path the
input audio actually takes (here: through the axon relay; on a real pod
host: PCIe) — by timing ``jax.device_put`` of float32 blocks at several
sizes and fitting bytes/s on the linear region.

Writes the fit to ``BENCH_INPUT_BW.json`` so ``CommEnv`` docs and
docs/DEPLOYMENT.md can cite a measured number.

    python scripts/measure_input_bw.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)

    sizes_mb = [1, 4, 16, 64, 128]
    reps = {1: 6, 4: 5, 16: 4, 64: 3, 128: 3}
    rows = []
    rng = np.random.default_rng(0)
    for mb in sizes_mb:
        nbytes = mb * (1 << 20)
        x = rng.standard_normal(nbytes // 4).astype(np.float32)
        # warm (allocator, relay session)
        y = jax.device_put(x, dev)
        float(jnp.sum(y[:8]))
        best = float("inf")
        for _ in range(reps[mb]):
            t0 = time.perf_counter()
            y = jax.device_put(x, dev)
            # a scalar fetch forces completion through the relay
            # (block_until_ready does not reliably block here)
            float(jnp.sum(y[:8]))
            dt = time.perf_counter() - t0
            best = min(best, dt)
        rows.append({"mb": mb, "best_s": best,
                     "gbps": nbytes / best / 1e9})
        print(f"{mb:4d} MB: {best*1e3:8.1f} ms  "
              f"{nbytes / best / 1e9:6.3f} GB/s", file=sys.stderr)

    # fit t = a + nbytes/bw over the two largest sizes (amortises the
    # fixed per-transfer latency)
    big = rows[-2:]
    b0, b1 = big[0], big[1]
    dbytes = (b1["mb"] - b0["mb"]) * (1 << 20)
    dt = b1["best_s"] - b0["best_s"]
    bw = dbytes / dt if dt > 0 else big[-1]["gbps"] * 1e9
    lat = b0["best_s"] - b0["mb"] * (1 << 20) / bw
    out = {
        "device": str(dev),
        "path": "host->device via axon relay (jax.device_put + fetch)",
        "rows": rows,
        "fit_bw_bytes_per_s": bw,
        "fit_latency_s": max(lat, 0.0),
        "config5_input_rate_bytes_per_s": 1024 * 48000 * 4,
        "config5_input_bound_rtf_via_this_link":
            bw / (1024 * 48000 * 4),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_INPUT_BW.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps({"fit_bw_gbps": round(bw / 1e9, 3),
                      "fit_latency_ms": round(max(lat, 0.0) * 1e3, 2),
                      "input_bound_rtf": round(out[
                          "config5_input_bound_rtf_via_this_link"], 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
