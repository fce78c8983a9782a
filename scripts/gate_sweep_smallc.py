"""Kernel-gate sweep below C=64 (VERDICT r4 next #6).

The round-4 retune measured the kernel gates at C=64 only; the auto
floors below that (``_FUSED_MIN_CH``, ``_ROT_MIN_ELEMS``,
``_HEAD_MIN_ELEMS``) were conservative guesses.  This sweep measures the
headline geometry scaled down to C in {8, 16, 32} with the kernel stack
(a) auto-gated and (b) forced, so the floors can be tuned from data.

Each (C, mode) cell runs in its own subprocess (warm-process isolation).

Round 5: at these sizes the renders are dispatch-bound, so the
wall-clock slope is relay-noise-dominated (STATUS.md round-5 residual).
Each cell therefore ALSO captures a ``jax.profiler`` trace of one render
and reports ``device_rtf`` from summed device-op time — the
contention-immune number the gate decision should key off (same method
as ``trace_config5.py``; requires a profiler-healthy window, else the
field is null and wall rtf stands alone).

    python scripts/gate_sweep_smallc.py

Writes BENCH_GATE_SWEEP.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

FS = 48000.0


def _device_seconds(run) -> float | None:
    """Sum of device-side op durations for ONE ``run()`` call, from a
    jax.profiler trace (same parsing as ``trace_config5.py``).  Returns
    None when the profiler yields no device events (unhealthy relay
    windows capture 0-duration traces)."""
    import glob
    import gzip
    import shutil

    import jax
    import jax.numpy as jnp

    tdir = "/tmp/trace_gate_sweep"
    shutil.rmtree(tdir, ignore_errors=True)
    jax.profiler.start_trace(tdir)
    y = run()
    float(jnp.sum(y))
    jax.profiler.stop_trace()
    try:
        f = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    except IndexError:
        return None
    tr = json.load(gzip.open(f))
    pid_names = {}
    for e in tr.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    total = 0.0
    for e in tr.get("traceEvents", []):
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e["pid"] not in dev_pids:
            continue
        if e.get("name", "?").startswith(("jit_", "XLA Modules", "Steal")):
            continue
        total += e["dur"] * 1e-6
    return total or None


def _measure(C: int, forced: bool):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from bbcat_dsp_tpu.convolve import NonUniformConvolver
    from bbcat_dsp_tpu.convolve.fft import resolve_spectral_spec
    from bbcat_dsp_tpu.convolve.nonuniform import nonuniform_render_pinned

    rng = np.random.default_rng(0)
    N, B, ratio = 32768, 512, 8
    SB = B * ratio
    irs = (rng.standard_normal((C, N)) * np.exp(-np.arange(N) / 4000.0)
           ).astype(np.float32)
    spectral = None
    if forced:
        over = dict(mac="1", fused_head="1")
        sh = resolve_spectral_spec(2 * B, backend="dftmm",
                                   probe=False)._replace(**over)
        st = resolve_spectral_spec(2 * SB, backend="dftmm",
                                   probe=False)._replace(**over,
                                                         permfft="1")
        spectral = (sh, st)
    conv = NonUniformConvolver(irs, block=B, ratio=ratio, spectral=spectral)
    T = SB * conv.tail_parts * 4        # longer signal: small C renders fast
    x = jnp.asarray(rng.standard_normal((C, T)).astype(np.float32))
    box = {"state": conv.state}

    def run():
        box["state"], y = nonuniform_render_pinned(
            box["state"], conv.H_head, conv.H_tail, x, B, tail_slot0=0,
            specs=conv.specs if spectral else None)
        return y

    run()

    def chain(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = run()
            float(jnp.sum(last))
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(4):
        t1, t2 = chain(1), chain(3)
        per = (t2 - t1) / 2
        if per > 0.2 * t1:
            break
    dev = _device_seconds(run)
    return {"C": C, "mode": "forced" if forced else "auto",
            "rtf": round(T / FS / per, 1),
            "device_rtf": round(T / FS / dev, 1) if dev else None,
            "device_ms": round(dev * 1e3, 3) if dev else None}


def main() -> int:
    import subprocess

    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        C, forced = int(sys.argv[2]), sys.argv[3] == "1"
        print(json.dumps(_measure(C, forced)))
        return 0
    out = []
    for C in (8, 16, 32, 64):
        for forced in (False, True):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only",
                 str(C), "1" if forced else "0"],
                capture_output=True, text=True, timeout=1800)
            r = None
            for ln in reversed(p.stdout.strip().splitlines()):
                try:
                    r = json.loads(ln)
                    break
                except ValueError:
                    continue
            out.append(r or {"C": C, "forced": forced,
                             "error": p.stderr[-200:]})
            print(json.dumps(out[-1]))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_GATE_SWEEP.json"),
            "w") as fp:
        json.dump(out, fp, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
