"""Benchmark harness — BASELINE.md headline config on real hardware.

Measures the north-star metric: real-time factor of 64-channel x 32768-tap
partitioned convolution at 48 kHz on one TPU chip (BASELINE.json), plus the
SNR of the same computation against the float64 golden model.

The TPU is reached through a shared relay whose latency fluctuates and can
stall outright, so the harness is organised around ALWAYS having a number:

- the very first timed call already yields a defensible lower bound
  (total wall time of a 2-render chain, dispatch included) which is
  stashed in ``_BEST`` immediately;
- every subsequent, better measurement replaces it;
- the SIGALRM watchdog and any exception path emit the best-so-far value
  with ``"approx": true`` instead of a null line;
- compilations are cached on disk across runs, and the float64 golden
  reference for the SNR check is cached in /tmp so re-runs skip it.

Timing estimator: per-render cost is the SLOPE between a short and a long
chain of renders executed inside one device program (intercept = relay
round-trip, which cancels); the minimum over spaced attempts is kept (the
standard estimator under external interference, which only ever ADDS time).

Output contract: the LAST complete JSON line on stdout is the result —
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
where vs_baseline is the real-time factor divided by the 100x target.
(The watchdog/backstop paths may emit interim best-so-far lines before
the final one; consumers must parse the last line, as the driver does.)
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

import numpy as np

_WATCHDOG_S = 400    # first deadline: emit an interim line, keep running
_WATCHDOG_EXTRA_S = 150  # second deadline: emit final line and exit

# Best-so-far measurement, updated the moment any timing exists so the
# watchdog / exception paths can emit a real number instead of null.
_BEST = {
    "rtf": None,        # best real-time factor measured so far
    "per_render": None,
    "snr": None,
    "stage": "init",    # how far the run got (for the approx note)
    "exact": False,     # True once the slope estimator has run
}

_FS = 48000.0
_C, _N, _B = 64, 32768, 512
_NBLOCKS = 48  # per render: 6 super-blocks (tail fires every super-block)
_T = _B * _NBLOCKS


def _emit(note: str | None = None) -> None:
    """Print the ONE JSON result line from whatever _BEST holds."""
    rtf = _BEST["rtf"]
    result = {
        "metric": "rtf_64ch_32ktap_48kHz_1chip",
        "value": round(float(rtf), 2) if rtf is not None else None,
        "unit": "x_realtime",
        "vs_baseline": round(float(rtf) / 100.0, 3) if rtf is not None else None,
    }
    if _BEST["snr"] is not None:
        result["snr_db_vs_golden"] = round(float(_BEST["snr"]), 1)
    if _BEST["per_render"] is not None:
        result["samples_per_sec_per_chip"] = int(
            _C * _T / _BEST["per_render"]
        )
    result["engine"] = "nonuniform_partitioned(B=512, ratio=8)"
    if _BEST.get("layout"):
        result["layout"] = _BEST["layout"]
    if note is not None:
        result["approx"] = True
        result["note"] = f"{note} (stage={_BEST['stage']}); " + (
            "value is the best lower bound measured before the interruption"
            if rtf is not None else "no timing completed"
        )
    print(json.dumps(result))
    sys.stdout.flush()


_fired = 0
_DONE = False


def _thread_backstop() -> None:
    """SIGALRM handlers only run when the main thread executes Python
    bytecode; a relay call that never returns (observed: backend init
    hanging indefinitely during a relay outage) would wedge them and the
    driver would get NO line at all.  Daemon timer threads are immune:
    they emit the best-so-far line and hard-exit from the timer thread.
    Armed slightly after the signal deadlines so they only act when the
    signal path is wedged."""
    import threading

    def interim():
        if not _DONE and _fired == 0:
            _emit(note=f"TPU relay unresponsive at {_WATCHDOG_S + 30}s "
                       "(thread backstop)")

    def final():
        if not _DONE:
            _emit(note="TPU relay wedged; thread-backstop exit")
            os._exit(0)

    for t in (
        threading.Timer(_WATCHDOG_S + 30, interim),
        threading.Timer(_WATCHDOG_S + _WATCHDOG_EXTRA_S + 30, final),
    ):
        t.daemon = True
        t.start()


def _watchdog(signum, frame):  # noqa: ARG001
    # The relay to the TPU can stall for minutes under contention (backend
    # init alone has been observed >420 s).  Two-phase: at the first
    # deadline emit the best-so-far as an interim line and re-arm — the
    # driver parses the LAST complete JSON line, so a later, better result
    # supersedes it; at the second deadline emit and exit for real.
    global _fired
    _fired += 1
    if _fired == 1:
        _emit(note=f"TPU relay slow; interim result at {_WATCHDOG_S}s")
        signal.alarm(_WATCHDOG_EXTRA_S)
        return
    _emit(note=f"TPU relay stalled > {_WATCHDOG_S + _WATCHDOG_EXTRA_S}s")
    os._exit(0)


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def _golden_ref(x0: np.ndarray, ir0: np.ndarray) -> np.ndarray:
    """Float64 golden convolution of channel 0, cached on disk across runs."""
    cache = "/tmp/bbcat_bench_golden_v1.npz"
    key = float(x0[:8].sum() + ir0[:8].sum())
    try:
        z = np.load(cache)
        if abs(float(z["key"]) - key) < 1e-12 and z["ref"].shape == (_T,):
            return z["ref"]
    except Exception:
        pass
    from scipy.signal import fftconvolve

    ref = fftconvolve(x0.astype(np.float64), ir0.astype(np.float64))[:_T]
    try:
        np.savez(cache, ref=ref, key=key)
    except Exception:
        pass
    return ref


def main() -> None:
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(_WATCHDOG_S)
    _thread_backstop()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp

    from bbcat_dsp_tpu.convolve import (
        NonUniformConvolver,
        nonuniform_render_looped,
    )

    # Backend init through the relay is the single most variable cost
    # (107-270 s observed; it is what stalled round 1's bench) — absorb it
    # on a trivial op so the first real timing isn't polluted by it.
    _BEST["stage"] = "backend_init"
    float(jnp.sum(jnp.ones((8, 128)) * 2))

    rng = np.random.default_rng(0)
    irs = (
        rng.standard_normal((_C, _N)) * np.exp(-np.arange(_N) / 4000.0)
    ).astype(np.float64)
    x = rng.standard_normal((_C, _T)).astype(np.float32)

    from bbcat_dsp_tpu.convolve.fft import half_engine_layout

    _BEST["layout"] = half_engine_layout(2 * _B * 8)  # tail FFT size
    conv = NonUniformConvolver(irs, block=_B, ratio=8)
    xd = jnp.asarray(x)
    # timing renders each consume a DISTINCT signal: scanning the same x
    # lets XLA hoist the input-dependent stages (whole-signal forward DFTs)
    # out of the repeat loop and inflates the "throughput" ~7x
    # 24 distinct signals -> the long chain covers ~70 ms of device time,
    # >2x the relay RTT, so the short/long slope is much less sensitive to
    # per-call relay jitter than the previous 12-render chain (the
    # 176-196x spread across round-3 runs was mostly that jitter)
    xs_all = jnp.asarray(
        rng.standard_normal((24, _C, _T)).astype(np.float32)
    )
    audio_seconds = _T / _FS

    # -- throughput first: get a number on the board before anything else --
    # Two programs, in safety order:
    #   1. tail_slot0=None (dynamic tail-queue slot): compiles in ~5 s and
    #      clears the target several times over (~600x) — this secures a
    #      defensible number early no matter what the relay does;
    #   2. tail_slot0=0 (static slots, zero-gather): ~6x faster on device
    #      (3696x measured honest) but its fully-unrolled program has taken
    #      the remote compiler minutes on bad days — attempted only after a
    #      dynamic number exists and only within the remaining time budget.
    conv.reset()
    state = conv.state
    Hh, Ht = conv.H_head, conv.H_tail
    run_t0 = time.perf_counter()

    def chain(n: int, slot0, trials: int = 2) -> float:
        # n renders (distinct inputs) inside ONE device program:
        # per-dispatch relay latency appears once per call and cancels in
        # the slope over n.  Every completed call immediately improves the
        # overhead-INCLUSIVE lower bound in _BEST, so even a later stall
        # leaves a real value.
        nonlocal state
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            state, tails = nonuniform_render_looped(
                state, Hh, Ht, xs_all[:n], _B, tail_slot0=slot0
            )
            float(jnp.sum(tails))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            lb = audio_seconds * n / dt  # dispatch-inclusive -> lower bound
            if _BEST["rtf"] is None or (not _BEST["exact"]
                                        and lb > _BEST["rtf"]):
                _BEST["rtf"] = lb
                _BEST["per_render"] = dt / n
        return best

    n1, n2 = 2, 24

    def slope_attempts(slot0, attempts: int, budget_s: float) -> None:
        # The relay's load varies on minute scales and inflates every
        # sample (interference only ever ADDS time), so take the best
        # slope across spaced attempts, stopping early once an attempt is
        # clearly uncongested.
        good = audio_seconds / (400.0 if slot0 is None else 2500.0)
        t0 = time.perf_counter()
        for _ in range(attempts):
            t_short = chain(n1, slot0)
            t_long = chain(n2, slot0)
            per = (t_long - t_short) / (n2 - n1)
            if (per > 0.2 * t_short / n1  # slope consistent with abs time
                    and audio_seconds / per > (_BEST["rtf"] or 0.0)):
                _BEST["rtf"] = audio_seconds / per
                _BEST["per_render"] = per
                _BEST["exact"] = True
            if ((_BEST["per_render"] or 1.0) < good
                    or time.perf_counter() - t0 > budget_s):
                break
            time.sleep(15)

    _BEST["stage"] = "compile_dynamic"
    try:
        chain(n1, None, trials=1)  # compile + first lower bound
    except Exception:
        # the permuted-layout tail is the default; if its program fails
        # on this backend (never-compiled-here path), fall back to the
        # standard layout rather than lose the round's number.  The
        # switch is recorded in the emitted JSON so the number is never
        # silently attributed to the layout it didn't measure.
        os.environ["BBCAT_DSP_PERM_LAYOUT"] = "0"
        _BEST["layout"] = "std_fallback"
        conv = NonUniformConvolver(irs, block=_B, ratio=8)
        state, Hh, Ht = conv.state, conv.H_head, conv.H_tail
        _BEST["stage"] = "compile_dynamic_stdlayout"
        chain(n1, None, trials=1)
    chain(n2, None, trials=1)
    _BEST["stage"] = "slope_dynamic"
    slope_attempts(None, attempts=2, budget_s=60.0)

    # -- static-slot upgrade, only with >=150 s of watchdog budget left --
    if time.perf_counter() - run_t0 < _WATCHDOG_S - 150.0:
        _BEST["stage"] = "compile_static"
        try:
            chain(n1, 0, trials=1)
            chain(n2, 0, trials=1)
            _BEST["stage"] = "slope_static"
            slope_attempts(0, attempts=3, budget_s=90.0)
        except Exception:  # noqa: BLE001 — keep the dynamic number
            pass
    if _BEST["per_render"] is None:
        # no consistent slope anywhere: overhead-inclusive fallback
        t_long = chain(n2, None, trials=1)
        _BEST["per_render"] = t_long / n2
        _BEST["rtf"] = audio_seconds / _BEST["per_render"]

    # -- accuracy: one channel vs float64 golden convolution (cached) --
    # call the dynamic-slot render directly: conv.process would pick the
    # static-slot program (nsuper multiple of tail partitions) and eat its
    # pathological compile
    _BEST["stage"] = "snr"
    conv.reset()
    from bbcat_dsp_tpu.convolve import nonuniform_render

    _, y = nonuniform_render(conv.state, Hh, Ht, xd, _B, tail_slot0=None)
    y0 = np.asarray(y[0])
    ref0 = _golden_ref(x[0], irs[0])
    _BEST["snr"] = 10.0 * np.log10(
        np.sum(ref0**2) / np.sum((ref0 - y0) ** 2)
    )

    _BEST["stage"] = "done"
    global _DONE
    _DONE = True
    signal.alarm(0)
    _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — any failure still yields a line
        _DONE = True
        signal.alarm(0)
        _emit(note=f"exception: {type(e).__name__}: {e}")
        sys.exit(0)
