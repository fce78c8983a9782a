"""Pod-deployment walkthrough, runnable without a pod.

Simulates an 8-chip slice with virtual CPU devices and drives the REAL
pod path end-to-end — the same `shard_map` programs a multi-host
deployment runs (docs/DEPLOYMENT.md "Multi-host pod slice"), at a scaled
-down geometry:

1. channel-sharded two-level convolver render (BASELINE config #5's
   engine) with the frozen perm-layout + forced-kernel spec,
2. sharded BS.1770 integrated loudness (one psum over the mesh),
3. the communication model's byte accounting + scaling projection.

Self-checking: sharded output must be BIT-EXACT against the same engine
run on one device, and the loudness psum must match the unsharded meter.

    python examples/pod_render.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 8 virtual devices BEFORE jax initialises (same trick tests/conftest.py
# and dryrun_multichip use; a real pod would jax.distributed.initialize())
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    fs = 48000.0
    C, B, ratio = 128, 128, 16        # scaled-down config-#5 shape;
    # tail window 2*B*ratio = 4096 > 2048 -> the PERMUTED layout engages,
    # and C/8 = 16 channels per device keeps the forced kernels engaged
    # on the shards too (same arithmetic both sides -> bit-exact)
    SB = B * ratio

    from bbcat_dsp_tpu.convolve import NonUniformConvolver
    from bbcat_dsp_tpu.convolve.fft import resolve_spectral_spec
    from bbcat_dsp_tpu.loudness import integrated_loudness
    from bbcat_dsp_tpu.parallel import (
        allreduce_bytes,
        channel_sharded_nonuniform_render,
        config5_scaling_table,
        make_mesh,
        shard_channels,
        sharded_integrated_loudness,
    )

    # the POD-DEFAULT spectral stack, frozen at construction: permuted
    # layout where it applies + Pallas kernels (interpreted off-TPU)
    # pin every kernel gate so the 16-channel shards and the 128-channel
    # single-device run resolve the SAME program (auto floors are
    # C-dependent; the fused head stays off below 64 ch)
    sh = resolve_spectral_spec(2 * B, backend="dftmm",
                               probe=False)._replace(mac="1",
                                                     fused_head="0")
    st = resolve_spectral_spec(2 * SB, backend="dftmm",
                               probe=False)._replace(permfft="1", mac="1")
    rng = np.random.default_rng(0)
    irs = rng.standard_normal((C, 4 * SB)) * np.exp(
        -np.arange(4 * SB) / (SB / 2.0))
    # >= 0.5 s so BS.1770's 400 ms gating blocks exist (48 super-blocks,
    # a multiple of the tail partition count -> static-slot path)
    x = (0.1 * rng.standard_normal((C, 48 * SB))).astype(np.float32)

    # ---- single-device reference
    conv = NonUniformConvolver(irs, block=B, ratio=ratio, spectral=(sh, st))
    y_ref = np.asarray(conv.process(jnp.asarray(x)))

    # ---- the same engine, channel-sharded over the mesh
    mesh = make_mesh()                 # all 8 (virtual) devices, axis "ch"
    conv2 = NonUniformConvolver(irs, block=B, ratio=ratio, spectral=(sh, st))
    render = channel_sharded_nonuniform_render(mesh, B, tail_slot0=0,
                                               specs=(sh, st))
    _, y = render(conv2.state, conv2.H_head, conv2.H_tail,
                  shard_channels(x, mesh))
    y = np.asarray(y)
    # per-shard channel count differs from the single-device batch, so
    # kernel gates may resolve differently per side — the contract is the
    # dryrun's: >= 110 dB (bit-exact when both sides pick the same path)
    err = np.sum((y_ref.astype(np.float64) - y.astype(np.float64)) ** 2)
    sig = np.sum(y_ref.astype(np.float64) ** 2)
    snr_db = float("inf") if err == 0 else 10 * np.log10(sig / err)

    # ---- sharded loudness: ONE psum rides the mesh
    lkfs_ref = float(integrated_loudness(jnp.asarray(y_ref), fs))
    weights = jnp.ones((C,), jnp.float32)
    lkfs = float(sharded_integrated_loudness(mesh, fs, C)(
        shard_channels(y, mesh), shard_channels(weights, mesh)))

    # ---- what a real slice would communicate per render
    psum_bytes = allreduce_bytes(4, len(jax.devices()))
    rows = config5_scaling_table(82.7, (1, 2, 4, 8))

    print(f"devices                 : {len(jax.devices())} "
          f"(virtual CPU; swap for a pod with jax.distributed.initialize)")
    print(f"engine                  : NonUniform B={B} ratio={ratio}, "
          f"tail layout={st.layout} radix={st.radix} kernels=forced")
    print(f"sharded vs single       : {snr_db:.1f} dB SNR (contract >= 110)")
    print(f"loudness (sharded psum) : {lkfs:7.2f} LKFS "
          f"(unsharded {lkfs_ref:7.2f})")
    print(f"collective bytes/render : {psum_bytes} (loudness psum; "
          f"render itself is communication-free)")
    print("scaling (from the measured 82.7x 1-chip artifact):")
    for r in rows:
        print(f"  {r['chips']:2d} chips: {r['aggregate_rtf']:7.1f}x RT "
              f"at {100 * r['efficiency']:5.1f}% efficiency")
    assert snr_db >= 110.0, f"sharded render diverged: {snr_db:.1f} dB"
    assert abs(lkfs - lkfs_ref) < 1e-4, (lkfs, lkfs_ref)


if __name__ == "__main__":
    main()
