"""First-principles roofline model of the config-#5 render group.

Computes, for each engine variant, the per-render-group (Pt super-blocks)
HBM bytes, MXU flops (at HIGH = 3 bf16 passes) and VPU MACs, and the
implied bound on real-time factor on one v5e chip.  Pure arithmetic — no
device needed; used to sanity-check measured numbers and pick A/B
priorities (docs/PERFORMANCE.md cites this).

    python scripts/roofline_config5.py
"""

from __future__ import annotations

# v5e chip characteristics
HBM_GBS = 819e9          # bytes/s
MXU_BF16 = 197e12        # flop/s
HIGH_PASSES = 3          # HIGH = 3 bf16 matmul passes
VPU_FMA = 0.96e12        # FMA/s float32 (8 sublanes x 128 lanes x ~0.94 GHz)

FS = 48000.0
C, N, B, RATIO = 1024, 65536, 512, 8
SB = B * RATIO                      # 4096
P_HEAD = 2 * RATIO                  # 16
F_HEAD = B + 1                      # 513
PT = -(-(N - 2 * SB) // SB)         # 14 tail partitions
GROUP_S = PT * SB / FS              # seconds of audio per render group
ROWS = PT * C                       # tail transform rows per group


def mxu_s(flops):
    return flops * HIGH_PASSES / MXU_BF16


def fmt(name, hbm, mxu_flop, vpu_mac):
    t_hbm = hbm / HBM_GBS
    t_mxu = mxu_s(mxu_flop)
    t_vpu = vpu_mac / VPU_FMA
    # HBM overlaps compute within a kernel; across XLA ops it serialises.
    # Report both the optimistic max() and pessimistic sum() bounds.
    lo = max(t_hbm, t_mxu + t_vpu)
    hi = t_hbm + t_mxu + t_vpu
    print(f"{name:34s} HBM {hbm/1e9:6.2f} GB ({t_hbm*1e3:5.1f} ms)  "
          f"MXU {mxu_flop/1e9:6.1f} GF ({t_mxu*1e3:5.1f} ms)  "
          f"VPU {vpu_mac/1e9:5.1f} GMAC ({t_vpu*1e3:5.1f} ms)  "
          f"-> {GROUP_S/hi:5.1f}-{GROUP_S/lo:5.1f}x RT")
    return lo, hi


def head_budget(fused_whole_group: bool):
    """Fused head kernel: x + y + H + carry traffic; DFT matmuls + MAC."""
    f32 = 4
    x_y = 2 * C * PT * SB * f32
    H = 2 * P_HEAD * C * F_HEAD * f32
    carry = 2 * 2 * P_HEAD * C * F_HEAD * f32  # in + out
    n_calls = 1 if fused_whole_group else (PT * RATIO) // 16
    hbm = x_y + n_calls * (H + carry)
    # DFT matmuls: fwd [blocks*C, B]x[B, F] + inv [blocks*C, F]x[F, B]
    blocks = PT * RATIO
    mxu = 2 * blocks * C * B * F_HEAD * 2 * 2
    # MAC: P complex MACs per (block, c, f)
    vpu = P_HEAD * blocks * C * F_HEAD * 4
    return hbm, mxu, vpu


def tail_budget(layout: str, kernels: bool, radix: int = 8):
    f32 = 4
    if layout == "std":
        Fp = SB + 1
        # staged XLA four-step: two materialised transposes per transform
        # + packed-inverse flip; intermediates ~[ROWS, 2*SB] complex
        inter = 2 * ROWS * 2 * SB * f32
        fwd_hbm = ROWS * SB * f32 + 2 * inter + 2 * ROWS * Fp * f32
        inv_hbm = 2 * ROWS * Fp * f32 + 2 * inter + ROWS * SB * f32
        # rect four-step flops (~2.7x less than generic)
        n1, n2 = 128, 64
        fwd_mxu = ROWS * 8 * 2 * SB * (n1 + n2) / 2.7
        inv_mxu = fwd_mxu
        fwd_vpu = inv_vpu = ROWS * 2 * SB  # twiddles
    else:
        r = radix
        n1 = 2 * SB // r
        n1h1 = n1 // 2 + 1
        Fp = r * n1h1
        fwd_hbm = ROWS * SB * f32 + 2 * ROWS * Fp * f32
        inv_hbm = 2 * ROWS * Fp * f32 + ROWS * SB * f32
        if not kernels:  # XLA materialises the radix-stage intermediate
            inter = 2 * ROWS * r * n1 * f32
            fwd_hbm += 2 * inter
            inv_hbm += 2 * inter
        # stage matmul: [rows*r, n1] x [n1, n1h1] complex (4 real matmuls)
        fwd_mxu = ROWS * 4 * 2 * r * n1 * n1h1
        inv_mxu = fwd_mxu
        # butterflied radix stage: ~(r/2)*log2(r) butterflies, ~6 FMA each
        import math
        bfly = 6 * (r // 2) * int(math.log2(r))
        fwd_vpu = ROWS * bfly * n1
        inv_vpu = ROWS * bfly * n1 + ROWS * r * n1 * 4  # + stage-B twiddle
    # grouped MAC kernel: queue + xt + H read once, out + queue' written
    qbytes = 2 * PT * C * Fp * f32
    mac_hbm = 5 * qbytes
    mac_vpu = PT * PT * C * Fp * 4
    return (fwd_hbm + inv_hbm + mac_hbm,
            fwd_mxu + inv_mxu,
            fwd_vpu + inv_vpu + mac_vpu)


def main():
    print(f"config #5: {C} ch x {N} taps, group = {PT} super-blocks "
          f"= {GROUP_S*1e3:.0f} ms of audio\n")
    variants = [
        ("std layout, staged XLA (r1 final)",
         tail_budget("std", False), head_budget(False)),
        ("perm layout, XLA transforms",
         tail_budget("perm", False), head_budget(False)),
        ("perm + Pallas FFT kernels",
         tail_budget("perm", True), head_budget(False)),
        ("perm + kernels + grouped head",
         tail_budget("perm", True), head_budget(True)),
        ("radix16 + kernels + grouped head",
         tail_budget("perm", True, 16), head_budget(True)),
        ("radix32 + kernels + grouped head",
         tail_budget("perm", True, 32), head_budget(True)),
    ]
    for name, (th, tm, tv), (hh, hm, hv) in variants:
        fmt(name, th + hh, tm + hm, tv + hv)
    print("\nKaratsuba (BBCAT_DSP_CMATMUL) scales the tail stage-matmul "
          "flops by 0.75.")
    print("Bounds exclude XLA op-boundary copies, layout relayouts and "
          "dispatch; measured numbers land between the two bounds.")


if __name__ == "__main__":
    main()
