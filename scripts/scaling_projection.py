"""Render the multi-host scaling projection for BASELINE config #5 from
MEASURED artifacts (BENCH_EXTRA.json) + the communication model
(parallel/comms.py).  Prints a markdown table for docs/DEPLOYMENT.md.

    python scripts/scaling_projection.py [rtf_1chip]

The rtf argument overrides the artifact (e.g. to project from a fresh
measurement before BENCH_EXTRA.json is refreshed).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bbcat_dsp_tpu.parallel.comms import CommEnv, config5_scaling_table


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rtf = None
    src = "cli"
    if len(sys.argv) > 1:
        rtf = float(sys.argv[1])
    else:
        try:
            with open(os.path.join(root, "BENCH_EXTRA.json")) as fp:
                blob = json.load(fp)
            rtf = float(blob["bench_config5"]["rtf"])
            src = "BENCH_EXTRA.json bench_config5.rtf (git_sha=" + str(
                blob.get("provenance", {}).get("git_sha", "pre-provenance")
            ) + ")"
        except Exception as e:  # noqa: BLE001
            print(f"no artifact rtf available ({e}); pass one on the CLI")
            return 1
    env = CommEnv()
    rows = config5_scaling_table(rtf)
    print(f"config #5 scaling projection — measured 1-chip RTF {rtf:.1f}x "
          f"(source: {src})")
    print(f"model: ICI {env.ici_bw/1e9:.0f} GB/s @ {env.ici_lat*1e6:.0f} us, "
          f"DCN {env.dcn_bw*8/1e9:.0f} Gb/s @ {env.dcn_lat*1e6:.0f} us; "
          "collectives = one scalar loudness psum per render")
    print()
    print("| chips | hosts | per-chip compute (ms/s-audio) | "
          "collective (ms) | efficiency | aggregate RTF | "
          "input-bound RTF ceiling* |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['chips']} | {r['hosts']} | "
              f"{r['per_chip_compute_s']*1e3:.2f} | {r['comm_s']*1e3:.4f} | "
              f"{r['efficiency']*100:.1f} % | {r['aggregate_rtf']:.0f}x | "
              f"{r['input_bound_rtf']:.0f}x |")
    ok = all(r["efficiency"] >= 0.8 for r in rows if r["hosts"] >= 2)
    print()
    print("*ceiling if the input audio streams in over the host's DCN link "
          "(pipelined); locally-sourced input has no such ceiling.")
    print(f">=80 % multi-host target (collective efficiency): "
          f"{'MET (model)' if ok else 'AT RISK'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
