#!/usr/bin/env python
"""Analytic FLOP/bandwidth roofline for the flagship train step's pieces.

Hand-counts GEMM MACs from the config dims (no tracing) so profiler
measurements (scripts/profile_step.py) can be placed against hardware
ceilings honestly — XLA's cost analysis undercounts scan bodies.

    python scripts/roofline.py [--peak_tflops 197] [--hbm_gbps 810]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="bf16 peak of the chip (v5e: 197)")
    p.add_argument("--hbm_gbps", type=float, default=810.0, help="v5e: 810")
    args = p.parse_args()

    from __graft_entry__ import _make_conf
    c = _make_conf(tiny=False)
    T, B, I = c.batch_length, c.batch_size, c.iwae_samples
    M = T * B * I
    H = c.imag_horizon
    D, S, K, Hd = c.deter_dim, c.stoch_dim, c.stoch_discrete, c.hidden_dim
    Z = S * K
    F = D + Z
    A = c.action_dim
    AH = 400  # actor/critic MLP width (reference a2c default)
    out_stoch = Z if K else 2 * S

    def gemm(m, k, n):
        return 2 * m * k * n  # FLOPs

    # --- dream scan: per step over M examples --------------------------------
    dream_step = (
        gemm(M, F, AH) + 3 * gemm(M, AH, AH) + gemm(M, AH, A)   # actor MLP
        + gemm(M, Z, Hd) + gemm(M, A, Hd)                       # z_mlp + a_mlp
        + gemm(M, Hd, 3 * D) + gemm(M, D, 3 * D)                # GRU gates
        + gemm(M, D, Hd) + gemm(M, Hd, out_stoch)               # prior MLP
    )
    dream_total = dream_step * H
    # weight bytes streamed per step (bf16), the scan's HBM floor
    wbytes = 2 * (F * AH + 3 * AH * AH + AH * A + Z * Hd + A * Hd
                  + Hd * 3 * D + D * 3 * D + D * Hd + Hd * out_stoch)
    state_bytes = 4 * M * (D + Z)  # f32 carries

    # --- RSSM forward scan (posterior path), per step ------------------------
    E = 32 * c.cnn_depth  # conv encoder output embedding
    rssm_step = (
        gemm(M // T * T, 1, 1) * 0  # (shape helper; per-step M_rssm = B*I)
    )
    Mr = B * I
    rssm_step = (
        gemm(Mr, Z, Hd) + gemm(Mr, A, Hd)
        + gemm(Mr, Hd, 3 * D) + gemm(Mr, D, 3 * D)
        + gemm(Mr, D, Hd) + gemm(Mr, E, Hd) + gemm(Mr, Hd, out_stoch)  # post
    )
    rssm_total = rssm_step * T

    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbps * 1e9
    rows = {
        "dream_scan": {
            "gflop": round(dream_total / 1e9, 1),
            "ideal_compute_ms": round(dream_total / peak * 1e3, 3),
            "ideal_weight_stream_ms": round(H * wbytes / bw * 1e3, 3),
            "per_step_weight_MB": round(wbytes / 1e6, 2),
            "state_MB": round(state_bytes / 1e6, 2),
        },
        "rssm_fwd_scan": {
            "gflop": round(rssm_total / 1e9, 1),
            "ideal_compute_ms": round(rssm_total / peak * 1e3, 3),
        },
        "dims": dict(M=M, H=H, T=T, B=B, D=D, Z=Z, hidden=Hd, F=F,
                     actor_hidden=AH, embed=E),
    }
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
