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

    # --- conv encoder / decoder pair (VERDICT r3 #1) -------------------------
    # Encoder: 4x Conv k4 s2 VALID over M = T*B*I frames (models/encoders.py):
    #   64x64xC -> 31x31xd -> 14x14x2d -> 6x6x4d -> 2x2x8d
    # Decoder: Dense(32d) + 4x ConvTranspose k(5,5,6,6) s2 VALID
    #   1x1x32d -> 5x5x4d -> 13x13x2d -> 30x30xd -> 64x64xC
    # FLOPs: conv fwd = 2*M*Ho*Wo*K^2*Cin*Cout; convT fwd = 2*M*Hi*Wi*K^2*Cin*Cout.
    # Backward adds ~2x fwd (input-grad conv + weight-grad conv), so
    # fwd+bwd = 3x fwd per layer (weight-grad and input-grad each equal fwd).
    d = c.cnn_depth
    C = c.image_channels
    enc_layers = [  # (name, Hi, Wi, Cin, Ho, Wo, Cout, K)
        ("conv0", 64, 64, C, 31, 31, d, 4),
        ("conv1", 31, 31, d, 14, 14, 2 * d, 4),
        ("conv2", 14, 14, 2 * d, 6, 6, 4 * d, 4),
        ("conv3", 6, 6, 4 * d, 2, 2, 8 * d, 4),
    ]
    dec_layers = [
        ("deconv0", 1, 1, 32 * d, 5, 5, 4 * d, 5),
        ("deconv1", 5, 5, 4 * d, 13, 13, 2 * d, 5),
        ("deconv2", 13, 13, 2 * d, 30, 30, d, 6),
        ("deconv3", 30, 30, d, 64, 64, C, 6),
    ]
    conv_rows = {}
    conv_totals = dict(fwd_gflop=0.0, fwdbwd_gflop=0.0,
                       ideal_fwdbwd_ms=0.0, hbm_fwdbwd_ms=0.0)
    for name, Hi, Wi, Cin, Ho, Wo, Cout, K in enc_layers + dec_layers:
        transposed = name.startswith("de")
        spatial = (Hi * Wi) if transposed else (Ho * Wo)
        fwd = 2 * M * spatial * K * K * Cin * Cout
        fwdbwd = 3 * fwd
        # HBM floor (bf16): fwd reads in + writes out; bwd reads out-grad +
        # in (for wgrad) + writes in-grad; activations dominate, weights are
        # tiny (K^2*Cin*Cout). ~= 2x(in+out) activations for fwd+bwd.
        act_in = 2 * M * Hi * Wi * Cin
        act_out = 2 * M * Ho * Wo * Cout
        hbm_bytes = 2 * (act_in + act_out)
        ideal_ms = fwdbwd / peak * 1e3
        hbm_ms = hbm_bytes / bw * 1e3
        conv_rows[name] = {
            "shape": f"{Hi}x{Wi}x{Cin} -> {Ho}x{Wo}x{Cout} k{K}",
            "fwd_gflop": round(fwd / 1e9, 1),
            "fwdbwd_gflop": round(fwdbwd / 1e9, 1),
            "ideal_fwdbwd_ms": round(ideal_ms, 3),
            "hbm_fwdbwd_ms": round(hbm_ms, 3),
            "bound": "compute" if ideal_ms > hbm_ms else "memory",
            "intensity_flop_per_byte": round(fwdbwd / hbm_bytes, 1),
        }
        conv_totals["fwd_gflop"] += fwd / 1e9
        conv_totals["fwdbwd_gflop"] += fwdbwd / 1e9
        conv_totals["ideal_fwdbwd_ms"] += ideal_ms
        conv_totals["hbm_fwdbwd_ms"] += hbm_ms
    conv_totals = {k: round(v, 2) for k, v in conv_totals.items()}
    # decoder input dense layer (F -> 32d), part of the "conv pair" budget
    dec_dense = 3 * gemm(M, F, 32 * d)
    conv_totals["dec_dense_fwdbwd_gflop"] = round(dec_dense / 1e9, 1)

    rows = {
        "conv_pair": {"layers": conv_rows, "totals": conv_totals},
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
