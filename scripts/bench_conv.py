#!/usr/bin/env python
"""Isolated microbench of the flagship conv encoder/decoder pair (VERDICT r4).

Benches the EXACT convolutions of the flagship step (64x64x3 -> 2x2x384 and
1x1x1536 -> 64x64x3, M = T*B*I = 1536 frames, bf16 NHWC) per layer and as
whole stacks, fwd and fwd+bwd, against their analytic compute floors
(scripts/roofline.py conv_pair section). This is the per-shape evidence the
scans got in r3 (PERF.md).

    python scripts/bench_conv.py [--layers] [--stacks] [--variants] [--all]

Timing uses the bench.py idiom: a chain of jitted calls closed by a host
float() fetch (block_until_ready can return early on this remote backend).
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

PEAK_TFLOPS = 197.0  # v5e bf16


def timeit(fn, args, n=30, warmup=5):
    import jax.numpy as jnp
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / n * 1e3  # ms


def bench_layers(M, d, C):
    """Each conv / deconv layer in isolation, fwd and fwd+bwd."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from pydreamer_tpu.models.modules import xavier_uniform

    enc = [  # (name, Hi, Cin, Cout, K, transposed)
        ("conv0", 64, C, d, 4, False),
        ("conv1", 31, d, 2 * d, 4, False),
        ("conv2", 14, 2 * d, 4 * d, 4, False),
        ("conv3", 6, 4 * d, 8 * d, 4, False),
        ("deconv0", 1, 32 * d, 4 * d, 5, True),
        ("deconv1", 5, 4 * d, 2 * d, 5, True),
        ("deconv2", 13, 2 * d, d, 6, True),
        ("deconv3", 30, d, C, 6, True),
    ]
    rows = {}
    for name, Hi, Cin, Cout, K, transposed in enc:
        if transposed:
            mod = nn.ConvTranspose(Cout, (K, K), strides=(2, 2),
                                   padding="VALID", dtype=jnp.bfloat16,
                                   param_dtype=jnp.float32,
                                   kernel_init=xavier_uniform)
            Ho = 2 * Hi + K - 2
            spatial = Hi * Hi
        else:
            mod = nn.Conv(Cout, (K, K), strides=(2, 2), padding="VALID",
                          dtype=jnp.bfloat16, param_dtype=jnp.float32,
                          kernel_init=xavier_uniform)
            Ho = (Hi - K) // 2 + 1
            spatial = Ho * Ho
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(M, Hi, Hi, Cin).astype(np.float32) - 0.5,
                        jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x)
        fwd = jax.jit(lambda p, x, mod=mod: mod.apply(p, x))

        def loss(p, x, mod=mod):
            return jnp.sum(jnp.square(mod.apply(p, x).astype(jnp.float32)))
        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

        gflop_fwd = 2 * M * spatial * K * K * Cin * Cout / 1e9
        ms_fwd = timeit(fwd, (params, x))
        g = grad(params, x)  # build once so timing excludes compile
        ms_bwd = timeit(lambda p, x: grad(p, x)[1], (params, x))
        rows[name] = {
            "shape": f"{Hi}x{Hi}x{Cin} -> {Ho}x{Ho}x{Cout} k{K}"
                     + (" ^T" if transposed else ""),
            "fwd_ms": round(ms_fwd, 3),
            "fwd_tflops": round(gflop_fwd / ms_fwd, 1),
            "fwd_pct_peak": round(gflop_fwd / ms_fwd / PEAK_TFLOPS * 100, 1),
            "fwdbwd_ms": round(ms_bwd, 3),
            "fwdbwd_tflops": round(3 * gflop_fwd / ms_bwd, 1),
            "fwdbwd_pct_peak": round(
                3 * gflop_fwd / ms_bwd / PEAK_TFLOPS * 100, 1),
        }
        print(name, json.dumps(rows[name]), flush=True)
        del g
    return rows


def bench_stacks(M, d, C, conf):
    """The real encoder / decoder modules, fwd and fwd+bwd."""
    import jax
    import jax.numpy as jnp
    from pydreamer_tpu.models.encoders import ConvEncoder
    from pydreamer_tpu.models.decoders import ConvDecoder

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(M, 64, 64, C).astype(np.float32) - 0.5,
                      jnp.bfloat16)
    F = conf.deter_dim + conf.stoch_dim * conf.stoch_discrete
    feat = jnp.asarray(rng.rand(M, F).astype(np.float32), jnp.bfloat16)

    enc = ConvEncoder(C, d, dtype=jnp.bfloat16)
    dec = ConvDecoder(in_dim=F, out_channels=C, cnn_depth=d,
                      dtype=jnp.bfloat16)
    pe = enc.init(jax.random.PRNGKey(0), img)
    pd = dec.init(jax.random.PRNGKey(0), feat)

    # analytic fwd GFLOPs (roofline.py conv_pair)
    enc_gflop = sum(2 * M * ho * ho * 16 * ci * co for (ho, ci, co) in
                    [(31, C, d), (14, d, 2 * d), (6, 2 * d, 4 * d),
                     (2, 4 * d, 8 * d)]) / 1e9
    dec_gflop = (2 * M * F * 32 * d + sum(
        2 * M * hi * hi * k * k * ci * co for (hi, ci, co, k) in
        [(1, 32 * d, 4 * d, 5), (5, 4 * d, 2 * d, 5),
         (13, 2 * d, d, 6), (30, d, C, 6)])) / 1e9

    rows = {}
    for name, mod, p, x, gflop in (("encoder", enc, pe, img, enc_gflop),
                                   ("decoder", dec, pd, feat, dec_gflop)):
        fwd = jax.jit(lambda p, x, mod=mod: mod.apply(p, x))

        def loss(p, x, mod=mod):
            return jnp.sum(jnp.square(mod.apply(p, x).astype(jnp.float32)))
        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        ms_fwd = timeit(fwd, (p, x))
        grad(p, x)
        ms_bwd = timeit(lambda p, x: grad(p, x)[1], (p, x))
        rows[name] = {
            "fwd_ms": round(ms_fwd, 3),
            "fwd_pct_peak": round(gflop / ms_fwd / PEAK_TFLOPS * 100, 1),
            "fwdbwd_ms": round(ms_bwd, 3),
            "fwdbwd_pct_peak": round(
                3 * gflop / ms_bwd / PEAK_TFLOPS * 100, 1),
            "fwd_gflop": round(gflop, 1),
        }
        print(name, json.dumps(rows[name]), flush=True)
    return rows


def bench_variants(M, d, C, conf):
    """Decoder lowering A/B: XLA conv_transpose vs subpixel regrouping
    (pydreamer_tpu/ops/subpixel.py) — identical math, same params."""
    import jax
    import jax.numpy as jnp
    from pydreamer_tpu.models.decoders import ConvDecoder

    rng = np.random.RandomState(0)
    F = conf.deter_dim + conf.stoch_dim * conf.stoch_discrete
    feat = jnp.asarray(rng.rand(M, F).astype(np.float32), jnp.bfloat16)
    rows = {}
    params = None
    outs = {}
    for impl in ("xla", "subpixel", "auto"):  # auto = per-layer mixed policy
        dec = ConvDecoder(in_dim=F, out_channels=C, cnn_depth=d,
                          transpose_impl=impl, dtype=jnp.bfloat16)
        if params is None:
            params = dec.init(jax.random.PRNGKey(0), feat)
        fwd = jax.jit(lambda p, x, dec=dec: dec.apply(p, x))

        def loss(p, x, dec=dec):
            return jnp.sum(jnp.square(dec.apply(p, x).astype(jnp.float32)))
        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        outs[impl] = np.asarray(fwd(params, feat), np.float32)
        ms_fwd = timeit(fwd, (params, feat))
        grad(params, feat)
        ms_bwd = timeit(lambda p, x: grad(p, x)[1], (params, feat))
        rows[impl] = {"fwd_ms": round(ms_fwd, 3),
                      "fwdbwd_ms": round(ms_bwd, 3)}
        print("decoder/" + impl, json.dumps(rows[impl]), flush=True)
    err = float(max(np.abs(outs["xla"] - outs[k]).max()
                    for k in ("subpixel", "auto")))
    rows["max_abs_diff"] = err
    print(f"# impl outputs max|diff| = {err:.4f} (bf16 assoc noise)",
          flush=True)

    # Per-layer A/B: which deconvs does each lowering win?
    import flax.linen as nn
    from pydreamer_tpu.models.decoders import _ConvTransposeS2
    layer_shapes = [("deconv0", 1, 32 * d, 4 * d, 5),
                    ("deconv1", 5, 4 * d, 2 * d, 5),
                    ("deconv2", 13, 2 * d, d, 6),
                    ("deconv3", 30, d, C, 6)]
    per_layer = {}
    for name, Hi, Cin, Cout, K in layer_shapes:
        x = jnp.asarray(rng.rand(M, Hi, Hi, Cin).astype(np.float32) - 0.5,
                        jnp.bfloat16)
        row = {}
        for impl in ("xla", "subpixel", "fused"):
            mod = _ConvTransposeS2(Cout, (K, K), impl=impl,
                                   dtype=jnp.bfloat16)
            p = mod.init(jax.random.PRNGKey(0), x)
            fwd = jax.jit(lambda p, x, mod=mod: mod.apply(p, x))

            def loss(p, x, mod=mod):
                return jnp.sum(jnp.square(mod.apply(p, x).astype(jnp.float32)))
            grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
            ms_f = timeit(fwd, (p, x))
            grad(p, x)
            ms_b = timeit(lambda p, x: grad(p, x)[1], (p, x))
            row[impl] = {
                "fwd_ms": round(ms_f, 3), "fwdbwd_ms": round(ms_b, 3)}
        per_layer[name] = row
        print(f"layer {name}", json.dumps(row), flush=True)
    rows["per_layer"] = per_layer

    # Encoder lowering A/B: plain stride-2 conv vs space-to-depth stem.
    from pydreamer_tpu.models.encoders import ConvEncoder
    img = jnp.asarray(rng.rand(M, 64, 64, C).astype(np.float32) - 0.5,
                      jnp.bfloat16)
    enc_rows = {}
    for impl in ("xla", "s2d"):
        enc = ConvEncoder(C, d, conv_impl=impl, dtype=jnp.bfloat16)
        p = enc.init(jax.random.PRNGKey(0), img)
        fwd = jax.jit(lambda p, x, enc=enc: enc.apply(p, x))

        def loss(p, x, enc=enc):
            return jnp.sum(jnp.square(enc.apply(p, x).astype(jnp.float32)))
        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        ms_f = timeit(fwd, (p, img))
        grad(p, img)
        ms_b = timeit(lambda p, x: grad(p, x)[1], (p, img))
        enc_rows[impl] = {"fwd_ms": round(ms_f, 3),
                          "fwdbwd_ms": round(ms_b, 3)}
        print("encoder/" + impl, json.dumps(enc_rows[impl]), flush=True)
    rows["encoder"] = enc_rows
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--layers", action="store_true")
    p.add_argument("--stacks", action="store_true")
    p.add_argument("--variants", action="store_true")
    p.add_argument("--all", action="store_true")
    args = p.parse_args()
    if args.all:
        args.layers = args.stacks = args.variants = True

    from pydreamer_tpu.tools import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from __graft_entry__ import _make_conf
    conf = _make_conf(tiny=False)
    M = conf.batch_length * conf.batch_size * conf.iwae_samples
    d, C = conf.cnn_depth, conf.image_channels
    out = {"M": M, "cnn_depth": d}
    if args.layers:
        out["layers"] = bench_layers(M, d, C)
    if args.stacks:
        out["stacks"] = bench_stacks(M, d, C, conf)
    if args.variants:
        out["variants"] = bench_variants(M, d, C, conf)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
