"""Subpixel-phase rewrite of stride-2 transposed convolution.

``lax.conv_transpose`` lowers to a convolution over an INPUT-DILATED
(zeros-interleaved) activation — on TPU the MXU then convolves a tensor
that is 75% zeros, so the op runs at <=25% of its useful FLOP rate plus
the dilation shuffle. For stride 2 the same math regroups EXACTLY into
2x2 = 4 small dense convolutions (one per output-pixel parity phase),
whose outputs interleave into the transposed-conv output:

    out[2q + r] = sum_j x[q - j] * W[2j + r]        (per spatial dim)

i.e. phase r is a plain (non-dilated, "full"-padded) convolution of x
with the parity-r taps of W. No zeros are convolved; each phase conv is
a dense MXU-friendly op. This is the standard TPU decomposition for
deconvolution decoders; used by ConvDecoder when it measures faster than
the XLA lowering (see scripts/bench_conv.py --variants, PERF.md r4).

(reference counterpart: pydreamer/models/decoders.py:111-180 uses
torch ConvTranspose2d; this is the TPU-native equivalent formulation.)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv_transpose_s2_subpixel", "conv_transpose_s2_fused",
           "conv_s2_space_to_depth"]


def conv_s2_space_to_depth(x: jax.Array, kernel: jax.Array,
                           precision=None) -> jax.Array:
    """Stride-2 VALID convolution computed on a 2x2-blocked input.

    Exact regrouping of ``lax.conv_general_dilated(x, W, strides=(2, 2),
    padding='VALID', NHWC)`` for EVEN kernel size and even H, W: the input
    is reshaped to (H/2, W/2, 4*Cin) blocks and convolved with the
    (k/2, k/2, 4*Cin, Cout) remapped kernel at stride 1. For a first conv
    with Cin=3 the per-tap contraction grows 3 -> 12, which tiles onto the
    MXU's 8-sublane granularity instead of padding 3 -> 8 per tap (the
    standard TPU space-to-depth trick for RGB stems).

    x: (N, H, W, Cin); kernel: (k, k, Cin, Cout), k even, H, W even.
    """
    N, H, W, Cin = x.shape
    k, _, _, Cout = kernel.shape
    assert k % 2 == 0 and H % 2 == 0 and W % 2 == 0, (k, H, W)
    # Block input: (N, H/2, 2, W/2, 2, C) -> (N, H/2, W/2, 2*2*C), channel
    # index = py*2*Cin + px*Cin + c.
    xb = x.reshape(N, H // 2, 2, W // 2, 2, Cin).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(N, H // 2, W // 2, 4 * Cin)
    # Kernel remap: W'(by, bx, (py, px, c), o) = W(2by+py, 2bx+px, c, o).
    kb = kernel.reshape(k // 2, 2, k // 2, 2, Cin, Cout)
    kb = kb.transpose(0, 2, 1, 3, 4, 5).reshape(k // 2, k // 2, 4 * Cin, Cout)
    dn = lax.conv_dimension_numbers(xb.shape, kb.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        xb, kb.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=dn, precision=precision)


def conv_transpose_s2_subpixel(x: jax.Array, kernel: jax.Array,
                               precision=None) -> jax.Array:
    """Equivalent of ``lax.conv_transpose(x, kernel, strides=(2, 2),
    padding='VALID', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))``.

    x: (N, H, W, Cin); kernel: (kh, kw, Cin, Cout) — flax ConvTranspose's
    HWIO layout. Output: (N, 2H + kh - 2, 2W + kw - 2, Cout).
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    Ho, Wo = 2 * H + kh - 2, 2 * W + kw - 2

    if H == 1 and W == 1:
        # Degenerate spatial input: the transposed conv IS one GEMM,
        # out[py, px] = x . W[kh-1-py, kw-1-px]  (mirrored taps, above).
        # XLA's dilated-conv lowering ran this at ~6% of peak
        # (bench_conv.py r4); as a GEMM the MXU runs it at matmul rates.
        w = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(
            Cin, kh * kw * Cout)
        out = jnp.einsum("nc,ck->nk", x[:, 0, 0], w.astype(x.dtype),
                         precision=precision)
        return out.reshape(N, kh, kw, Cout)

    dn = lax.conv_dimension_numbers(x.shape, (1, 1, Cin, Cout),
                                    ("NHWC", "HWIO", "NHWC"))

    # lax.conv_transpose is a fractionally-strided CORRELATION:
    #   out[p] = sum_i x[i] * W[2i - p + k - 1]
    # so against the regrouping identity out[p] = sum_i x[i] * Wf[p - 2i]
    # the effective kernel is the spatial mirror Wf = flip(W).
    kf = kernel[::-1, ::-1]
    # Phase convs, then interleave by pad+stack+reshape (a pure relayout —
    # strided .at[::2].set scatters measured slower on TPU).
    Hc, Wc = (Ho + 1) // 2, (Wo + 1) // 2
    cols = []
    for ry in range(2):
        ny = (kh - ry + 1) // 2          # parity-ry tap count
        row = []
        for rx in range(2):
            nx = (kw - rx + 1) // 2
            # Parity taps Wf[2j + r]; a dense correlation with "full"
            # padding needs them flipped back per phase.
            sub = kf[ry::2, rx::2][::-1, ::-1]
            phase = lax.conv_general_dilated(
                x, sub.astype(x.dtype),
                window_strides=(1, 1),
                padding=((ny - 1, ny - 1), (nx - 1, nx - 1)),  # "full"
                dimension_numbers=dn, precision=precision)
            # (N, H + ny - 1, W + nx - 1, Cout) parity-(ry,rx) positions;
            # pad the short phases (odd k) up to the (Hc, Wc) grid.
            ph, pw = Hc - (H + ny - 1), Wc - (W + nx - 1)
            if ph or pw:
                phase = jnp.pad(phase, ((0, 0), (0, ph), (0, pw), (0, 0)))
            row.append(phase)
        cols.append(jnp.stack(row, axis=3))      # (N, Hc, Wc, 2, Cout)
    out = jnp.stack(cols, axis=2)                # (N, Hc, 2, Wc, 2, Cout)
    out = out.reshape(N, 2 * Hc, 2 * Wc, Cout)   # y = 2q + r interleave
    return out[:, :Ho, :Wo]


def conv_transpose_s2_fused(x: jax.Array, kernel: jax.Array,
                            precision=None) -> jax.Array:
    """Same op as :func:`conv_transpose_s2_subpixel`, but all 4 parity
    phases run as ONE dense convolution with 4x the output channels,
    followed by a depth-to-space interleave.

    The parity sub-kernels are zero-padded to a common (ceil(kh/2),
    ceil(kw/2)) tap grid and concatenated along the output-channel axis, so
    the MXU sees a single conv with C_out' = 4*Cout — curing both the
    4-dispatch overhead and the 128-lane padding waste that made the
    4-conv form lose on small C_out (bench_conv.py r4: deconv3 with
    C_out=3 ran 2x slower as 4 separate convs). Odd k pays (2*ceil(k/2))^2
    / k^2 extra zero-tap FLOPs (+44% for k=5) in exchange for the fusion.
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Cout = kernel.shape
    Ho, Wo = 2 * H + kh - 2, 2 * W + kw - 2
    if H == 1 and W == 1:
        return conv_transpose_s2_subpixel(x, kernel, precision)

    KH, KW = (kh + 1) // 2, (kw + 1) // 2     # common tap grid
    kf = kernel[::-1, ::-1]
    subs = []
    for ry in range(2):
        ny = (kh - ry + 1) // 2
        for rx in range(2):
            nx = (kw - rx + 1) // 2
            sub = kf[ry::2, rx::2][::-1, ::-1]   # (ny, nx, Cin, Cout)
            # Leading zero-pad: with "full" padding (KH-1, KW-1) the
            # correlation's valid output window then matches the (ny, nx)
            # phase output at offset 0 (verified vs lax.conv_transpose in
            # tests/test_models.py).
            sub = jnp.pad(sub, ((KH - ny, 0), (KW - nx, 0), (0, 0), (0, 0)))
            subs.append(sub)
    big = jnp.concatenate(subs, axis=-1)         # (KH, KW, Cin, 4*Cout)
    dn = lax.conv_dimension_numbers(x.shape, big.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, big.astype(x.dtype), window_strides=(1, 1),
        padding=((KH - 1, KH - 1), (KW - 1, KW - 1)),
        dimension_numbers=dn, precision=precision)
    Hc, Wc = H + KH - 1, W + KW - 1              # per-phase grid
    # (N, Hc, Wc, ry, rx, C) -> (N, Hc, ry, Wc, rx, C) -> interleave
    y = y.reshape(N, Hc, Wc, 2, 2, Cout).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(N, 2 * Hc, 2 * Wc, Cout)
    return y[:, :Ho, :Wo]
