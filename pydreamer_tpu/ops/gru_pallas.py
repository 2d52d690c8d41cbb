"""Pallas TPU kernel: fused DreamerV2 late-reset GRU cell.

The RSSM scan is the framework's hot sequential path (SURVEY §7 'hard
parts'): T steps of small-batch GEMMs + LayerNorm + gate math. This kernel
fuses the whole cell update — both gate GEMMs, the LayerNorm over the fused
3H gates, and the gate nonlinearity — into ONE Pallas program per step:

  gates = x @ w_ih + h @ w_hh          (MXU, f32 accumulate)
  gates = LayerNorm(gates)             (VPU, over 3H)
  r, u, n = split(gates)
  h' = sigmoid(u-1) * tanh(sigmoid(r)*n) + (1-sigmoid(u-1)) * h

vs. XLA's lowering this avoids materializing the (B, 3H) gate tensor in HBM
between GEMM and LayerNorm and keeps the whole cell in VMEM. Weights are
staged to VMEM per call; inside a `lax.scan` XLA hoists the transfer, so the
weights stay resident across all T steps.

Backward: `jax.custom_vjp` with a recompute-based backward in plain XLA
(gates are cheap to recompute; saving them would cost (B,3H) HBM traffic per
step). Gradient parity with the reference cell is tested in
tests/test_pallas.py.

Sizing: single-program kernel — requires (in+hidden)*3H*2 bytes of weights
to fit VMEM (~12.4 MB for the Atari config in bf16). `fits_vmem()` guards
callers; `NormGRUCellLateResetPallas` transparently falls back to the plain
JAX cell otherwise or on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_gru_dv2", "fits_vmem", "NormGRUCellLateResetPallas"]

_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under ~16MB/core


def fits_vmem(in_dim: int, hidden: int, batch: int, bytes_per_el: int = 2) -> bool:
    weights = (in_dim + hidden) * 3 * hidden * bytes_per_el
    acts = batch * (in_dim + hidden + 3 * hidden) * 4  # f32 activations
    return (weights + acts) < _VMEM_BUDGET


def _kernel(x_ref, h_ref, wih_ref, whh_ref, scale_ref, bias_ref, out_ref):
    from jax.experimental import pallas as pl  # noqa: F401

    x = x_ref[:]
    h = h_ref[:]
    # Both gate GEMMs on the MXU with f32 accumulation.
    gates = jnp.dot(x, wih_ref[:], preferred_element_type=jnp.float32)
    gates = gates + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
    # LayerNorm over the fused 3H axis (eps matches the reference cell).
    mean = jnp.mean(gates, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(gates - mean), axis=-1, keepdims=True)
    gates = (gates - mean) * jax.lax.rsqrt(var + 1e-3)
    gates = gates * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    hidden = h.shape[-1]
    r = gates[:, :hidden]
    u = gates[:, hidden:2 * hidden]
    n = gates[:, 2 * hidden:]
    reset = jax.nn.sigmoid(r)
    update = jax.nn.sigmoid(u - 1.0)           # update_bias = -1
    newval = jnp.tanh(reset * n)               # late reset
    out_ref[:] = (update * newval + (1.0 - update) * h.astype(jnp.float32)
                  ).astype(out_ref.dtype)


def _forward(x, h, w_ih, w_hh, scale, bias, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, hidden = h.shape
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, hidden), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, h, w_ih, w_hh, scale, bias)


def _reference_math(x, h, w_ih, w_hh, scale, bias):
    """Plain-XLA forward used for the recompute backward (and fallback)."""
    gates = (x.astype(jnp.float32) @ w_ih.astype(jnp.float32)
             + h.astype(jnp.float32) @ w_hh.astype(jnp.float32))
    mean = jnp.mean(gates, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(gates - mean), axis=-1, keepdims=True)
    gates = (gates - mean) * jax.lax.rsqrt(var + 1e-3)
    gates = gates * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    hidden = h.shape[-1]
    r, u, n = gates[:, :hidden], gates[:, hidden:2 * hidden], gates[:, 2 * hidden:]
    reset = jax.nn.sigmoid(r)
    update = jax.nn.sigmoid(u - 1.0)
    newval = jnp.tanh(reset * n)
    return update * newval + (1.0 - update) * h.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_gru_dv2(x, h, w_ih, w_hh, scale, bias, interpret=False):
    """Fused late-reset GRU step -> new hidden state (B, H) f32."""
    return _forward(x, h, w_ih, w_hh, scale, bias, interpret=interpret)


def _fwd(x, h, w_ih, w_hh, scale, bias, interpret):
    out = _forward(x, h, w_ih, w_hh, scale, bias, interpret=interpret)
    return out, (x, h, w_ih, w_hh, scale, bias)


def _bwd(interpret, res, g):
    x, h, w_ih, w_hh, scale, bias = res
    # Recompute-based backward through the plain-XLA math — one extra
    # forward's FLOPs instead of (B,3H) residual traffic per scan step.
    _, vjp = jax.vjp(_reference_math, x, h, w_ih, w_hh, scale, bias)
    return vjp(g)


fused_gru_dv2.defvjp(_fwd, _bwd)


class NormGRUCellLateResetPallas:
    """Flax-compatible cell using the Pallas kernel on TPU.

    Defined as a linen module lazily to keep flax import at module top level
    only where needed.
    """

    def __new__(cls, hidden_size: int, dtype=jnp.float32, name=None):
        import flax.linen as nn
        from ..models.modules import xavier_uniform, orthogonal_init

        class _Cell(nn.Module):
            hidden_size: int
            dtype: Any = jnp.float32

            @nn.compact
            def __call__(self, x, h):
                w_ih = self.param("weight_ih", xavier_uniform,
                                  (x.shape[-1], 3 * self.hidden_size), jnp.float32)
                w_hh = self.param("weight_hh", orthogonal_init,
                                  (self.hidden_size, 3 * self.hidden_size), jnp.float32)
                scale = self.param("ln_scale", nn.initializers.ones,
                                   (3 * self.hidden_size,), jnp.float32)
                bias = self.param("ln_bias", nn.initializers.zeros,
                                  (3 * self.hidden_size,), jnp.float32)
                dt = self.dtype
                on_tpu = jax.devices()[0].platform == "tpu"
                if on_tpu and fits_vmem(x.shape[-1], self.hidden_size,
                                        x.shape[0],
                                        bytes_per_el=jnp.dtype(dt).itemsize):
                    out = fused_gru_dv2(x.astype(dt), h.astype(dt),
                                        w_ih.astype(dt), w_hh.astype(dt),
                                        scale, bias)
                else:
                    out = _reference_math(x.astype(dt), h.astype(dt),
                                          w_ih.astype(dt), w_hh.astype(dt),
                                          scale, bias)
                return out.astype(dt)

        return _Cell(hidden_size=hidden_size, dtype=dtype, name=name)
