"""GRU cell family for the RSSM deterministic path.

Re-designs the reference's cell zoo (reference: pydreamer/models/rnn.py):
  * ``gru``                — plain GRU cell (rnn.py:70-92)
  * ``gru_layernorm``      — per-gate LayerNorm GRU (rnn.py:95-116)
  * ``gru_layernorm_dv2``  — DreamerV2 late-reset cell: one LayerNorm over the
                             fused 3H gates, update bias -1, reset applied
                             inside tanh (rnn.py:119-138)
  * ``GRUCellStack``       — N stacked cells splitting the hidden state
                             (rnn.py:40-67)

TPU notes: each cell computes its gates with ONE fused (B, in+hidden) x
(in+hidden, 3H) matmul where the math allows (late-reset + layernorm variants),
keeping the MXU busy with a single large GEMM per step instead of six small
ones. The plain GRU needs the h-gates separate from the reset product, so it
fuses into two GEMMs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .modules import xavier_uniform, orthogonal_init

__all__ = ["GRUCell", "NormGRUCell", "NormGRUCellLateReset", "GRUCellStack", "make_gru_cell"]


def _gate_kernels(self_mod, input_size, hidden_size, use_bias):
    """Create fused ih (Xavier) and hh (orthogonal per gate block) kernels."""
    w_ih = self_mod.param("weight_ih", xavier_uniform, (input_size, 3 * hidden_size), jnp.float32)
    # Orthogonal init per 3H block, matching torch orthogonal_ over the full
    # (H, 3H) matrix closely enough; use orthogonal over the whole matrix.
    w_hh = self_mod.param("weight_hh", orthogonal_init, (hidden_size, 3 * hidden_size), jnp.float32)
    if use_bias:
        b_ih = self_mod.param("bias_ih", nn.initializers.zeros, (3 * hidden_size,), jnp.float32)
        b_hh = self_mod.param("bias_hh", nn.initializers.zeros, (3 * hidden_size,), jnp.float32)
        return w_ih, w_hh, b_ih, b_hh
    return w_ih, w_hh, None, None


class GRUCell(nn.Module):
    """Plain GRU cell (same math as torch.nn.GRUCell)."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        w_ih, w_hh, b_ih, b_hh = _gate_kernels(self, x.shape[-1], self.hidden_size, True)
        dt = self.dtype
        gates_i = x.astype(dt) @ w_ih.astype(dt) + b_ih.astype(dt)
        gates_h = h.astype(dt) @ w_hh.astype(dt) + b_hh.astype(dt)
        ri, ui, ni = jnp.split(gates_i, 3, -1)
        rh, uh, nh = jnp.split(gates_h, 3, -1)
        reset = jax.nn.sigmoid(ri + rh)
        update = jax.nn.sigmoid(ui + uh)
        newval = jnp.tanh(ni + reset * nh)
        return update * newval + (1.0 - update) * h.astype(dt)


class NormGRUCell(nn.Module):
    """GRU with per-gate LayerNorm (no gate biases; LN provides the offset)."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        w_ih, w_hh, _, _ = _gate_kernels(self, x.shape[-1], self.hidden_size, False)
        dt = self.dtype
        gates = x.astype(dt) @ w_ih.astype(dt) + h.astype(dt) @ w_hh.astype(dt)
        r, u, n = jnp.split(gates, 3, -1)
        ln = lambda name: nn.LayerNorm(epsilon=1e-3, dtype=dt, param_dtype=jnp.float32, name=name)
        reset = jax.nn.sigmoid(ln("ln_reset")(r))
        update = jax.nn.sigmoid(ln("ln_update")(u))
        # NOTE the reference's per-gate-LN cell normalizes (ni + reset*nh);
        # with fused gates we get LN(ni + nh) scaled by reset inside: to keep
        # exact reference math the newval path must stay unfused.
        w_nh = w_hh[:, 2 * self.hidden_size:]
        w_ni = w_ih[:, 2 * self.hidden_size:]
        ni = x.astype(dt) @ w_ni.astype(dt)
        nh = h.astype(dt) @ w_nh.astype(dt)
        newval = jnp.tanh(ln("ln_newval")(ni + reset * nh))
        return update * newval + (1.0 - update) * h.astype(dt)


class NormGRUCellLateReset(nn.Module):
    """DreamerV2 GRU: fused 3H gates -> one LayerNorm -> late reset.

    ``newval = tanh(reset * n)``; ``update = sigmoid(u - 1)`` (update_bias=-1).
    The single fused GEMM + single LayerNorm makes this the fastest variant on
    TPU and it is the cell DreamerV2 actually uses.
    """

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        w_ih, w_hh, _, _ = _gate_kernels(self, x.shape[-1], self.hidden_size, False)
        dt = self.dtype
        gates = x.astype(dt) @ w_ih.astype(dt) + h.astype(dt) @ w_hh.astype(dt)
        gates = nn.LayerNorm(epsilon=1e-3, dtype=dt, param_dtype=jnp.float32, name="lnorm")(gates)
        r, u, n = jnp.split(gates, 3, -1)
        reset = jax.nn.sigmoid(r)
        update = jax.nn.sigmoid(u - 1.0)
        newval = jnp.tanh(reset * n)
        return update * newval + (1.0 - update) * h.astype(dt)


_CELLS = {
    "gru": GRUCell,
    "gru_layernorm": NormGRUCell,
    # XLA lowering of the late-reset cell. On TPU the fused Pallas kernel is
    # measurably faster for the same math (scripts/bench_gru.py: 35.25 vs
    # 33.85 grad-steps/s at the flagship config — see PERF.md), so the plain
    # name auto-selects the kernel; this explicit alias forces XLA.
    "gru_layernorm_dv2_xla": NormGRUCellLateReset,
}


def make_gru_cell(cell_type: str, hidden_size: int, dtype=jnp.float32, name=None):
    if cell_type in ("gru_layernorm_dv2", "gru_pallas_dv2"):
        # Fused Pallas TPU kernel for the late-reset cell (ops/gru_pallas.py);
        # falls back to plain XLA on non-TPU backends / oversized shapes.
        from ..ops.gru_pallas import NormGRUCellLateResetPallas
        return NormGRUCellLateResetPallas(hidden_size, dtype=dtype, name=name)
    try:
        cls = _CELLS[cell_type]
    except KeyError:
        raise ValueError(
            f"Unknown gru_type {cell_type!r}; options: "
            f"{sorted(_CELLS) + ['gru_layernorm_dv2', 'gru_pallas_dv2']}")
    return cls(hidden_size=hidden_size, dtype=dtype, name=name)


class GRUCellStack(nn.Module):
    """N stacked GRU cells, each owning hidden_size // N of the state.

    (reference: rnn.py:40-67.) The input feeds layer 0; each layer's output
    state feeds the next; output states are re-concatenated.
    """

    hidden_size: int
    num_layers: int = 1
    cell_type: str = "gru"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        if self.hidden_size % self.num_layers != 0:
            raise ValueError("hidden_size must be divisible by num_layers")
        layer_size = self.hidden_size // self.num_layers
        states = jnp.split(h, self.num_layers, -1)
        outs = []
        for i in range(self.num_layers):
            cell = make_gru_cell(self.cell_type, layer_size, self.dtype, name=f"cell_{i}")
            x = cell(x, states[i])
            outs.append(x)
        return jnp.concatenate(outs, -1)
