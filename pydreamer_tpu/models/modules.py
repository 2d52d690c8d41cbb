"""Common NN building blocks (flax.linen) with reference-matching inits.

Counterpart of the reference's `common.py` MLP / NoNorm (common.py:37-74) and
`init_weights_tf2` (functions.py:81-94): Dense/Conv kernels are Xavier-uniform
with zero bias; GRU hidden-to-hidden kernels are orthogonal. LayerNorm uses
eps=1e-3 throughout.

Mixed precision: every module takes a ``dtype`` (compute dtype). Parameters
are always float32; activations flow in ``dtype`` (bfloat16 on TPU keeps the
MXU fed at full rate and needs no loss scaling).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Dense", "Norm", "MLP", "xavier_uniform", "orthogonal_init"]

xavier_uniform = nn.initializers.glorot_uniform()
orthogonal_init = nn.initializers.orthogonal()


class Dense(nn.Module):
    """nn.Dense with Xavier-uniform kernel / zero bias (TF2-matching init)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros,
        )(x)


class Norm(nn.Module):
    """LayerNorm(eps=1e-3) or identity — the reference's `norm`/`NoNorm` switch."""

    enabled: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not self.enabled:
            return x
        return nn.LayerNorm(epsilon=1e-3, dtype=self.dtype, param_dtype=jnp.float32)(x)


class MLP(nn.Module):
    """[Dense -> LayerNorm -> ELU] x hidden_layers -> Dense(out).

    Rank-polymorphic: applies over the last axis of any-rank input. When
    ``out_dim == 1`` the trailing singleton axis is squeezed (reference:
    common.py:55-58 `nn.Flatten(0)` after the final Linear).
    """

    out_dim: int
    hidden_dim: int = 400
    hidden_layers: int = 4
    layer_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for _ in range(self.hidden_layers):
            x = Dense(self.hidden_dim, dtype=self.dtype)(x)
            x = Norm(self.layer_norm, dtype=self.dtype)(x)
            x = nn.elu(x)
        x = Dense(self.out_dim, dtype=self.dtype)(x)
        if self.out_dim == 1:
            x = jnp.squeeze(x, -1)
        return x
