"""Structure/shape utilities shared by all models.

JAX pytree counterparts of the reference's tensor utilities
(reference: pydreamer/models/functions.py:11-160). The universal idiom is
"fold leading batch dims, apply, unfold" — in JAX we express most of it with
plain reshapes; modules are written rank-polymorphic instead where possible.

Shape vocabulary (matches reference pydreamer/models/common.py:10-34):
  T = TBTT sequence length (e.g. 48)
  B = batch size
  I = IWAE samples
  A = action dim, E = embed dim, F = feature dim (= deter + stoch)
  H = imagination horizon, J = H+1, M = T*B*I
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "flatten_batch", "unflatten_batch", "insert_dim", "expand_iwae",
    "logavgexp", "nanmean", "clip_rewards", "clip_rewards_np",
    "symlog", "symexp", "global_norm", "map_structure",
]


def flatten_batch(x: jax.Array, nonbatch_dims: int = 1) -> Tuple[jax.Array, Tuple[int, ...]]:
    """(b1,b2,...,X) -> (B,X); returns folded array and the batch shape."""
    if nonbatch_dims > 0:
        batch_dim = x.shape[:-nonbatch_dims]
        return x.reshape((-1,) + x.shape[-nonbatch_dims:]), batch_dim
    batch_dim = x.shape
    return x.reshape((-1,)), batch_dim


def unflatten_batch(x: jax.Array, batch_dim: Tuple[int, ...]) -> jax.Array:
    """(B,X) -> (b1,b2,...,X)."""
    return x.reshape(tuple(batch_dim) + x.shape[1:])


def insert_dim(x: jax.Array, dim: int, size: int) -> jax.Array:
    """Insert a broadcast dimension of the given size at `dim`."""
    x = jnp.expand_dims(x, dim)
    return jnp.broadcast_to(x, x.shape[:dim] + (size,) + x.shape[dim + 1:])


def expand_iwae(x: jax.Array, I: int) -> jax.Array:
    """(T,B,...) -> (T,B*I,...): replicate batch for multi-sample IWAE bound.

    (reference: rssm.py:35-41 `expand`.)
    """
    if I == 1:
        return x
    T, B = x.shape[:2]
    x = jnp.broadcast_to(x[:, :, None], (T, B, I) + x.shape[2:])
    return x.reshape((T, B * I) + x.shape[3:])


def logavgexp(x: jax.Array, axis: int) -> jax.Array:
    """log(mean(exp(x))) along axis; identity-squeeze when the axis is size 1.

    (reference: functions.py:97-102.) Computed in float32 for IWAE stability.
    """
    if x.shape[axis] > 1:
        x32 = x.astype(jnp.float32)
        return jax.nn.logsumexp(x32, axis=axis) - math.log(x.shape[axis])
    return jnp.squeeze(x, axis=axis)


def nanmean(x: jax.Array) -> jax.Array:
    """Mean ignoring NaNs (reference: functions.py:149-150)."""
    mask = ~jnp.isnan(x)
    return jnp.nansum(x) / jnp.maximum(mask.sum(), 1)


def symlog(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def clip_rewards(x: jax.Array, mode: str | None = None) -> jax.Array:
    """Reward squashing (reference: functions.py:153-160)."""
    if not mode:
        return x
    if mode == "tanh":
        return jnp.tanh(x)
    if mode == "log1p":
        return jnp.log1p(x)
    if mode == "symlog":
        return symlog(x)
    raise ValueError(f"unknown clip_rewards mode {mode!r}")


def clip_rewards_np(x, mode=None):
    """Numpy version for host-side preprocessing and static config transforms."""
    import numpy as np
    if not mode:
        return x
    if mode == "tanh":
        return np.tanh(x)
    if mode == "log1p":
        return np.log1p(x)
    if mode == "symlog":
        return np.sign(x) * np.log1p(np.abs(x))
    raise ValueError(f"unknown clip_rewards mode {mode!r}")


def global_norm(tree) -> jax.Array:
    """Global L2 norm of a pytree (for grad_norm metrics)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))


def map_structure(data, f):
    """Apply f to each leaf of a (nested) tuple/dict structure.

    Kept for API parity with the reference (functions.py:108-115); new code
    should prefer ``jax.tree.map``.
    """
    return jax.tree_util.tree_map(f, data)
