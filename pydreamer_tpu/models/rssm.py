"""RSSM (Recurrent State-Space Model) core — the framework's hot sequential path.

TPU-first re-design of the reference RSSM (reference: pydreamer/models/rssm.py):
the reference unrolls ``RSSMCell`` in a Python for-loop over T (rssm.py:49-56);
here the time axis is a single ``lax.scan`` so XLA compiles one fused cell body
and pipelines the T iterations. Priors are computed *batched* over all T states
after the scan (reference: rssm.py:61 ``batch_prior``) — that part is
time-parallel and lands on the MXU as one big GEMM.

Latent layout: state ``(h, z)`` with h = deterministic GRU state (B,D) and
z = stochastic sample (B, S*K) (flattened one-hot factors for the discrete
case, S-dim gaussian sample otherwise). Features = concat(h, z).

IWAE: the batch axis is expanded to B*I before the scan and folded back to
(T,B,I,...) after (reference: rssm.py:33-41,64-69).

Reset handling: ``reset[t]`` zeroes the *incoming* state at step t, restarting
the latent at episode boundaries while keeping shapes static (rssm.py:134-135).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .distributions import OneHotCategorical, diag_normal
from .functions import expand_iwae
from .modules import Dense, Norm
from .rnn import GRUCellStack

__all__ = ["RSSMCell", "RSSMCore", "draw_z_noise", "init_state", "to_feature",
           "feature_replace_z"]

State = Tuple[jax.Array, jax.Array]  # (h: (B,D), z: (B,S*K))


def init_state(batch_size: int, deter_dim: int, stoch_dim: int, stoch_discrete: int) -> State:
    """Zero (h, z) state (reference: rssm.py:118-123)."""
    return (
        jnp.zeros((batch_size, deter_dim), jnp.float32),
        jnp.zeros((batch_size, stoch_dim * (stoch_discrete or 1)), jnp.float32),
    )


def to_feature(h: jax.Array, z: jax.Array) -> jax.Array:
    return jnp.concatenate([h, z], -1)


def draw_z_noise(key: jax.Array, shape_prefix: Tuple[int, ...],
                 stoch_dim: int, stoch_discrete: int) -> jax.Array:
    """Pre-draw latent sampling noise for a whole scan in ONE batched RNG op.

    Per-step `rsample(key)` calls inside lax.scan put threefry + gumbel on
    the sequential critical path (the z tensor is the largest per-step RNG
    consumer: (B, S, K) elements). Drawing (T, B, S, K) up front keeps the
    math identical (gumbel-max / reparameterization) while the RNG runs
    time-parallel. Returns standard gumbel (discrete) or normal (gaussian).
    """
    if stoch_discrete:
        return jax.random.gumbel(
            key, shape_prefix + (stoch_dim, stoch_discrete), jnp.float32)
    return jax.random.normal(key, shape_prefix + (stoch_dim,), jnp.float32)


def feature_replace_z(features: jax.Array, z: jax.Array) -> jax.Array:
    """Swap the stochastic part of features (for decode-from-prior metrics)."""
    h = features[..., : features.shape[-1] - z.shape[-1]]
    return jnp.concatenate([h, z], -1)


class RSSMCell(nn.Module):
    """One RSSM step: (h,z) + action [+ embed] -> new (h,z) and post/prior stats.

    (reference: rssm.py:94-203.) The input MLPs for z and action are fused by
    addition (a_mlp has no bias), then LayerNorm+ELU feed the GRU stack.
    """

    embed_dim: int
    action_dim: int
    deter_dim: int
    stoch_dim: int
    stoch_discrete: int  # 0 => gaussian latent
    hidden_dim: int
    gru_layers: int = 1
    gru_type: str = "gru"
    layer_norm: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        out_stoch = self.stoch_dim * (self.stoch_discrete or 2)
        self.z_mlp = Dense(self.hidden_dim, dtype=self.dtype)
        self.a_mlp = Dense(self.hidden_dim, use_bias=False, dtype=self.dtype)
        self.in_norm = Norm(self.layer_norm, dtype=self.dtype)
        self.gru = GRUCellStack(self.deter_dim, self.gru_layers, self.gru_type, dtype=self.dtype)
        self.prior_mlp_h = Dense(self.hidden_dim, dtype=self.dtype)
        self.prior_norm = Norm(self.layer_norm, dtype=self.dtype)
        self.prior_mlp = Dense(out_stoch, dtype=self.dtype)
        self.post_mlp_h = Dense(self.hidden_dim, dtype=self.dtype)
        self.post_mlp_e = Dense(self.hidden_dim, use_bias=False, dtype=self.dtype)
        self.post_norm = Norm(self.layer_norm, dtype=self.dtype)
        self.post_mlp = Dense(out_stoch, dtype=self.dtype)

    # -- pieces -----------------------------------------------------------

    def _gru_step(self, action, in_state, reset_mask):
        h, z = in_state
        if reset_mask is not None:
            h = h * reset_mask
            z = z * reset_mask
        x = self.z_mlp(z) + self.a_mlp(action.astype(self.dtype))
        za = nn.elu(self.in_norm(x))
        h_new = self.gru(za, h.astype(self.dtype))
        return h_new.astype(jnp.float32)

    def _post_stats(self, h, embed):
        x = self.post_mlp_h(h.astype(self.dtype)) + self.post_mlp_e(embed.astype(self.dtype))
        x = nn.elu(self.post_norm(x))
        return self.post_mlp(x).astype(jnp.float32)

    def _prior_stats(self, h):
        x = self.prior_mlp_h(h.astype(self.dtype))
        x = nn.elu(self.prior_norm(x))
        return self.prior_mlp(x).astype(jnp.float32)

    def zdistr(self, pp: jax.Array):
        """Latent distribution from raw stats (reference: rssm.py:195-203)."""
        if self.stoch_discrete:
            logits = pp.reshape(pp.shape[:-1] + (self.stoch_dim, self.stoch_discrete))
            return OneHotCategorical(logits, event_dims=1)
        return diag_normal(pp)

    # -- steps ------------------------------------------------------------

    def post_step(self, in_state: State, embed, action, reset_mask, z_noise):
        """Posterior step (reference: rssm.py:125-153).

        ``z_noise``: pre-drawn standard noise from ``draw_z_noise`` — see
        there for why sampling noise is hoisted out of the scan."""
        h = self._gru_step(action, in_state, reset_mask)
        post = self._post_stats(h, embed)
        z = self.zdistr(post).rsample_noise(z_noise).reshape(h.shape[0], -1)
        return post, (h, z)

    def prior_step(self, in_state: State, action, reset_mask, z_noise):
        """Prior (open-loop / imagination) step (reference: rssm.py:155-184)."""
        h = self._gru_step(action, in_state, reset_mask)
        prior = self._prior_stats(h)
        z = self.zdistr(prior).rsample_noise(z_noise).reshape(h.shape[0], -1)
        return prior, (h, z)

    def batch_prior(self, h: jax.Array) -> jax.Array:
        """Prior stats for all timesteps at once — time-parallel MXU GEMMs."""
        return self._prior_stats(h)


class RSSMCore(nn.Module):
    """T-step RSSM unroll via lax.scan (reference: rssm.py:15-91)."""

    embed_dim: int
    action_dim: int
    deter_dim: int
    stoch_dim: int
    stoch_discrete: int
    hidden_dim: int
    gru_layers: int = 1
    gru_type: str = "gru"
    layer_norm: bool = True
    dtype: Any = jnp.float32
    scan_unroll: int = 1  # lax.scan unroll factor: trades compile time /
    #                       code size for less per-iteration loop overhead
    #                       and cross-iteration op pipelining on TPU

    def setup(self):
        self.cell = RSSMCell(
            embed_dim=self.embed_dim, action_dim=self.action_dim,
            deter_dim=self.deter_dim, stoch_dim=self.stoch_dim,
            stoch_discrete=self.stoch_discrete, hidden_dim=self.hidden_dim,
            gru_layers=self.gru_layers, gru_type=self.gru_type,
            layer_norm=self.layer_norm, dtype=self.dtype)

    def __call__(self,
                 embed: jax.Array,    # (T,B,E)
                 action: jax.Array,   # (T,B,A)
                 reset: jax.Array,    # (T,B) bool
                 in_state: State,     # ((B*I,D), (B*I,S*K))
                 key: jax.Array,
                 iwae_samples: int = 1,
                 do_open_loop: bool = False):
        T, B = embed.shape[:2]
        I = iwae_samples

        embeds = expand_iwae(embed, I)                              # (T,BI,E)
        actions = expand_iwae(action, I)                            # (T,BI,A)
        reset_masks = expand_iwae((~reset.astype(bool))[..., None].astype(jnp.float32), I)
        # One batched RNG op for all T steps (see draw_z_noise).
        z_noise = draw_z_noise(key, (T, B * I), self.stoch_dim, self.stoch_discrete)

        def scan_post(cell, carry, x):
            emb, act, rm, zn = x
            post, (h, z) = cell.post_step(carry, emb, act, rm, zn)
            return (h, z), (post, h, z)

        def scan_prior(cell, carry, x):
            _, act, rm, zn = x
            prior, (h, z) = cell.prior_step(carry, act, rm, zn)
            return (h, z), (prior, h, z)

        scan_fn = scan_prior if do_open_loop else scan_post
        scan = nn.scan(scan_fn,
                       variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=0, out_axes=0,
                       unroll=self.scan_unroll)
        (h_last, z_last), (posts, states_h, samples) = scan(
            self.cell, in_state, (embeds, actions, reset_masks, z_noise))

        priors = self.cell.batch_prior(states_h)                    # (T,BI,2S)
        features = to_feature(states_h, samples)                    # (T,BI,D+S*K)

        fold = lambda x: x.reshape((T, B, I) + x.shape[2:])
        states = (fold(states_h), fold(samples))
        out_state = (jax.lax.stop_gradient(h_last), jax.lax.stop_gradient(z_last))
        return (
            fold(priors),        # (T,B,I,2S)
            fold(posts),         # (T,B,I,2S)
            fold(samples),       # (T,B,I,S*K)
            fold(features),      # (T,B,I,D+S*K)
            states,
            out_state,
        )

    # Single-cell passthroughs for dream/inference call-sites. Callers pass
    # pre-drawn standard noise (draw_z_noise), not PRNG keys.
    def prior_step(self, in_state: State, action, reset_mask, z_noise):
        return self.cell.prior_step(in_state, action, reset_mask, z_noise)

    def post_step(self, in_state: State, embed, action, reset_mask, z_noise):
        return self.cell.post_step(in_state, embed, action, reset_mask, z_noise)

    def zdistr(self, pp):
        return self.cell.zdistr(pp)
