"""Minimal, TPU-friendly distribution library.

Implements exactly the distribution surface the framework needs (the reference
uses torch.distributions: OneHotCategoricalStraightThrough wrapped in
Independent for RSSM latents rssm.py:195-203, OneHotCategorical/normal_tanh/
tanh_normal for policies a2c.py:43-55, Bernoulli/Normal/CategoricalSupport for
decoder heads decoders.py:257-362).

All distribution parameters are promoted to float32 regardless of the compute
dtype — matching the reference's `.float()` casts at distribution boundaries
(rssm.py:199, a2c.py:44) — because softmax/KL in bfloat16 loses the precision
that KL-balancing gradients depend on.

Distributions are immutable pytree-registered objects, so they can be returned
from jitted functions and `lax.scan` bodies.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

__all__ = [
    "OneHotCategorical", "DiagNormal", "Bernoulli", "Normal",
    "CategoricalSupport", "TanhNormal", "TruncNormal",
    "diag_normal", "normal_tanh", "tanh_normal", "trunc_normal",
    "zdistr_kl", "support_to_categorical",
]

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _f32(x):
    return jnp.asarray(x, jnp.float32)


def support_to_categorical(target: jax.Array, support: jax.Array) -> jax.Array:
    """Nearest-bucket index of a continuous target on a fixed scalar support.

    The single definition of reward bucketing — shared by the
    CategoricalSupport distribution (loss path) and MultiDecoder's
    per-bucket diagnostics, so they can never disagree."""
    support = _f32(support)
    return jnp.argmin(jnp.square(_f32(target)[..., None] - support), axis=-1)


@jax.tree_util.register_pytree_node_class
class OneHotCategorical:
    """(Batched, optionally factorized) one-hot categorical over the last axis.

    With ``event_dims=1`` this matches ``Independent(OneHotCategoricalST, 1)``
    in the reference: logits shaped (..., S, K); log_prob/entropy/kl sum over S.
    ``rsample`` is the straight-through gradient estimator.
    """

    def __init__(self, logits: jax.Array, event_dims: int = 0):
        self.logits = _f32(logits) - jax.nn.logsumexp(_f32(logits), axis=-1, keepdims=True)
        self.event_dims = event_dims

    @property
    def probs(self) -> jax.Array:
        return jnp.exp(self.logits)

    @property
    def mean(self) -> jax.Array:
        return self.probs

    def _sum_events(self, x: jax.Array) -> jax.Array:
        for _ in range(self.event_dims):
            x = x.sum(axis=-1)
        return x

    def log_prob(self, onehot: jax.Array) -> jax.Array:
        lp = jnp.sum(self.logits * _f32(onehot), axis=-1)
        return self._sum_events(lp)

    def entropy(self) -> jax.Array:
        ent = -jnp.sum(jnp.exp(self.logits) * self.logits, axis=-1)
        return self._sum_events(ent)

    def sample(self, key: jax.Array) -> jax.Array:
        idx = jax.random.categorical(key, self.logits, axis=-1)
        return jax.nn.one_hot(idx, self.logits.shape[-1], dtype=jnp.float32)

    def rsample(self, key: jax.Array) -> jax.Array:
        """Straight-through sample: hard one-hot forward, softmax gradient."""
        sample = self.sample(key)
        probs = self.probs
        return sample + (probs - jax.lax.stop_gradient(probs))

    # -- pre-drawn-noise sampling (TPU perf path) --------------------------
    # Inside a lax.scan every per-step `sample(key)` puts a threefry + gumbel
    # computation on the sequential critical path. Callers can instead draw
    # ALL noise in one batched RNG op outside the scan (draw_noise) and pass
    # per-step slices here — identical distribution (gumbel-max trick), the
    # RNG cost runs time-parallel.

    @staticmethod
    def draw_noise(key: jax.Array, shape) -> jax.Array:
        return jax.random.gumbel(key, shape, jnp.float32)

    def sample_noise(self, gumbel: jax.Array) -> jax.Array:
        idx = jnp.argmax(self.logits + gumbel, axis=-1)
        return jax.nn.one_hot(idx, self.logits.shape[-1], dtype=jnp.float32)

    def rsample_noise(self, gumbel: jax.Array) -> jax.Array:
        sample = self.sample_noise(gumbel)
        probs = self.probs
        return sample + (probs - jax.lax.stop_gradient(probs))

    def kl_to(self, other: "OneHotCategorical") -> jax.Array:
        kl = jnp.sum(jnp.exp(self.logits) * (self.logits - other.logits), axis=-1)
        return self._sum_events(kl)

    def tree_flatten(self):
        return (self.logits,), (self.event_dims,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.logits, = children
        obj.event_dims, = aux
        return obj


@jax.tree_util.register_pytree_node_class
class DiagNormal:
    """Independent Normal over the last axis (event dim)."""

    def __init__(self, mean: jax.Array, std: jax.Array, event_dims: int = 1):
        self.loc = _f32(mean)
        self.scale = _f32(std)
        self.event_dims = event_dims

    @property
    def mean(self) -> jax.Array:
        return self.loc

    def _sum_events(self, x: jax.Array) -> jax.Array:
        for _ in range(self.event_dims):
            x = x.sum(axis=-1)
        return x

    def log_prob(self, x: jax.Array) -> jax.Array:
        z = (_f32(x) - self.loc) / self.scale
        lp = -0.5 * jnp.square(z) - jnp.log(self.scale) - _HALF_LOG_2PI
        return self._sum_events(lp)

    def entropy(self) -> jax.Array:
        ent = 0.5 + _HALF_LOG_2PI + jnp.log(self.scale)
        return self._sum_events(ent)

    def sample(self, key: jax.Array) -> jax.Array:
        return self.loc + self.scale * jax.random.normal(key, self.loc.shape, jnp.float32)

    # Reparameterized by construction.
    rsample = sample

    # Pre-drawn-noise sampling (see OneHotCategorical.draw_noise).
    @staticmethod
    def draw_noise(key: jax.Array, shape) -> jax.Array:
        return jax.random.normal(key, shape, jnp.float32)

    def sample_noise(self, eps: jax.Array) -> jax.Array:
        return self.loc + self.scale * eps

    rsample_noise = sample_noise

    def kl_to(self, other: "DiagNormal") -> jax.Array:
        var_ratio = jnp.square(self.scale / other.scale)
        t1 = jnp.square((self.loc - other.loc) / other.scale)
        kl = 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
        return self._sum_events(kl)

    def tree_flatten(self):
        return (self.loc, self.scale), (self.event_dims,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.loc, obj.scale = children
        obj.event_dims, = aux
        return obj


@jax.tree_util.register_pytree_node_class
class Normal(DiagNormal):
    """Scalar Normal (no event dims) — decoder heads with out_dim == 1."""

    def __init__(self, mean: jax.Array, std: jax.Array):
        super().__init__(mean, std, event_dims=0)


@jax.tree_util.register_pytree_node_class
class Bernoulli:
    """Bernoulli from logits (terminal-flag decoder head)."""

    def __init__(self, logits: jax.Array):
        self.logits = _f32(logits)

    @property
    def mean(self) -> jax.Array:
        return jax.nn.sigmoid(self.logits)

    def log_prob(self, x: jax.Array) -> jax.Array:
        x = _f32(x)
        # -softplus(-l)*x - softplus(l)*(1-x), numerically stable
        return x * self.logits - jax.nn.softplus(self.logits)

    def entropy(self) -> jax.Array:
        p = self.mean
        return jax.nn.softplus(self.logits) - self.logits * p

    def sample(self, key: jax.Array) -> jax.Array:
        return (jax.random.uniform(key, self.logits.shape) < self.mean).astype(jnp.float32)

    def tree_flatten(self):
        return (self.logits,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.logits, = children
        return obj


@jax.tree_util.register_pytree_node_class
class CategoricalSupport:
    """Categorical over a fixed support of scalar values.

    Used by the categorical reward decoder: ``mean = probs . support``
    (reference: common.py:77-87).
    """

    def __init__(self, logits: jax.Array, support: jax.Array):
        self.logits = _f32(logits) - jax.nn.logsumexp(_f32(logits), axis=-1, keepdims=True)
        self.support = _f32(support)

    @property
    def probs(self) -> jax.Array:
        return jnp.exp(self.logits)

    @property
    def mean(self) -> jax.Array:
        return jnp.einsum("...i,i->...", self.probs, self.support)

    def to_categorical(self, target: jax.Array) -> jax.Array:
        """Nearest-support-bucket index for a continuous target."""
        return support_to_categorical(target, self.support)

    def log_prob_idx(self, idx: jax.Array) -> jax.Array:
        return jnp.take_along_axis(self.logits, idx[..., None], axis=-1).squeeze(-1)

    def log_prob(self, target: jax.Array) -> jax.Array:
        return self.log_prob_idx(self.to_categorical(target))

    def entropy(self) -> jax.Array:
        return -jnp.sum(self.probs * self.logits, axis=-1)

    def sample(self, key: jax.Array) -> jax.Array:
        idx = jax.random.categorical(key, self.logits, axis=-1)
        return self.support[idx]

    def tree_flatten(self):
        return (self.logits, self.support), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.logits, obj.support = children
        return obj


@jax.tree_util.register_pytree_node_class
class TanhNormal:
    """tanh(Normal) with pre-squash mean clipping (policy for continuous ctrl).

    Matches the reference's ``tanh_normal`` (functions.py:69-78): base Normal
    with mean 5*tanh(x/5) and std softplus(x)+0.1; ``entropy()`` intentionally
    returns the *base* normal entropy (same hack as the reference — the tanh
    Jacobian correction is omitted).
    """

    def __init__(self, mean: jax.Array, std: jax.Array):
        self.base = DiagNormal(mean, std, event_dims=1)

    @property
    def mean(self) -> jax.Array:
        # Approximation: tanh of base mean (exact mean has no closed form).
        return jnp.tanh(self.base.mean)

    def sample(self, key: jax.Array) -> jax.Array:
        return jnp.tanh(self.base.sample(key))

    rsample = sample

    def log_prob(self, y: jax.Array) -> jax.Array:
        y = jnp.clip(_f32(y), -0.999999, 0.999999)
        x = jnp.arctanh(y)
        # log det Jacobian of tanh: sum log(1 - tanh(x)^2) = sum 2*(log2 - x - softplus(-2x))
        ldj = 2.0 * (math.log(2.0) - x - jax.nn.softplus(-2.0 * x))
        base_lp = -0.5 * jnp.square((x - self.base.loc) / self.base.scale) \
            - jnp.log(self.base.scale) - _HALF_LOG_2PI
        return jnp.sum(base_lp - ldj, axis=-1)

    def entropy(self) -> jax.Array:
        return self.base.entropy()

    def tree_flatten(self):
        return (self.base.loc, self.base.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.base = DiagNormal(children[0], children[1], event_dims=1)
        return obj


# ---------------------------------------------------------------------------
# Distribution builders (reference: functions.py:46-78)
# ---------------------------------------------------------------------------

def diag_normal(x: jax.Array, min_std: float = 0.1, max_std: float = 2.0) -> DiagNormal:
    """Split last axis into (mean, std_param); std = max*sigmoid(p) + min."""
    mean, std = jnp.split(_f32(x), 2, axis=-1)
    std = max_std * jax.nn.sigmoid(std) + min_std
    return DiagNormal(mean, std, event_dims=1)


def normal_tanh(x: jax.Array, min_std: float = 0.01, max_std: float = 1.0) -> DiagNormal:
    """Normal(tanh(mean), sigmoid-scaled std) — bounded-mean gaussian policy."""
    mean, std = jnp.split(_f32(x), 2, axis=-1)
    return DiagNormal(jnp.tanh(mean), max_std * jax.nn.sigmoid(std) + min_std, event_dims=1)


def tanh_normal(x: jax.Array) -> TanhNormal:
    """TanhTransform(Normal(5 tanh(x/5), softplus(x)+0.1))."""
    mean, std = jnp.split(_f32(x), 2, axis=-1)
    mean = 5.0 * jnp.tanh(mean / 5.0)
    std = jax.nn.softplus(std) + 0.1
    return TanhNormal(mean, std)


@jax.tree_util.register_pytree_node_class
class TruncNormal:
    """Normal truncated to [-1, 1] per dimension (DreamerV2's DMC policy).

    Added after the r4 dmc_swingup collapse (results/README.md): the
    reference's ``tanh_normal`` head has an UNBOUNDED softplus std whose
    base-normal entropy feeds the entropy bonus, so once tanh saturates
    the dynamics gradient vanishes and nothing opposes std growth —
    actor-std runaway, bang-bang policy, collapse. The reference never
    trains that path (its dynamics mode detaches dreams, PARITY.md §2.10);
    DreamerV2 proper uses THIS head on dm_control: mean = tanh(m),
    std = 2*sigmoid(s/2) + min_std (bounded), truncated support — entropy
    is bounded and the pathwise gradient never saturates.

    Exact truncated-normal sample (inverse-CDF, pathwise-differentiable
    via the traced bounds), log_prob, entropy, and mean.
    """

    LO, HI = -1.0, 1.0

    def __init__(self, mean: jax.Array, std: jax.Array):
        self.loc = _f32(mean)
        self.scale = _f32(std)

    def _bounds(self):
        a = (self.LO - self.loc) / self.scale
        b = (self.HI - self.loc) / self.scale
        return a, b

    def _logz(self):
        from jax.scipy.special import log_ndtr
        a, b = self._bounds()
        # log(ndtr(b) - ndtr(a)), stable: logsumexp-style difference
        lb, la = log_ndtr(b), log_ndtr(a)
        return lb + jnp.log1p(-jnp.exp(la - lb))

    def sample(self, key: jax.Array) -> jax.Array:
        # Truncated noise drawn with STOPPED bounds: the exact pathwise
        # gradient through the truncation (implicit diff of ndtri/ndtr)
        # contains pdf ratios phi(a)/phi(x) that explode for tail draws —
        # one such draw among the M*H*A dream samples NaN'd the whole
        # params tree in the r4 swingup run. With sg(bounds) the gradient
        # flows through loc + scale*eps only (|d/dscale| = |eps| <= 20),
        # the standard truncated-reparameterization approximation.
        sg = jax.lax.stop_gradient
        a, b = self._bounds()
        eps = jax.random.truncated_normal(key, sg(a), sg(b),
                                          shape=self.loc.shape)
        return jnp.clip(self.loc + self.scale * sg(eps), self.LO, self.HI)

    rsample = sample

    @property
    def mean(self) -> jax.Array:
        a, b = self._bounds()
        phi = lambda t: jnp.exp(-0.5 * t * t - _HALF_LOG_2PI)
        z = jnp.exp(self._logz())
        return self.loc + self.scale * (phi(a) - phi(b)) / z

    def log_prob(self, y: jax.Array) -> jax.Array:
        lp = -0.5 * jnp.square((_f32(y) - self.loc) / self.scale) \
            - jnp.log(self.scale) - _HALF_LOG_2PI - self._logz()
        return jnp.sum(lp, axis=-1)

    def entropy(self) -> jax.Array:
        a, b = self._bounds()
        phi = lambda t: jnp.exp(-0.5 * t * t - _HALF_LOG_2PI)
        logz = self._logz()
        z = jnp.exp(logz)
        # H = log(sqrt(2*pi*e)*sigma*Z) + (a*phi(a) - b*phi(b)) / (2Z),
        # with the a/b*phi terms -> 0 as bounds -> inf.
        h = _HALF_LOG_2PI + 0.5 + jnp.log(self.scale) + logz \
            + (a * phi(a) - b * phi(b)) / (2.0 * z)
        return jnp.sum(h, axis=-1)

    def tree_flatten(self):
        return (self.loc, self.scale), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.loc, obj.scale = children
        return obj


def trunc_normal(x: jax.Array, min_std: float = 0.1) -> TruncNormal:
    """DreamerV2 dmc head: TruncNormal(tanh(m), 2*sigmoid(s/2)+min_std)."""
    mean, std = jnp.split(_f32(x), 2, axis=-1)
    return TruncNormal(jnp.tanh(mean),
                       2.0 * jax.nn.sigmoid(std / 2.0) + min_std)


def zdistr_kl(post, prior) -> jax.Array:
    """Exact KL(post || prior) for matching latent distribution types."""
    return post.kl_to(prior)
