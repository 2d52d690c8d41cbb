"""Decoder heads and the multi-head reconstruction loss.

Counterpart of the reference decoders (reference: pydreamer/models/decoders.py):
  * ``MultiDecoder``                  — weighted image+vecobs+reward+terminal
    heads, each returning (loss_tbi, loss_tb, reconstruction) (decoders.py:10-108)
  * ``ConvDecoder``                   — transposed CNN, 0.5*MSE loss (111-180)
  * ``CatImageDecoder``               — dense categorical-image decoder with
    ``min_prob`` uniform mixing (183-254)
  * ``DenseBernoulliDecoder``         — terminal head (257-284)
  * ``DenseNormalDecoder``            — fixed sigma=0.3989 => loss = 0.5*MSE (287-319)
  * ``DenseCategoricalSupportDecoder``— categorical reward head (322-362)

All heads follow the (T,B,I,F) feature layout: the target is broadcast over
the IWAE axis and per-sample losses are aggregated with -logavgexp over I.
Images are NHWC (class/channel axis LAST for the categorical image decoder —
a deliberate layout divergence from the reference's channel-first).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from jax import lax

from ..ops.subpixel import conv_transpose_s2_fused, conv_transpose_s2_subpixel
from .distributions import (Bernoulli, CategoricalSupport, DiagNormal, Normal,
                            support_to_categorical)
from .functions import flatten_batch, unflatten_batch, insert_dim, logavgexp, nanmean
from .modules import Dense, Norm, MLP, xavier_uniform

__all__ = [
    "MultiDecoder", "ConvDecoder", "CatImageDecoder",
    "DenseBernoulliDecoder", "DenseNormalDecoder", "DenseCategoricalSupportDecoder",
]


def _active_platform() -> str:
    """Platform governing the 'auto' lowering choice.

    A CPU-forced process (`conf.platform: cpu` -> jax.config.update
    "jax_platforms" in the trainer/launcher) must resolve the CPU
    heuristic even on images that force-register a TPU plugin whose
    backends were touched before the config update (advisor r4,
    decoders.py:63) — so the config knob wins when it names cpu first.
    Otherwise trust jax.default_backend(): plugin platforms can appear
    in the knob under an alias (e.g. 'axon,cpu' on this image) while
    their devices correctly report platform 'tpu'."""
    try:
        first = (jax.config.jax_platforms or "").split(",")[0]
    except AttributeError:
        first = ""
    if first == "cpu":
        return "cpu"
    return jax.default_backend()


class _ConvTransposeS2(nn.Module):
    """Stride-2 VALID transposed conv with a selectable lowering.

    Param tree ("kernel" HWIO + "bias") and init match nn.ConvTranspose
    exactly, so checkpoints are interchangeable between impls:
      * 'xla'      — lax.conv_transpose (input-dilated conv)
      * 'subpixel' — exact parity-phase regrouping into dense convs
                     (ops/subpixel.py); on TPU the dilated lowering ran the
                     decoder at ~29% of peak with deconv0 at 6%
                     (scripts/bench_conv.py r4), the subpixel form avoids
                     convolving 75%-zeros activations.
    """

    features: int
    kernel_size: Tuple[int, int]
    impl: str = "auto"   # auto | xla | subpixel | fused
    dtype: Any = jnp.float32

    def _resolve(self, h_in: int) -> str:
        if self.impl != "auto":
            return self.impl
        if _active_platform() != "tpu":
            return "xla"
        # Chip-measured, interleaved in-step A/B (scripts/bench_step_ab.py
        # r4): lowering the 1x1-input stem layer as a GEMM is worth +5.9%
        # end-to-end (38.1 vs 36.0 grad-steps/s, consistent across all
        # interleaved windows); every other regrouping LOSES in the fused
        # step even though it wins isolated microbenches — XLA fuses the
        # dilated-conv grads with surrounding ops, and the multi-op forms
        # break those fusions. So: GEMM for the 1x1 stem, XLA elsewhere.
        return "subpixel" if h_in == 1 else "xla"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", xavier_uniform,
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        impl = self._resolve(int(x.shape[1]))
        if impl == "subpixel":
            y = conv_transpose_s2_subpixel(x, kernel.astype(self.dtype))
        elif impl == "fused":
            y = conv_transpose_s2_fused(x, kernel.astype(self.dtype))
        else:
            y = lax.conv_transpose(
                x, kernel.astype(self.dtype), strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class ConvDecoder(nn.Module):
    """Dense(32d) -> reshape (1,1,32d) -> 4x ConvTranspose (k 5,5,6,6, s2)."""

    in_dim: int
    out_channels: int = 3
    cnn_depth: int = 32
    mlp_layers: int = 0
    layer_norm: bool = True
    # 'auto' | 'xla' | 'subpixel' | 'fused', or a comma-list per layer
    # (e.g. 'subpixel,xla,fused,xla') — identical math either way.
    transpose_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x, bd = flatten_batch(x, 1)
        x = x.astype(self.dtype)
        d = self.cnn_depth
        if self.mlp_layers == 0:
            x = Dense(d * 32, dtype=self.dtype)(x)  # no activation (DreamerV2)
        else:
            for _ in range(self.mlp_layers):
                x = Dense(d * 32, dtype=self.dtype)(x)
                x = Norm(self.layer_norm, dtype=self.dtype)(x)
                x = nn.elu(x)
        x = x.reshape(x.shape[0], 1, 1, d * 32)
        kernels = (5, 5, 6, 6)
        depths = (d * 4, d * 2, d, self.out_channels)
        impls = self.transpose_impl.split(",")
        if len(impls) == 1:
            impls = impls * len(kernels)
        for i, (k, depth) in enumerate(zip(kernels, depths)):
            x = _ConvTransposeS2(depth, (k, k), impl=impls[i].strip(),
                                 dtype=self.dtype, name=f"deconv_{i}")(x)
            if i < 3:
                x = nn.elu(x)
        x = x.astype(jnp.float32)
        return unflatten_batch(x, bd)  # (...,H,W,C)

    def loss(self, output: jax.Array, target: jax.Array) -> jax.Array:
        """0.5 * sum-of-squares over (H,W,C)."""
        return 0.5 * jnp.sum(
            jnp.square(output.astype(jnp.float32) - target.astype(jnp.float32)),
            axis=(-1, -2, -3))

    def training_step(self, features, target):
        """(T,B,I,F),(T,B,H,W,C) -> (loss_tbi, loss_tb, decoded_TBHWC)."""
        I = features.shape[2]
        target_i = insert_dim(target, 2, I)
        decoded = self(features)
        loss_tbi = self.loss(decoded, target_i)
        loss_tb = -logavgexp(-loss_tbi, axis=2)
        return loss_tbi, loss_tb, decoded.mean(axis=2)


class CatImageDecoder(nn.Module):
    """Dense decoder for categorical images (class axis LAST: (...,H,W,K))."""

    in_dim: int
    out_shape: Tuple[int, int, int]  # (H, W, K)
    hidden_dim: int = 400
    hidden_layers: int = 2
    layer_norm: bool = True
    min_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x, bd = flatten_batch(x, 1)
        x = x.astype(self.dtype)
        for _ in range(self.hidden_layers):
            x = Dense(self.hidden_dim, dtype=self.dtype)(x)
            x = Norm(self.layer_norm, dtype=self.dtype)(x)
            x = nn.elu(x)
        x = Dense(int(np.prod(self.out_shape)), dtype=self.dtype)(x)
        x = x.reshape((x.shape[0],) + tuple(self.out_shape)).astype(jnp.float32)
        return unflatten_batch(x, bd)

    def loss(self, logits: jax.Array, target: jax.Array) -> jax.Array:
        """Cross-entropy summed over (H,W); target int (...,H,W) or one-hot."""
        if logits.ndim == target.ndim:
            target = jnp.argmax(target, axis=-1)  # one-hot (...,H,W,K) -> int
        logp = jax.nn.log_softmax(logits, axis=-1)
        if self.min_prob > 0:
            prob = jnp.exp(logp)
            K = logits.shape[-1]
            prob = (1.0 - self.min_prob) * prob + self.min_prob / K
            logp = jnp.log(prob)
        nll = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32), axis=-1)
        return jnp.sum(nll.squeeze(-1), axis=(-1, -2))

    def training_step(self, features, target):
        I = features.shape[2]
        target_i = insert_dim(target, 2, I)
        logits = self(features)
        loss_tbi = self.loss(logits, target_i)
        loss_tb = -logavgexp(-loss_tbi, axis=2)
        # Aggregate I in log-prob space, renormalized over classes
        # (reference: decoders.py:247-251).
        logits = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        logits = jax.nn.logsumexp(logits, axis=2)  # (T,B,H,W,K)
        logits = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        return loss_tbi, loss_tb, logits


class DenseBernoulliDecoder(nn.Module):
    """Terminal-flag head: MLP -> Bernoulli(logits)."""

    in_dim: int
    hidden_dim: int = 400
    hidden_layers: int = 2
    layer_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array) -> Bernoulli:
        y = MLP(1, self.hidden_dim, self.hidden_layers, self.layer_norm,
                dtype=self.dtype, name="model")(features)
        return Bernoulli(logits=y)

    def training_step(self, features, target):
        I = features.shape[2]
        target_i = insert_dim(target, 2, I)
        p = self(features)
        loss_tbi = -p.log_prob(target_i)
        loss_tb = -logavgexp(-loss_tbi, axis=2)
        return loss_tbi, loss_tb, p.mean.mean(axis=2)


class DenseNormalDecoder(nn.Module):
    """Fixed-sigma gaussian head. sigma = 1/sqrt(2 pi) makes loss == 0.5*MSE
    (reference: decoders.py:302-304)."""

    in_dim: int
    out_dim: int = 1
    hidden_dim: int = 400
    hidden_layers: int = 2
    layer_norm: bool = True
    std: float = 0.3989422804
    # vector_head: the target carries a trailing event axis even when
    # out_dim == 1 (vecobs of size 1). The reference's vecobs head is always
    # Independent(Normal, 1) (reference: decoders.py:330-340); scalar heads
    # (reward) squeeze instead.
    vector_head: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array):
        y = MLP(self.out_dim, self.hidden_dim, self.hidden_layers,
                self.layer_norm, dtype=self.dtype, name="model")(features)
        y = y.astype(jnp.float32)
        if self.out_dim == 1 and self.vector_head:
            y = y[..., None]  # undo MLP's out_dim==1 squeeze
        if self.out_dim > 1 or self.vector_head:
            return DiagNormal(y, jnp.full_like(y, self.std), event_dims=1)
        return Normal(y, jnp.full_like(y, self.std))

    def training_step(self, features, target):
        I = features.shape[2]
        target_i = insert_dim(target, 2, I)
        p = self(features)
        loss_tbi = -p.log_prob(target_i) * (self.std ** 2)  # == 0.5*MSE
        loss_tb = -logavgexp(-loss_tbi, axis=2)
        return loss_tbi, loss_tb, p.mean.mean(axis=2)


class DenseCategoricalSupportDecoder(nn.Module):
    """Categorical head over a fixed scalar support (reward buckets)."""

    in_dim: int
    support: Tuple[float, ...] = (0.0, 1.0)
    hidden_dim: int = 400
    hidden_layers: int = 2
    layer_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jax.Array) -> CategoricalSupport:
        y = MLP(len(self.support), self.hidden_dim, self.hidden_layers,
                self.layer_norm, dtype=self.dtype, name="model")(features)
        return CategoricalSupport(logits=y, support=jnp.asarray(self.support, jnp.float32))

    def training_step(self, features, target):
        I = features.shape[2]
        target_i = insert_dim(target, 2, I)
        p = self(features)
        loss_tbi = -p.log_prob(target_i)
        loss_tb = -logavgexp(-loss_tbi, axis=2)
        return loss_tbi, loss_tb, p.mean.mean(axis=2)


class MultiDecoder(nn.Module):
    """Weighted multi-head reconstruction (reference: decoders.py:10-108)."""

    features_dim: int
    image_decoder: Optional[str]       # 'cnn' | 'dense' | None
    image_size: int
    image_channels: int
    cnn_depth: int
    image_decoder_layers: int
    image_decoder_min_prob: float
    reward_decoder_layers: int
    terminal_decoder_layers: int
    reward_decoder_categorical: Optional[Tuple[float, ...]]
    vecobs_size: int
    image_weight: float = 1.0
    vecobs_weight: float = 1.0
    reward_weight: float = 1.0
    terminal_weight: float = 1.0
    transpose_impl: str = "auto"
    layer_norm: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        if self.image_decoder == "cnn":
            self.image = ConvDecoder(self.features_dim, self.image_channels,
                                     self.cnn_depth,
                                     transpose_impl=self.transpose_impl,
                                     dtype=self.dtype)
        elif self.image_decoder == "dense":
            self.image = CatImageDecoder(
                self.features_dim,
                out_shape=(self.image_size, self.image_size, self.image_channels),
                hidden_layers=self.image_decoder_layers,
                layer_norm=self.layer_norm,
                min_prob=self.image_decoder_min_prob, dtype=self.dtype)
        elif not self.image_decoder:
            self.image = None
        else:
            raise ValueError(f"unknown image_decoder {self.image_decoder!r}")

        if self.reward_decoder_categorical:
            self.reward = DenseCategoricalSupportDecoder(
                self.features_dim, support=tuple(self.reward_decoder_categorical),
                hidden_layers=self.reward_decoder_layers, layer_norm=self.layer_norm,
                dtype=self.dtype)
        else:
            self.reward = DenseNormalDecoder(
                self.features_dim, hidden_layers=self.reward_decoder_layers,
                layer_norm=self.layer_norm, dtype=self.dtype)

        self.terminal = DenseBernoulliDecoder(
            self.features_dim, hidden_layers=self.terminal_decoder_layers,
            layer_norm=self.layer_norm, dtype=self.dtype)

        if self.vecobs_size:
            self.vecobs = DenseNormalDecoder(
                self.features_dim, out_dim=self.vecobs_size, hidden_layers=4,
                vector_head=True,
                layer_norm=self.layer_norm, dtype=self.dtype)
        else:
            self.vecobs = None

    def __call__(self, features, obs, extra_metrics: bool = False):
        """Multi-head loss: returns (loss_reconstr_tbi, metrics, tensors)."""
        tensors: Dict[str, jax.Array] = {}
        metrics: Dict[str, jax.Array] = {}
        loss_reconstr = 0.0

        if self.image is not None:
            loss_image_tbi, loss_image, image_rec = self.image.training_step(features, obs["image"])
            loss_reconstr += self.image_weight * loss_image_tbi
            metrics["loss_image"] = loss_image.mean()
            tensors["loss_image"] = loss_image
            tensors["image_rec"] = image_rec

        if self.vecobs is not None:
            loss_vecobs_tbi, loss_vecobs, vecobs_rec = self.vecobs.training_step(features, obs["vecobs"])
            loss_reconstr += self.vecobs_weight * loss_vecobs_tbi
            metrics["loss_vecobs"] = loss_vecobs.mean()
            tensors["loss_vecobs"] = loss_vecobs
            tensors["vecobs_rec"] = vecobs_rec

        loss_reward_tbi, loss_reward, reward_rec = self.reward.training_step(features, obs["reward"])
        loss_reconstr += self.reward_weight * loss_reward_tbi
        metrics["loss_reward"] = loss_reward.mean()
        tensors["loss_reward"] = loss_reward
        tensors["reward_rec"] = reward_rec

        loss_terminal_tbi, loss_terminal, terminal_rec = self.terminal.training_step(features, obs["terminal"])
        loss_reconstr += self.terminal_weight * loss_terminal_tbi
        metrics["loss_terminal"] = loss_terminal.mean()
        tensors["loss_terminal"] = loss_terminal
        tensors["terminal_rec"] = terminal_rec

        if extra_metrics:
            # Per-reward-bucket logprob diagnostics (reference: decoders.py:85-106).
            if self.reward_decoder_categorical:
                sup = jnp.asarray(self.reward_decoder_categorical, jnp.float32)
                reward_cat = support_to_categorical(obs["reward"], sup)
                for i in range(len(self.reward_decoder_categorical)):
                    mask = (reward_cat == i).astype(jnp.float32)
                    loss_rewardp = loss_reward * mask / mask  # nan where ~mask
                    metrics[f"loss_reward{i}"] = nanmean(loss_rewardp)
                    tensors[f"loss_reward{i}"] = loss_rewardp
            else:
                for sig in (-1, 1):
                    mask = (jnp.sign(obs["reward"]) == sig).astype(jnp.float32)
                    loss_rewardp = loss_reward * mask / mask
                    metrics[f"loss_reward{sig}"] = nanmean(loss_rewardp)
                    tensors[f"loss_reward{sig}"] = loss_rewardp
            mask_t1 = (obs["terminal"] > 0).astype(jnp.float32)
            loss_terminal1 = loss_terminal * mask_t1 / mask_t1
            metrics["loss_terminal1"] = nanmean(loss_terminal1)
            tensors["loss_terminal1"] = loss_terminal1

        return loss_reconstr, metrics, tensors

    def reward_terminal(self, features):
        """Reward/terminal means for imagination rollouts (dream)."""
        return self.reward(features).mean, self.terminal(features).mean

    def image_forward(self, features):
        """Raw image head output (dream-log decoding)."""
        return self.image(features)
