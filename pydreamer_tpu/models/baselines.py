"""Baseline world models for probe evaluation (no actor-critic).

Counterpart of the reference baselines (reference: pydreamer/models/baselines.py):
  * ``VAEWorldModel``            — per-frame VAE (baselines.py:250-310)
  * ``GRUVAEWorldModel``         — detached VAE embed -> GRU -> predict next
    embed (baselines.py:114-180)
  * ``TransformerVAEWorldModel`` — 6-layer transformer dynamics over VAE
    embeds (baselines.py:183-247)
  * ``GRUEncoderOnly``           — forward-only GRU probe baseline
    (baselines.py:314-357)
  * ``WorldModelProbe``          — wrapper with the same training_step
    contract as Dreamer, minus the actor-critic (baselines.py:19-111)

Selected by ``conf.model`` in the trainer (reference: train.py:104-107).
All recurrences are ``lax.scan``; the transformer is an unmasked encoder, so
it is fully time-parallel on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoders import MultiDecoder, DenseNormalDecoder
from .distributions import diag_normal
from .dreamer import WorldModel, compute_dtype, dummy_obs
from .encoders import MultiEncoder
from .functions import insert_dim, logavgexp
from .modules import Dense, Norm, xavier_uniform
from .probes import make_probe

__all__ = ["WorldModelProbe", "VAEWorldModel", "GRUVAEWorldModel",
           "TransformerVAEWorldModel", "GRUEncoderOnly"]

sg = jax.lax.stop_gradient


class GRUSequence(nn.Module):
    """Single-layer GRU over (T,B,X) via lax.scan (plain-GRU math)."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: jax.Array, in_state: jax.Array):
        from .rnn import GRUCell
        cell = GRUCell(self.hidden_size, dtype=self.dtype)
        scan = nn.scan(lambda c, carry, x: (lambda h: (h, h))(c(x, carry)),
                       variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=0, out_axes=0)
        out_state, features = scan(cell, in_state, xs)
        return features.astype(jnp.float32), out_state.astype(jnp.float32)


class _VAECore(nn.Module):
    """Encoder -> gaussian posterior MLP (Linear 256, ELU, Linear 2S)."""

    encoder: MultiEncoder
    stoch_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs):
        embed = self.encoder(obs)
        x = Dense(256, dtype=self.dtype)(embed)
        x = nn.elu(x)
        return Dense(2 * self.stoch_dim, dtype=self.dtype)(x).astype(jnp.float32)


class VAEWorldModel:
    """Per-frame VAE: N(0,1) prior, diag-normal posterior, multi-head decode."""

    def __init__(self, conf):
        self.conf = conf
        self.dtype = compute_dtype(conf)
        self.kl_weight = conf.kl_weight
        self.out_dim = conf.stoch_dim
        encoder = MultiEncoder(
            image_encoder=conf.image_encoder, image_size=conf.image_size,
            image_channels=conf.image_channels, cnn_depth=conf.cnn_depth,
            image_encoder_layers=conf.image_encoder_layers,
            vecobs_size=conf.vecobs_size, reward_input=conf.reward_input,
            layer_norm=conf.layer_norm, dtype=self.dtype)
        self.core = _VAECore(encoder, conf.stoch_dim, self.dtype)
        self.decoder = MultiDecoder(
            features_dim=conf.stoch_dim, image_decoder=conf.image_decoder,
            image_size=conf.image_size, image_channels=conf.image_channels,
            cnn_depth=conf.cnn_depth, image_decoder_layers=conf.image_decoder_layers,
            image_decoder_min_prob=conf.image_decoder_min_prob,
            reward_decoder_layers=conf.reward_decoder_layers,
            terminal_decoder_layers=conf.terminal_decoder_layers,
            reward_decoder_categorical=(
                tuple(conf.reward_decoder_categorical) if conf.reward_decoder_categorical else None),
            vecobs_size=conf.vecobs_size,
            image_weight=conf.image_weight, vecobs_weight=conf.vecobs_weight,
            reward_weight=conf.reward_weight, terminal_weight=conf.terminal_weight,
            layer_norm=conf.layer_norm, dtype=self.dtype)

    def init(self, key: jax.Array):
        obs = dummy_obs(self.conf, 2, 2)
        k1, k2 = jax.random.split(key)
        return {
            "core": self.core.init(k1, obs),
            "decoder": self.decoder.init(k2, jnp.zeros((2, 2, 1, self.out_dim)), obs),
        }

    def init_state(self, batch_size: int):
        return jnp.zeros((0,), jnp.float32)  # stateless placeholder

    def training_step(self, params, obs, in_state, key,
                      iwae_samples: int = 1, do_open_loop=False, do_image_pred=False):
        I = iwae_samples
        k_z, k_prior = jax.random.split(key)
        post = self.core.apply(params["core"], obs)
        post = insert_dim(post, 2, I)                       # (T,B,I,2S)
        post_distr = diag_normal(post)
        z = post_distr.rsample(k_z)
        loss_reconstr, metrics, tensors = self.decoder.apply(params["decoder"], z, obs)

        prior_distr = diag_normal(jnp.zeros_like(post))     # ~ N(0,1)
        loss_kl = post_distr.kl_to(prior_distr)             # (T,B,I)
        loss_model_tbi = self.kl_weight * loss_kl + loss_reconstr
        loss_model = -logavgexp(-loss_model_tbi, axis=2)

        loss_kl_m = -logavgexp(-sg(loss_kl), axis=2)
        entropy_post = sg(post_distr.entropy()).mean(axis=2)
        tensors.update(loss_kl=loss_kl_m, entropy_post=entropy_post)
        metrics.update(loss_model=sg(loss_model.mean()), loss_kl=loss_kl_m.mean(),
                       entropy_post=entropy_post.mean())

        if do_image_pred:
            zprior = prior_distr.sample(k_prior)
            _, mets, tens = self.decoder.apply(params["decoder"], sg(zprior), obs, True)
            tensors.update({k.replace("_rec", "_pred"): v
                            for k, v in tens.items() if k.endswith("_rec")})

        return loss_model.mean(), z, None, in_state, metrics, tensors


class GRUVAEWorldModel:
    """VAE embed (detached) + next-action -> GRU -> predict next embed."""

    def __init__(self, conf):
        self.conf = conf
        self.dtype = compute_dtype(conf)
        self.state_dim = conf.deter_dim
        self.out_dim = self.state_dim
        self.embedding = VAEWorldModel(conf)
        self.rnn = GRUSequence(self.state_dim, dtype=self.dtype)
        self.dynamics = DenseNormalDecoder(self.state_dim, self.embedding.out_dim,
                                           hidden_layers=2, dtype=self.dtype)

    def init(self, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        T, B = 2, 2
        emb_act = jnp.zeros((T, B, self.embedding.out_dim + self.conf.action_dim))
        feat = jnp.zeros((T, B, 1, self.state_dim))
        tgt = jnp.zeros((T, B, 1, self.embedding.out_dim))
        return {
            "embedding": self.embedding.init(k1),
            "rnn": self.rnn.init(k2, emb_act, jnp.zeros((B, self.state_dim))),
            "dynamics": self.dynamics.init(k3, feat, tgt,
                                           method=DenseNormalDecoder.training_step),
        }

    def init_state(self, batch_size: int):
        return jnp.zeros((batch_size, self.state_dim), jnp.float32)

    def training_step(self, params, obs, in_state, key,
                      iwae_samples: int = 1, do_open_loop=False, do_image_pred=False):
        # Reset only honored at batch start (reference: baselines.py:138-141).
        # in_state is (B*I, D); the (B,) reset mask is repeated over the IWAE
        # samples with the same interleaving as expand_iwae.
        reset_first = obs["reset"][0]
        mask = (~reset_first.astype(bool)).astype(jnp.float32)   # (B,)
        rep = in_state.shape[0] // mask.shape[0]
        if rep > 1:
            mask = jnp.repeat(mask, rep, axis=0)
        in_state = in_state * mask[:, None]

        loss, embed, _, _, metrics, tensors = self.embedding.training_step(
            params["embedding"], obs, None, key,
            iwae_samples=iwae_samples, do_image_pred=do_image_pred)
        T, B, I = embed.shape[:3]
        embed = sg(embed.reshape((T, B * I, -1)))           # predict embeds as-is

        action_next = jnp.repeat(obs["action_next"], I, axis=1) if I > 1 else obs["action_next"]
        embed_act = jnp.concatenate([embed, action_next], -1)
        features, out_state = self.rnn.apply(params["rnn"], embed_act, in_state)
        features = features.reshape((T, B, I, -1))
        out_state = sg(out_state)

        # Each IWAE sample predicts ITS OWN next embedding, so the loss is
        # computed directly against the (T-1,B,I,E) targets (the decoder's
        # training_step tiles ONE target over I, which is wrong here for I>1).
        embed_next = embed[1:].reshape((T - 1, B, I, -1))
        dyn_dist = self.dynamics.apply(params["dynamics"], features[:-1])
        loss_dyn_tbi = -dyn_dist.log_prob(embed_next) * (self.dynamics.std ** 2)
        loss_dyn = -logavgexp(-loss_dyn_tbi, axis=2)                 # (T-1,B)
        embed_pred = dyn_dist.mean.mean(axis=2)                      # (T-1,B,E)
        loss = loss + loss_dyn.mean()
        metrics["loss_dyn"] = sg(loss_dyn.mean())
        tensors["loss_dyn"] = sg(loss_dyn)

        if do_image_pred:
            z = sg(embed_pred)
            z = jnp.concatenate([jnp.zeros_like(z[:1]), z], 0)
            _, mets, tens = self.embedding.decoder.apply(
                params["embedding"]["decoder"], z[:, :, None], obs, True)
            tensors.update({k.replace("_rec", "_pred"): v
                            for k, v in tens.items() if k.endswith("_rec")})

        return loss, features, None, out_state, metrics, tensors


class _TransformerEncoder(nn.Module):
    """Pre-input Dense + N post-norm transformer encoder layers (unmasked)."""

    d_model: int = 512
    nhead: int = 8
    dim_feedforward: int = 2048
    num_layers: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (T,B,X)
        x = Dense(self.d_model, dtype=self.dtype)(x)
        x = jnp.swapaxes(x, 0, 1)  # (B,T,D): attention over T
        for i in range(self.num_layers):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nhead, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=xavier_uniform, name=f"attn_{i}")(x, x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"ln1_{i}")(x + attn)
            y = Dense(self.dim_feedforward, dtype=self.dtype)(x)
            y = nn.relu(y)
            y = Dense(self.d_model, dtype=self.dtype)(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"ln2_{i}")(x + y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="ln_out")(x)
        return jnp.swapaxes(x, 0, 1).astype(jnp.float32)


class TransformerVAEWorldModel:
    """Transformer dynamics over detached VAE embeds."""

    def __init__(self, conf):
        self.conf = conf
        self.dtype = compute_dtype(conf)
        self.state_dim = 512
        self.out_dim = self.state_dim
        self.embedding = VAEWorldModel(conf)
        self.transformer = _TransformerEncoder(dtype=self.dtype)
        self.dynamics = DenseNormalDecoder(self.state_dim, self.embedding.out_dim,
                                           hidden_layers=2, dtype=self.dtype)

    def init(self, key: jax.Array):
        k1, k2, k3 = jax.random.split(key, 3)
        T, B = 2, 2
        emb_act = jnp.zeros((T, B, self.embedding.out_dim + self.conf.action_dim))
        feat = jnp.zeros((T, B, 1, self.state_dim))
        tgt = jnp.zeros((T, B, 1, self.embedding.out_dim))
        return {
            "embedding": self.embedding.init(k1),
            "transformer": self.transformer.init(k2, emb_act),
            "dynamics": self.dynamics.init(k3, feat, tgt,
                                           method=DenseNormalDecoder.training_step),
        }

    def init_state(self, batch_size: int):
        return jnp.zeros((0,), jnp.float32)

    def training_step(self, params, obs, in_state, key,
                      iwae_samples: int = 1, do_open_loop=False, do_image_pred=False):
        loss, embed, _, _, metrics, tensors = self.embedding.training_step(
            params["embedding"], obs, None, key,
            iwae_samples=iwae_samples, do_image_pred=do_image_pred)
        T, B, I = embed.shape[:3]
        embed = sg(embed.reshape((T, B * I, -1)))
        action_next = jnp.repeat(obs["action_next"], I, axis=1) if I > 1 else obs["action_next"]
        embed_act = jnp.concatenate([embed, action_next], -1)

        features = self.transformer.apply(params["transformer"], embed_act)
        features = features.reshape((T, B, I, -1))

        # Per-sample next-embedding targets, (T-1,B,I,E); see GRU-VAE note.
        embed_next = embed[1:].reshape((T - 1, B, I, -1))
        dyn_dist = self.dynamics.apply(params["dynamics"], features[:-1])
        loss_dyn_tbi = -dyn_dist.log_prob(embed_next) * (self.dynamics.std ** 2)
        loss_dyn = -logavgexp(-loss_dyn_tbi, axis=2)                 # (T-1,B)
        embed_pred = dyn_dist.mean.mean(axis=2)                      # (T-1,B,E)
        loss = loss + loss_dyn.mean()
        metrics["loss_dyn"] = sg(loss_dyn.mean())
        tensors["loss_dyn"] = sg(loss_dyn)

        if do_image_pred:
            z = sg(embed_pred)
            z = jnp.concatenate([jnp.zeros_like(z[:1]), z], 0)
            _, mets, tens = self.embedding.decoder.apply(
                params["embedding"]["decoder"], z[:, :, None], obs, True)
            tensors.update({k.replace("_rec", "_pred"): v
                            for k, v in tens.items() if k.endswith("_rec")})

        return loss, features, None, in_state, metrics, tensors


class _GRUEncoderCore(nn.Module):
    encoder: MultiEncoder
    state_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs, in_state):
        embed = self.encoder(obs)
        embed = Dense(32, dtype=self.dtype)(embed)  # squeeze vs action input
        embed_act = jnp.concatenate([embed.astype(jnp.float32), obs["action_next"]], -1)
        return GRUSequence(self.state_dim, dtype=self.dtype)(embed_act, in_state)


class GRUEncoderOnly:
    """Forward-only GRU probe baseline (loss 0; probe supplies the training signal)."""

    def __init__(self, conf):
        self.conf = conf
        self.dtype = compute_dtype(conf)
        self.state_dim = conf.deter_dim
        self.out_dim = self.state_dim
        encoder = MultiEncoder(
            image_encoder=conf.image_encoder, image_size=conf.image_size,
            image_channels=conf.image_channels, cnn_depth=conf.cnn_depth,
            image_encoder_layers=conf.image_encoder_layers,
            vecobs_size=conf.vecobs_size, reward_input=conf.reward_input,
            layer_norm=conf.layer_norm, dtype=self.dtype)
        self.core = _GRUEncoderCore(encoder, self.state_dim, self.dtype)

    def init(self, key: jax.Array):
        obs = dummy_obs(self.conf, 2, 2)
        obs["action_next"] = obs["action"]
        return {"core": self.core.init(key, obs, self.init_state(2))}

    def init_state(self, batch_size: int):
        return jnp.zeros((batch_size, self.state_dim), jnp.float32)

    def training_step(self, params, obs, in_state, key,
                      iwae_samples: int = 1, do_open_loop=False, do_image_pred=False):
        assert iwae_samples == 1
        reset_first = obs["reset"][0]
        in_state = in_state * (~reset_first.astype(bool))[:, None].astype(jnp.float32)
        features, out_state = self.core.apply(params["core"], obs, in_state)
        features = features[:, :, None]  # insert I=1
        return jnp.zeros(()), features, None, sg(out_state), {}, {}


_BASELINES = {
    "vae": VAEWorldModel,
    "gru_vae": GRUVAEWorldModel,
    "transformer_vae": TransformerVAEWorldModel,
    "gru_probe": GRUEncoderOnly,
}


class WorldModelProbe:
    """Baseline wrapper with the Dreamer training_step contract (no AC)."""

    def __init__(self, conf):
        self.conf = conf
        self.probe_gradients = conf.probe_gradients
        try:
            self.wm = _BASELINES[conf.model](conf)
        except KeyError:
            raise ValueError(f"unknown baseline model {conf.model!r}")
        self.probe = make_probe(conf, self.wm.out_dim, compute_dtype(conf))

    def init(self, key: jax.Array):
        k1, k2 = jax.random.split(key)
        return {"wm": self.wm.init(k1), "probe": self.probe.init(k2)}

    def init_state(self, batch_size: int):
        return self.wm.init_state(batch_size)

    def training_step(self, params, obs, in_state, key,
                      iwae_samples: Optional[int] = None,
                      imag_horizon: Optional[int] = None,
                      do_open_loop: bool = False,
                      do_image_pred: bool = False,
                      do_dream_tensors: bool = False):
        from .dreamer import prepare_obs
        obs = prepare_obs(obs)
        I = int(iwae_samples or self.conf.iwae_samples)
        loss_model, features, states, out_state, metrics, tensors = \
            self.wm.training_step(params["wm"], obs, in_state, key,
                                  iwae_samples=I, do_open_loop=do_open_loop,
                                  do_image_pred=do_image_pred)
        features_probe = features if self.probe_gradients else sg(features)
        loss_probe, metrics_probe, tensors_probe = self.probe.training_step(
            params["probe"], features_probe, obs)
        metrics.update(metrics_probe)
        tensors.update(tensors_probe)
        losses = dict(loss_model=loss_model, loss_probe=loss_probe)
        return losses, out_state, metrics, tensors, {}
