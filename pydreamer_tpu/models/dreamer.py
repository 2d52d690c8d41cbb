"""Dreamer agent: world model + actor-critic trained in imagination.

TPU-native counterpart of the reference agent (reference:
pydreamer/models/dreamer.py). The reference is a stateful nn.Module; here
``Dreamer`` and ``WorldModel`` are *coordinators* — plain classes holding flax
module definitions and exposing pure functions ``(params, batch, state, rng)
-> outputs`` that the trainer jits as one fused step.

Gradient routing (reference solves by optimizer partition, dreamer.py:60-71,
203-205): the params tree has top-level keys {wm, probe, actor, critic,
critic_target}; each loss touches only its own subtree —
  * loss_model:  wm only
  * loss_probe:  probe only (features stop-gradiented unless probe_gradients)
  * loss_actor:  actor only (dream() runs on stop_gradient(wm params), the
    JAX equivalent of ``wm.requires_grad_(False)`` in dreamer.py:192)
  * loss_critic: critic only
so ONE backward pass over the summed loss yields exactly the same partitioned
gradients as the reference's four backward calls.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .a2c import ActorCritic
from .decoders import MultiDecoder
from .distributions import OneHotCategorical, diag_normal
from .encoders import MultiEncoder
from .functions import logavgexp, flatten_batch, unflatten_batch
from .probes import make_probe
from .rssm import (RSSMCore, draw_z_noise, init_state, to_feature,
                   feature_replace_z)

__all__ = ["Dreamer", "WorldModel", "dummy_obs", "compute_dtype"]

sg = jax.lax.stop_gradient


def compute_dtype(conf) -> Any:
    """Compute dtype from config: 'bfloat16'|'float32' (conf.amp => bf16)."""
    prec = conf.get("precision", None)
    if prec is None:
        prec = "bfloat16" if conf.get("amp", False) else "float32"
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(prec)]


def prepare_obs(obs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """On-device obs normalization: uint8 image -> float32 in [-0.5, 0.5].

    Runs inside the jitted step so the host pipeline ships raw uint8 (4x
    fewer bytes over PCIe/ICI and no float conversion on host CPUs).
    """
    if "image" in obs and obs["image"].dtype == jnp.uint8:
        obs = dict(obs)
        obs["image"] = obs["image"].astype(jnp.float32) / 255.0 - 0.5
    return obs


def dummy_obs(conf, T: int = 2, B: int = 2) -> Dict[str, jax.Array]:
    """Minimal observation batch matching the data contract, for module init.

    Keys follow the reference obs contract (dreamer.py:122-125): action,
    reward, terminal, reset always present; image/vecobs/map/goals by config.
    """
    obs: Dict[str, jax.Array] = {
        "action": jnp.zeros((T, B, conf.action_dim), jnp.float32),
        "reward": jnp.zeros((T, B), jnp.float32),
        "terminal": jnp.zeros((T, B), jnp.float32),
        "reset": jnp.zeros((T, B), bool),
    }
    if conf.image_encoder:
        obs["image"] = jnp.zeros(
            (T, B, conf.image_size, conf.image_size, conf.image_channels), jnp.float32)
    if conf.vecobs_size:
        obs["vecobs"] = jnp.zeros((T, B, conf.vecobs_size), jnp.float32)
    if conf.probe_model in ("map", "map+goals"):
        obs["map"] = jnp.zeros((T, B, conf.map_size, conf.map_size), jnp.int32)
        obs["map_coord"] = jnp.zeros((T, B, 4), jnp.float32)
    if conf.probe_model in ("goals", "map+goals"):
        obs["goal_direction"] = jnp.zeros((T, B, 2), jnp.float32)
        obs["goals_direction"] = jnp.zeros((T, B, conf.goals_size * 2), jnp.float32)
        obs["goals_visage"] = jnp.zeros((T, B, conf.goals_size), jnp.float32)
    return obs


class WorldModel:
    """Encoder -> RSSM -> multi-head decoder with KL-balanced ELBO.

    (reference: dreamer.py:232-396.)
    """

    def __init__(self, conf):
        self.conf = conf
        self.dtype = compute_dtype(conf)
        self.deter_dim = conf.deter_dim
        self.stoch_dim = conf.stoch_dim
        self.stoch_discrete = conf.stoch_discrete
        self.kl_weight = conf.kl_weight
        self.kl_balance = None if conf.kl_balance == 0.5 else conf.kl_balance
        self.aux_critic_weight = conf.aux_critic_weight
        self.features_dim = conf.deter_dim + conf.stoch_dim * (conf.stoch_discrete or 1)

        self.encoder = MultiEncoder(
            image_encoder=conf.image_encoder, image_size=conf.image_size,
            image_channels=conf.image_channels, cnn_depth=conf.cnn_depth,
            image_encoder_layers=conf.image_encoder_layers,
            vecobs_size=conf.vecobs_size, reward_input=conf.reward_input,
            conv_impl=conf.get("conv_impl", "auto"),
            layer_norm=conf.layer_norm, dtype=self.dtype)

        self.decoder = MultiDecoder(
            features_dim=self.features_dim, image_decoder=conf.image_decoder,
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
            transpose_impl=conf.get("conv_transpose_impl", "auto"),
            layer_norm=conf.layer_norm, dtype=self.dtype)

        self.core = RSSMCore(
            embed_dim=self.encoder.out_dim, action_dim=conf.action_dim,
            deter_dim=conf.deter_dim, stoch_dim=conf.stoch_dim,
            stoch_discrete=conf.stoch_discrete, hidden_dim=conf.hidden_dim,
            gru_layers=conf.gru_layers, gru_type=conf.gru_type,
            layer_norm=conf.layer_norm, dtype=self.dtype,
            scan_unroll=int(conf.get("scan_unroll", 1)))

        if conf.aux_critic:
            # Critic-only: the aux head's sole output is loss_critic, so no
            # actor params are created (init_critic) — the wm optimizer
            # carries no frozen-by-zero-grad actor MLP.
            self.ac_aux: Optional[ActorCritic] = ActorCritic(
                in_dim=self.features_dim, out_actions=conf.action_dim,
                layer_norm=conf.layer_norm, gamma=conf.gamma_aux,
                lambda_gae=conf.lambda_gae_aux, entropy_weight=conf.entropy,
                target_interval=conf.target_interval_aux,
                actor_grad=conf.actor_grad, actor_dist=conf.actor_dist,
                critic_features_grad=True,  # aux loss shapes the WM features
                dtype=self.dtype, gae_impl=conf.get("gae_impl", "scan"))
        else:
            self.ac_aux = None

    # -- params -----------------------------------------------------------

    def init(self, key: jax.Array) -> Dict[str, Any]:
        conf = self.conf
        obs = dummy_obs(conf, T=2, B=2)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        embed = jnp.zeros((2, 2, self.encoder.out_dim))
        state = self.init_state(2)
        params = {
            "encoder": self.encoder.init(k1, obs),
            "core": self.core.init(
                k2, embed, obs["action"], obs["reset"], state, k3, 1, False),
            "decoder": self.decoder.init(
                k4, jnp.zeros((2, 2, 1, self.features_dim)), obs),
        }
        if self.ac_aux is not None:
            params["ac_aux"] = self.ac_aux.init_critic(k5)
        return params

    def init_state(self, batch_size: int):
        return init_state(batch_size, self.deter_dim, self.stoch_dim, self.stoch_discrete)

    def zdistr(self, pp: jax.Array):
        if self.stoch_discrete:
            logits = pp.reshape(pp.shape[:-1] + (self.stoch_dim, self.stoch_discrete))
            return OneHotCategorical(logits, event_dims=1)
        return diag_normal(pp)

    # -- forward ----------------------------------------------------------

    def forward(self, params, obs, in_state, key):
        """Features + new state only (acting path) (reference: dreamer.py:289-295)."""
        embed = self.encoder.apply(params["encoder"], obs)
        _, _, _, features, _, out_state = self.core.apply(
            params["core"], embed, obs["action"], obs["reset"], in_state, key, 1, False)
        return features, out_state

    def training_step(self, params, obs, in_state, key,
                      iwae_samples: int = 1,
                      do_open_loop: bool = False,
                      do_image_pred: bool = False):
        """(reference: dreamer.py:297-396.) Returns
        (loss, features, states, out_state, metrics, tensors)."""
        I = iwae_samples
        k_rssm, k_pred = jax.random.split(key)

        embed = self.encoder.apply(params["encoder"], obs)
        prior, post, post_samples, features, states, out_state = self.core.apply(
            params["core"], embed, obs["action"], obs["reset"], in_state,
            k_rssm, I, do_open_loop)

        loss_reconstr, metrics, tensors = self.decoder.apply(
            params["decoder"], features, obs)

        # KL loss with balancing (reference: dreamer.py:328-343).
        dprior = self.zdistr(prior)
        dpost = self.zdistr(post)
        loss_kl_exact = dpost.kl_to(dprior)  # (T,B,I)
        if I == 1:
            if not self.kl_balance:
                loss_kl = loss_kl_exact
            else:
                loss_kl_postgrad = dpost.kl_to(self.zdistr(sg(prior)))
                loss_kl_priograd = self.zdistr(sg(post)).kl_to(dprior)
                loss_kl = ((1 - self.kl_balance) * loss_kl_postgrad
                           + self.kl_balance * loss_kl_priograd)
        else:
            # Sampled KL for the IWAE bound.
            z = post_samples.reshape(post.shape[:-1] + (self.stoch_dim, self.stoch_discrete)) \
                if self.stoch_discrete else post_samples
            loss_kl = dpost.log_prob(z) - dprior.log_prob(z)

        # Auxiliary critic on real data (reference: dreamer.py:345-358).
        if self.ac_aux is not None:
            features_tb = features[:, :, 0]
            loss_critic_aux, metrics_ac, tensors_ac = self.ac_aux.critic_training_step(
                params["ac_aux"], features_tb, obs["reward"], obs["terminal"])
            metrics.update(loss_critic_aux=metrics_ac["loss_critic"],
                           policy_value_aux=metrics_ac["policy_value_im"])
            tensors.update(policy_value_aux=tensors_ac["value"])
        else:
            loss_critic_aux = 0.0

        # Total: -logavgexp over IWAE samples (reference: dreamer.py:360-365).
        loss_model_tbi = self.kl_weight * loss_kl + loss_reconstr
        loss_model_tb = -logavgexp(-loss_model_tbi, axis=2)
        loss = loss_model_tb.mean() + self.aux_critic_weight * loss_critic_aux

        loss_kl_metric = -logavgexp(-sg(loss_kl_exact), axis=2)
        entropy_prior = sg(dprior.entropy()).mean(axis=2)
        entropy_post = sg(dpost.entropy()).mean(axis=2)
        tensors.update(loss_kl=loss_kl_metric, entropy_prior=entropy_prior,
                       entropy_post=entropy_post)
        metrics.update(loss_model=sg(loss_model_tb.mean()),
                       loss_kl=loss_kl_metric.mean(),
                       entropy_prior=entropy_prior.mean(),
                       entropy_post=entropy_post.mean())

        if do_image_pred:
            # Decode from prior samples for open-loop quality metrics
            # (reference: dreamer.py:383-394).
            prior_samples = self.zdistr(sg(prior)).sample(k_pred).reshape(post_samples.shape)
            features_prior = feature_replace_z(sg(features), prior_samples)
            _, mets, tens = self.decoder.apply(
                params["decoder"], features_prior, obs, True)
            metrics.update({k.replace("loss_", "logprob_"): v
                            for k, v in mets.items() if k.startswith("loss_")})
            tensors.update({k.replace("loss_", "logprob_"): v
                            for k, v in tens.items() if k.startswith("loss_")})
            tensors.update({k.replace("_rec", "_pred"): v
                            for k, v in tens.items() if k.endswith("_rec")})

        return loss, features, states, out_state, metrics, tensors


class Dreamer:
    """Top-level agent (reference: dreamer.py:19-229)."""

    def __init__(self, conf):
        assert conf.action_dim > 0, "Need to set action_dim to match environment"
        self.conf = conf
        self.dtype = compute_dtype(conf)
        self.iwae_samples = conf.iwae_samples
        self.imag_horizon = conf.imag_horizon
        self.probe_gradients = conf.probe_gradients
        self.features_dim = conf.deter_dim + conf.stoch_dim * (conf.stoch_discrete or 1)

        self.wm = WorldModel(conf)
        self.ac = ActorCritic(
            in_dim=self.features_dim, out_actions=conf.action_dim,
            layer_norm=conf.layer_norm, gamma=conf.gamma,
            lambda_gae=conf.lambda_gae, entropy_weight=conf.entropy,
            target_interval=conf.target_interval, actor_grad=conf.actor_grad,
            actor_dist=conf.actor_dist, dtype=self.dtype,
            gae_impl=conf.get("gae_impl", "scan"))
        self.probe = make_probe(conf, self.features_dim, self.dtype)

    # -- params / state ---------------------------------------------------

    def init(self, key: jax.Array) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        ac_params = self.ac.init(k2)
        return {
            "wm": self.wm.init(k1),
            "probe": self.probe.init(k3),
            "actor": ac_params["actor"],
            "critic": ac_params["critic"],
            "critic_target": ac_params["critic_target"],
        }

    def init_state(self, batch_size: int):
        return self.wm.init_state(batch_size)

    # -- inference (acting) ----------------------------------------------

    def inference(self, params, obs, in_state, key, eval_temperature: float = 1.0):
        """One acting step: obs (T=1,B,...) -> sampled action (1,B,A).

        (reference: dreamer.py:92-111 + generator NetworkPolicy sampling.)
        """
        obs = prepare_obs(obs)
        k_wm, k_act = jax.random.split(key)
        features, out_state = self.wm.forward(params["wm"], obs, in_state, k_wm)
        feature = features[:, :, 0]  # (1,B,F)
        action_distr = self.ac.forward_actor(params["actor"], feature)
        value = self.ac.forward_value(params["critic"], feature)
        action = action_distr.sample(k_act)
        # Per-slot (B,) metrics: the batched generator (VectorNetworkPolicy)
        # attributes them to each env's episode; B=1 callers float() them.
        metrics = dict(policy_value=value[0],
                       policy_entropy=action_distr.entropy()[0],
                       action_prob=jnp.exp(action_distr.log_prob(action))[0])
        return action, out_state, metrics

    # -- imagination ------------------------------------------------------

    def dream(self, params, in_state, imag_horizon: int,
              dynamics_gradients: bool, key: jax.Array):
        """H-step open-loop rollout through the prior with the policy.

        The world model is frozen via stop_gradient on its params — the JAX
        equivalent of ``wm.requires_grad_(False)`` (reference: dreamer.py:188-216).
        Returns (features (H+1,M,F), actions (H,M,A), rewards (H+1,M),
        terminals (H+1,M)).
        """
        wm_params = sg(params["wm"])
        actor_params = params["actor"]
        # NB: unlike the RSSM forward scan (rssm.py — pre-drawn noise wins
        # there), the dream scan draws its z noise per step INSIDE the scan:
        # the (H, M, S, K) noise tensor is ~90 MB at the flagship config and
        # streaming it through the scan cost more than it saved (measured on
        # chip: dream while-op 3.55 -> 4.0 ms/step with hoisted noise).
        # The in-scan bits instead come from the TPU's hardware generator
        # (`rbg` impl -> XLA RngBitGenerator): threefry spends ~20 VPU ops
        # per random word on the sequential critical path, the hardware RNG
        # ~none. Exploration noise needs no counter-exact stream; set
        # dream_rng: threefry to force the legacy path.
        if self.conf.get("dream_rng", "rbg") == "rbg":
            key = jax.random.wrap_key_data(
                jnp.tile(jax.random.key_data(key), 2), impl="rbg")
        keys = jax.random.split(key, imag_horizon)
        M = in_state[0].shape[0]

        def step(state, k):
            k_act, k_prior = jax.random.split(k)
            feature = to_feature(*state)
            action_dist = self.ac.forward_actor(actor_params, feature)
            action = (action_dist.rsample(k_act) if dynamics_gradients
                      else action_dist.sample(k_act))
            zn = draw_z_noise(k_prior, (M,),
                              self.wm.stoch_dim, self.wm.stoch_discrete)
            _, new_state = self.wm.core.apply(
                wm_params["core"], state, action, None, zn,
                method=RSSMCore.prior_step)
            return new_state, (feature, action)

        last_state, (features, actions) = jax.lax.scan(
            step, in_state, keys,
            unroll=min(int(self.conf.get("scan_unroll", 1)), imag_horizon))
        features = jnp.concatenate([features, to_feature(*last_state)[None]], 0)

        rewards, terminals = self.wm.decoder.apply(
            wm_params["decoder"], features,
            method=MultiDecoder.reward_terminal)
        return features, actions, rewards, terminals

    # -- training ---------------------------------------------------------

    def training_step(self, params, obs, in_state, key,
                      iwae_samples: Optional[int] = None,
                      imag_horizon: Optional[int] = None,
                      do_open_loop: bool = False,
                      do_image_pred: bool = False,
                      do_dream_tensors: bool = False):
        """One fused forward (reference: dreamer.py:113-186).

        Returns (losses, out_state, metrics, tensors, dream_tensors) where
        losses = {loss_model, loss_probe, loss_actor, loss_critic}.
        """
        obs = prepare_obs(obs)
        I = int(iwae_samples or self.iwae_samples)
        H = int(imag_horizon or self.imag_horizon)
        T, B = obs["action"].shape[:2]
        k_wm, k_dream, k_dream_log = jax.random.split(key, 3)

        # World model.
        loss_model, features, states, out_state, metrics, tensors = \
            self.wm.training_step(params["wm"], obs, in_state, k_wm,
                                  iwae_samples=I, do_open_loop=do_open_loop,
                                  do_image_pred=do_image_pred)

        # Probe (stop-gradient features unless probe_gradients).
        features_probe = features if self.probe_gradients else sg(features)
        loss_probe, metrics_probe, tensors_probe = self.probe.training_step(
            params["probe"], features_probe, obs)
        metrics.update(metrics_probe)
        tensors.update(tensors_probe)

        # Imagination + actor-critic.
        in_state_dream = jax.tree_util.tree_map(
            lambda x: sg(x).reshape((-1,) + x.shape[3:]), states)  # (T,B,I,..)->(TBI,..)
        dynamics = self.ac.actor_grad == "dynamics"
        features_dream, actions_dream, rewards_dream, terminals_dream = \
            self.dream(params, in_state_dream, H, dynamics, k_dream)
        if not dynamics:
            # reinforce: all dream tensors detached (reference: dreamer.py:154-157)
            features_dream = sg(features_dream)
            actions_dream = sg(actions_dream)
            rewards_dream = sg(rewards_dream)
            terminals_dream = sg(terminals_dream)
        ac_params = {"actor": params["actor"], "critic": params["critic"],
                     "critic_target": params["critic_target"]}
        (loss_actor, loss_critic), metrics_ac, tensors_ac = self.ac.training_step(
            ac_params, features_dream, actions_dream, rewards_dream, terminals_dream)
        metrics.update(metrics_ac)
        tensors.update(policy_value=unflatten_batch(
            tensors_ac["value"][0], (T, B, I)).mean(-1))

        # Dream log sample: H=T-1 rollout from the first state, aligned with
        # the real batch for side-by-side npz logging (reference: dreamer.py:163-180).
        dream_tensors = {}
        if do_dream_tensors and self.conf.image_decoder:
            in_state_log = jax.tree_util.tree_map(lambda x: sg(x)[0, :, 0], states)
            f_d, a_d, r_d, t_d = self.dream(sg(params), in_state_log, T - 1, False, k_dream_log)
            image_dream = self.wm.decoder.apply(
                sg(params["wm"])["decoder"], f_d, method=MultiDecoder.image_forward)
            _, _, tens_ac = self.ac.training_step(
                sg(ac_params), f_d, a_d, r_d, t_d, log_only=True)
            dream_tensors = dict(
                action_pred=jnp.concatenate([obs["action"][:1], a_d]),
                reward_pred=r_d, terminal_pred=t_d, image_pred=image_dream,
                **tens_ac)

        losses = dict(loss_model=loss_model, loss_probe=loss_probe,
                      loss_actor=loss_actor, loss_critic=loss_critic)
        return losses, out_state, metrics, tensors, dream_tensors
