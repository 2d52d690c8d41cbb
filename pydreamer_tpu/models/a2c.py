"""Actor-critic trained on imagined rollouts (GAE advantage, target critic).

Counterpart of the reference ActorCritic (reference: pydreamer/models/a2c.py):
  * actor/critic = 4-layer 400-wide MLPs (a2c.py:36-39)
  * frozen ``critic_target`` refreshed every ``target_interval`` steps — here
    the copy is a ``lax.cond`` inside the jitted train step (a2c.py:77-79,151-152)
  * GAE advantage — the reference's reversed Python loop (a2c.py:88-103) is a
    single reversed ``lax.scan``
  * ``reality_weight`` = cumprod(1-terminal) masks post-terminal imagination
    (a2c.py:108)
  * actor loss: reinforce(-logpi * adv_gae) or dynamics(-value_target)
    + entropy bonus (a2c.py:117-131)
  * action distributions: onehot / normal_tanh / tanh_normal (a2c.py:43-55)

Divergence (fix): in dynamics mode the gradient path from value_target back
through the imagined rewards/states into the actor is kept alive (the world
model is frozen with stop_gradient by the caller); the reference detaches all
dream tensors which silently cuts dynamics gradients.

Sequence convention (a2c.py:68-75):
    features[0] -> actions[0] -> rewards[1], terminals[1], features[1] -> ...
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .distributions import (OneHotCategorical, normal_tanh, tanh_normal,
                            trunc_normal)
from .modules import MLP

__all__ = ["ActorCritic", "gae_advantage"]

sg = jax.lax.stop_gradient


def gae_advantage(advantage: jax.Array, terminal1: jax.Array,
                  gamma: float, lambda_: float, impl: str = "scan") -> jax.Array:
    """Generalized advantage estimation via reversed scan.

    advantage_gae[t] = adv[t] + (gamma*lambda)*(1-terminal1[t])*advantage_gae[t+1]

    impl (identical math, perf knob — PERF.md r5):
      * 'scan'     — lax.scan(reverse=True, unroll=H). Even fully
                     unrolled, the scan lowering materializes a runtime
                     `reverse` of the stacked inputs/outputs (~0.4 ms/step
                     in the r4 per-op audit).
      * 'unrolled' — hand-unrolled Python loop over the static H; the
                     reversal is pure trace-time operand ordering, no
                     runtime reverse op.
    """
    if impl == "unrolled":
        h = advantage.shape[0]
        agae_next = jnp.zeros_like(advantage[-1])
        out = [None] * h
        for t in range(h - 1, -1, -1):
            agae_next = (advantage[t]
                         + lambda_ * gamma * (1.0 - terminal1[t]) * agae_next)
            out[t] = agae_next
        return jnp.stack(out)

    def step(agae_next, x):
        adv, term = x
        agae = adv + lambda_ * gamma * (1.0 - term) * agae_next
        return agae, agae

    # Fully unrolled: H is small (15) and the body is a handful of VPU ops,
    # so the loop overhead dwarfs the work; unrolling lets XLA fuse all H
    # steps into one kernel.
    _, agae = jax.lax.scan(step, jnp.zeros_like(advantage[-1]),
                           (advantage, terminal1), reverse=True,
                           unroll=advantage.shape[0])
    return agae


class ActorCritic:
    """Pure-functional actor-critic: params are passed explicitly.

    Param tree layout: {'actor': ..., 'critic': ..., 'critic_target': ...};
    the caller owns optimizer partitioning and the periodic target copy.
    """

    def __init__(self, in_dim: int, out_actions: int,
                 hidden_dim: int = 400, hidden_layers: int = 4,
                 layer_norm: bool = True, gamma: float = 0.999,
                 lambda_gae: float = 0.95, entropy_weight: float = 1e-3,
                 target_interval: int = 100, actor_grad: str = "reinforce",
                 actor_dist: str = "onehot",
                 critic_features_grad: bool = False, dtype=jnp.float32,
                 gae_impl: str = "scan"):
        self.in_dim = in_dim
        self.out_actions = out_actions
        self.gamma = gamma
        self.lambda_ = lambda_gae
        self.entropy_weight = entropy_weight
        self.target_interval = target_interval
        self.actor_grad = actor_grad
        self.actor_dist = actor_dist
        self.gae_impl = gae_impl
        # Let the critic MSE backprop into the input features. False for the
        # imagination AC (loss_critic must touch only the critic subtree);
        # True for the auxiliary critic, whose purpose is shaping world-model
        # features from real data (reference: dreamer.py:345-358 + a2c.py:113
        # — there the aux loss reaches the WM because features arrive
        # non-detached).
        self.critic_features_grad = critic_features_grad
        actor_out_dim = out_actions if actor_dist == "onehot" else 2 * out_actions
        self.actor = MLP(actor_out_dim, hidden_dim, hidden_layers, layer_norm, dtype=dtype)
        self.critic = MLP(1, hidden_dim, hidden_layers, layer_norm, dtype=dtype)

    def init(self, key: jax.Array) -> Dict[str, Any]:
        ka, kc = jax.random.split(key)
        x = jnp.zeros((1, self.in_dim))
        critic_params = self.critic.init(kc, x)
        return {
            "actor": self.actor.init(ka, x),
            "critic": critic_params,
            "critic_target": jax.tree_util.tree_map(jnp.copy, critic_params),
        }

    def init_critic(self, key: jax.Array) -> Dict[str, Any]:
        """Critic-only param tree, for the auxiliary critic (whose actor loss
        is never used — only loss_critic reaches the world-model total,
        reference: dreamer.py:345-358). Avoids carrying a frozen-by-zero-grad
        actor MLP in the wm optimizer."""
        x = jnp.zeros((1, self.in_dim))
        critic_params = self.critic.init(key, x)
        return {
            "critic": critic_params,
            "critic_target": jax.tree_util.tree_map(jnp.copy, critic_params),
        }

    def _critic_losses(self, params, features, rewards, terminals):
        """Critic half of the loss: GAE targets from the frozen target net +
        reality-weighted MSE regression.

        Gradients must never reach the critic_target PARAMS (sg on the param
        tree — the optimizer additionally labels the subtree frozen), but
        they DO flow through the FEATURES: in dynamics mode that is the whole
        policy-gradient path (loss_policy = -value_target -> features ->
        dream -> actor). In reinforce mode the caller passes detached
        features, so this is equivalent to the reference (a2c.py:88 on
        pre-detached inputs).
        """
        reward1 = rewards[1:]        # (H,M)
        terminal0 = terminals[:-1]
        terminal1 = terminals[1:]
        value_t = self.critic.apply(sg(params["critic_target"]), features)
        value0t = value_t[:-1]
        value1t = value_t[1:]
        advantage = -value0t + reward1 + self.gamma * (1.0 - terminal1) * value1t
        advantage_gae = gae_advantage(advantage, terminal1, self.gamma,
                                      self.lambda_, impl=self.gae_impl)
        value_target = advantage_gae + value0t

        # reality_weight[i] = prod_{j<=i} (1-terminal[j]) — masks imagination
        # that continued past a predicted episode end.
        reality_weight = sg(jnp.cumprod(1.0 - terminal0, axis=0))

        # Critic regression to detached GAE value target. Features are
        # stop-gradiented unless this is an auxiliary critic meant to shape
        # the world model (critic_features_grad).
        feat_v = features if self.critic_features_grad else sg(features)
        value = self.critic.apply(params["critic"], feat_v)
        loss_critic = 0.5 * jnp.square(sg(value_target) - value[:-1])
        loss_critic = (loss_critic * reality_weight).mean()
        return (loss_critic, value, value_target, advantage, advantage_gae,
                reality_weight)

    def critic_training_step(self,
                             params: Dict[str, Any],
                             features: jax.Array,   # (J,M,F)
                             rewards: jax.Array,    # (J,M)
                             terminals: jax.Array,  # (J,M)
                             ) -> Tuple[jax.Array, Dict, Dict]:
        """Critic-only training step for the auxiliary critic on real data
        (reference: dreamer.py:345-358 — only its critic loss is used)."""
        loss_critic, value, *_ = self._critic_losses(
            params, features, rewards, terminals)
        metrics = dict(loss_critic=sg(loss_critic),
                       policy_value_im=sg(value[:-1].mean()))
        tensors = dict(value=sg(value))
        return loss_critic, metrics, tensors

    def forward_actor(self, actor_params, features: jax.Array):
        y = self.actor.apply(actor_params, features).astype(jnp.float32)
        if self.actor_dist == "onehot":
            return OneHotCategorical(y)
        if self.actor_dist == "normal_tanh":
            return normal_tanh(y)
        if self.actor_dist == "tanh_normal":
            return tanh_normal(y)
        if self.actor_dist == "trunc_normal":
            return trunc_normal(y)
        raise ValueError(f"unknown actor_dist {self.actor_dist!r}")

    def forward_value(self, critic_params, features: jax.Array) -> jax.Array:
        return self.critic.apply(critic_params, features)

    def training_step(self,
                      params: Dict[str, Any],
                      features: jax.Array,   # (J,M,F) J=H+1
                      actions: jax.Array,    # (H,M,A)
                      rewards: jax.Array,    # (J,M)
                      terminals: jax.Array,  # (J,M)
                      log_only: bool = False,
                      ) -> Tuple[Tuple[jax.Array, jax.Array], Dict, Dict]:
        # log_only is kept for call-site parity with the reference, where it
        # gates the critic_target refresh (a2c.py:76-79). Here that refresh
        # lives in TrainStep (training/train_step.py), so the flag changes
        # nothing: callers on the log path discard the losses and keep the
        # diagnostic tensors.
        del log_only
        reward1 = rewards[1:]        # (H,M)
        (loss_critic, value, value_target, advantage, advantage_gae,
         reality_weight) = self._critic_losses(params, features, rewards, terminals)
        value0 = value[:-1]

        # Actor loss.
        if self.actor_grad == "reinforce":
            policy_distr = self.forward_actor(params["actor"], sg(features[:-1]))
            action_logprob = policy_distr.log_prob(sg(actions))
            loss_policy = -action_logprob * sg(advantage_gae)
        elif self.actor_grad == "dynamics":
            # Features stay live: the entropy and value terms backprop
            # through the imagined states into the actor (WM params are
            # frozen by the caller's stop_gradient in dream()).
            policy_distr = self.forward_actor(params["actor"], features[:-1])
            loss_policy = -value_target
        else:
            raise ValueError(f"unknown actor_grad {self.actor_grad!r}")

        policy_entropy = policy_distr.entropy()
        loss_actor = loss_policy - self.entropy_weight * policy_entropy
        loss_actor = (loss_actor * reality_weight).mean()

        metrics = dict(
            loss_critic=sg(loss_critic),
            loss_actor=sg(loss_actor),
            policy_entropy=sg(policy_entropy.mean()),
            policy_value=sg(value0[0].mean()),      # value of real states
            policy_value_im=sg(value0.mean()),      # value of imagined states
            policy_reward=sg(reward1.mean()),
            policy_reward_std=sg(reward1.std()),
        )
        tensors = dict(
            value=sg(value),
            value_target=sg(value_target),
            value_advantage=sg(advantage),
            value_advantage_gae=sg(advantage_gae),
            value_weight=reality_weight,
        )
        return (loss_actor, loss_critic), metrics, tensors
