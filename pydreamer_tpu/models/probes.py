"""Probe heads: stop-gradient diagnostic decoders on world-model features.

Counterpart of the reference probes (reference: pydreamer/models/probes.py):
  * ``MapProbeHead``  — (features, map_coord) -> categorical global-map decoder
    with accuracy / seen-mask-accuracy metrics (probes.py:32-86)
  * ``GoalsProbe``    — normal decoders for goal directions with
    MSE-by-visibility-age metrics (probes.py:89-137)
  * ``MapGoalsProbe`` — both (probes.py:15-29)
  * ``NoProbeHead``   — dummy parameter so the probe optimizer is non-empty
    (probes.py:140-150)

Each probe exposes ``init(key, features_dim, obs)`` and
``training_step(params, features, obs) -> (loss, metrics, tensors)``; the
caller detaches features unless ``probe_gradients`` is on.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .decoders import CatImageDecoder, DenseNormalDecoder
from .functions import insert_dim, nanmean

__all__ = ["MapProbeHead", "GoalsProbe", "MapGoalsProbe", "NoProbeHead", "make_probe"]

sg = jax.lax.stop_gradient


class MapProbeHead:
    """Predict the global map from features + 4-dim map_coord."""

    def __init__(self, map_state_dim: int, conf, dtype=jnp.float32):
        if conf.map_decoder != "dense":
            raise NotImplementedError(f"map_decoder={conf.map_decoder}")
        self.decoder = CatImageDecoder(
            in_dim=map_state_dim,
            out_shape=(conf.map_size, conf.map_size, conf.map_channels),
            hidden_dim=conf.map_hidden_dim,
            hidden_layers=conf.map_hidden_layers,
            layer_norm=conf.layer_norm,
            dtype=dtype)
        self.map_state_dim = map_state_dim

    def init(self, key: jax.Array) -> Any:
        feat = jnp.zeros((1, 1, 1, self.map_state_dim))
        tgt = jnp.zeros((1, 1) + tuple(self.decoder.out_shape)[:2], jnp.int32)
        return self.decoder.init(key, feat, tgt, method=CatImageDecoder.training_step)

    def training_step(self, params, features, obs):
        I = features.shape[2]
        map_coord = insert_dim(obs["map_coord"], 2, I)
        map_features = jnp.concatenate([features, map_coord.astype(features.dtype)], -1)
        _, loss, map_pred = self.decoder.apply(
            params, map_features, obs["map"], method=CatImageDecoder.training_step)

        map_pred = sg(map_pred)
        acc_map = self.accuracy(map_pred, obs["map"])
        tensors = dict(map_rec=map_pred, loss_map=sg(loss), acc_map=acc_map)
        metrics = dict(loss_map=sg(loss.mean()), acc_map=nanmean(acc_map))
        if "map_seen_mask" in obs:
            metrics["acc_map_seen"] = nanmean(
                self.accuracy(map_pred, obs["map"], obs["map_seen_mask"]))
        return loss.mean(), metrics, tensors

    @staticmethod
    def accuracy(output, target, map_seen_mask=None):
        """Per-(T,B) pixel accuracy; class axis is LAST (NHWC layout)."""
        if output.ndim == target.ndim:
            target = jnp.argmax(target, axis=-1)
        acc = (jnp.argmax(output, axis=-1) == target)
        if map_seen_mask is None:
            return acc.astype(jnp.float32).mean(axis=(-1, -2))
        m = map_seen_mask.astype(jnp.float32)
        return (acc * m).sum(axis=(-1, -2)) / m.sum(axis=(-1, -2))


class GoalsProbe:
    """Predict goal directions; MSE metrics bucketed by goal visibility age."""

    LOG_RANGES = (-1, 0, 5, 10, 50, 200, 1000)

    def __init__(self, state_dim: int, conf, dtype=jnp.float32):
        self.state_dim = state_dim
        self.goals_size = conf.goals_size
        self.decoders = {
            "goal_direction": DenseNormalDecoder(state_dim, out_dim=2, hidden_layers=4,
                                                 layer_norm=True, dtype=dtype),
            "goals_direction": DenseNormalDecoder(state_dim, out_dim=conf.goals_size * 2,
                                                  hidden_layers=4, layer_norm=True,
                                                  dtype=dtype),
        }

    def init(self, key: jax.Array) -> Any:
        params = {}
        for i, (name, dec) in enumerate(self.decoders.items()):
            feat = jnp.zeros((1, 1, 1, self.state_dim))
            tgt = jnp.zeros((1, 1, dec.out_dim))
            params[name] = dec.init(jax.random.fold_in(key, i), feat, tgt,
                                    method=DenseNormalDecoder.training_step)
        return params

    def training_step(self, params, features, obs):
        loss_total = 0.0
        metrics: Dict[str, jax.Array] = {}
        tensors: Dict[str, jax.Array] = {}
        for name, dec in self.decoders.items():
            _, loss, pred = dec.apply(params[name], features, obs[name],
                                      method=DenseNormalDecoder.training_step)
            loss_total = loss_total + loss.mean()
            metrics[f"loss_{name}"] = sg(loss.mean())
            tensors[f"loss_{name}"] = sg(loss)
            tensors[f"{name}_pred"] = sg(pred)

        goals = obs["goals_direction"]
        pred = tensors["goals_direction_pred"]
        mse_per_coord = jnp.square(goals - pred)                   # (T,B,2G)
        mse_per_goal = mse_per_coord.reshape(
            mse_per_coord.shape[:-1] + (-1, 2)).sum(-1)            # (T,B,G)
        metrics["mse_goals"] = mse_per_goal.mean(-1).mean()

        var_per_coord = jnp.var(goals.reshape((-1, goals.shape[-1])), axis=0)
        metrics["var_goals"] = var_per_coord.reshape((-1, 2)).sum(-1).mean()

        visage = obs.get("goals_visage")
        if visage is not None:
            for i in range(1, len(self.LOG_RANGES)):
                vmin = self.LOG_RANGES[i - 1] + 1
                vmax = self.LOG_RANGES[i]
                mask = ((vmin <= visage) & (visage <= vmax)).astype(jnp.float32)
                metrics[f"mse_goal_age{vmax}"] = nanmean(mse_per_goal * mask / mask)
        return loss_total, metrics, tensors


class MapGoalsProbe:
    """MapProbeHead + GoalsProbe combined (reference: probes.py:15-29)."""

    def __init__(self, state_dim: int, conf, dtype=jnp.float32):
        self.map_probe = MapProbeHead(state_dim + 4, conf, dtype)
        self.goals_probe = GoalsProbe(state_dim, conf, dtype)

    def init(self, key: jax.Array) -> Any:
        k1, k2 = jax.random.split(key)
        return {"map": self.map_probe.init(k1), "goals": self.goals_probe.init(k2)}

    def training_step(self, params, features, obs):
        loss_m, met_m, ten_m = self.map_probe.training_step(params["map"], features, obs)
        loss_g, met_g, ten_g = self.goals_probe.training_step(params["goals"], features, obs)
        return loss_m + loss_g, {**met_m, **met_g}, {**ten_m, **ten_g}


class NoProbeHead:
    """Dummy probe with one parameter so the probe optimizer has state."""

    def init(self, key: jax.Array) -> Any:
        return {"dummy": jnp.zeros((1,), jnp.float32)}

    def training_step(self, params, features, obs):
        return jnp.square(params["dummy"]).sum(), {}, {}


def make_probe(conf, features_dim: int, dtype=jnp.float32):
    """Probe factory (reference: dreamer.py:47-56)."""
    if conf.probe_model == "map":
        return MapProbeHead(features_dim + 4, conf, dtype)
    if conf.probe_model == "goals":
        return GoalsProbe(features_dim, conf, dtype)
    if conf.probe_model == "map+goals":
        return MapGoalsProbe(features_dim, conf, dtype)
    if conf.probe_model == "none":
        return NoProbeHead()
    raise NotImplementedError(f"Unknown probe_model={conf.probe_model}")
