"""Shared test helpers: tiny configs and synthetic batches."""

import numpy as np

from pydreamer_tpu.conf import Conf

# A minimal, fast config exercising the full Dreamer stack (RSSM + CNN
# encoder/decoder + AC). Mirrors the shape of config/defaults.yaml.
BASE = dict(
    # features
    image_key="image", image_size=64, image_channels=3, image_categorical=False,
    action_dim=4, clip_rewards=None, vecobs_size=0,
    # probe features
    map_key=None, map_size=0, map_channels=0, map_categorical=True, goals_size=0,
    # model
    model="dreamer", deter_dim=64, stoch_dim=8, stoch_discrete=8, hidden_dim=64,
    gru_layers=1, gru_type="gru", layer_norm=True,
    image_encoder="cnn", cnn_depth=8, image_encoder_layers=0,
    image_decoder="cnn", image_decoder_layers=0, image_decoder_min_prob=0.0,
    reward_input=False, reward_decoder_layers=2, reward_decoder_categorical=None,
    terminal_decoder_layers=2,
    # probe
    probe_model="none", probe_gradients=False,
    map_decoder="dense", map_hidden_layers=2, map_hidden_dim=64,
    # training
    iwae_samples=1, kl_balance=0.8, kl_weight=1.0,
    image_weight=1.0, vecobs_weight=1.0, reward_weight=1.0, terminal_weight=1.0,
    adam_lr=3e-4, adam_lr_actor=1e-4, adam_lr_critic=1e-4, adam_eps=1e-5,
    keep_state=True, batch_length=6, batch_size=2,
    grad_clip=200.0, grad_clip_ac=200.0, precision="float32",
    # actor-critic
    gamma=0.99, lambda_gae=0.95, entropy=1e-3, target_interval=100,
    imag_horizon=5, actor_grad="reinforce", actor_dist="onehot",
    # aux critic
    aux_critic=False, aux_critic_weight=1.0, gamma_aux=0.99,
    lambda_gae_aux=0.95, target_interval_aux=1000,
)


def make_conf(**over) -> Conf:
    d = dict(BASE)
    d.update(over)
    return Conf(d)


def make_batch(conf, T=None, B=None, seed=0):
    """Synthetic observation batch in the canonical data contract."""
    rng = np.random.RandomState(seed)
    T = T or conf.batch_length
    B = B or conf.batch_size
    obs = {
        "action": np.eye(conf.action_dim, dtype=np.float32)[
            rng.randint(0, conf.action_dim, (T, B))],
        "reward": rng.randn(T, B).astype(np.float32),
        "terminal": np.zeros((T, B), np.float32),
        "reset": np.zeros((T, B), bool),
    }
    obs["reset"][0, :] = True
    if conf.image_encoder:
        if conf.image_categorical:
            idx = rng.randint(0, conf.image_channels, (T, B, conf.image_size, conf.image_size))
            obs["image"] = np.eye(conf.image_channels, dtype=np.float32)[idx]
        else:
            obs["image"] = rng.rand(
                T, B, conf.image_size, conf.image_size, conf.image_channels
            ).astype(np.float32) - 0.5
    if conf.vecobs_size:
        obs["vecobs"] = rng.randn(T, B, conf.vecobs_size).astype(np.float32)
    if conf.probe_model in ("map", "map+goals"):
        obs["map"] = rng.randint(0, conf.map_channels,
                                 (T, B, conf.map_size, conf.map_size)).astype(np.int32)
        obs["map_coord"] = rng.rand(T, B, 4).astype(np.float32)
    if conf.probe_model in ("goals", "map+goals"):
        obs["goal_direction"] = rng.randn(T, B, 2).astype(np.float32)
        obs["goals_direction"] = rng.randn(T, B, conf.goals_size * 2).astype(np.float32)
        obs["goals_visage"] = rng.randint(0, 100, (T, B, conf.goals_size)).astype(np.float32)
    return obs
