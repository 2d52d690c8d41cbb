"""Baseline world-model tests: VAE / GRU-VAE / Transformer-VAE / GRU-probe."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util import make_conf, make_batch

from pydreamer_tpu.models.baselines import WorldModelProbe


def baseline_conf(model, **over):
    return make_conf(
        model=model, image_encoder="dense", image_decoder="dense",
        image_categorical=True, image_channels=5, image_size=7,
        image_encoder_layers=2, image_decoder_layers=2,
        deter_dim=32, stoch_dim=8, stoch_discrete=0, hidden_dim=32,
        batch_length=6, batch_size=2,
        probe_model="map", map_size=5, map_channels=6,
        map_hidden_layers=2, map_hidden_dim=32,
        **over)


def add_action_next(obs):
    obs = dict(obs)
    obs["action_next"] = jnp.concatenate(
        [obs["action"][1:], jnp.zeros_like(obs["action"][:1])])
    return obs


@pytest.mark.parametrize("model_name", ["vae", "gru_vae", "transformer_vae", "gru_probe"])
def test_baseline_training_step(model_name):
    conf = baseline_conf(model_name)
    model = WorldModelProbe(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = add_action_next({k: jnp.asarray(v) for k, v in make_batch(conf).items()})
    state = model.init_state(conf.batch_size)
    losses, out_state, metrics, tensors, _ = model.training_step(
        params, obs, state, jax.random.PRNGKey(1))
    assert set(losses) == {"loss_model", "loss_probe"}
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k
    assert "loss_map" in metrics  # probe ran
    if model_name in ("gru_vae", "gru_probe"):
        assert out_state.shape == (conf.batch_size, conf.deter_dim)


@pytest.mark.parametrize("model_name", ["vae", "gru_vae", "transformer_vae"])
def test_baseline_iwae_multisample(model_name):
    """Baselines must run with iwae_samples > 1 (the trainer allocates a
    B*I state and eval uses eval_samples; regression: (B,) reset mask vs
    (B*I, D) state broadcast crash in GRUVAEWorldModel)."""
    I = 3
    conf = baseline_conf(model_name, iwae_samples=I)
    model = WorldModelProbe(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = add_action_next({k: jnp.asarray(v) for k, v in make_batch(conf).items()})
    state = model.init_state(conf.batch_size * I)
    losses, out_state, metrics, tensors, _ = model.training_step(
        params, obs, state, jax.random.PRNGKey(1))
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k
    if model_name == "gru_vae":
        assert out_state.shape == (conf.batch_size * I, conf.deter_dim)
        # image_pred path at I>1 too
        _, _, _, tensors2, _ = model.training_step(
            params, obs, state, jax.random.PRNGKey(2), do_image_pred=True)
        assert "image_pred" in tensors2
    """loss_model only reaches wm; loss_probe only reaches probe."""
    conf = baseline_conf("vae")
    model = WorldModelProbe(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = add_action_next({k: jnp.asarray(v) for k, v in make_batch(conf).items()})
    state = model.init_state(conf.batch_size)

    def loss(p, which):
        losses, *_ = model.training_step(p, obs, state, jax.random.PRNGKey(1))
        return losses[which]

    g = jax.grad(lambda p: loss(p, "loss_model"))(params)
    s = lambda t: float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), t, 0.0))
    assert s(g["wm"]) > 0 and s(g["probe"]) == 0
    g = jax.grad(lambda p: loss(p, "loss_probe"))(params)
    assert s(g["probe"]) > 0 and s(g["wm"]) == 0


def test_vae_image_pred():
    conf = baseline_conf("vae")
    model = WorldModelProbe(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = add_action_next({k: jnp.asarray(v) for k, v in make_batch(conf).items()})
    _, _, metrics, tensors, _ = model.training_step(
        params, obs, model.init_state(conf.batch_size), jax.random.PRNGKey(1),
        do_image_pred=True)
    assert "image_pred" in tensors
