"""Feature-matrix tests: config options that change the model graph.

Covers the reference's advertised feature set (README.md:21-47): GRU cell
variants, continuous-action policies, categorical reward decoder, reward
input planes, vecobs-only envs, auxiliary critic, IWAE multisampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util import make_conf, make_batch

from pydreamer_tpu.models.dreamer import Dreamer


def tiny(**over):
    base = dict(
        deter_dim=32, stoch_dim=4, stoch_discrete=4, hidden_dim=32,
        cnn_depth=4, batch_length=5, batch_size=2, imag_horizon=2,
        reward_decoder_layers=1, terminal_decoder_layers=1)
    base.update(over)
    return make_conf(**base)


def run_step(conf, seed=0):
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(seed))
    obs = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    losses, out_state, metrics, tensors, _ = model.training_step(
        params, obs, state, jax.random.PRNGKey(seed + 1))
    for k, v in losses.items():
        assert np.isfinite(np.asarray(v)), k
    return losses, metrics, tensors


@pytest.mark.parametrize("gru_type", ["gru", "gru_layernorm", "gru_layernorm_dv2"])
def test_gru_cell_variants(gru_type):
    run_step(tiny(gru_type=gru_type))


def test_gru_stack_layers():
    run_step(tiny(gru_layers=2))


def test_no_layer_norm():
    run_step(tiny(layer_norm=False))


@pytest.mark.parametrize("actor_dist", ["normal_tanh", "tanh_normal"])
def test_continuous_policies(actor_dist):
    losses, metrics, _ = run_step(tiny(
        actor_dist=actor_dist, stoch_discrete=0, action_dim=4))
    assert np.isfinite(float(metrics["policy_entropy"]))


def test_gaussian_latents():
    """stoch_discrete=0 -> diag-gaussian latent space."""
    run_step(tiny(stoch_discrete=0))


def test_categorical_reward_decoder():
    losses, metrics, tensors = run_step(tiny(
        reward_decoder_categorical=[-1.0, 0.0, 1.0]))
    assert "loss_reward" in metrics


def test_reward_input_planes():
    run_step(tiny(reward_input=True))


def test_vecobs_only():
    """CartPole-style: no image branch at all (config `vectorenv`)."""
    conf = tiny(image_encoder=None, image_decoder=None, image_key=None,
                vecobs_size=4)
    losses, metrics, _ = run_step(conf)
    assert "loss_vecobs" in metrics
    assert "loss_image" not in metrics


def test_image_plus_vecobs():
    losses, metrics, _ = run_step(tiny(vecobs_size=3))
    assert "loss_image" in metrics and "loss_vecobs" in metrics


def test_aux_critic():
    losses, metrics, tensors = run_step(tiny(aux_critic=True))
    assert "loss_critic_aux" in metrics
    assert "policy_value_aux" in metrics


def test_aux_critic_shapes_world_model():
    """The aux critic loss must backprop into WM features (its entire point,
    reference: dreamer.py:345-358); switching it on changes the encoder/core
    gradients of loss_model."""
    conf = tiny(aux_critic=True)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    state = model.init_state(conf.batch_size)

    def wm_grads(weight):
        m = Dreamer(tiny(aux_critic=True, aux_critic_weight=weight))

        def loss_fn(p):
            losses, *_ = m.training_step(p, obs, state, jax.random.PRNGKey(1))
            return losses["loss_model"]
        g = jax.grad(loss_fn)(params)
        return np.concatenate([np.asarray(x).ravel() for x in
                               jax.tree_util.tree_leaves(g["wm"]["core"])])

    g0, g1 = wm_grads(0.0), wm_grads(1.0)
    assert not np.allclose(g0, g1), \
        "aux critic loss does not reach the world model"
    # ...but it must never touch the aux target net.
    def loss_fn(p):
        losses, *_ = model.training_step(p, obs, state, jax.random.PRNGKey(1))
        return losses["loss_model"]
    g = jax.grad(loss_fn)(params)
    tgt = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)),
        g["wm"]["ac_aux"]["critic_target"], 0.0))
    assert tgt == 0.0


def test_aux_critic_target_refresh():
    """TrainStep refreshes wm/ac_aux/critic_target every target_interval_aux
    steps (reference: the aux AC self-refreshes, a2c.py:76-79)."""
    from pydreamer_tpu.training.train_step import TrainStep
    conf = tiny(aux_critic=True, target_interval=1000, target_interval_aux=3)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    ts = TrainStep(model, conf, donate=False)
    opt_state = ts.init_optimizer(params)
    obs = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    state = model.init_state(conf.batch_size)

    def flat(v):
        return np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree_util.tree_leaves(v)])

    p, o = params, opt_state
    for i in (1, 2):
        p, o, _, _, _, _ = ts(p, o, obs, state, i, jax.random.PRNGKey(i))
    # aux critic drifted away from its target
    assert not np.allclose(flat(p["wm"]["ac_aux"]["critic"]),
                           flat(p["wm"]["ac_aux"]["critic_target"]))
    critic_before = flat(p["wm"]["ac_aux"]["critic"])
    # step 3 (3 % 3 == 0): target <- critic BEFORE the update
    p, o, _, _, _, _ = ts(p, o, obs, state, 3, jax.random.PRNGKey(3))
    np.testing.assert_allclose(flat(p["wm"]["ac_aux"]["critic_target"]),
                               critic_before, rtol=1e-6)


def test_iwae_multisample_bound():
    """IWAE bound with I=4 should be <= single-sample ELBO (tighter)."""
    conf = tiny(iwae_samples=4)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    state4 = model.init_state(conf.batch_size * 4)
    losses4, _, m4, _, _ = model.training_step(
        params, obs, state4, jax.random.PRNGKey(1), iwae_samples=4)
    assert np.isfinite(float(losses4["loss_model"]))
    # exact-KL metric is still logged under IWAE (reference: dreamer.py:370)
    assert np.isfinite(float(m4["loss_kl"]))


def test_probe_gradients_mode():
    """probe_gradients=True routes probe loss into the WM optimizer group."""
    conf = tiny(probe_gradients=True)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    state = model.init_state(conf.batch_size)

    from pydreamer_tpu.training.train_step import make_optimizer_labels
    labels = make_optimizer_labels(params, probe_gradients=True)
    assert labels["probe"] == "wm"

    # features NOT stop-gradiented: probe loss reaches wm params
    def loss(p):
        losses, *_ = model.training_step(p, obs, state, jax.random.PRNGKey(1))
        return losses["loss_probe"]
    # probe_model='none' has a dummy param; use map probe for a real path
    conf2 = tiny(probe_gradients=True, probe_model="map", map_size=4,
                 map_channels=5, map_hidden_layers=1, map_hidden_dim=16)
    model2 = Dreamer(conf2)
    params2 = model2.init(jax.random.PRNGKey(0))
    obs2 = {k: jnp.asarray(v) for k, v in make_batch(conf2).items()}
    g = jax.grad(lambda p: model2.training_step(
        p, obs2, model2.init_state(conf2.batch_size),
        jax.random.PRNGKey(1))[0]["loss_probe"])(params2)
    wm_g = float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), g["wm"], 0.0))
    assert wm_g > 0


def test_eval_samples_multisampling():
    """evaluate-style call with eval_samples>1 (reference: train.py:285)."""
    conf = tiny()
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    state = model.init_state(conf.batch_size * 3)
    losses, out_state, metrics, tensors, _ = model.training_step(
        params, obs, state, jax.random.PRNGKey(1),
        iwae_samples=3, do_open_loop=True, do_image_pred=True)
    assert "logprob_image" in metrics
