"""TrainStep unit tests: optimizer partition, target refresh, donation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util import make_conf, make_batch

from pydreamer_tpu.models.dreamer import Dreamer
from pydreamer_tpu.training.train_step import TrainStep, make_optimizer_labels


@pytest.fixture(scope="module")
def setup():
    conf = make_conf(deter_dim=32, stoch_dim=4, stoch_discrete=4, hidden_dim=32,
                     cnn_depth=4, batch_length=4, batch_size=2, imag_horizon=2,
                     reward_decoder_layers=1, terminal_decoder_layers=1,
                     target_interval=3)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    ts = TrainStep(model, conf, donate=False)
    opt_state = ts.init_optimizer(params)
    batch = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    state = model.init_state(conf.batch_size)
    return conf, model, params, ts, opt_state, batch, state


def _flat(v):
    return np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(v)])


def test_optimizer_labels():
    params = {"wm": {}, "probe": {}, "actor": {}, "critic": {}, "critic_target": {}}
    labels = make_optimizer_labels(params, probe_gradients=False)
    assert labels == {"wm": "wm", "probe": "probe", "actor": "actor",
                      "critic": "critic", "critic_target": "frozen"}
    labels = make_optimizer_labels(params, probe_gradients=True)
    assert labels["probe"] == "wm"


def test_params_update_and_target_frozen(setup):
    conf, model, params, ts, opt_state, batch, state = setup
    p1, o1, s1, metrics, _, _ = ts(params, opt_state, batch, state, 1,
                                   jax.random.PRNGKey(1))
    # trainable groups moved
    assert not np.allclose(_flat(p1["wm"]), _flat(params["wm"]))
    assert not np.allclose(_flat(p1["critic"]), _flat(params["critic"]))
    # critic_target untouched at non-refresh step (1 % 3 != 0)
    np.testing.assert_array_equal(_flat(p1["critic_target"]),
                                  _flat(params["critic_target"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert np.isfinite(float(metrics["grad_norm_actor"]))


def test_critic_target_refresh_on_interval(setup):
    conf, model, params, ts, opt_state, batch, state = setup
    # Drift critic away from target with a couple of steps.
    p, o = params, opt_state
    for i in (1, 2):
        p, o, _, _, _, _ = ts(p, o, batch, state, i, jax.random.PRNGKey(i))
    assert not np.allclose(_flat(p["critic"]), _flat(p["critic_target"]))
    critic_before = _flat(p["critic"])
    # Step 3 (3 % target_interval == 0): target <- critic BEFORE the update.
    p, o, _, _, _, _ = ts(p, o, batch, state, 3, jax.random.PRNGKey(3))
    np.testing.assert_allclose(_flat(p["critic_target"]), critic_before,
                               rtol=1e-6)


def test_rng_stream_derived_from_step(setup):
    """The step fold_ins the step index on-device, so callers may pass the
    SAME key every iteration and still get fresh randomness per step."""
    conf, model, params, ts, opt_state, batch, state = setup
    key = jax.random.PRNGKey(9)
    p1, _, _, m1, _, _ = ts(params, opt_state, batch, state, 1, key)
    p2, _, _, m2, _, _ = ts(params, opt_state, batch, state, 2, key)
    p1b, _, _, m1b, _, _ = ts(params, opt_state, batch, state, 1, key)
    # Same (key, step) => deterministic
    np.testing.assert_array_equal(_flat(p1["wm"]), _flat(p1b["wm"]))
    # Different step, same key => different sampling => different gradients
    assert not np.allclose(_flat(p1["actor"]), _flat(p2["actor"]))


def test_metrics_include_losses(setup):
    conf, model, params, ts, opt_state, batch, state = setup
    _, _, _, metrics, _, _ = ts(params, opt_state, batch, state, 1,
                                jax.random.PRNGKey(1))
    for k in ("loss_model", "loss_actor", "loss_critic", "loss_probe"):
        assert k in metrics


def test_generator_chunking():
    from pydreamer_tpu.generator import chunk_episode_data
    data = {"reset": np.zeros(2500, bool), "reward": np.arange(2500.0)}
    chunks = chunk_episode_data(data, 1000)
    sizes = [len(c["reset"]) for c in chunks]
    assert sum(sizes) == 2500
    assert all(1000 <= s < 2000 for s in sizes)
    # order preserved
    np.testing.assert_array_equal(
        np.concatenate([c["reward"] for c in chunks]), data["reward"])


def test_donate_state_steps_run_and_match():
    """donate_state=True (TBTT in_state buffers donated, PERF.md r5): the
    jitted step still returns the same numbers as the undonated step, and
    consecutive steps can chain the returned state."""
    conf = make_conf(deter_dim=32, stoch_dim=4, stoch_discrete=4, hidden_dim=32,
                     cnn_depth=4, batch_length=4, batch_size=2, imag_horizon=2,
                     reward_decoder_layers=1, terminal_decoder_layers=1,
                     donate_state=True)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    rng = jax.random.PRNGKey(1)

    def run(donate):
        c = conf.replace(donate_state=donate)
        ts = TrainStep(model, c, donate=donate)
        p = jax.tree_util.tree_map(jnp.copy, params)
        opt = ts.init_optimizer(p)
        state = model.init_state(conf.batch_size)
        losses = []
        for i in range(2):
            p, opt, state, metrics, *_ = ts(p, opt, batch, state, i, rng)
            losses.append(float(metrics["loss_model"]))
        return losses

    plain = run(False)
    donated = run(True)
    assert np.isfinite(donated).all()
    np.testing.assert_allclose(donated, plain, rtol=1e-5)
