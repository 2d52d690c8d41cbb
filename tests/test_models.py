"""Model stack tests: init, shapes, losses, gradient routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.util import make_conf, make_batch

from pydreamer_tpu.models.dreamer import Dreamer, WorldModel


def _tree_to_jnp(obs):
    return {k: jnp.asarray(v) for k, v in obs.items()}


@pytest.fixture(scope="module")
def setup():
    conf = make_conf()
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = _tree_to_jnp(make_batch(conf))
    state = model.init_state(conf.batch_size * conf.iwae_samples)
    return conf, model, params, obs, state


def test_dreamer_training_step_shapes(setup):
    conf, model, params, obs, state = setup
    losses, out_state, metrics, tensors, dream = model.training_step(
        params, obs, state, jax.random.PRNGKey(1))
    T, B = conf.batch_length, conf.batch_size
    assert set(losses) == {"loss_model", "loss_probe", "loss_actor", "loss_critic"}
    for k, v in losses.items():
        assert v.shape == (), k
        assert np.isfinite(np.asarray(v)), k
    h, z = out_state
    assert h.shape == (B, conf.deter_dim)
    assert z.shape == (B, conf.stoch_dim * conf.stoch_discrete)
    assert tensors["loss_kl"].shape == (T, B)
    assert metrics["loss_model"].shape == ()
    assert np.isfinite(np.asarray(metrics["policy_entropy"]))


def test_dreamer_iwae_samples(setup):
    conf, model, params, obs, _ = setup
    I = 3
    state = model.init_state(conf.batch_size * I)
    losses, out_state, metrics, tensors, _ = model.training_step(
        params, obs, state, jax.random.PRNGKey(1), iwae_samples=I)
    assert np.isfinite(np.asarray(losses["loss_model"]))
    assert out_state[0].shape[0] == conf.batch_size * I


def test_dreamer_open_loop_and_image_pred(setup):
    conf, model, params, obs, state = setup
    losses, _, metrics, tensors, _ = model.training_step(
        params, obs, state, jax.random.PRNGKey(1),
        do_open_loop=True, do_image_pred=True)
    assert "logprob_image" in metrics
    assert "image_pred" in tensors
    assert tensors["image_pred"].shape == obs["image"].shape


def test_dream_tensors(setup):
    conf, model, params, obs, state = setup
    _, _, _, _, dream = model.training_step(
        params, obs, state, jax.random.PRNGKey(1), do_dream_tensors=True)
    assert dream["action_pred"].shape == obs["action"].shape
    assert dream["image_pred"].shape == obs["image"].shape


def test_gradient_routing(setup):
    """Each loss must only produce gradients in its own param subtree."""
    conf, model, params, obs, state = setup

    def loss_fn(p, which):
        losses, *_ = model.training_step(p, obs, state, jax.random.PRNGKey(1))
        return losses[which]

    def grad_norms(which):
        g = jax.grad(lambda p: loss_fn(p, which))(params)
        return {k: float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), v, 0.0)) for k, v in g.items()}

    gm = grad_norms("loss_model")
    assert gm["wm"] > 0
    assert gm["actor"] == 0 and gm["critic"] == 0 and gm["probe"] == 0

    ga = grad_norms("loss_actor")
    assert ga["actor"] > 0
    assert ga["wm"] == 0 and ga["critic"] == 0

    gc = grad_norms("loss_critic")
    assert gc["critic"] > 0
    assert gc["wm"] == 0 and gc["actor"] == 0
    assert gc["critic_target"] == 0


def test_dynamics_actor_grad():
    # entropy=0 so the ONLY gradient path into the actor is the dynamics
    # chain: loss_actor = -value_target -> critic_target(features) ->
    # imagined states -> rsampled actions -> actor params. This is the
    # documented fix over the reference (which detaches dream tensors and
    # thereby cuts this path, reference: dreamer.py:154-157).
    conf = make_conf(actor_grad="dynamics", actor_dist="normal_tanh",
                     stoch_discrete=0, entropy=0.0)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = _tree_to_jnp(make_batch(conf))
    state = model.init_state(conf.batch_size)

    def loss_fn(p):
        losses, *_ = model.training_step(p, obs, state, jax.random.PRNGKey(1))
        return losses["loss_actor"]

    g = jax.grad(loss_fn)(params)
    norms = {k: float(jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x)), v, 0.0)) for k, v in g.items()}
    assert norms["actor"] > 0          # value gradients reach the actor
    assert norms["wm"] == 0            # but never the frozen world model
    assert norms["critic"] == 0        # nor the critic
    assert norms["critic_target"] == 0  # nor the frozen target net (routing)


def test_inference_step(setup):
    conf, model, params, obs, _ = setup
    B = 2
    obs1 = {k: v[:1, :B] for k, v in obs.items()}
    state = model.init_state(B)
    action, out_state, metrics = model.inference(
        params, obs1, state, jax.random.PRNGKey(3))
    assert action.shape == (1, B, conf.action_dim)
    assert np.allclose(np.asarray(action).sum(-1), 1.0)  # one-hot


def test_probe_map():
    conf = make_conf(probe_model="map", map_size=5, map_channels=6,
                     image_encoder="dense", image_decoder="dense",
                     image_categorical=True, image_channels=4, image_size=7,
                     image_encoder_layers=2, image_decoder_layers=2)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = _tree_to_jnp(make_batch(conf))
    state = model.init_state(conf.batch_size)
    losses, _, metrics, tensors, _ = model.training_step(
        params, obs, state, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(losses["loss_probe"]))
    assert "acc_map" in metrics
    assert 0.0 <= float(metrics["acc_map"]) <= 1.0


def test_conv_decoder_subpixel_same_math():
    """The subpixel ConvTranspose lowering (ops/subpixel.py) is a pure perf
    knob: identical params tree and outputs/grads vs the XLA lowering."""
    import jax.numpy as jnp
    from pydreamer_tpu.models.decoders import ConvDecoder

    F, M, d, C = 24, 6, 4, 3
    feat = jnp.asarray(np.random.RandomState(0).rand(M, F), jnp.float32)
    dec_x = ConvDecoder(in_dim=F, out_channels=C, cnn_depth=d,
                        transpose_impl="xla")
    params = dec_x.init(jax.random.PRNGKey(0), feat)
    y_x = dec_x.apply(params, feat)
    assert y_x.shape == (M, 64, 64, C)
    g_x = jax.grad(lambda p: jnp.sum(jnp.square(dec_x.apply(p, feat))))(params)
    for impl in ("subpixel", "fused"):
        dec_s = ConvDecoder(in_dim=F, out_channels=C, cnn_depth=d,
                            transpose_impl=impl)
        # same param tree => checkpoints interchangeable
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(
                dec_s.init(jax.random.PRNGKey(0), feat))
        y_s = dec_s.apply(params, feat)
        np.testing.assert_allclose(np.asarray(y_x), np.asarray(y_s),
                                   rtol=1e-5, atol=1e-5)
        g_s = jax.grad(
            lambda p: jnp.sum(jnp.square(dec_s.apply(p, feat))))(params)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_x),
                jax.tree_util.tree_leaves_with_path(g_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4,
                                       err_msg=f"{impl} {ka}")


def test_conv_encoder_s2d_same_math():
    """Space-to-depth first-conv lowering (ops/subpixel.py) is a pure perf
    knob: identical param tree, outputs, and grads vs the plain conv."""
    import jax.numpy as jnp
    from pydreamer_tpu.models.encoders import ConvEncoder

    M, C, d = 4, 3, 4
    img = jnp.asarray(np.random.RandomState(0).rand(M, 64, 64, C) - 0.5,
                      jnp.float32)
    enc_x = ConvEncoder(C, d, conv_impl="xla")
    enc_s = ConvEncoder(C, d, conv_impl="s2d")
    params = enc_x.init(jax.random.PRNGKey(0), img)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(enc_s.init(jax.random.PRNGKey(0), img))
    y_x = enc_x.apply(params, img)
    y_s = enc_s.apply(params, img)
    assert y_x.shape == (M, 32 * d)
    np.testing.assert_allclose(np.asarray(y_x), np.asarray(y_s),
                               rtol=1e-5, atol=1e-5)
    g_x = jax.grad(lambda p: jnp.sum(jnp.square(enc_x.apply(p, img))))(params)
    g_s = jax.grad(lambda p: jnp.sum(jnp.square(enc_s.apply(p, img))))(params)
    for (ka, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_x),
            jax.tree_util.tree_leaves_with_path(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=str(ka))


def test_scan_unroll_same_math(setup):
    """scan_unroll is a pure perf knob: identical losses for unroll 1 vs 4."""
    conf, model, params, obs, state = setup
    conf4 = make_conf(scan_unroll=4)
    model4 = Dreamer(conf4)
    key = jax.random.PRNGKey(7)
    losses1, out1, _, _, _ = model.training_step(params, obs, state, key)
    losses4, out4, _, _, _ = model4.training_step(params, obs, state, key)
    for k in losses1:
        np.testing.assert_allclose(
            np.asarray(losses1[k]), np.asarray(losses4[k]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out4[0]), rtol=1e-5, atol=1e-6)
