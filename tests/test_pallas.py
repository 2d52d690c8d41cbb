"""Pallas fused GRU kernel: numerical + gradient parity vs plain-XLA math.

Runs in Pallas interpreter mode on CPU (the kernel itself targets TPU; the
interpreter executes identical semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydreamer_tpu.ops.gru_pallas import (_reference_math, fits_vmem,
                                          fused_gru_dv2)


def make_inputs(B=8, Din=64, H=128, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, Din).astype(np.float32))
    h = jnp.asarray(rng.randn(B, H).astype(np.float32))
    w_ih = jnp.asarray((rng.randn(Din, 3 * H) * 0.1).astype(np.float32))
    w_hh = jnp.asarray((rng.randn(H, 3 * H) * 0.1).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.randn(3 * H).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.randn(3 * H).astype(np.float32))
    return x, h, w_ih, w_hh, scale, bias


def test_forward_parity_interpret():
    inputs = make_inputs()
    got = fused_gru_dv2(*inputs, True)
    want = _reference_math(*inputs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity_interpret():
    inputs = make_inputs(seed=1)

    def loss_fused(*args):
        return jnp.sum(jnp.square(fused_gru_dv2(*args, True)))

    def loss_ref(*args):
        return jnp.sum(jnp.square(_reference_math(*args)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*inputs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*inputs)
    for gf, gr, name in zip(g_fused, g_ref,
                            ["x", "h", "w_ih", "w_hh", "scale", "bias"]):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_fits_vmem_guard():
    assert fits_vmem(1000, 1024, 32)          # Atari config fits (bf16)
    assert not fits_vmem(8192, 8192, 32)      # huge cell does not


def test_cell_in_rssm_cpu_fallback():
    """gru_type='gru_pallas_dv2' runs end-to-end on CPU via the XLA fallback."""
    from tests.util import make_conf, make_batch
    from pydreamer_tpu.models.dreamer import Dreamer

    conf = make_conf(gru_type="gru_pallas_dv2",
                     deter_dim=32, stoch_dim=4, stoch_discrete=4, hidden_dim=32,
                     cnn_depth=4, batch_length=4, batch_size=2, imag_horizon=2,
                     reward_decoder_layers=1, terminal_decoder_layers=1)
    model = Dreamer(conf)
    params = model.init(jax.random.PRNGKey(0))
    obs = {k: jnp.asarray(v) for k, v in make_batch(conf).items()}
    losses, *_ = model.training_step(
        params, obs, model.init_state(conf.batch_size), jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss_model"]))
