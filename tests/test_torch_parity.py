"""Numerical parity vs the reference PyTorch implementation (oracle tests).

These tests import the reference (read-only mount at /root/reference) purely
as a NUMERICAL ORACLE: identical weights are loaded into both frameworks and
outputs are compared. They are skipped automatically when the reference or
torch is unavailable, so the suite stays self-contained.
"""

import sys

import numpy as np
import pytest

try:
    sys.path.insert(0, "/root/reference")
    import torch
    from pydreamer.models import rnn as ref_rnn  # noqa: F401
    HAVE_REF = True
except Exception:
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference/torch unavailable")

import jax
import jax.numpy as jnp


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


class TestGRUCellParity:
    """Same weights -> same next hidden state, for every cell variant."""

    B, DIN, H = 5, 12, 16

    def _inputs(self, seed=0):
        rng = np.random.RandomState(seed)
        x = rng.randn(self.B, self.DIN).astype(np.float32)
        h = rng.randn(self.B, self.H).astype(np.float32)
        return x, h

    def test_plain_gru(self):
        from pydreamer_tpu.models.rnn import GRUCell
        x, h = self._inputs()
        cell = GRUCell(self.H)
        params = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))
        p = params["params"]

        ref = ref_rnn.GRUCell(self.DIN, self.H)
        with torch.no_grad():
            ref.weight_ih.copy_(_t(p["weight_ih"]))
            ref.weight_hh.copy_(_t(p["weight_hh"]))
            ref.bias_ih.copy_(_t(p["bias_ih"]))
            ref.bias_hh.copy_(_t(p["bias_hh"]))
            want = ref(_t(x), _t(h)).numpy()
        got = np.asarray(cell.apply(params, jnp.asarray(x), jnp.asarray(h)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_late_reset_cell(self):
        from pydreamer_tpu.models.rnn import NormGRUCellLateReset
        x, h = self._inputs(1)
        cell = NormGRUCellLateReset(self.H)
        params = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))
        p = params["params"]

        ref = ref_rnn.NormGRUCellLateReset(self.DIN, self.H)
        with torch.no_grad():
            # torch Linear stores (out, in); flax kernel is (in, out).
            ref.weight_ih.weight.copy_(_t(p["weight_ih"]).T)
            ref.weight_hh.weight.copy_(_t(p["weight_hh"]).T)
            ref.lnorm.weight.copy_(_t(p["lnorm"]["scale"]))
            ref.lnorm.bias.copy_(_t(p["lnorm"]["bias"]))
            want = ref(_t(x), _t(h)).numpy()
        got = np.asarray(cell.apply(params, jnp.asarray(x), jnp.asarray(h)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_norm_gru_cell(self):
        from pydreamer_tpu.models.rnn import NormGRUCell
        x, h = self._inputs(2)
        cell = NormGRUCell(self.H)
        params = cell.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(h))
        p = params["params"]

        ref = ref_rnn.NormGRUCell(self.DIN, self.H)
        with torch.no_grad():
            ref.weight_ih.weight.copy_(_t(p["weight_ih"]).T)
            ref.weight_hh.weight.copy_(_t(p["weight_hh"]).T)
            for name in ("ln_reset", "ln_update", "ln_newval"):
                getattr(ref, name).weight.copy_(_t(p[name]["scale"]))
                getattr(ref, name).bias.copy_(_t(p[name]["bias"]))
            want = ref(_t(x), _t(h)).numpy()
        got = np.asarray(cell.apply(params, jnp.asarray(x), jnp.asarray(h)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestDistributionParity:
    def test_onehot_kl_matches_torch(self):
        import torch.distributions as D
        from pydreamer_tpu.models.distributions import OneHotCategorical
        rng = np.random.RandomState(0)
        lp = rng.randn(3, 4, 6).astype(np.float32)
        lq = rng.randn(3, 4, 6).astype(np.float32)

        dp = D.Independent(D.OneHotCategoricalStraightThrough(logits=torch.tensor(lp)), 1)
        dq = D.Independent(D.OneHotCategoricalStraightThrough(logits=torch.tensor(lq)), 1)
        want = D.kl.kl_divergence(dp, dq).numpy()

        got = np.asarray(OneHotCategorical(jnp.asarray(lp), 1).kl_to(
            OneHotCategorical(jnp.asarray(lq), 1)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_diag_normal_matches_torch(self):
        import torch.distributions as D
        from pydreamer.models.functions import diag_normal as ref_diag_normal
        from pydreamer_tpu.models.distributions import diag_normal
        rng = np.random.RandomState(1)
        x = rng.randn(4, 10).astype(np.float32)

        ref = ref_diag_normal(torch.tensor(x))
        ours = diag_normal(jnp.asarray(x))
        v = rng.randn(4, 5).astype(np.float32)
        np.testing.assert_allclose(np.asarray(ours.log_prob(jnp.asarray(v))),
                                   ref.log_prob(torch.tensor(v)).numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours.entropy()),
                                   ref.entropy().numpy(), rtol=1e-5, atol=1e-5)

    def test_logavgexp_matches_torch(self):
        from pydreamer.models.functions import logavgexp as ref_logavgexp
        from pydreamer_tpu.models.functions import logavgexp
        x = np.random.RandomState(2).randn(3, 4, 5).astype(np.float32)
        want = ref_logavgexp(torch.tensor(x), dim=2).numpy()
        got = np.asarray(logavgexp(jnp.asarray(x), axis=2))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestDecoderLossParity:
    def test_conv_decoder_mse(self):
        """0.5*sum-sq loss identical (layouts differ: ours NHWC)."""
        from pydreamer.models.decoders import ConvDecoder as RefConv
        from pydreamer_tpu.models.decoders import ConvDecoder
        rng = np.random.RandomState(3)
        out_nhwc = rng.randn(2, 3, 8, 8, 3).astype(np.float32)
        tgt_nhwc = rng.randn(2, 3, 8, 8, 3).astype(np.float32)
        ours = ConvDecoder(in_dim=4).loss(jnp.asarray(out_nhwc), jnp.asarray(tgt_nhwc))
        ref_dec = RefConv.__new__(RefConv)  # only need .loss, no weights
        out_nchw = torch.tensor(out_nhwc.transpose(0, 1, 4, 2, 3))
        tgt_nchw = torch.tensor(tgt_nhwc.transpose(0, 1, 4, 2, 3))
        want = RefConv.loss(ref_dec, out_nchw, tgt_nchw).numpy()
        np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-5, atol=1e-4)

    def test_categorical_support_mean(self):
        from pydreamer.models.common import CategoricalSupport as RefCS
        from pydreamer_tpu.models.distributions import CategoricalSupport
        rng = np.random.RandomState(4)
        logits = rng.randn(5, 4).astype(np.float32)
        sup = np.array([-2.0, 0.0, 1.0, 5.0], np.float32)
        ref = RefCS(logits=torch.tensor(logits), sup=torch.tensor(sup))
        ours = CategoricalSupport(jnp.asarray(logits), jnp.asarray(sup))
        np.testing.assert_allclose(np.asarray(ours.mean), ref.mean.numpy(),
                                   rtol=1e-5, atol=1e-5)


class TestGAEParity:
    def test_against_reference_actorcritic_math(self):
        """GAE + value target + reality weight vs the reference loop."""
        rng = np.random.RandomState(5)
        H, M = 6, 4
        gamma, lam = 0.97, 0.9
        rewards = rng.randn(H + 1, M).astype(np.float32)
        terminals = (rng.rand(H + 1, M) < 0.2).astype(np.float32)
        value_t = rng.randn(H + 1, M).astype(np.float32)

        # reference math (a2c.py:81-108)
        reward1, terminal0, terminal1 = rewards[1:], terminals[:-1], terminals[1:]
        value0t, value1t = value_t[:-1], value_t[1:]
        advantage = -value0t + reward1 + gamma * (1 - terminal1) * value1t
        agae = None
        out = []
        for adv, term in zip(advantage[::-1], terminal1[::-1]):
            agae = adv if agae is None else adv + lam * gamma * (1 - term) * agae
            out.append(agae)
        want_gae = np.stack(out[::-1])
        want_weight = np.exp(np.cumsum(np.log(1 - terminal0 + 1e-30), 0))

        from pydreamer_tpu.models.a2c import gae_advantage
        got_gae = np.asarray(gae_advantage(jnp.asarray(advantage),
                                           jnp.asarray(terminal1), gamma, lam))
        np.testing.assert_allclose(got_gae, want_gae, rtol=1e-5)
        got_weight = np.asarray(jnp.cumprod(1.0 - jnp.asarray(terminal0), axis=0))
        np.testing.assert_allclose(got_weight, want_weight, rtol=1e-4, atol=1e-6)
