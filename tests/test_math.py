"""Math-kernel unit tests against hand-computed / torch-checked values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pydreamer_tpu.models import functions as F
from pydreamer_tpu.models import distributions as D
from pydreamer_tpu.models.a2c import gae_advantage


class TestLogAvgExp:
    def test_matches_numpy(self):
        x = jnp.asarray(np.random.RandomState(0).randn(4, 3, 5).astype(np.float32))
        got = F.logavgexp(x, axis=2)
        want = np.log(np.mean(np.exp(np.asarray(x)), axis=2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_singleton_is_squeeze(self):
        x = jnp.asarray(np.random.randn(4, 3, 1).astype(np.float32))
        np.testing.assert_allclose(F.logavgexp(x, axis=2), x[:, :, 0])


class TestDistributions:
    def test_onehot_categorical_kl(self):
        rng = np.random.RandomState(1)
        logits_p = jnp.asarray(rng.randn(2, 4, 8).astype(np.float32))
        logits_q = jnp.asarray(rng.randn(2, 4, 8).astype(np.float32))
        p = D.OneHotCategorical(logits_p, event_dims=1)
        q = D.OneHotCategorical(logits_q, event_dims=1)
        kl = np.asarray(p.kl_to(q))
        # manual
        lp = np.asarray(p.logits)
        lq = np.asarray(q.logits)
        want = (np.exp(lp) * (lp - lq)).sum(-1).sum(-1)
        np.testing.assert_allclose(kl, want, rtol=1e-5)
        assert kl.shape == (2,)
        # KL(p, p) == 0
        np.testing.assert_allclose(np.asarray(p.kl_to(p)), 0.0, atol=1e-5)

    def test_onehot_entropy_uniform(self):
        logits = jnp.zeros((3, 5, 4))
        p = D.OneHotCategorical(logits, event_dims=1)
        np.testing.assert_allclose(np.asarray(p.entropy()),
                                   5 * np.log(4), rtol=1e-5)

    def test_straight_through_gradient(self):
        """rsample forward is hard one-hot; gradient flows via softmax probs."""
        logits = jnp.asarray([[1.0, 2.0, 0.5]])

        def f(lg):
            d = D.OneHotCategorical(lg)
            s = d.rsample(jax.random.PRNGKey(0))
            return (s * jnp.asarray([1.0, 2.0, 3.0])).sum()

        g = jax.grad(f)(logits)
        assert np.abs(np.asarray(g)).sum() > 0  # gradient exists
        d = D.OneHotCategorical(logits)
        s = d.rsample(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(s).sum(), 1.0)
        assert set(np.asarray(s).flatten()).issubset({0.0, 1.0})

    def test_diag_normal_kl_closed_form(self):
        p = D.DiagNormal(jnp.asarray([[0.0, 1.0]]), jnp.asarray([[1.0, 2.0]]))
        q = D.DiagNormal(jnp.asarray([[0.0, 0.0]]), jnp.asarray([[1.0, 1.0]]))
        # KL(N(0,1)||N(0,1)) = 0; KL(N(1,4)||N(0,1)) = 0.5*(4 + 1 - 1 - ln4)
        want = 0.5 * (4 + 1 - 1 - np.log(4))
        np.testing.assert_allclose(np.asarray(p.kl_to(q))[0], want, rtol=1e-5)

    def test_bernoulli_logprob(self):
        b = D.Bernoulli(jnp.asarray([0.0, 2.0]))
        lp = np.asarray(b.log_prob(jnp.asarray([1.0, 0.0])))
        np.testing.assert_allclose(lp[0], np.log(0.5), rtol=1e-5)
        np.testing.assert_allclose(lp[1], np.log(1 / (1 + np.exp(2.0))), rtol=1e-4)

    def test_categorical_support_mean(self):
        sup = jnp.asarray([-1.0, 0.0, 2.0])
        logits = jnp.log(jnp.asarray([[0.25, 0.25, 0.5]]))
        d = D.CategoricalSupport(logits, sup)
        np.testing.assert_allclose(np.asarray(d.mean)[0],
                                   0.25 * -1 + 0.5 * 2, rtol=1e-5)
        idx = np.asarray(d.to_categorical(jnp.asarray([1.2])))
        assert idx[0] == 2  # nearest bucket is 2.0

    def test_tanh_normal_log_prob_integrates(self):
        """Sampled log-prob should be finite and sane."""
        d = D.tanh_normal(jnp.zeros((1, 4)))  # 2 actions
        s = d.sample(jax.random.PRNGKey(0))
        assert np.all(np.abs(np.asarray(s)) <= 1.0)
        lp = d.log_prob(s)
        assert np.isfinite(np.asarray(lp)).all()


class TestGAE:
    def test_matches_reference_loop(self):
        """Reversed-scan GAE == the reference's explicit Python loop
        (reference: a2c.py:88-103)."""
        rng = np.random.RandomState(0)
        H, M = 7, 5
        gamma, lam = 0.95, 0.9
        adv = rng.randn(H, M).astype(np.float32)
        term = (rng.rand(H, M) < 0.2).astype(np.float32)

        got = np.asarray(gae_advantage(jnp.asarray(adv), jnp.asarray(term),
                                       gamma, lam))
        # reference-style reversed loop
        agae = None
        out = []
        for a, t in zip(adv[::-1], term[::-1]):
            agae = a if agae is None else a + lam * gamma * (1 - t) * agae
            out.append(agae)
        want = np.stack(out[::-1])
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_unrolled_impl_matches_scan(self):
        """gae_impl='unrolled' (trace-time reversal, no runtime reverse op
        — PERF.md r5) is the same math as the scan lowering."""
        rng = np.random.RandomState(1)
        adv = jnp.asarray(rng.randn(15, 8).astype(np.float32))
        term = jnp.asarray((rng.rand(15, 8) < 0.15).astype(np.float32))
        a = gae_advantage(adv, term, 0.99, 0.95, impl="scan")
        b = gae_advantage(adv, term, 0.99, 0.95, impl="unrolled")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_lambda_zero_reduces_to_onestep(self):
        adv = jnp.asarray(np.random.randn(4, 3).astype(np.float32))
        term = jnp.zeros((4, 3))
        got = gae_advantage(adv, term, 0.99, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(adv), rtol=1e-6)


class TestStructure:
    def test_expand_iwae_interleaving(self):
        x = jnp.arange(6).reshape(2, 3, 1).astype(jnp.float32)  # (T,B,1)
        y = F.expand_iwae(x, 2)  # (T, B*2, 1)
        assert y.shape == (2, 6, 1)
        # slot b*I+i pattern
        np.testing.assert_allclose(np.asarray(y[0, :, 0]), [0, 0, 1, 1, 2, 2])

    def test_flatten_unflatten_roundtrip(self):
        x = jnp.asarray(np.random.randn(3, 4, 5, 6).astype(np.float32))
        f, bd = F.flatten_batch(x, 2)
        assert f.shape == (12, 5, 6)
        np.testing.assert_array_equal(np.asarray(F.unflatten_batch(f, bd)), np.asarray(x))

    def test_nanmean(self):
        x = jnp.asarray([1.0, np.nan, 3.0])
        np.testing.assert_allclose(float(F.nanmean(x)), 2.0)

    def test_global_norm(self):
        tree = {"a": jnp.asarray([3.0]), "b": jnp.asarray([4.0])}
        np.testing.assert_allclose(float(F.global_norm(tree)), 5.0)


class TestTruncNormal:
    """trunc_normal — DreamerV2's DMC policy head, added after the r4
    swingup collapse (actor-std runaway through tanh_normal's unbounded
    softplus std; see results/README.md). The head's defining properties:
    bounded support, bounded std => bounded entropy, exact closed forms."""

    def test_matches_scipy(self):
        st = pytest.importorskip("scipy.stats")
        for m, sd in [(0.5, 0.3), (-0.9, 1.5), (0.0, 0.1)]:
            a, b = (-1 - m) / sd, (1 - m) / sd
            rv = st.truncnorm(a, b, loc=m, scale=sd)
            d = D.TruncNormal(jnp.array([m]), jnp.array([sd]))
            np.testing.assert_allclose(float(d.entropy()), rv.entropy(),
                                       atol=1e-4)
            np.testing.assert_allclose(float(d.mean[0]), rv.mean(), atol=1e-4)
            np.testing.assert_allclose(float(d.log_prob(jnp.array([0.3]))),
                                       rv.logpdf(0.3), atol=1e-4)

    def test_sample_bounded_and_differentiable(self):
        d = D.TruncNormal(jnp.array([0.5, -0.9]), jnp.array([0.3, 1.5]))
        ks = jax.random.split(jax.random.PRNGKey(0), 5000)
        s = jax.vmap(d.sample)(ks)
        assert float(s.min()) >= -1.0 and float(s.max()) <= 1.0

        def f(params):
            return jnp.sum(D.trunc_normal(params).sample(jax.random.PRNGKey(1)))
        g = jax.grad(f)(jnp.array([0.2, -0.1, 0.5, 0.3]))
        assert np.abs(np.asarray(g)).sum() > 0  # pathwise grads flow

    def test_entropy_bounded_unlike_tanh_normal(self):
        """The collapse mechanism: tanh_normal's entropy grows without
        bound in the std parameter (entropy bonus rewards runaway std);
        trunc_normal's is capped by the sigmoid std ceiling."""
        raw = jnp.array([0.0, 100.0])  # huge raw std parameter
        h_trunc = float(D.trunc_normal(raw).entropy())
        h_tanh = float(D.tanh_normal(raw).entropy())
        # cap: std <= 2.1 => per-dim H <= log(2.1) + 0.5*log(2*pi*e)
        assert h_trunc <= np.log(2.1) + 0.5 * np.log(2 * np.pi * np.e) + 1e-5
        assert h_tanh > h_trunc + 1.0  # unbounded parameterization

    def test_sample_gradients_bounded(self):
        """Regression for the r4 NaN collapse: the exact pathwise gradient
        through the truncation bounds explodes on tail draws (pdf ratio
        phi(a)/phi(x)); the sg-bounds reparameterization keeps |grad|
        bounded by the noise magnitude for EVERY draw."""
        def f(params, key):
            return jnp.sum(D.trunc_normal(params).sample(key))
        g = jax.jit(jax.grad(f))
        params = jnp.array([5.0, -5.0, 0.0, 3.0,   # extreme means
                            -10.0, 10.0, 0.0, -10.0])  # extreme raw stds
        for i in range(50):
            gi = np.asarray(g(params, jax.random.PRNGKey(i)))
            assert np.isfinite(gi).all(), (i, gi)
            assert np.abs(gi).max() < 25.0, (i, gi)
