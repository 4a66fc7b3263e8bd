"""Riemannian covariance geometry (`ops/riemann.py`): manifold
primitive identities, geometric-mean oracles, and the MDM /
tangent-space decoders on planted two-class data."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.riemann import (epoch_covariances, mdm_decode,
                                         riemannian_distance,
                                         riemannian_mean, spd_expm,
                                         spd_logm, spd_sqrtm,
                                         tangent_decode, tangent_space)


def _spd(rng, c=4, batch=()):
    a = rng.standard_normal(batch + (c, c))
    return (a @ np.swapaxes(a, -1, -2) + c * np.eye(c)).astype(
        np.float32)


class TestPrimitives:
    def test_log_exp_roundtrip(self):
        rng = np.random.default_rng(0)
        p = _spd(rng, batch=(5,))
        back = np.asarray(spd_expm(spd_logm(p)))
        np.testing.assert_allclose(back, p, rtol=2e-4, atol=2e-4)

    def test_sqrtm(self):
        rng = np.random.default_rng(1)
        p = _spd(rng, batch=(3,))
        s = np.asarray(spd_sqrtm(p))
        np.testing.assert_allclose(s @ s, p, rtol=2e-4, atol=2e-4)

    def test_distance_properties(self):
        rng = np.random.default_rng(2)
        a, b = _spd(rng), _spd(rng)
        d_ab = float(riemannian_distance(a, b))
        assert d_ab > 0
        np.testing.assert_allclose(
            float(riemannian_distance(a, a)), 0.0, atol=1e-3)
        np.testing.assert_allclose(
            float(riemannian_distance(b, a)), d_ab, rtol=1e-3)
        # congruence invariance: d(WAW', WBW') == d(A, B)
        w = rng.standard_normal((4, 4)).astype(np.float32)
        wa = w @ a @ w.T + 0.0
        wb = w @ b @ w.T
        np.testing.assert_allclose(
            float(riemannian_distance(wa, wb)), d_ab, rtol=5e-3)

    def test_karcher_mean_diagonal_oracle(self):
        """Commuting (diagonal) SPD matrices: the Karcher mean is the
        elementwise geometric mean."""
        rng = np.random.default_rng(3)
        d = rng.uniform(0.5, 4.0, (6, 4))
        covs = np.stack([np.diag(row) for row in d]).astype(np.float32)
        g = np.asarray(riemannian_mean(covs))
        want = np.diag(np.exp(np.mean(np.log(d), axis=0)))
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)

    def test_mean_congruence_equivariance(self):
        rng = np.random.default_rng(4)
        covs = _spd(rng, batch=(5,))
        w = rng.standard_normal((4, 4)).astype(np.float32)
        g1 = np.asarray(riemannian_mean(
            np.einsum("ij,ejk,lk->eil", w, covs, w)))
        g2 = w @ np.asarray(riemannian_mean(covs)) @ w.T
        np.testing.assert_allclose(g1, g2, rtol=5e-3, atol=5e-3)

    def test_tangent_norm_matches_distance(self):
        """|| tangent_space(C, ref) || == d(C, ref) (the sqrt(2)
        off-diagonal weights make the flat norm the manifold metric)."""
        rng = np.random.default_rng(5)
        covs = _spd(rng, batch=(4,))
        ref = _spd(rng)
        feats = np.asarray(tangent_space(covs, ref))
        d = np.asarray(riemannian_distance(covs, ref[None]))
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), d,
                                   rtol=2e-3)

    def test_validation(self):
        with pytest.raises(ValueError):
            riemannian_mean(np.eye(3, dtype=np.float32))
        with pytest.raises(ValueError):
            epoch_covariances(np.zeros((4, 100), np.float32))


def _two_class(ea=24, eb=24, c=6, n=256, gap=2.5, seed=0):
    """Class-dependent source variance along two channels."""
    rng = np.random.default_rng(seed)
    xa = rng.standard_normal((ea, c, n))
    xb = rng.standard_normal((eb, c, n))
    xa[:, 0] *= gap
    xb[:, 1] *= gap
    return xa.astype(np.float32), xb.astype(np.float32)


class TestDecoders:
    def test_mdm_separates(self):
        xa, xb = _two_class()
        acc = mdm_decode(xa, xb)
        assert acc > 0.9

    def test_tangent_lda_separates(self):
        xa, xb = _two_class(seed=1)
        auc = tangent_decode(xa, xb)
        assert auc > 0.95

    def test_chance_on_shuffled(self):
        rng = np.random.default_rng(2)
        xa = rng.standard_normal((20, 4, 256)).astype(np.float32)
        xb = rng.standard_normal((20, 4, 256)).astype(np.float32)
        acc = mdm_decode(xa, xb)
        auc = tangent_decode(xa, xb)
        assert 0.2 < acc < 0.8
        assert 0.25 < auc < 0.75

    def test_validation(self):
        with pytest.raises(ValueError):
            mdm_decode(np.zeros((3, 4, 64), np.float32),
                       np.zeros((8, 4, 64), np.float32))


class TestAdapter:
    def test_epochs_decode(self):
        from tests.test_epochs import FakeEpochs
        xa, xb = _two_class(seed=3)
        ewa = nw.EpochsWavelet(FakeEpochs(xa, 1000.0), nw.Morse(1000.0))
        ewb = nw.EpochsWavelet(FakeEpochs(xb, 1000.0), nw.Morse(1000.0))
        auc = ewa.riemann_decode(ewb)
        assert auc > 0.9
        acc = ewa.riemann_decode(ewb, method="mdm")
        assert acc > 0.85
        with pytest.raises(ValueError, match="method"):
            ewa.riemann_decode(ewb, method="nope")
