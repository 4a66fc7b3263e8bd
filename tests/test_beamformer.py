"""LCMV beamforming (`ops/beamformer.py`): planted-source localization
on a simulated leadfield, free-orientation selection, noise-covariance
NAI, and source-space analyses through the regular engine."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.beamformer import lcmv, lcmv_apply


def _leadfield(c=32, s=50, seed=0):
    """Random smooth fixed-orientation leadfield (S, C), unit rows."""
    rng = np.random.default_rng(seed)
    lf = rng.standard_normal((s, c))
    lf /= np.linalg.norm(lf, axis=1, keepdims=True)
    return lf.astype(np.float32)


def _simulate(lf, active, n=20000, amp=3.0, seed=0):
    """Sensor data: white sensor noise + oscillatory sources at the
    ``active`` leadfield rows.  Returns (x, sources)."""
    rng = np.random.default_rng(seed)
    s, c = lf.shape
    t = np.arange(n) / 1000.0
    x = 0.5 * rng.standard_normal((c, n))
    src = {}
    for j, row in enumerate(active):
        sig = amp * np.sin(2 * np.pi * (10 + 7 * j) * t
                           + rng.uniform(0, 2 * np.pi))
        sig += 0.2 * rng.standard_normal(n)
        x += lf[row][:, None] * sig[None, :]
        src[row] = sig
    return x.astype(np.float32), src


class TestFixedOrientation:
    def test_localizes_planted_sources(self):
        lf = _leadfield()
        active = [7, 31]
        x, _ = _simulate(lf, active)
        cov = (x @ x.T / x.shape[1]).astype(np.float32)
        res = lcmv(cov, lf)
        nai = np.asarray(res.nai)
        top2 = set(np.argsort(nai)[-2:].tolist())
        assert top2 == set(active), (top2, nai[active], nai.max())

    def test_time_course_recovery(self):
        lf = _leadfield(seed=1)
        x, src = _simulate(lf, [12], seed=1)
        cov = (x @ x.T / x.shape[1]).astype(np.float32)
        res = lcmv(cov, lf)
        tc = np.asarray(lcmv_apply(res, x))[12]
        truth = src[12]
        r = np.corrcoef(tc, truth)[0, 1]
        assert abs(r) > 0.95        # sign is arbitrary

    def test_unit_gain(self):
        """w_s^T l_s == 1 (the LCMV distortionless constraint)."""
        lf = _leadfield(seed=2)
        x, _ = _simulate(lf, [5], seed=2)
        cov = (x @ x.T / x.shape[1]).astype(np.float32)
        res = lcmv(cov, lf)
        gains = np.einsum("sc,sc->s", np.asarray(res.filters), lf)
        np.testing.assert_allclose(gains, 1.0, rtol=1e-3)

    def test_noise_cov_nai(self):
        lf = _leadfield(seed=3)
        x, _ = _simulate(lf, [20], seed=3)
        cov = (x @ x.T / x.shape[1]).astype(np.float32)
        ncov = 0.25 * np.eye(32, dtype=np.float32)
        res = lcmv(cov, lf, noise_cov=ncov)
        assert int(np.argmax(np.asarray(res.nai))) == 20


class TestFreeOrientation:
    def test_orientation_and_localization(self):
        """(S, 3, C) leadfield whose true source uses a known
        orientation: the max-power pick recovers it and the source
        still localizes."""
        rng = np.random.default_rng(4)
        c, s = 32, 40
        lf3 = rng.standard_normal((s, 3, c)).astype(np.float32)
        lf3 /= np.linalg.norm(lf3, axis=-1, keepdims=True)
        true_ori = np.array([0.6, -0.64, 0.48])
        true_ori /= np.linalg.norm(true_ori)
        lrow = np.einsum("o,oc->c", true_ori, lf3[17])
        n = 20000
        t = np.arange(n) / 1000.0
        sig = 3.0 * np.sin(2 * np.pi * 11 * t)
        x = (0.5 * rng.standard_normal((c, n))
             + lrow[:, None] * sig[None, :]).astype(np.float32)
        cov = (x @ x.T / n).astype(np.float32)
        res = lcmv(cov, lf3)
        assert int(np.argmax(np.asarray(res.nai))) == 17
        got = np.asarray(res.orientations)[17]
        assert abs(float(np.dot(got, true_ori))) > 0.95

    def test_validation(self):
        cov = np.eye(8, dtype=np.float32)
        with pytest.raises(ValueError):
            lcmv(cov, np.zeros((5, 4), np.float32))
        with pytest.raises(ValueError):
            lcmv(cov, np.zeros((5, 2, 8), np.float32))
        with pytest.raises(ValueError):
            lcmv(np.zeros((3, 4), np.float32), np.zeros((5, 4)))
        res = lcmv(cov, np.zeros((5, 8), np.float32) + 0.1)
        with pytest.raises(ValueError, match="channel count"):
            lcmv_apply(res, np.zeros((4, 100), np.float32))


class TestSourceSpaceAnalysis:
    def test_source_tfr_through_engine(self):
        """Beamformed time courses feed the ordinary TFR engine."""
        lf = _leadfield(c=16, s=10, seed=5)
        x, _ = _simulate(lf, [3], n=4000, seed=5)
        cov = (x @ x.T / x.shape[1]).astype(np.float32)
        res = lcmv(cov, lf)
        tc = np.asarray(lcmv_apply(res, x))        # (S, N)
        morse = nw.Morse(1000.0)
        p = np.asarray(morse.power(tc[3], np.arange(5.0, 30.0, 1.0)))
        # the planted source oscillates at 10 Hz
        assert abs(5 + int(np.argmax(p.mean(-1))) - 10) <= 1


class TestDICS:
    def test_oscillatory_localization_and_source_coherence(self):
        """Two PARTIALLY coherent 20 Hz sources + one independent one:
        DICS at 20 Hz lights up all three; source coherence is elevated
        only for the coupled pair.  (The coupling must be partial — a
        fully correlated pair CANCELS, the textbook LCMV/DICS
        correlated-source limitation, which the first version of this
        test rediscovered.)"""
        import jax.numpy as jnp
        from ninwavelets_tpu.ops.bank import make_fft_bank
        from ninwavelets_tpu.ops.beamformer import (dics,
                                                    source_coherence,
                                                    wavelet_csd)
        rng = np.random.default_rng(7)
        c, s, n, e = 24, 30, 2048, 12
        lf = rng.standard_normal((s, c))
        lf /= np.linalg.norm(lf, axis=1, keepdims=True)
        lf = lf.astype(np.float32)
        t = np.arange(n) / 1000.0
        x = 0.4 * rng.standard_normal((e, c, n))
        for i in range(e):
            drive = np.sin(2 * np.pi * 20 * t
                           + rng.uniform(0, 2 * np.pi))
            own = np.sin(2 * np.pi * 20 * t
                         + rng.uniform(0, 2 * np.pi))
            indep = np.sin(2 * np.pi * 20 * t
                           + rng.uniform(0, 2 * np.pi))
            x[i] += 2.0 * lf[4][:, None] * drive[None, :]
            x[i] += 2.0 * lf[11][:, None] * (0.71 * drive
                                             + 0.71 * own)[None, :]
            x[i] += 2.0 * lf[22][:, None] * indep[None, :]
        x = x.astype(np.float32)
        morse = nw.Morse(1000.0)
        freqs = np.array([12.0, 20.0, 35.0], np.float32)
        bank = jnp.asarray(np.asarray(make_fft_bank(
            morse._wdef(), jnp.asarray(freqs), n, 1000.0, True),
            np.float32))
        csd_r, csd_i = wavelet_csd(x, bank, interpolate=True)
        res = dics(csd_r[1], csd_i[1], lf)      # the 20 Hz row
        nai = np.asarray(res.nai)
        top3 = set(np.argsort(nai)[-3:].tolist())
        assert top3 == {4, 11, 22}, top3
        coh = np.asarray(source_coherence(res, csd_r[1], csd_i[1]))
        assert coh[4, 11] > 0.3                 # shared drive (~0.5)
        assert coh[4, 22] < 0.15 and coh[11, 22] < 0.15
        np.testing.assert_allclose(np.diagonal(coh), 1.0, atol=1e-4)
        # off-frequency row: the 20 Hz sources fade
        res_off = dics(csd_r[2], csd_i[2], lf)
        assert np.asarray(res_off.nai)[4] < 0.3 * nai[4]

    def test_validation(self):
        from ninwavelets_tpu.ops.beamformer import dics
        with pytest.raises(ValueError):
            dics(np.zeros((4, 5), np.float32), np.zeros((4, 5)),
                 np.zeros((3, 4)))
        with pytest.raises(ValueError):
            dics(np.eye(4, dtype=np.float32), np.zeros((4, 4)),
                 np.zeros((3, 5), np.float32))


class TestMinimumNorm:
    def test_sloreta_zero_localization_bias(self):
        """The defining sLORETA property: a single noiseless source at
        ANY location peaks exactly at that location."""
        from ninwavelets_tpu.ops.beamformer import (minimum_norm,
                                                    minimum_norm_apply)
        lf = _leadfield(c=24, s=40, seed=8)
        # give rows wildly different norms (depth-like bias bait)
        lf = lf * np.linspace(0.2, 3.0, 40)[:, None].astype(np.float32)
        res = minimum_norm(lf, method="sloreta")
        for src in (0, 7, 19, 39):
            est = np.abs(np.asarray(
                minimum_norm_apply(res, lf[src][:, None])))[:, 0]
            assert int(np.argmax(est)) == src, src

    def test_mne_recovers_correlated_sources(self):
        """Fully correlated sources cancel in LCMV but NOT in the
        non-adaptive minimum-norm inverse."""
        from ninwavelets_tpu.ops.beamformer import (minimum_norm,
                                                    minimum_norm_apply)
        rng = np.random.default_rng(9)
        lf = _leadfield(c=24, s=30, seed=9)
        n = 8000
        t = np.arange(n) / 1000.0
        drive = 3.0 * np.sin(2 * np.pi * 15 * t)
        x = (0.3 * rng.standard_normal((24, n))
             + (lf[3] + lf[20])[:, None] * drive[None, :]).astype(
                 np.float32)
        res = minimum_norm(lf, method="sloreta")
        est = np.asarray(minimum_norm_apply(res, x))
        power = (est ** 2).mean(-1)
        top2 = set(np.argsort(power)[-2:].tolist())
        assert top2 == {3, 20}, top2

    def test_dspm_noise_normalized(self):
        """dSPM rows have unit predicted-noise variance."""
        from ninwavelets_tpu.ops.beamformer import minimum_norm
        lf = _leadfield(c=16, s=20, seed=10)
        res = minimum_norm(lf, method="dspm")
        k = np.asarray(res.kernel)
        np.testing.assert_allclose(np.sum(k * k, axis=1), 1.0,
                                   rtol=1e-4)

    def test_validation(self):
        from ninwavelets_tpu.ops.beamformer import minimum_norm
        with pytest.raises(ValueError):
            minimum_norm(np.zeros((5, 3, 8), np.float32))
        with pytest.raises(ValueError):
            minimum_norm(np.zeros((5, 8), np.float32), method="nope")
