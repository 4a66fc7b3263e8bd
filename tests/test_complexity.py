"""Complexity measures (`ops/complexity.py`): naive-loop numpy oracles,
classic qualitative signatures (sine vs noise, white vs 1/f), and the
EpochsWavelet surface."""
import itertools
import math

import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.complexity import (multiscale_entropy,
                                            multiscale_permutation_entropy,
                                            permutation_entropy,
                                            sample_entropy)


def _sampen_naive(x, m, r):
    """Richman-Moorman with N - m templates at both lengths."""
    x = np.asarray(x, np.float64)
    np_ = len(x) - m
    b = a = 0
    for i in range(np_):
        for j in range(np_):
            if i == j:
                continue
            if np.max(np.abs(x[i:i + m] - x[j:j + m])) < r:
                b += 1
            if np.max(np.abs(x[i:i + m + 1] - x[j:j + m + 1])) < r:
                a += 1
    if a == 0 or b == 0:
        return np.inf
    return -np.log(a / b)


def _pe_naive(x, m, tau):
    x = np.asarray(x, np.float64)
    el = len(x) - (m - 1) * tau
    counts = {}
    for i in range(el):
        w = x[i:i + (m - 1) * tau + 1:tau]
        # stable argsort = Bandt-Pompe tie convention
        pat = tuple(np.argsort(w, kind="stable"))
        counts[pat] = counts.get(pat, 0) + 1
    p = np.array(list(counts.values()), np.float64) / el
    return -np.sum(p * np.log(p)) / np.log(math.factorial(m))


class TestSampEn:
    def test_matches_naive(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(200)
        r = 0.2 * x.std()
        for m in (1, 2, 3):
            want = _sampen_naive(x, m, r)
            got = float(sample_entropy(x, m=m, r=r, scale_r=False))
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_relative_r_matches_absolute(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(300)
        got_rel = float(sample_entropy(x, r=0.2))
        got_abs = float(sample_entropy(x, r=0.2 * x.std(ddof=0),
                                       scale_r=False))
        np.testing.assert_allclose(got_rel, got_abs, rtol=1e-4)

    def test_sine_regular_noise_irregular(self):
        rng = np.random.default_rng(2)
        t = np.arange(2000) / 1000.0
        sine = np.sin(2 * np.pi * 10 * t)
        noise = rng.standard_normal(2000)
        se_sine = float(sample_entropy(sine))
        se_noise = float(sample_entropy(noise))
        assert se_sine < 0.3
        assert 1.5 < se_noise < 3.0
        assert se_noise > 4 * se_sine

    def test_batched_matches_loop(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((3, 2, 150)).astype(np.float32)
        got = np.asarray(sample_entropy(x))
        assert got.shape == (3, 2)
        for i in range(3):
            for j in range(2):
                one = float(sample_entropy(x[i, j]))
                np.testing.assert_allclose(got[i, j], one, rtol=1e-5)

    def test_constant_is_inf(self):
        assert np.isinf(float(sample_entropy(np.ones(100))))

    def test_validation(self):
        with pytest.raises(ValueError):
            sample_entropy(np.zeros(3), m=2)
        with pytest.raises(ValueError):
            sample_entropy(np.zeros(100), m=0)


class TestMSE:
    def test_white_decays_pink_sustains(self):
        from ninwavelets_tpu.ops.sim import powerlaw_noise
        rng = np.random.default_rng(4)
        white = rng.standard_normal((4, 8192)).astype(np.float32)
        pink = np.asarray(powerlaw_noise(5, (4, 8192), exponent=-1.0))
        mw = np.asarray(multiscale_entropy(white, scales=8)).mean(0)
        mp = np.asarray(multiscale_entropy(pink, scales=8)).mean(0)
        assert mw.shape == (8,)
        # Costa 2002: white-noise MSE decays with scale, 1/f stays up
        assert mw[7] < mw[0] - 0.3
        assert mp[7] > mw[7] + 0.2

    def test_scale1_equals_sampen(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal(400).astype(np.float32)
        prof = np.asarray(multiscale_entropy(x, scales=3))
        np.testing.assert_allclose(prof[0], float(sample_entropy(x)),
                                   rtol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            multiscale_entropy(np.zeros(50), scales=30)
        with pytest.raises(ValueError):
            multiscale_entropy(np.zeros(50), scales=[0, 2])


class TestPermutationEntropy:
    def test_matches_naive(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal(500)
        for m, tau in ((2, 1), (3, 1), (3, 2), (4, 1), (5, 3)):
            want = _pe_naive(x, m, tau)
            got = float(permutation_entropy(x, m=m, tau=tau))
            np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_ramp_zero_noise_high(self):
        rng = np.random.default_rng(8)
        ramp = np.arange(1000.0)
        assert float(permutation_entropy(ramp)) == pytest.approx(0.0,
                                                                 abs=1e-6)
        noise = rng.standard_normal(4096)
        assert float(permutation_entropy(noise)) > 0.95

    def test_ties_stable(self):
        # constant signal: a single (identity) pattern -> entropy 0
        assert float(permutation_entropy(np.ones(100))) == pytest.approx(
            0.0, abs=1e-6)
        # tie convention matches the naive stable argsort
        rng = np.random.default_rng(9)
        x = rng.integers(0, 3, 200).astype(np.float64)   # many ties
        np.testing.assert_allclose(
            float(permutation_entropy(x, m=3)), _pe_naive(x, 3, 1),
            rtol=1e-5)

    def test_amplitude_invariant(self):
        rng = np.random.default_rng(10)
        x = rng.standard_normal(800)
        a = float(permutation_entropy(x))
        b = float(permutation_entropy(5.0 * x + 3.0))
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_batched(self):
        rng = np.random.default_rng(11)
        x = rng.standard_normal((2, 3, 400)).astype(np.float32)
        got = np.asarray(permutation_entropy(x))
        assert got.shape == (2, 3)

    def test_validation(self):
        with pytest.raises(ValueError):
            permutation_entropy(np.zeros(100), m=7)
        with pytest.raises(ValueError):
            permutation_entropy(np.zeros(4), m=3, tau=2)


class TestMPE:
    def test_profile(self):
        rng = np.random.default_rng(12)
        x = rng.standard_normal((2, 4096)).astype(np.float32)
        prof = np.asarray(multiscale_permutation_entropy(x, scales=6))
        assert prof.shape == (2, 6)
        assert np.all(prof > 0.9)           # white noise: high everywhere
        np.testing.assert_allclose(
            prof[:, 0], np.asarray(permutation_entropy(x)), rtol=1e-5)


class TestAdapter:
    def test_epochs_surface(self):
        from tests.test_epochs import FakeEpochs
        rng = np.random.default_rng(13)
        t = np.arange(1024) / 1000.0
        clean = np.sin(2 * np.pi * 10 * t)
        data = np.stack([
            np.stack([clean + 0.01 * rng.standard_normal(1024),
                      rng.standard_normal(1024)])
            for _ in range(4)]).astype(np.float32)       # (4, 2, 1024)
        ew = nw.EpochsWavelet(FakeEpochs(data, 1000.0), nw.Morse(1000.0))
        se = np.asarray(ew.sample_entropy())
        pe = np.asarray(ew.permutation_entropy())
        mse = np.asarray(ew.multiscale_entropy(scales=4))
        assert se.shape == (4, 2) and pe.shape == (4, 2)
        assert mse.shape == (4, 2, 4)
        # channel 0 (near-sine) more regular than channel 1 (noise)
        assert np.all(se[:, 0] < se[:, 1])
        assert np.all(pe[:, 0] < pe[:, 1])


class TestDFA:
    def test_powerlaw_exponents(self):
        """The canonical DFA calibration: alpha = (1 - exponent) / 2
        + 1/2... concretely white -> 0.5, pink (1/f) -> 1.0, brown
        (1/f^2) -> 1.5."""
        from ninwavelets_tpu.ops.complexity import dfa
        from ninwavelets_tpu.ops.sim import powerlaw_noise
        n, b = 16384, 8
        for exponent, want in ((0.0, 0.5), (-1.0, 1.0), (-2.0, 1.5)):
            x = np.asarray(powerlaw_noise(3, (b, n), exponent=exponent))
            alpha, f = dfa(x)
            a = float(np.mean(np.asarray(alpha)))
            assert abs(a - want) < 0.12, (exponent, a)
            assert np.all(np.diff(np.log(np.asarray(f)), axis=-1) > 0)

    def test_matches_numpy_oracle(self):
        from ninwavelets_tpu.ops.complexity import dfa
        rng = np.random.default_rng(0)
        x = rng.standard_normal(2048)
        scales = (8, 16, 32, 64, 128)
        alpha, f = dfa(x, scales=scales)
        # naive float64 oracle
        y = np.cumsum(x - x.mean())
        fo = []
        for s in scales:
            nb = len(y) // s
            resid = []
            t = np.arange(s)
            for k in range(nb):
                seg = y[k * s:(k + 1) * s]
                coef = np.polyfit(t, seg, 1)
                resid.append(seg - np.polyval(coef, t))
            fo.append(np.sqrt(np.mean(np.concatenate(resid) ** 2)))
        np.testing.assert_allclose(np.asarray(f), fo, rtol=1e-4)
        lo = np.polyfit(np.log(scales), np.log(fo), 1)[0]
        np.testing.assert_allclose(float(alpha), lo, rtol=1e-4)

    def test_validation(self):
        from ninwavelets_tpu.ops.complexity import dfa
        with pytest.raises(ValueError):
            dfa(np.zeros(10, np.float32))
        with pytest.raises(ValueError):
            dfa(np.zeros(1000, np.float32), scales=(2, 8))


class TestRawDFA:
    def test_envelope_alpha(self):
        """1/f-modulated alpha-band amplitude gives alpha > 0.5 (long-
        range correlated envelope); white-envelope control near 0.5."""
        from ninwavelets_tpu.ops.sim import powerlaw_noise

        class FakeRaw:
            def __init__(self, data, sfreq=250.0):
                self._data = data
                self.info = {"sfreq": sfreq}
                self.ch_names = ["EEG 000"]

            def get_data(self):
                return self._data

        rng = np.random.default_rng(14)
        n = 65536
        t = np.arange(n) / 250.0
        # carrier at 10 Hz with a long-range-correlated envelope
        env = np.asarray(powerlaw_noise(7, (n,), exponent=-1.0))
        env = 1.0 + 0.8 * (env - env.min()) / (env.max() - env.min())
        x = (env * np.sin(2 * np.pi * 10 * t)).astype(np.float32)
        rw = nw.RawWavelet(FakeRaw(x[None]), nw.Morse(250.0))
        alpha, f = rw.dfa("EEG 000", 10.0)
        assert 0.6 < float(alpha) < 1.4
        # white-amplitude control: independent modulation per sample
        xw = (np.abs(rng.standard_normal(n)) *
              np.sin(2 * np.pi * 10 * t)).astype(np.float32)
        rww = nw.RawWavelet(FakeRaw(xw[None]), nw.Morse(250.0))
        aw, _ = rww.dfa("EEG 000", 10.0)
        assert float(aw) < float(alpha) - 0.1
