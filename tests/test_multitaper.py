"""Multitaper Morse spectrograms (`ops/multitaper.py`,
`ops.spectra.morse_taper_spectrum`) against float64 scipy oracles: the
order-k members vs `scipy.special.eval_genlaguerre`, pairwise
orthogonality / energy equality of the Olhede-Walden family, and the
estimator-variance reduction the tapers exist for."""
import math

import numpy as np
import pytest
from scipy.special import eval_genlaguerre, gammaln

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import multitaper as mt
from ninwavelets_tpu.ops.spectra import morse_spectrum, morse_taper_spectrum

B, R = 17.5, 3.0


def _oracle_member(w, k, b=B, r=R):
    """Float64 Olhede-Walden member in the engine convention."""
    w = np.asarray(w, np.float64)
    c = (2 * b + 1) / r - 1
    log_rho = 0.5 * (gammaln(k + 1) + gammaln(c + 1) - gammaln(k + c + 1))
    out = np.zeros_like(w)
    pos = w > 0
    wp = w[pos]
    lag = eval_genlaguerre(k, c, 2 * (b / r) * wp ** r)
    out[pos] = 2 * np.exp(b * np.log(wp) + (b / r) * (1 - wp ** r)
                          + log_rho) * lag
    return out


class TestTaperSpectrum:
    def test_order0_is_reference_morse(self):
        grid = np.linspace(0, 500, 2048, dtype=np.float32)
        a = np.asarray(morse_taper_spectrum(grid, 60.0, B, R, 0))
        b = np.asarray(morse_spectrum(grid, 60.0, B, R))
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("k", [1, 2, 3, 5])
    def test_matches_scipy_genlaguerre(self, k):
        grid = np.linspace(0.0, 250.0, 4096, dtype=np.float32)
        ours = np.asarray(morse_taper_spectrum(grid, 40.0, B, R, k))
        ref = _oracle_member(grid / 40.0, k)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(ours, ref, atol=3e-4 * scale, rtol=0)

    def test_family_is_orthogonal_and_equal_energy(self):
        # trapezoid integration over w on a fine float64 grid
        w = np.linspace(0, 6, 200001)
        members = [_oracle_member(w, k) for k in range(5)]
        energies = [np.trapezoid(m * m, w) for m in members]
        for e in energies[1:]:
            assert e == pytest.approx(energies[0], rel=1e-6)
        for j in range(5):
            for k in range(j + 1, 5):
                inner = np.trapezoid(members[j] * members[k], w)
                assert abs(inner) < 1e-6 * energies[0]

    def test_jax_members_orthogonal(self):
        # the float32 jnp implementation keeps the orthogonality to f32
        grid = np.linspace(0, 500, 65536, dtype=np.float32)
        ms = [np.asarray(morse_taper_spectrum(grid, 50.0, B, R, k),
                         np.float64) for k in range(4)]
        e0 = float(np.dot(ms[0], ms[0]))
        for j in range(4):
            for k in range(j + 1, 4):
                assert abs(float(np.dot(ms[j], ms[k]))) < 2e-4 * e0

    def test_tail_is_clean(self):
        # far tail: the damping guard must give exact zeros, never NaN/inf
        grid = np.linspace(0, 5e5, 4096, dtype=np.float32)
        out = np.asarray(morse_taper_spectrum(grid, 10.0, B, R, 6))
        assert np.isfinite(out).all()
        assert (out[grid > 100.0] == 0.0).all()


class TestMultitaperPower:
    def _sig(self, e=6, n=512, seed=3):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / 1000.0
        return (np.sin(2 * np.pi * 60 * t)
                + 0.5 * rng.standard_normal((e, n))).astype(np.float32)

    def test_single_taper_equals_morse_power(self):
        sig = self._sig()[0]
        freqs = np.linspace(20, 100, 9)
        a = np.asarray(mt.multitaper_power(sig, freqs, 1000.0, n_tapers=1))
        b = np.asarray(nw.Morse(1000.0).power(sig, freqs))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_mean_power_equals_mean_of_power(self):
        sig = self._sig()
        freqs = np.linspace(20, 100, 7)
        a = np.asarray(mt.multitaper_mean_power(sig[:, None, :], freqs,
                                                1000.0, n_tapers=3))[0]
        b = np.asarray(mt.multitaper_power(sig, freqs, 1000.0,
                                           n_tapers=3)).mean(0)
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)

    def test_variance_reduction_on_noise(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((40, 2048)).astype(np.float32)
        freqs = [50.0, 120.0]
        p1 = np.asarray(mt.multitaper_power(x, freqs, 1000.0, n_tapers=1))
        p4 = np.asarray(mt.multitaper_power(x, freqs, 1000.0, n_tapers=4))
        # relative variance of the per-trial estimate at plane center
        mid = slice(512, 1536)
        for f in range(2):
            v1 = p1[:, f, mid].std() / p1[:, f, mid].mean()
            v4 = p4[:, f, mid].std() / p4[:, f, mid].mean()
            assert v4 < 0.65 * v1  # ~1/sqrt(4) = 0.5 ideal

    def test_peak_stays_on_signal(self):
        sig = self._sig()[0]
        freqs = np.linspace(20, 100, 17)
        p = np.asarray(mt.multitaper_power(sig, freqs, 1000.0, n_tapers=4))
        assert freqs[p[:, 128:384].mean(-1).argmax()] == pytest.approx(
            60.0, abs=5.01)

    def test_weights(self):
        sig = self._sig()[0]
        banks = mt.multitaper_banks([40.0, 60.0], sig.shape[-1], 1000.0,
                                    n_tapers=3)
        uni = np.asarray(mt.multitaper_power_from_banks(sig, banks))
        w = np.asarray(mt.multitaper_power_from_banks(
            sig, banks, weights=[1.0, 1.0, 1.0]))
        np.testing.assert_allclose(uni, w, rtol=1e-6, atol=1e-8)

    def test_model_class(self):
        sig = self._sig()
        freqs = np.linspace(20, 100, 5)
        m = nw.MorseMultitaper(1000.0, n_tapers=3)
        p = np.asarray(m.power(sig[0], freqs))
        assert p.shape == (5, 512)
        mp = np.asarray(m.mean_power(sig[:, None, :], freqs))
        assert mp.shape == (1, 5, 512)
        one = nw.MorseMultitaper(1000.0, n_tapers=1)
        np.testing.assert_allclose(
            np.asarray(one.power(sig[0], freqs)),
            np.asarray(nw.Morse(1000.0).power(sig[0], freqs)),
            rtol=1e-5, atol=1e-6)


class TestShardedAndAdapter:
    def test_sharded_matches_single_device(self):
        import ninwavelets_tpu.parallel as par
        rng = np.random.default_rng(4)
        sig = rng.standard_normal((8, 2, 256)).astype(np.float32)
        freqs = np.linspace(20, 80, 4)
        banks = mt.multitaper_banks(freqs, 256, 1000.0, n_tapers=3)
        single = np.asarray(mt.multitaper_mean_power(
            sig, freqs, 1000.0, n_tapers=3))
        for d, f in ((2, 4), (4, 2), (8, 1)):
            mesh = par.make_mesh(data=d, freq=f)
            out = np.asarray(par.sharded_multitaper_mean_power(
                sig, banks, mesh=mesh))
            np.testing.assert_allclose(out, single, rtol=2e-5, atol=1e-7)

    def test_adapter_multitaper_power(self):
        rng = np.random.default_rng(5)
        data = rng.standard_normal((6, 2, 256)).astype(np.float32)
        ew = nw.EpochsWavelet(
            nw.ArrayEpochs(data, 500.0, ch_names=["a", "b"]),
            nw.Morse(500.0))
        freqs = np.linspace(20, 80, 5)
        p = np.asarray(ew.multitaper_power("a", freqs, n_tapers=3))
        assert p.shape == (5, 256)
        # single taper == the ordinary epoch-mean power
        np.testing.assert_allclose(
            np.asarray(ew.multitaper_power("a", freqs, n_tapers=1)),
            np.asarray(ew.power("a", freqs)), rtol=1e-5, atol=1e-7)


class TestMultitaperConnectivity:
    FREQS = np.arange(20.0, 60.0, 8.0)
    SFREQ = 1000.0

    def _pair(self, coupled: bool, e=1, n=2048, seed=0):
        """Single (or few) epochs: shared 40 Hz source or independent."""
        rng = np.random.default_rng(seed)
        t = np.arange(n) / self.SFREQ
        sig = np.empty((e, 2, n), np.float32)
        for i in range(e):
            base = np.sin(2 * np.pi * 40 * t + rng.uniform(0, 2 * np.pi))
            sig[i, 0] = base + 0.4 * rng.standard_normal(n)
            # NOTE the uncoupled control must be broadband noise: at
            # E = 1 two same-frequency sinusoids are genuinely coherent
            # (a constant phase offset IS a linear relation).
            sig[i, 1] = (base + 0.4 * rng.standard_normal(n)
                         if coupled else rng.standard_normal(n))
        return sig

    def test_single_epoch_detects_coupling(self):
        """Epoch-wise coherence is degenerate (== 1) at E = 1; the
        taper-augmented estimator is not."""
        from ninwavelets_tpu.ops.multitaper import \
            multitaper_coherence_matrix
        row = int(np.argmin(np.abs(self.FREQS - 44.0)))
        hi = np.asarray(multitaper_coherence_matrix(
            self._pair(True), self.FREQS, self.SFREQ))
        lo = np.asarray(multitaper_coherence_matrix(
            self._pair(False, seed=1), self.FREQS, self.SFREQ))
        assert hi.shape == (self.FREQS.size, 2, 2)
        assert hi[row, 0, 1] > 0.7
        assert lo[row, 0, 1] < 0.4
        np.testing.assert_allclose(np.diagonal(hi, axis1=1, axis2=2),
                                   1.0, atol=1e-4)

    def test_matches_float64_oracle(self):
        from ninwavelets_tpu.ops.multitaper import (
            multitaper_banks, multitaper_coherence_matrix)
        x = self._pair(True, e=2, n=1024, seed=2)
        banks = np.asarray(multitaper_banks(
            self.FREQS, 1024, self.SFREQ, n_tapers=3), np.float64)
        got = np.asarray(multitaper_coherence_matrix(
            x, self.FREQS, self.SFREQ, n_tapers=3))
        spec = np.fft.fft(np.asarray(x, np.float64))    # (E, C, N)
        for f in range(banks.shape[0]):
            s = np.zeros((2, 2), complex)
            for k in range(3):
                w = np.fft.ifft(spec * banks[f, k])
                s += np.einsum('ean,ebn->ab', w, w.conj())
            num = np.abs(s) ** 2
            p = np.real(np.diag(s))
            want = num / np.maximum(p[:, None] * p[None, :],
                                    1e-12 * (p[:, None] * p[None, :]).max())
            np.testing.assert_allclose(got[f], want, rtol=2e-3,
                                       atol=2e-4)

    def test_partial_coherence_low_trials(self):
        """Mediated chain at E = 2 (rank-starved for the single-taper
        estimator at this time window) — tapers restore conditioning."""
        from ninwavelets_tpu.ops.multitaper import \
            multitaper_partial_coherence
        rng = np.random.default_rng(3)
        e, n = 2, 2048
        z = rng.standard_normal((e, 1, n))
        e2 = 0.5 * rng.standard_normal((e, 1, n))
        e3 = 0.5 * rng.standard_normal((e, 1, n))
        x = np.concatenate([z, z + e2, z + e2 + e3], 1).astype(np.float32)
        pc = np.asarray(multitaper_partial_coherence(
            x, self.FREQS, self.SFREQ)).mean(0)
        assert pc[0, 2] < 0.1
        assert pc[0, 1] > 0.25 and pc[1, 2] > 0.3
        np.testing.assert_allclose(np.diagonal(pc), 1.0, atol=1e-4)

    def test_adapter(self):
        from tests.test_epochs import FakeEpochs
        x = self._pair(True, e=2)
        ew = nw.EpochsWavelet(FakeEpochs(x, self.SFREQ),
                              nw.Morse(self.SFREQ))
        c = np.asarray(ew.multitaper_coherence_matrix(self.FREQS))
        assert c.shape == (self.FREQS.size, 2, 2)
        row = int(np.argmin(np.abs(self.FREQS - 44.0)))
        assert c[row, 0, 1] > 0.7
        pc = np.asarray(ew.multitaper_partial_coherence(self.FREQS))
        assert pc.shape == (self.FREQS.size, 2, 2)
