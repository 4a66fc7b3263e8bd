"""Simulation module (ops.sim) + wavelet lagged coherence — generators
validated against their own ground truth, then fed to the analyses they
were built to validate."""
import jax.numpy as jnp
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import sim
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.connectivity import (lagged_coherence,
                                               lagged_coherence_morse)

SFREQ = 250.0


def _bank(freqs, n, sfreq=SFREQ):
    morse = nw.Morse(sfreq)
    return jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.asarray(freqs, np.float32)), n,
        sfreq, True), np.float32))


class TestGenerators:
    def test_powerlaw_slope(self):
        x = np.asarray(sim.powerlaw_noise(0, (16, 4096), exponent=-2.0))
        assert x.shape == (16, 4096)
        np.testing.assert_allclose(x.std(-1), 1.0, atol=1e-4)
        np.testing.assert_allclose(x.mean(-1), 0.0, atol=1e-4)
        psd = (np.abs(np.fft.rfft(x)) ** 2).mean(0)
        f = np.arange(1, 2049)
        slope = np.polyfit(np.log(f[8:512]), np.log(psd[8:512]), 1)[0]
        assert slope == pytest.approx(-2.0, abs=0.3)

    def test_white_is_flat(self):
        x = np.asarray(sim.powerlaw_noise(1, (8, 2048), exponent=0.0))
        psd = (np.abs(np.fft.rfft(x)) ** 2).mean(0)
        slope = np.polyfit(np.log(np.arange(8, 512)),
                           np.log(psd[8:512]), 1)[0]
        assert abs(slope) < 0.2

    def test_ar1_autocorrelation(self):
        r = 0.8
        x = np.asarray(sim.ar1_noise(2, (8, 8192), r=r)).astype(np.float64)
        assert x.var(-1).mean() == pytest.approx(1.0, abs=0.1)
        lag1 = np.mean([np.corrcoef(row[:-1], row[1:])[0, 1] for row in x])
        assert lag1 == pytest.approx(r, abs=0.05)
        with pytest.raises(ValueError):
            sim.ar1_noise(0, (4,), r=1.0)

    def test_oscillation(self):
        x = np.asarray(sim.oscillation(1000, SFREQ, 10.0))
        assert x.var() == pytest.approx(1.0, abs=1e-3)
        peak = np.abs(np.fft.rfft(x)).argmax() * SFREQ / 1000
        assert peak == pytest.approx(10.0, abs=0.3)

    def test_asym_oscillation_rdsym(self):
        # rdsym = 0.5 reduces to the pure sinusoid
        a = np.asarray(sim.asym_oscillation(1000, SFREQ, 5.0, 0.5))
        b = np.asarray(sim.oscillation(1000, SFREQ, 5.0, -np.pi / 2))
        np.testing.assert_allclose(a, b, atol=1e-4)
        # rdsym = 0.2: rise (trough->peak) takes 20% of the period
        x = np.asarray(sim.asym_oscillation(5000, SFREQ, 5.0, 0.2))
        period = int(SFREQ / 5.0)
        cyc = x[period:2 * period]
        rise = (cyc.argmax() - cyc.argmin()) % period
        assert rise / period == pytest.approx(0.2, abs=0.05)
        with pytest.raises(ValueError):
            sim.asym_oscillation(100, SFREQ, 5.0, 1.0)

    def test_asym_oscillation_agrees_with_cycles(self):
        # the cycle analyzer recovers the planted rise-decay asymmetry
        from ninwavelets_tpu.ops.cycles import cycle_features
        x = sim.asym_oscillation(4096, SFREQ, 8.0, 0.3)
        tab = cycle_features(x, SFREQ, f_range=(6.0, 10.0))
        k = int(tab.n_cycles)
        rd = np.asarray(tab.rdsym)[:k]
        assert rd.mean() == pytest.approx(0.3, abs=0.06)

    def test_bursty_oscillation(self):
        x, mask = sim.bursty_oscillation(3, 4096, SFREQ, 10.0,
                                         enter_prob=0.3, leave_prob=0.3)
        x, mask = np.asarray(x), np.asarray(mask)
        assert set(np.unique(mask)) <= {0.0, 1.0}
        assert np.all(x[mask == 0.0] == 0.0)
        assert 0.05 < mask.mean() < 0.95
        with pytest.raises(ValueError):
            sim.bursty_oscillation(0, 100, SFREQ, 10.0, enter_prob=2.0)

    def test_combine_snr(self):
        osc = sim.oscillation(4096, SFREQ, 10.0)
        noise = sim.powerlaw_noise(4, (4096,), 0.0)
        x = np.asarray(sim.combine(osc, noise, snr_db=20.0))
        assert x.std() == pytest.approx(1.0, abs=1e-3)
        # at +20 dB the oscillation dominates: spectral peak at 10 Hz
        peak = np.abs(np.fft.rfft(x)).argmax() * SFREQ / 4096
        assert peak == pytest.approx(10.0, abs=0.3)


class TestLaggedCoherence:
    FREQS = np.arange(5.0, 30.0, 1.0)

    def test_sustained_rhythm_is_one(self):
        n = 4096
        sig = sim.oscillation(n, SFREQ, 12.0)
        lc = np.asarray(lagged_coherence(sig, _bank(self.FREQS, n),
                                         self.FREQS, SFREQ))
        assert lc.shape == (len(self.FREQS),)
        assert lc[self.FREQS == 12.0][0] > 0.95

    def test_noise_is_low(self):
        # with a SHORT (3-cycle) window and lag >= the window, noise
        # samples are near-independent; the long default wavelet at
        # lag=1 would sit near its own autocorrelation (~0.85)
        n = 4096
        sig = sim.powerlaw_noise(5, (n,), 0.0)
        lc = np.asarray(lagged_coherence_morse(sig, self.FREQS, SFREQ))
        assert lc.max() < 0.45

    def test_morse_variant_keeps_rhythm_high(self):
        n = 4096
        sig = sim.oscillation(n, SFREQ, 12.0)
        lc = np.asarray(lagged_coherence_morse(sig, self.FREQS, SFREQ))
        assert lc[self.FREQS == 12.0][0] > 0.95

    def test_rhythm_beats_burst(self):
        # equal-power sustained rhythm vs a brief transient: lagged
        # coherence separates them where mean power cannot
        n = 4096
        rng = np.random.default_rng(6)
        noise = np.asarray(sim.powerlaw_noise(7, (2, n), 0.0))
        t = np.arange(n) / SFREQ
        sustained = np.sin(2 * np.pi * 12.0 * t) * 0.7
        burst = np.zeros(n)
        burst[1000:1250] = np.sin(2 * np.pi * 12.0 * t[1000:1250]) * np.sqrt(n / 250) * 0.7
        sigs = np.stack([noise[0] + sustained,
                         noise[1] + burst]).astype(np.float32)
        lc = np.asarray(lagged_coherence_morse(sigs, self.FREQS, SFREQ))
        i = int(np.argwhere(self.FREQS == 12.0))
        assert lc[0, i] > lc[1, i] + 0.2

    def test_batched_matches_rows(self):
        n = 2048
        sigs = np.asarray(sim.powerlaw_noise(8, (3, n), -1.0))
        bank = _bank(self.FREQS, n)
        full = np.asarray(lagged_coherence(sigs, bank, self.FREQS, SFREQ))
        row = np.asarray(lagged_coherence(sigs[1], bank, self.FREQS,
                                          SFREQ))
        np.testing.assert_allclose(full[1], row, rtol=1e-5, atol=1e-6)

    def test_lag_and_validation(self):
        n = 2048
        sig = sim.oscillation(n, SFREQ, 12.0)
        bank = _bank(self.FREQS, n)
        lc2 = np.asarray(lagged_coherence(sig, bank, self.FREQS, SFREQ,
                                          lag=2))
        assert lc2[self.FREQS == 12.0][0] > 0.95
        with pytest.raises(ValueError):
            lagged_coherence(sig, bank, self.FREQS, SFREQ, lag=0)
        with pytest.raises(ValueError):
            lagged_coherence(sig, bank[:, :100], self.FREQS, SFREQ)
        with pytest.raises(ValueError):
            lagged_coherence(sig[:4], _bank(self.FREQS, 4), self.FREQS,
                             SFREQ)

    def test_pooled_epochs_and_adapter(self):
        n = 1024
        e = 6
        t = np.arange(n) / SFREQ
        rng = np.random.default_rng(9)
        sig = (np.sin(2 * np.pi * 12.0 * t)[None, :]
               + 0.3 * rng.standard_normal((e, n))).astype(np.float32)
        bank = _bank(self.FREQS, n)
        pooled = np.asarray(lagged_coherence(sig, bank, self.FREQS,
                                             SFREQ, pooled=True))
        assert pooled.shape == (len(self.FREQS),)
        assert pooled[self.FREQS == 12.0][0] > 0.9
        from ninwavelets_tpu.utils.mne_adapter import (ArrayEpochs,
                                                       EpochsWavelet)
        ew = EpochsWavelet(ArrayEpochs(sig[:, None, :], SFREQ, ["ch0"]),
                           nw.Morse(SFREQ))
        lc = np.asarray(ew.lagged_coherence("ch0", self.FREQS))
        assert lc.shape == (len(self.FREQS),)
        assert lc[self.FREQS == 12.0][0] > 0.9


class TestIAAFT:
    def test_distribution_exact_spectrum_close(self):
        from ninwavelets_tpu.ops.sim import iaaft_surrogates, powerlaw_noise
        x = np.asarray(powerlaw_noise(0, (2048,), exponent=-1.0))
        s = np.asarray(iaaft_surrogates(1, x, n_surrogates=3, n_iter=50))
        assert s.shape == (3, 2048)
        for k in range(3):
            # amplitude distribution EXACT (rank remap ends every iter)
            np.testing.assert_array_equal(np.sort(s[k]), np.sort(x))
            # power spectrum approximately preserved
            pa = np.abs(np.fft.rfft(x)) ** 2
            pb = np.abs(np.fft.rfft(s[k])) ** 2
            num = np.sum((pa[1:] - pb[1:]) ** 2)
            assert num / np.sum(pa[1:] ** 2) < 0.05
            assert not np.array_equal(s[k], x)      # actually shuffled

    def test_destroys_nonlinear_structure(self):
        """Time-asymmetry statistic E[(dx)^3] of a time-irreversible
        STOCHASTIC process (shot noise: fast rise, slow decay): large
        observed, ~0 for the IAAFT surrogates -> one-sided p < 0.05.
        (A strictly periodic signal would be a bad positive control —
        its harmonic amplitude structure lets the iteration re-lock the
        phases to a time shift of the original, the documented IAAFT
        periodicity caveat.)"""
        from ninwavelets_tpu.ops.sim import iaaft_surrogates
        rng = np.random.default_rng(0)
        n = 2048
        spikes = (rng.random(n) < 0.02) * rng.exponential(1.0, n)
        kernel = np.exp(-np.arange(100) / 15.0)
        x = np.convolve(spikes, kernel)[:n]             + 0.05 * rng.standard_normal(n)
        x = (x / x.std()).astype(np.float32)

        def tasym(v):
            d = np.diff(v)
            return np.mean(d ** 3) / np.mean(d ** 2) ** 1.5

        obs = abs(tasym(x))
        sur = np.asarray(iaaft_surrogates(2, x, n_surrogates=19,
                                          n_iter=100))
        null = np.array([abs(tasym(sur[k])) for k in range(19)])
        assert obs > 3 * null.max()     # decisive, not marginal

    def test_batched_and_validation(self):
        from ninwavelets_tpu.ops.sim import iaaft_surrogates
        rng = np.random.default_rng(3)
        x = rng.standard_normal((2, 3, 512)).astype(np.float32)
        s = np.asarray(iaaft_surrogates(0, x, n_surrogates=2, n_iter=20))
        assert s.shape == (2, 2, 3, 512)
        with pytest.raises(ValueError, match="power of two"):
            iaaft_surrogates(0, np.zeros(1000, np.float32))
