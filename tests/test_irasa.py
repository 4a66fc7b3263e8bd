"""IRASA fractal/oscillatory separation (ops/irasa.py)."""
import numpy as np
import pytest
from scipy import signal as ss

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.irasa import (aperiodic_fit, irasa, welch_psd)

SFREQ = 500.0


def _fractal_plus_tone(n=60_000, chi_amp=5.0, f0=10.0, a0=0.8, seed=0):
    rng = np.random.default_rng(seed)
    w = np.cumsum(rng.standard_normal(n))          # 1/f^2 process
    w -= np.linspace(w[0], w[-1], n)               # kill the ramp
    t = np.arange(n) / SFREQ
    return (w / np.abs(w).max() * chi_amp
            + a0 * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


class TestWelch:
    def test_matches_scipy(self):
        sig = _fractal_plus_tone(20_000)
        ours = np.asarray(welch_psd(sig, sfreq=SFREQ, nperseg=1024))
        f, ref = ss.welch(sig, fs=SFREQ, window="hamming", nperseg=1024,
                          noverlap=512, detrend="constant")
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3 * ref.max(),
                                   rtol=5e-3)

    def test_batched(self):
        rng = np.random.default_rng(1)
        sigs = rng.standard_normal((3, 2, 8192)).astype(np.float32)
        p = np.asarray(welch_psd(sigs, sfreq=SFREQ, nperseg=512))
        assert p.shape == (3, 2, 257)
        solo = np.asarray(welch_psd(sigs[2, 1], sfreq=SFREQ, nperseg=512))
        np.testing.assert_allclose(p[2, 1], solo, rtol=1e-6)


class TestIrasa:
    def test_exact_decomposition(self):
        res = irasa(_fractal_plus_tone(), SFREQ, band=(1.0, 40.0))
        np.testing.assert_array_equal(
            np.asarray(res.psd),
            np.asarray(res.fractal) + np.asarray(res.oscillatory))

    def test_recovers_exponent_and_peak(self):
        res = irasa(_fractal_plus_tone(), SFREQ, band=(1.0, 40.0))
        off, chi = aperiodic_fit(res.freqs, res.fractal)
        assert abs(float(chi) - 2.0) < 0.35        # true 1/f^2
        osc = np.asarray(res.oscillatory)
        f = np.asarray(res.freqs)
        assert abs(f[osc.argmax()] - 10.0) < 0.5
        # the peak towers over the residual background
        bg = np.median(np.abs(osc[(f < 8) | (f > 12)]))
        assert osc.max() > 50 * bg

    def test_pure_fractal_has_no_peaks(self):
        sig = _fractal_plus_tone(a0=0.0, seed=3)
        res = irasa(sig, SFREQ, band=(2.0, 40.0))
        osc = np.asarray(res.oscillatory)
        psd = np.asarray(res.psd)
        # oscillatory residual is a small fraction of total power
        assert np.abs(osc).sum() < 0.25 * psd.sum()

    def test_validation(self):
        with pytest.raises(ValueError):
            irasa(np.zeros(4096, np.float32), SFREQ, hset=[0.9, 1.1])
        with pytest.raises(ValueError):
            irasa(np.zeros(4096, np.float32), SFREQ, band=(300.0, 400.0))

    def test_raw_adapter(self):
        data = np.stack([_fractal_plus_tone(20_000, seed=4),
                         _fractal_plus_tone(20_000, a0=0.0, seed=5)])

        class FakeRaw:
            info = {"sfreq": SFREQ}
            ch_names = ["a", "b"]

            def get_data(self):
                return data

        rw = nw.RawWavelet(FakeRaw(), nw.Morse(SFREQ))
        res = rw.irasa(band=(2.0, 40.0))
        assert np.asarray(res.psd).shape[0] == 2
        osc = np.asarray(res.oscillatory)
        f = np.asarray(res.freqs)
        assert abs(f[osc[0].argmax()] - 10.0) < 0.5
        sub = rw.irasa(band=(2.0, 40.0), picks=["b"])
        assert np.asarray(sub.psd).shape[0] == 1
