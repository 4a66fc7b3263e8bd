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


class TestAdapterPSD:
    """`EpochsWavelet.psd` / `RawWavelet.psd` (Welch, adapter surface)."""

    def _raw(self, data, sfreq=256.0, names=None):
        import ninwavelets_tpu as nw
        names = names or [f"c{i}" for i in range(data.shape[0])]
        raw = type("R", (), {"_d": data.astype(np.float32),
                             "info": {"sfreq": sfreq}, "ch_names": names,
                             "get_data": lambda s: s._d})()
        return nw.RawWavelet(raw, nw.Morse(sfreq), window=1024)

    def test_raw_matches_scipy(self):
        from scipy.signal import welch as sp_welch
        rng = np.random.default_rng(0)
        x = rng.standard_normal((3, 8192)).astype(np.float32)
        rw = self._raw(x)
        freqs, psd = rw.psd(nperseg=512)
        f_sp, p_sp = sp_welch(x, fs=256.0, window="hamming", nperseg=512,
                              noverlap=256, detrend="constant")
        np.testing.assert_allclose(freqs, f_sp)
        np.testing.assert_allclose(psd, p_sp, rtol=2e-2, atol=1e-6)

    def test_band_crop_peak_and_picks(self):
        t = np.arange(8192) / 256.0
        x = np.stack([np.sin(2 * np.pi * 10.0 * t),
                      np.sin(2 * np.pi * 40.0 * t)])
        rw = self._raw(x, names=["a", "b"])
        freqs, psd = rw.psd(band=(5.0, 20.0), picks=["b", "a"])
        assert freqs[0] >= 5.0 and freqs[-1] <= 20.0
        # picked order: row 0 is "b" (40 Hz -> flat in band),
        # row 1 is "a" (10 Hz peak)
        assert abs(freqs[np.argmax(psd[1])] - 10.0) < 1.0
        assert psd[1].max() > 100 * psd[0].max()

    def test_epochs_mean_and_per_epoch(self):
        import ninwavelets_tpu as nw
        rng = np.random.default_rng(1)
        d = rng.standard_normal((5, 3, 2048)).astype(np.float32)
        ep = type("E", (), {"_d": d, "info": {"sfreq": 256.0},
                            "ch_names": ["a", "b", "c"],
                            "get_data": lambda s: s._d})()
        ew = nw.EpochsWavelet(ep, nw.Morse(256.0))
        freqs, pm = ew.psd(nperseg=512)
        _, pe = ew.psd(nperseg=512, average=False)
        assert pm.shape == (3, 257) and pe.shape == (5, 3, 257)
        np.testing.assert_allclose(pm, pe.mean(0), rtol=1e-5, atol=1e-8)

    def test_nperseg_clamp_and_validation(self):
        rng = np.random.default_rng(2)
        rw = self._raw(rng.standard_normal((2, 600)).astype(np.float32))
        freqs, psd = rw.psd(nperseg=1024)      # clamps to 512
        assert psd.shape == (2, 257)
        with pytest.raises(ValueError, match="band"):
            rw.psd(band=(200.0, 300.0))        # beyond 128 Hz Nyquist
