"""Filtering/resampling (`ops/filtering.py`): gain responses, scipy
resample oracle (pow2 and arbitrary ratios), anti-aliasing, and the
RawWavelet conveniences."""
import numpy as np
import pytest
from scipy import signal as sps

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import (bandpass, highpass, lowpass, notch,
                                 resample)

SFREQ = 500.0
N = 4096
T = np.arange(N) / SFREQ


def _tone(f, amp=1.0):
    return (amp * np.sin(2 * np.pi * f * T)).astype(np.float32)


def _rms(x):
    return float(np.sqrt(np.mean(np.square(np.asarray(x, np.float64)))))


class TestFilters:
    def test_bandpass_gains(self):
        x = _tone(5.0) + _tone(20.0) + _tone(80.0)
        y = np.asarray(bandpass(x, SFREQ, 12.0, 35.0))
        mid = slice(N // 8, -N // 8)
        # passband tone survives, stopband tones die
        for f, lo, hi in ((20.0, 0.95, 1.05), (5.0, 0.0, 0.05),
                          (80.0, 0.0, 0.05)):
            ref = _tone(f)
            g = abs(np.dot(y[mid], ref[mid]) / np.dot(ref[mid], ref[mid]))
            assert lo <= g <= hi, (f, g)

    def test_low_high_complementary(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(N).astype(np.float32)
        lo = np.asarray(lowpass(x, SFREQ, 30.0))
        hi = np.asarray(highpass(x, SFREQ, 30.0))
        # raised-cosine edges at the same cut are power-complementary
        # in amplitude: lo + hi == x exactly on the rfft grid
        np.testing.assert_allclose(lo + hi, x, atol=1e-4)

    def test_notch_kills_line(self):
        x = _tone(10.0) + _tone(50.0, 2.0)
        y = np.asarray(notch(x, SFREQ, 50.0, width=4.0))
        mid = slice(N // 8, -N // 8)
        line = _tone(50.0)
        g50 = abs(np.dot(y[mid], line[mid]) / np.dot(line[mid], line[mid]))
        sig = _tone(10.0)
        g10 = abs(np.dot(y[mid], sig[mid]) / np.dot(sig[mid], sig[mid]))
        assert g50 < 0.02
        assert 0.95 < g10 < 1.05

    def test_batched_and_validation(self):
        x = np.stack([_tone(20.0), _tone(30.0)])
        y = bandpass(x, SFREQ, 10.0, 40.0)
        assert y.shape == x.shape
        with pytest.raises(ValueError):
            bandpass(x, SFREQ, 40.0, 10.0)
        with pytest.raises(ValueError):
            lowpass(x, SFREQ, 400.0)
        with pytest.raises(ValueError):
            notch(x, SFREQ, 249.0, width=5.0)


class TestResample:
    def _sig(self, n=1024, seed=0):
        rng = np.random.default_rng(seed)
        k = sps.firwin(129, 0.2)
        s = np.convolve(rng.standard_normal(n + 256), k, mode="same")
        return s[128:128 + n].astype(np.float32)

    def test_pow2_ratios_match_scipy(self):
        x = self._sig()
        for new in (256.0, 512.0, 2048.0):
            y, sf = resample(x, 1024.0, new)
            assert sf == new
            m = int(round(1024 * new / 1024.0))
            ref = sps.resample(x.astype(np.float64), m)
            err = np.max(np.abs(np.asarray(y) - ref)) / np.abs(ref).max()
            assert err < 2e-3, (new, err)

    def test_arbitrary_ratios_match_scipy(self):
        x = self._sig(seed=1)
        for new in (300.0, 700.0, 999.0, 1300.0):
            y, _ = resample(x, 1024.0, new)
            m = int(round(1024 * new / 1024.0))
            ref = sps.resample(x.astype(np.float64), m)
            err = np.max(np.abs(np.asarray(y) - ref)) / np.abs(ref).max()
            assert err < 3e-3, (new, err)

    def test_downsample_antialiases(self):
        # content above the new Nyquist must vanish, not fold down
        x = (_tone(10.0) + _tone(180.0))[: 2048]
        y, _ = resample(x, SFREQ, 125.0)          # Nyquist 62.5 Hz
        ty = np.arange(y.shape[-1]) / 125.0
        ref10 = np.sin(2 * np.pi * 10.0 * ty)
        mid = slice(64, -64)
        g10 = abs(np.dot(np.asarray(y)[mid], ref10[mid])
                  / np.dot(ref10[mid], ref10[mid]))
        assert 0.9 < g10 < 1.1
        resid = np.asarray(y)[mid] - g10 * ref10[mid]
        assert _rms(resid) < 0.05 * _rms(ref10[mid])

    def test_tone_roundtrip(self):
        x = _tone(12.0)
        y, _ = resample(x, SFREQ, 200.0)
        z, _ = resample(y, 200.0, SFREQ)
        z = np.asarray(z)
        mm = min(z.shape[-1], N)       # rounding can differ by one
        mid = slice(N // 8, mm - N // 8)
        assert np.max(np.abs(z[mid] - x[mid])) < 0.02

    def test_validation(self):
        with pytest.raises(ValueError):
            resample(_tone(5.0), SFREQ, -1.0)


class FakeRaw:
    def __init__(self, data, sfreq):
        self._data = data
        self.info = {"sfreq": sfreq}
        self.ch_names = [f"EEG {i}" for i in range(data.shape[0])]

    def get_data(self):
        return self._data


class TestRawConveniences:
    def test_filter_and_resample(self):
        x = np.stack([_tone(10.0) + _tone(50.0, 2.0),
                      _tone(25.0) + _tone(50.0, 2.0)])
        rw = nw.RawWavelet(FakeRaw(x, SFREQ), nw.Morse(SFREQ))
        y = rw.filter(f_lo=5.0, f_hi=40.0, notch_hz=50.0)
        assert y.shape == x.shape
        line = _tone(50.0)
        mid = slice(N // 8, -N // 8)
        g = abs(np.dot(y[0][mid], line[mid]) / np.dot(line[mid], line[mid]))
        assert g < 0.05
        z, sf = rw.resample(125.0)
        assert sf == 125.0
        assert z.shape == (2, N // 4)
