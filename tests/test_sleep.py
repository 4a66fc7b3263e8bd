"""Sleep event detection (`ops/sleep.py`): planted spindles and slow
oscillations recovered with correct timing/frequency; criteria
filtering; the RawWavelet surface."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.sleep import (detect_slow_oscillations,
                                       detect_spindles)

SFREQ = 200.0


def _spindle_signal(n_s=60, events=((10.0, 1.0), (25.0, 0.8),
                                    (43.5, 1.4)), f_spindle=13.0,
                    seed=0):
    """Background pink-ish noise + amplitude-modulated sigma bursts."""
    rng = np.random.default_rng(seed)
    n = int(n_s * SFREQ)
    # mild 1/f background
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / SFREQ)
    spec[1:] /= np.sqrt(f[1:])
    x = np.fft.irfft(spec, n=n)
    x = x / x.std()
    t = np.arange(n) / SFREQ
    for t0, dur in events:
        m = (t >= t0) & (t < t0 + dur)
        ph = 2 * np.pi * f_spindle * (t[m] - t0)
        hann = np.sin(np.pi * (t[m] - t0) / dur) ** 2
        x[m] += 4.0 * hann * np.sin(ph)
    return x.astype(np.float32), [e[0] for e in events]


class TestSpindles:
    def test_planted_events_recovered(self):
        x, starts = _spindle_signal()
        tab = detect_spindles(x, SFREQ)
        v = np.asarray(tab.valid)
        got = np.asarray(tab.start)[v] / SFREQ
        assert v.sum() == 3, got
        for t0 in starts:
            assert np.min(np.abs(got - t0)) < 0.3
        f = np.asarray(tab.freq)[v]
        assert np.all(np.abs(f - 13.0) < 1.5)
        d = np.asarray(tab.duration)[v]
        assert np.all((d > 0.3) & (d < 2.0))

    def test_quiet_background_no_events(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(int(60 * SFREQ)).astype(np.float32)
        tab = detect_spindles(x, SFREQ, thresh=4.0)
        assert np.asarray(tab.valid).sum() == 0

    def test_duration_criterion(self):
        # a 0.2 s burst is below the minimum duration
        x, _ = _spindle_signal(events=((20.0, 0.2),), seed=2)
        tab = detect_spindles(x, SFREQ)
        assert np.asarray(tab.valid).sum() == 0

    def test_batched(self):
        x0, _ = _spindle_signal(seed=3)
        x1, _ = _spindle_signal(events=((5.0, 1.0),), seed=4)
        tab = detect_spindles(np.stack([x0, x1]), SFREQ)
        v = np.asarray(tab.valid)
        assert v.shape[0] == 2
        assert v[0].sum() == 3 and v[1].sum() == 1

    def test_validation(self):
        with pytest.raises(ValueError):
            detect_spindles(np.zeros(50, np.float32), SFREQ)
        with pytest.raises(ValueError):
            detect_spindles(np.zeros(1000, np.float32), SFREQ,
                            freq_range=(90.0, 120.0))


def _so_signal(n_s=120, events=(20.0, 50.0, 90.0), seed=0):
    """Small background + large ~0.8 Hz single-cycle waves (negative
    half first, the Massimini shape)."""
    rng = np.random.default_rng(seed)
    n = int(n_s * SFREQ)
    x = 0.15 * rng.standard_normal(n)
    t = np.arange(n) / SFREQ
    for t0 in events:
        dur = 1.25                      # one 0.8 Hz cycle
        m = (t >= t0) & (t < t0 + dur)
        x[m] += -3.0 * np.sin(2 * np.pi * (t[m] - t0) / dur)
    return x.astype(np.float32), events


class TestSlowOscillations:
    def test_planted_events_recovered(self):
        x, starts = _so_signal()
        tab = detect_slow_oscillations(x, SFREQ)
        v = np.asarray(tab.valid)
        got = np.asarray(tab.start)[v] / SFREQ
        assert v.sum() == 3, (v.sum(), got)
        for t0 in starts:
            assert np.min(np.abs(got - t0)) < 0.4
        # trough amplitude ~ -3, cycle freq ~ 0.8 Hz
        assert np.all(np.asarray(tab.peak_amp)[v] < -2.0)
        f = np.asarray(tab.freq)[v]
        assert np.all((f > 0.4) & (f < 1.4))

    def test_amplitude_criterion_absolute(self):
        x, _ = _so_signal(seed=1)
        tab = detect_slow_oscillations(x, SFREQ, amp_neg=10.0,
                                       amp_ptp=20.0)   # way above
        assert np.asarray(tab.valid).sum() == 0

    def test_quiet_background_no_events(self):
        rng = np.random.default_rng(2)
        x = 0.15 * rng.standard_normal(int(120 * SFREQ))
        tab = detect_slow_oscillations(x.astype(np.float32), SFREQ)
        assert np.asarray(tab.valid).sum() == 0

    def test_validation(self):
        with pytest.raises(ValueError):
            detect_slow_oscillations(np.zeros(100, np.float32), SFREQ)
        with pytest.raises(ValueError):
            detect_slow_oscillations(np.zeros(100000, np.float32),
                                     SFREQ, amp_neg=1.0)


class TestRawAdapter:
    class FakeRaw:
        def __init__(self, data, sfreq=SFREQ):
            self._data = data
            self.info = {"sfreq": sfreq}
            self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[0])]

        def get_data(self):
            return self._data

    def test_raw_surface(self):
        x0, _ = _spindle_signal(seed=5)
        so, _ = _so_signal(n_s=60, events=(20.0, 40.0), seed=6)
        data = np.stack([x0, so])
        rw = nw.RawWavelet(self.FakeRaw(data), nw.Morse(SFREQ))
        sp = rw.spindles()
        assert np.asarray(sp.valid).shape[0] == 2
        assert np.asarray(sp.valid)[0].sum() == 3
        so_tab = rw.slow_oscillations()
        assert np.asarray(so_tab.valid)[1].sum() == 2
