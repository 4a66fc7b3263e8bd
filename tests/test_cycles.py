"""Cycle-by-cycle analysis (`ops/cycles.py`): segmentation against a
numpy loop oracle, shape features on waveforms with known asymmetries,
and bycycle-style burst flagging."""
import jax.numpy as jnp
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import cycle_features
from ninwavelets_tpu.ops import cycles as cyc_mod

SFREQ = 500.0
N = 4096
T = np.arange(N) / SFREQ


def _sig(wave, noise=0.01, seed=0):
    rng = np.random.default_rng(seed)
    return (wave + noise * rng.standard_normal(N)).astype(np.float32)


def _oracle(x, f_range):
    """Loop reference: same filtered trace, same segmentation rule."""
    xf = np.asarray(cyc_mod._bandpass(jnp.asarray(x)[None], SFREQ,
                                      *f_range))[0]
    rises = [i for i in range(1, len(xf)) if xf[i - 1] < 0 <= xf[i]]
    falls = [i for i in range(1, len(xf)) if xf[i - 1] >= 0 > xf[i]]
    peaks = []
    for a in rises:
        b = next((f for f in falls if f > a), None)
        if b is not None:
            peaks.append(a + int(np.argmax(x[a:b])))
    troughs = []
    for a in falls:
        b = next((r for r in rises if r > a), None)
        if b is not None:
            troughs.append(a + int(np.argmin(x[a:b])))
    cycles = []
    for j in range(len(troughs) - 1):
        t0, t1 = troughs[j], troughs[j + 1]
        pk = [p for p in peaks if t0 < p < t1]
        if len(pk) != 1:
            continue
        cycles.append((t0, pk[0], t1))
    return cycles


class TestSegmentationOracle:
    def test_matches_loop_reference(self):
        x = _sig(np.sin(2 * np.pi * 8.0 * T)
                 + 0.3 * np.sin(2 * np.pi * 16.0 * T + 1.0), noise=0.02)
        ref = _oracle(x, (5.0, 12.0))
        tab = cycle_features(x, SFREQ, (5.0, 12.0))
        k = int(tab.n_cycles)
        assert k == len(ref)
        tr0 = np.round(np.asarray(tab.time_trough)[:k] * SFREQ)
        pk = np.round(np.asarray(tab.time_peak)[:k] * SFREQ)
        np.testing.assert_array_equal(tr0, [c[0] for c in ref])
        np.testing.assert_array_equal(pk, [c[1] for c in ref])


class TestShapeFeatures:
    def test_sine_is_symmetric(self):
        tab = cycle_features(_sig(np.sin(2 * np.pi * 8.0 * T)), SFREQ,
                             (5.0, 12.0))
        k = int(tab.n_cycles)
        assert 60 <= k <= 70  # ~8 Hz over 8.19 s
        assert abs(float(np.median(np.asarray(tab.freq_hz)[:k])) - 8.0) < 0.5
        assert abs(float(np.median(np.asarray(tab.rdsym)[:k])) - 0.5) < 0.05
        assert abs(float(np.median(np.asarray(tab.ptsym)[:k])) - 0.5) < 0.05
        assert float(np.median(np.asarray(tab.volt_amp)[:k])) > 1.5

    def test_sawtooth_rise_decay_asymmetry(self):
        ph = 2 * np.pi * 8.0 * T
        tab = cycle_features(_sig(np.sin(ph) + 0.35 * np.sin(2 * ph)),
                             SFREQ, (5.0, 12.0))
        k = int(tab.n_cycles)
        # fast rise, slow decay -> rise fraction well below 0.5
        assert float(np.median(np.asarray(tab.rdsym)[:k])) < 0.42

    def test_peak_trough_asymmetry(self):
        # bump train: narrow peaks, wide troughs -> ptsym < 0.5
        ph = 2 * np.pi * 8.0 * T
        bumps = np.exp(2.0 * np.cos(ph))
        bumps = bumps - bumps.mean()
        tab = cycle_features(_sig(bumps / bumps.std()), SFREQ,
                             (5.0, 12.0))
        k = int(tab.n_cycles)
        assert float(np.median(np.asarray(tab.ptsym)[:k])) < 0.45
        # symmetric rise/decay still
        assert abs(float(np.median(np.asarray(tab.rdsym)[:k])) - 0.5) < 0.05

    def test_monotonicity_drops_with_noise(self):
        clean = cycle_features(_sig(np.sin(2 * np.pi * 8.0 * T), 0.005),
                               SFREQ, (5.0, 12.0))
        noisy = cycle_features(_sig(np.sin(2 * np.pi * 8.0 * T), 0.2),
                               SFREQ, (5.0, 12.0))
        kc, kn = int(clean.n_cycles), int(noisy.n_cycles)
        assert (float(np.median(np.asarray(clean.monotonicity)[:kc]))
                > float(np.median(np.asarray(noisy.monotonicity)[:kn])) + 0.1)


class TestBursts:
    def test_continuous_oscillation_bursts(self):
        tab = cycle_features(_sig(np.sin(2 * np.pi * 8.0 * T)), SFREQ,
                             (5.0, 12.0))
        k = int(tab.n_cycles)
        assert float(np.mean(np.asarray(tab.is_burst)[:k])) > 0.9

    def test_gated_burst_localized(self):
        env = ((T > 2.0) & (T < 4.0)).astype(np.float32)
        x = _sig(np.sin(2 * np.pi * 8.0 * T) * env, noise=0.02, seed=1)
        tab = cycle_features(x, SFREQ, (5.0, 12.0), amp_fraction=0.3)
        k = int(tab.n_cycles)
        tpk = np.asarray(tab.time_peak)[:k]
        burst = np.asarray(tab.is_burst)[:k]
        inside = (tpk > 2.1) & (tpk < 3.9)
        assert burst[inside].mean() > 0.9
        assert burst[~inside].mean() < 0.1

    def test_pure_noise_no_bursts(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal(N).astype(np.float32)
        tab = cycle_features(x, SFREQ, (5.0, 12.0), amp_fraction=0.5,
                             monotonicity_threshold=0.9)
        k = int(tab.n_cycles)
        assert float(np.mean(np.asarray(tab.is_burst)[:k])) < 0.1


class TestSurface:
    def test_batched(self):
        x = _sig(np.sin(2 * np.pi * 8.0 * T))
        tab = cycle_features(np.stack([x, x]), SFREQ, (5.0, 12.0))
        assert tab.n_cycles.shape == (2,)
        assert int(tab.n_cycles[0]) == int(tab.n_cycles[1])
        np.testing.assert_allclose(np.asarray(tab.rdsym)[0],
                                   np.asarray(tab.rdsym)[1])

    def test_validation(self):
        x = np.zeros(64, np.float32)
        with pytest.raises(ValueError):
            cycle_features(x, SFREQ, (12.0, 5.0))
        with pytest.raises(ValueError):
            cycle_features(x, SFREQ, (5.0, 300.0))
        with pytest.raises(ValueError):
            cycle_features(np.zeros(8, np.float32), SFREQ, (5.0, 12.0))

    def test_adapter(self):
        class FakeEpochs:
            def __init__(self, data, sfreq):
                self._data = data
                self.info = {"sfreq": sfreq}
                self.ch_names = ["EEG 000"]

            def get_data(self):
                return self._data

            def __len__(self):
                return self._data.shape[0]

        x = _sig(np.sin(2 * np.pi * 8.0 * T))
        ep = FakeEpochs(np.stack([x, x])[:, None, :], SFREQ)
        ew = nw.EpochsWavelet(ep, nw.Morse(SFREQ))
        tab = ew.cycles("EEG 000", (5.0, 12.0))
        assert tab.n_cycles.shape == (2,)
        assert int(tab.n_cycles[0]) > 50


class TestReviewRegressions:
    def test_last_cycle_of_a_burst_flagged(self):
        # review finding: the consistency neighbor of the LAST valid
        # cycle used to be zero padding, vetoing every burst's end
        x = _sig(np.sin(2 * np.pi * 8.0 * T), noise=0.005)
        tab = cycle_features(x, SFREQ, (5.0, 12.0))
        k = int(tab.n_cycles)
        burst = np.asarray(tab.is_burst)[:k]
        assert bool(burst[-1])
        assert bool(burst[0])
        assert burst.mean() > 0.98
