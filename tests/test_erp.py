"""ERP measurement (`ops/erp.py`): known-waveform latency/amplitude
oracles, fractional-area midpoints, Miller-Ulrich jackknife onsets, and
the adapter surface."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.erp import (evoked, fractional_area_latency,
                                     fractional_peak_onset,
                                     jackknife_onsets, mean_amplitude,
                                     peak_measures)


def _component(n=600, center=300, width=40.0, amp=5.0):
    t = np.arange(n, dtype=np.float64)
    return amp * np.exp(-0.5 * ((t - center) / width) ** 2)


class TestPeak:
    def test_known_gaussian(self):
        w = _component().astype(np.float32)
        res = peak_measures(w, window=(100, 500))
        assert int(res.latency) == 300
        np.testing.assert_allclose(float(res.amplitude), 5.0, rtol=1e-5)

    def test_negative_polarity(self):
        w = (-_component()).astype(np.float32)
        res = peak_measures(w, window=(100, 500), polarity=-1)
        assert int(res.latency) == 300
        np.testing.assert_allclose(float(res.amplitude), -5.0, rtol=1e-5)

    def test_batched_and_window_is_absolute(self):
        w = np.stack([_component(center=250), _component(center=350)])
        res = peak_measures(w.astype(np.float32), window=(200, 400))
        np.testing.assert_array_equal(np.asarray(res.latency),
                                      [250, 350])

    def test_mean_amplitude(self):
        w = _component().astype(np.float32)
        got = float(mean_amplitude(w, (280, 320)))
        np.testing.assert_allclose(got, w[280:320].mean(), rtol=1e-6)

    def test_window_validation(self):
        with pytest.raises(ValueError):
            peak_measures(np.zeros(100, np.float32), window=(50, 200))


class TestFractionalArea:
    def test_symmetric_midpoint(self):
        w = _component().astype(np.float32)
        lat = int(fractional_area_latency(w, (100, 500), 0.5))
        assert abs(lat - 300) <= 1       # symmetric -> center

    def test_quartiles_ordered(self):
        w = _component().astype(np.float32)
        l25 = int(fractional_area_latency(w, (100, 500), 0.25))
        l50 = int(fractional_area_latency(w, (100, 500), 0.5))
        l75 = int(fractional_area_latency(w, (100, 500), 0.75))
        assert l25 < l50 < l75

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        w = (_component() + 0.3 * rng.standard_normal(600)).astype(
            np.float32)
        lo, hi = 150, 450
        seg = np.maximum(np.asarray(w[lo:hi], np.float64), 0.0)
        c = np.cumsum(seg)
        want = lo + int(np.argmax(c >= 0.5 * c[-1]))
        got = int(fractional_area_latency(w, (lo, hi), 0.5))
        assert got == want

    def test_validation(self):
        with pytest.raises(ValueError):
            fractional_area_latency(np.zeros(100, np.float32),
                                    (0, 100), 1.5)


class TestOnset:
    def test_ramp_crossing(self):
        # linear ramp 0..1 over [200, 400]: 50%-of-peak onset = 300
        w = np.zeros(600, np.float32)
        w[200:400] = np.linspace(0, 1, 200)
        w[400:] = 0.0
        on = int(fractional_peak_onset(w, (100, 420), 0.5))
        assert abs(on - 300) <= 2

    def test_jackknife_recovers_onset_with_tight_se(self):
        rng = np.random.default_rng(1)
        w = _component(center=320, width=30.0)
        x = (w[None, :] + 0.5 * rng.standard_normal((30, 600))).astype(
            np.float32)
        ons, mean, se = jackknife_onsets(x, (150, 500), 0.5)
        assert ons.shape == (30,)
        # onset of a width-30 gaussian at 50% of peak: ~320 - 35
        assert 250 < float(mean) < 320
        assert float(se) < 25           # subsample averages are stable
        # leave-one-out onsets hug the full-sample onset
        full = int(fractional_peak_onset(x.mean(0), (150, 500), 0.5))
        assert np.abs(np.asarray(ons) - full).max() < 30

    def test_validation(self):
        with pytest.raises(ValueError):
            jackknife_onsets(np.zeros((1, 100), np.float32), (0, 100))


class TestAdapter:
    def test_epochs_erp_surface(self):
        from tests.test_epochs import FakeEpochs
        rng = np.random.default_rng(2)
        w = _component(center=300, width=30.0)
        data = np.stack([
            np.stack([w + 0.3 * rng.standard_normal(600),
                      -w + 0.3 * rng.standard_normal(600)])
            for _ in range(20)]).astype(np.float32)     # (20, 2, 600)
        ew = nw.EpochsWavelet(FakeEpochs(data, 1000.0), nw.Morse(1000.0))
        ev = np.asarray(ew.evoked())
        assert ev.shape == (2, 600)
        np.testing.assert_allclose(ev, data.mean(0), rtol=1e-5,
                                   atol=1e-6)
        pk = ew.erp_peak(window=(0.2, 0.4))
        assert abs(int(np.asarray(pk.latency)[0]) - 300) < 10
        pkn = ew.erp_peak(window=(0.2, 0.4), polarity=-1)
        assert float(np.asarray(pkn.amplitude)[1]) < -3
        ons, mean, se = ew.erp_onset((0.15, 0.5))
        assert ons.shape == (20, 2)
        assert float(np.asarray(se)[0]) < 40     # positive component
        # the negative component needs the matching polarity
        _, mean_n, se_n = ew.erp_onset((0.15, 0.5), polarity=-1)
        assert float(np.asarray(se_n)[1]) < 40
        assert 230 < float(np.asarray(mean_n)[1]) < 320
