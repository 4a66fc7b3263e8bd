"""Burst detection (`ops/bursts.py`): synthetic bursts with known count,
timing, frequency extent and amplitude must be recovered exactly."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import bursts as bu

SFREQ = 250.0


def _planes():
    """(3, 8, 100) power planes with hand-placed bursts over a floor of
    1.0: epoch 0 has two bursts, epoch 1 one, epoch 2 none."""
    x = np.ones((3, 8, 100), np.float32)
    x[0, 2:4, 10:20] = 10.0    # burst A: rows 2-3, samples 10-19
    x[0, 6:7, 50:75] = 8.0     # burst B: row 6, samples 50-74
    x[1, 1:5, 30:40] = 12.0
    return x


class TestSummary:
    def test_counts_and_stats(self):
        x = _planes()
        s = bu.burst_summary(x, threshold=np.full(8, 5.0), sfreq=SFREQ,
                             freq_step=2.0)
        np.testing.assert_array_equal(np.asarray(s.count), [2, 1, 0])
        np.testing.assert_allclose(np.asarray(s.rate),
                                   [2 / (100 / SFREQ), 1 / (100 / SFREQ),
                                    0.0])
        # epoch 0 durations: 10 and 25 samples -> mean 17.5 samples
        assert float(s.mean_duration[0]) == pytest.approx(17.5 / SFREQ)
        assert float(s.mean_duration[1]) == pytest.approx(10 / SFREQ)
        # spans: (2 rows, 1 row) * 2 Hz -> mean 3.0; epoch 1: 4 rows
        assert float(s.mean_span[0]) == pytest.approx(3.0)
        assert float(s.mean_span[1]) == pytest.approx(8.0)
        np.testing.assert_allclose(np.asarray(s.mean_peak), [9.0, 12.0,
                                                             0.0])

    def test_median_threshold(self):
        x = _planes()
        thr = np.asarray(bu.burst_threshold(x, factor=6.0))
        np.testing.assert_allclose(thr, np.full(8, 6.0))  # median floor 1
        s = bu.burst_summary(x, sfreq=SFREQ)
        np.testing.assert_array_equal(np.asarray(s.count), [2, 1, 0])

    def test_min_area_filters_specks(self):
        x = _planes()
        x[2, 0, 0] = 100.0           # single-pixel speck
        s = bu.burst_summary(x, threshold=np.full(8, 5.0), sfreq=SFREQ)
        np.testing.assert_array_equal(np.asarray(s.count), [2, 1, 1])
        s2 = bu.burst_summary(x, threshold=np.full(8, 5.0), sfreq=SFREQ,
                              min_area=5)
        np.testing.assert_array_equal(np.asarray(s2.count), [2, 1, 0])
        t = bu.burst_table(x, threshold=np.full(8, 5.0), sfreq=SFREQ,
                           min_area=5)
        assert all(b["epoch"] != 2 for b in t)

    def test_validation(self):
        with pytest.raises(ValueError):
            bu.burst_summary(np.zeros((4, 8)))


class TestTable:
    def test_burst_listing(self):
        x = _planes()
        freqs = np.arange(10.0, 26.0, 2.0)
        table = bu.burst_table(x, threshold=np.full(8, 5.0), sfreq=SFREQ,
                               freqs=freqs)
        assert len(table) == 3
        a = [b for b in table if b["epoch"] == 0 and b["area"] == 20][0]
        assert a["t_start"] == pytest.approx(10 / SFREQ)
        assert a["t_stop"] == pytest.approx(20 / SFREQ)
        assert (a["f_lo"], a["f_hi"]) == (14.0, 16.0)
        assert a["peak"] == pytest.approx(10.0)
        b = [b for b in table if b["epoch"] == 1][0]
        assert b["area"] == 40 and b["peak"] == pytest.approx(12.0)


class TestEndToEnd:
    def test_beta_bursts_on_synthetic_signal(self):
        rng = np.random.default_rng(2)
        n = 1024
        t = np.arange(n) / SFREQ
        e = 6
        sig = 0.3 * rng.standard_normal((e, n)).astype(np.float32)
        # two 20 Hz bursts per epoch at fixed latencies
        for win in ((0.8, 1.1), (2.4, 2.8)):
            m = ((t > win[0]) & (t < win[1])).astype(np.float32)
            sig += (2.0 * np.sin(2 * np.pi * 20 * t) * m).astype(
                np.float32)
        ew = nw.EpochsWavelet(
            nw.ArrayEpochs(sig[:, None, :], SFREQ, ch_names=["c"]),
            nw.Morse(SFREQ))
        freqs = np.arange(12.0, 30.0, 2.0)
        trials = np.asarray(ew.single_trial_power("c", freqs))
        # a high factor isolates the strong planted events (at the
        # conventional 6x, near-threshold noise blobs also qualify)
        s = bu.burst_summary(trials, sfreq=SFREQ, freq_step=2.0,
                             factor=20.0, min_area=10)
        # every epoch shows exactly the two planted bursts
        np.testing.assert_array_equal(np.asarray(s.count),
                                      np.full(e, 2.0))
        assert 0.2 < float(s.mean_duration.mean()) < 0.6
        table = bu.burst_table(trials, sfreq=SFREQ, freqs=freqs,
                               factor=20.0, min_area=10)
        starts = sorted(b["t_start"] for b in table if b["epoch"] == 0)
        assert abs(starts[0] - 0.8) < 0.15
        assert abs(starts[1] - 2.4) < 0.15


def test_adapter_bursts():
    rng = np.random.default_rng(4)
    n = 512
    t = np.arange(n) / SFREQ
    sig = 0.2 * rng.standard_normal((4, 1, n)).astype(np.float32)
    m = ((t > 0.8) & (t < 1.2)).astype(np.float32)
    sig[:, 0, :] += (2.0 * np.sin(2 * np.pi * 20 * t) * m).astype(
        np.float32)
    ew = nw.EpochsWavelet(nw.ArrayEpochs(sig, SFREQ, ch_names=["c"]),
                          nw.Morse(SFREQ))
    freqs = np.arange(14.0, 28.0, 2.0)
    s = ew.bursts("c", freqs, factor=20.0, min_area=10)
    np.testing.assert_array_equal(np.asarray(s.count), np.ones(4))
    table = ew.bursts("c", freqs, factor=20.0, min_area=10, table=True)
    assert len(table) == 4
    assert all(0.6 < b["t_start"] < 1.0 for b in table)
