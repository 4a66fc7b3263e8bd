"""Epoch rejection (`ops/reject.py`): peak-to-peak rules, the
cross-validated global threshold (planted-artifact recovery), and the
composable EpochsWavelet.drop_bad adapter."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.reject import (autoreject_global, ptp,
                                        ptp_reject)


def _epochs(e=40, c=8, n=512, n_bad=6, amp_bad=12.0, seed=0):
    """Evoked waveform + noise; `n_bad` trials get a huge transient on
    one channel.  Returns (x, bad_mask)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 1000.0
    evoked = np.sin(2 * np.pi * 7 * t) * np.exp(-t * 4)
    x = evoked[None, None, :] + 0.4 * rng.standard_normal((e, c, n))
    bad = np.zeros(e, bool)
    bad[rng.choice(e, n_bad, replace=False)] = True
    for i in np.flatnonzero(bad):
        ch = rng.integers(c)
        j = rng.integers(n - 50)
        x[i, ch, j:j + 50] += amp_bad
    return x.astype(np.float32), bad


class TestPtp:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 4, 100))
        np.testing.assert_allclose(np.asarray(ptp(x)),
                                   x.max(-1) - x.min(-1), rtol=1e-6)

    def test_reject_rule(self):
        x, bad = _epochs(seed=2)
        clean_max = np.asarray(ptp(x))[~bad].max()
        mask = np.asarray(ptp_reject(x, clean_max + 0.5))
        np.testing.assert_array_equal(mask, bad)

    def test_validation(self):
        with pytest.raises(ValueError):
            ptp_reject(np.zeros((4, 100)), 1.0)


class TestAutorejectGlobal:
    def test_planted_artifacts_recovered(self):
        x, bad = _epochs(seed=3)
        res = autoreject_global(x, seed=0)
        np.testing.assert_array_equal(np.asarray(res.drop_mask), bad)
        # threshold sits between the clean and artifact populations
        trial_ptp = np.asarray(ptp(x)).max(-1)
        assert trial_ptp[~bad].max() <= res.threshold < trial_ptp[bad].min()
        assert np.isfinite(np.asarray(res.cv_error)).any()

    def test_cleaned_evoked_closer_to_truth(self):
        x, bad = _epochs(e=60, n_bad=10, seed=4)
        t = np.arange(512) / 1000.0
        truth = np.sin(2 * np.pi * 7 * t) * np.exp(-t * 4)
        res = autoreject_global(x, seed=1)
        keep = ~np.asarray(res.drop_mask)
        err_raw = np.abs(x.mean(0) - truth).mean()
        err_clean = np.abs(x[keep].mean(0) - truth).mean()
        assert err_clean < err_raw

    def test_custom_grid(self):
        x, bad = _epochs(seed=5)
        trial_ptp = np.asarray(ptp(x)).max(-1)
        lo, hi = trial_ptp[~bad].max(), trial_ptp[bad].min()
        grid = np.linspace(0.5 * lo, 2 * hi, 40).astype(np.float32)
        res = autoreject_global(x, thresholds=grid, seed=0)
        assert res.thresholds.shape == (40,)
        np.testing.assert_array_equal(np.asarray(res.drop_mask), bad)

    def test_no_artifacts_keeps_most(self):
        x, _ = _epochs(n_bad=0, seed=6)
        res = autoreject_global(x, seed=0)
        assert np.asarray(res.drop_mask).mean() < 0.5

    def test_validation(self):
        with pytest.raises(ValueError):
            autoreject_global(np.zeros((3, 4, 8)), n_folds=5)
        with pytest.raises(ValueError):
            autoreject_global(np.zeros((8, 4, 8)),
                              thresholds=np.zeros((2, 2)))
        with pytest.raises(ValueError):
            autoreject_global(np.zeros((4, 100)))


class TestAdapter:
    def test_drop_bad_auto(self):
        from tests.test_epochs import FakeEpochs
        x, bad = _epochs(seed=7)
        ew = nw.EpochsWavelet(FakeEpochs(x, 1000.0), nw.Morse(1000.0))
        clean = ew.drop_bad()
        assert len(clean.epochs) == int((~bad).sum())
        assert clean.reject_result is not None
        assert clean.reject_result.threshold > 0
        # composable: downstream transforms run on the cleaned trials
        p = np.asarray(clean.power_all([10.0, 20.0]))
        assert p.shape[0] == x.shape[1]

    def test_drop_bad_explicit_threshold(self):
        from tests.test_epochs import FakeEpochs
        x, bad = _epochs(seed=8)
        thr = float(np.asarray(ptp(x)).max(-1)[~bad].max()) + 0.5
        ew = nw.EpochsWavelet(FakeEpochs(x, 1000.0), nw.Morse(1000.0))
        clean = ew.drop_bad(threshold=thr)
        assert len(clean.epochs) == int((~bad).sum())
        assert clean.reject_result is None

    def test_drop_all_raises(self):
        from tests.test_epochs import FakeEpochs
        x, _ = _epochs(seed=9)
        ew = nw.EpochsWavelet(FakeEpochs(x, 1000.0), nw.Morse(1000.0))
        with pytest.raises(ValueError, match="every trial"):
            ew.drop_bad(threshold=0.0)


class TestRegressOut:
    def test_removes_shared_artifact(self):
        """Blink-like reference leaks into data channels with fixed
        gains; regression recovers the underlying signals."""
        rng = np.random.default_rng(0)
        e, c, n = 6, 4, 1000
        t = np.arange(n) / 1000.0
        truth = np.stack([[np.sin(2 * np.pi * (8 + ch) * t)
                           + 0.1 * rng.standard_normal(n)
                           for ch in range(c)] for _ in range(e)])
        blink = np.stack([np.exp(-0.5 * ((t - rng.uniform(0.2, 0.8))
                                         / 0.05) ** 2) * 20.0
                          for _ in range(e)])          # (E, N)
        gains = rng.uniform(0.2, 0.8, c)
        x = truth + gains[None, :, None] * blink[:, None, :]
        eog = blink[:, None, :] + 0.2 * rng.standard_normal((e, 1, n))
        from ninwavelets_tpu.ops.reject import regress_out
        out = np.asarray(regress_out(x.astype(np.float32),
                                     eog.astype(np.float32)))
        tc = truth - truth.mean(-1, keepdims=True)
        err_before = np.abs((x - x.mean(-1, keepdims=True)) - tc).mean()
        err_after = np.abs(out - tc).mean()
        assert err_after < 0.15 * err_before

    def test_matches_lstsq_oracle(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 500)).astype(np.float32)
        refs = rng.standard_normal((2, 500)).astype(np.float32)
        from ninwavelets_tpu.ops.reject import regress_out
        got = np.asarray(regress_out(x, refs))
        xm = x - x.mean(-1, keepdims=True)
        rm = refs - refs.mean(-1, keepdims=True)
        beta, *_ = np.linalg.lstsq(rm.T, xm.T, rcond=None)
        want = xm - beta.T @ rm
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_adapter_drops_refs(self):
        from tests.test_epochs import FakeEpochs
        rng = np.random.default_rng(2)
        data = rng.standard_normal((4, 3, 500)).astype(np.float32)
        data[:, 0] += 0.5 * data[:, 2]               # ch0 contaminated
        ew = nw.EpochsWavelet(FakeEpochs(data, 1000.0), nw.Morse(1000.0))
        clean = ew.regress_out(["EEG 002"])
        assert len(clean.epochs.ch_names) == 2
        assert "EEG 002" not in clean.epochs.ch_names
        got = np.asarray(clean._all_data())
        assert got.shape == (4, 2, 500)
        with pytest.raises(ValueError, match="ch_names"):
            ew.regress_out(["nope"])


class TestFindBadChannels:
    """Channel QC (`ops.reject.find_bad_channels`, PREP-style)."""

    def _montage(self, seed=0, c=16, n=10000, sfreq=250.0):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / sfreq
        shared = np.sin(2 * np.pi * 10 * t) + 0.5 * rng.standard_normal(n)
        x = np.stack([shared * rng.uniform(0.8, 1.2)
                      + 0.3 * rng.standard_normal(n)
                      for _ in range(c)]).astype(np.float32)
        return x, t, rng

    def test_planted_criteria(self):
        from ninwavelets_tpu.ops import find_bad_channels
        x, t, rng = self._montage()
        x[2] = 1e-14                                       # flat
        x[5] *= 60                                         # deviant amp
        x[6] = (3 * np.sin(2 * np.pi * 60 * t)
                + 0.1 * rng.standard_normal(t.size))       # line/HF
        x[7] = x[0] + 1e-3 * rng.standard_normal(t.size) \
            .astype(np.float32)                            # bridged
        x[9] = rng.standard_normal(t.size)                 # uncorrelated
        r = find_bad_channels(x, 250.0)
        assert r["flat"] == [2]
        assert 5 in r["noisy"]
        assert 6 in r["hf"]
        assert 9 in r["uncorrelated"]
        assert (0, 7) in r["bridged"]
        assert set(r["bads"]) == {2, 5, 6, 9}
        # flat channel never appears in correlation criteria
        assert 2 not in r["uncorrelated"]
        assert all(2 not in p for p in r["bridged"])

    def test_clean_montage_flags_nothing(self):
        from ninwavelets_tpu.ops import find_bad_channels
        x, _, _ = self._montage(seed=3)
        r = find_bad_channels(x, 250.0)
        assert r["bads"] == [] and r["bridged"] == []

    def test_validation(self):
        from ninwavelets_tpu.ops import find_bad_channels
        with pytest.raises(ValueError, match="C, N"):
            find_bad_channels(np.zeros((4, 4, 4), np.float32), 100.0)
        with pytest.raises(ValueError, match="short"):
            find_bad_channels(np.zeros((4, 4), np.float32), 100.0)

    def test_adapter_names(self):
        import ninwavelets_tpu as nw
        x, t, rng = self._montage(c=6)
        x[3] = 1e-14
        names = [f"ch{i}" for i in range(6)]
        raw = type("R", (), {"_d": x, "info": {"sfreq": 250.0},
                             "ch_names": names,
                             "get_data": lambda s: s._d})()
        rw = nw.RawWavelet(raw, nw.Morse(250.0), window=1024)
        r = rw.find_bad_channels()
        assert r["flat"] == ["ch3"] and r["bads"] == ["ch3"]

    def test_hf_disabled_at_nyquist(self):
        from ninwavelets_tpu.ops import find_bad_channels
        rng = np.random.default_rng(4)
        # sfreq=64 < 2*hf_hz: the high band is empty — a quiet channel
        # must NOT be flagged as "hf" (the inverted-ratio failure mode)
        x = rng.standard_normal((8, 4000)).astype(np.float32)
        x[3] *= 0.05                      # quiet but perfectly fine
        r = find_bad_channels(x, 64.0)    # default hf_hz=40 >= 32
        assert r["hf"] == []

    def test_raw_interpolate_bads_roundtrip(self):
        """QC -> spherical-spline repair on the Raw surface."""
        import ninwavelets_tpu as nw
        rng = np.random.default_rng(6)
        n, c = 6000, 12
        t = np.arange(n) / 250.0
        # smooth topography: two dipole-ish patterns over a ring montage
        th = np.linspace(0, 2 * np.pi, c, endpoint=False)
        pos = np.stack([np.cos(th) * 0.9, np.sin(th) * 0.9,
                        np.full(c, 0.436)], 1)
        a = np.sin(2 * np.pi * 8 * t)
        b = np.sin(2 * np.pi * 13 * t + 1.0)
        # shared broadband floor homogenizes per-channel amplitude
        # distributions (a PURE-sine montage legitimately trips the
        # deviation criterion: lone sines have ~30% higher MAD than
        # two-sine mixes of equal variance)
        common = 0.4 * rng.standard_normal(n)
        x = (np.outer(np.cos(th), a) + np.outer(np.sin(th), b)
             + common[None, :]
             + 0.05 * rng.standard_normal((c, n))).astype(np.float32)
        truth = x[4].copy()
        x[4] = 1e-14                        # kill one electrode
        names = [f"ch{i}" for i in range(c)]
        raw = type("R", (), {"_d": x, "info": {"sfreq": 250.0},
                             "ch_names": names,
                             "get_data": lambda s: s._d})()
        rw = nw.RawWavelet(raw, nw.Morse(250.0), window=1024)
        bads = rw.find_bad_channels()["bads"]
        assert bads == ["ch4"]
        fixed = rw.interpolate_bads(pos, bads)
        # the spline estimate recovers the smooth field
        r = np.corrcoef(fixed[4], truth)[0, 1]
        assert r > 0.98
        np.testing.assert_array_equal(fixed[0], x[0])
        with pytest.raises(ValueError, match="not in ch_names"):
            rw.interpolate_bads(pos, ["nope"])
