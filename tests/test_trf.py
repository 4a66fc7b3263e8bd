"""Temporal response functions (`ops/trf.py`): planted-kernel
deconvolution, lstsq oracle, prediction accuracy, contiguous-fold CV,
and the RawWavelet envelope workflow."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.trf import (lagged_design, trf_cv, trf_fit,
                                     trf_predict)


def _planted(n=20000, c=3, l_true=32, noise=0.5, seed=0):
    """Response = stimulus convolved with per-channel kernels."""
    rng = np.random.default_rng(seed)
    stim = rng.standard_normal(n).astype(np.float32)
    t = np.arange(l_true)
    kern = np.stack([np.sin(2 * np.pi * t / l_true * (ch + 1))
                     * np.exp(-t / 12.0) for ch in range(c)])
    resp = np.stack([np.convolve(stim, kern[ch])[:n]
                     for ch in range(c)])
    resp = (resp + noise * rng.standard_normal((c, n))).astype(
        np.float32)
    return stim, resp, kern.astype(np.float32)


class TestLaggedDesign:
    def test_shift_semantics(self):
        x = np.arange(10.0, dtype=np.float32)
        d = np.asarray(lagged_design(x, (0, 2, -1)))
        assert d.shape == (1, 3, 10)
        np.testing.assert_array_equal(d[0, 0], x)
        np.testing.assert_array_equal(d[0, 1, 2:], x[:-2])  # delayed
        np.testing.assert_array_equal(d[0, 1, :2], 0.0)
        np.testing.assert_array_equal(d[0, 2, :-1], x[1:])  # advanced


class TestFit:
    def test_recovers_planted_kernels(self):
        stim, resp, kern = _planted()
        res = trf_fit(stim, resp, range(0, 48), lam=1e-4)
        w = np.asarray(res.weights)[:, 0, :]            # (C, L)
        for ch in range(3):
            r = np.corrcoef(w[ch, :32], kern[ch])[0, 1]
            assert r > 0.95, (ch, r)
        # lags beyond the true kernel are ~0
        assert np.abs(w[:, 36:]).max() < 0.2 * np.abs(w).max()

    def test_matches_lstsq_oracle(self):
        rng = np.random.default_rng(1)
        stim = rng.standard_normal(1500).astype(np.float32)
        resp = rng.standard_normal((2, 1500)).astype(np.float32)
        lags = (0, 1, 2, 5)
        res = trf_fit(stim, resp, lags, lam=1e-3)
        x = np.asarray(lagged_design(stim, lags))[0]    # (L, N)
        xtx = x @ x.T
        a = xtx + 1e-3 * np.trace(xtx) / 4 * np.eye(4)
        want = np.linalg.solve(a, x @ resp.T).T
        np.testing.assert_allclose(np.asarray(res.weights)[:, 0, :],
                                   want, rtol=2e-3, atol=2e-4)

    def test_prediction_r(self):
        stim, resp, _ = _planted(noise=0.3, seed=2)
        res = trf_fit(stim, resp, range(0, 48), lam=1e-3)
        pred = np.asarray(trf_predict(res, stim))
        for ch in range(3):
            r = np.corrcoef(pred[ch], resp[ch])[0, 1]
            assert r > 0.8, (ch, r)

    def test_multifeature(self):
        rng = np.random.default_rng(3)
        stim = rng.standard_normal((2, 8000)).astype(np.float32)
        kern = rng.standard_normal((2, 8)).astype(np.float32)
        resp = sum(np.convolve(stim[k], kern[k])[:8000]
                   for k in range(2))[None, :].astype(np.float32)
        res = trf_fit(stim, resp, range(0, 12), lam=1e-4)
        w = np.asarray(res.weights)[0]                  # (2, 12)
        for k in range(2):
            np.testing.assert_allclose(w[k, :8], kern[k], atol=0.05)

    def test_validation(self):
        with pytest.raises(ValueError):
            trf_fit(np.zeros(100, np.float32),
                    np.zeros((2, 90), np.float32), (0, 1))
        with pytest.raises(ValueError):
            trf_fit(np.zeros(100, np.float32),
                    np.zeros((2, 100), np.float32), ())


class TestCV:
    def test_picks_sane_lam_and_r(self):
        stim, resp, _ = _planted(noise=0.5, seed=4)
        res, r, lam = trf_cv(stim, resp, range(0, 48),
                             lams=(1e-4, 1e-2, 1.0), n_folds=4)
        assert r.shape == (3,)
        assert np.all(r > 0.6)
        assert res.lam == lam
        # pure-noise response: held-out r stays near 0
        rng = np.random.default_rng(5)
        noise_resp = rng.standard_normal((2, 20000)).astype(np.float32)
        _, r0, _ = trf_cv(stim, noise_resp, range(0, 48), n_folds=4)
        assert np.all(np.abs(r0) < 0.1)

    def test_validation(self):
        with pytest.raises(ValueError):
            trf_cv(np.zeros(10, np.float32), np.zeros((1, 10),
                                                      np.float32),
                   (0, 1), n_folds=5)


class TestRawAdapter:
    def test_envelope_tracking_workflow(self):
        """Speech-envelope-style: the recording responds to a slow
        stimulus envelope through a known kernel; RawWavelet.trf
        recovers tracking r near the planted channels."""
        rng = np.random.default_rng(6)
        sfreq, n = 250.0, 25000
        env = np.convolve(rng.standard_normal(n),
                          np.hanning(25), "same").astype(np.float32)
        kern = (np.exp(-np.arange(30) / 8.0)
                * np.sin(np.arange(30) / 4.0)).astype(np.float32)
        driven = np.convolve(env, kern)[:n]
        data = np.stack([driven + 0.5 * rng.standard_normal(n),
                         rng.standard_normal(n)]).astype(np.float32)

        class FakeRaw:
            _d = data
            info = {"sfreq": sfreq}
            ch_names = ["c0", "c1"]
            def get_data(self):
                return self._d

        rw = nw.RawWavelet(FakeRaw(), nw.Morse(sfreq))
        res, r, lam = rw.trf(env, tmin_s=0.0, tmax_s=0.2)
        assert r[0] > 0.6          # driven channel tracks
        assert abs(r[1]) < 0.15    # noise channel does not
