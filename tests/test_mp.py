"""Matching pursuit (ops/mp.py): greedy Gabor decomposition."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.mp import (gabor_dictionary, matching_pursuit,
                                    mp_tfr)

SFREQ = 250.0
N = 1024


def _gabor(t, A, s, xi, u, phi):
    return A * np.exp(-np.pi * (t - u) ** 2 / s ** 2) \
        * np.cos(2 * np.pi * xi * (t - u) + phi)


class TestDictionary:
    def test_rows_normalized(self):
        rows, meta = gabor_dictionary(N, SFREQ)
        norms = np.sqrt((rows ** 2).sum(-1) / N)      # Parseval
        np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
        assert rows.shape[0] == meta.shape[0] > 50

    def test_meta_fields(self):
        rows, meta = gabor_dictionary(N, SFREQ)
        assert meta[:, 0].min() > 0          # scales in seconds
        assert meta[:, 1].max() <= 0.4 * SFREQ


class TestMatchingPursuit:
    t = np.arange(N) / SFREQ

    def test_recovers_single_atom(self):
        sig = _gabor(self.t, 2.0, 0.3, 13.0, 2.0, 0.7).astype(np.float32)
        res = matching_pursuit(sig, 5, SFREQ)
        # first atom carries nearly everything, within grid resolution
        assert float(res.energy[0]) / (sig ** 2).sum() > 0.98
        assert abs(float(res.freq_hz[0]) - 13.0) < 1.0
        assert abs(float(res.time_s[0]) - 2.0) < 0.05
        assert abs(float(res.scale_s[0]) - 0.3) < 0.15
        assert float((np.asarray(res.residual) ** 2).sum()) \
            < 1e-3 * (sig ** 2).sum()

    def test_energy_monotone_and_conserved(self):
        rng = np.random.default_rng(0)
        sig = rng.standard_normal(N).astype(np.float32)
        res = matching_pursuit(sig, 12, SFREQ)
        en = np.asarray(res.energy)
        assert np.all(en > 0)          # every projection removes energy
        # exact bookkeeping: sum(removed) + residual == input energy
        total = en.sum() + (np.asarray(res.residual) ** 2).sum()
        np.testing.assert_allclose(total, (sig ** 2).sum(), rtol=1e-4)

    def test_separates_two_components(self):
        """A short spindle burst and a long slow wave at the SAME time —
        the case a CWT's fixed time-frequency trade smears."""
        sig = (_gabor(self.t, 1.5, 0.25, 13.0, 2.0, 0.3)
               + _gabor(self.t, 1.0, 1.2, 3.0, 2.0, 1.1)).astype(np.float32)
        res = matching_pursuit(sig, 6, SFREQ)
        f = np.asarray(res.freq_hz[:2])
        s = np.asarray(res.scale_s[:2])
        i13, i3 = int(np.argmin(np.abs(f - 13))), int(np.argmin(np.abs(f - 3)))
        assert abs(f[i13] - 13) < 1.5 and abs(f[i3] - 3) < 1.0
        assert s[i13] < 0.5 < s[i3]
        assert float((np.asarray(res.residual) ** 2).sum()) \
            < 0.05 * (sig ** 2).sum()

    def test_batched_lead_dims(self):
        rng = np.random.default_rng(1)
        sigs = rng.standard_normal((3, 2, N)).astype(np.float32)
        res = matching_pursuit(sigs, 4, SFREQ)
        assert res.amplitude.shape == (3, 2, 4)
        assert res.residual.shape == (3, 2, N)
        # each signal decomposed independently
        solo = matching_pursuit(sigs[1, 0], 4, SFREQ)
        np.testing.assert_allclose(np.asarray(res.freq_hz[1, 0]),
                                   np.asarray(solo.freq_hz), rtol=1e-5)

    def test_tfr_map(self):
        sig = _gabor(self.t, 2.0, 0.3, 13.0, 2.0, 0.0).astype(np.float32)
        res = matching_pursuit(sig, 3, SFREQ)
        f_grid = np.arange(2.0, 40.0)
        m = np.asarray(mp_tfr(res, N, SFREQ, f_grid, t_decim=16))
        assert m.shape == (38, N // 16)
        assert f_grid[m.sum(-1).argmax()] == 13.0
        tpk = (m.sum(0).argmax() + 0.5) * 16 / SFREQ
        assert abs(tpk - 2.0) < 0.1
        # map integrates to the removed energy
        np.testing.assert_allclose(m.sum(), np.asarray(res.energy).sum(),
                                   rtol=1e-4)

    def test_adapter(self):
        sig = _gabor(self.t, 1.0, 0.3, 12.0, 2.0, 0.0)
        data = np.stack([np.stack([sig, 0.1 * sig])] * 4)  # (4, 2, N)

        class FE:
            info = {"sfreq": SFREQ}
            ch_names = ["a", "b"]
            def get_data(self):
                return data

        ew = nw.EpochsWavelet(FE(), nw.Morse(SFREQ))
        res = ew.matching_pursuit("a", n_atoms=3)
        assert res.amplitude.shape == (4, 3)
        assert abs(float(res.freq_hz[0, 0]) - 12.0) < 1.0
