"""CP/PARAFAC (`ops/cpd.py`): exact recovery of planted low-rank
tensors, nonnegative HALS mode, reconstruction identity, and the
EpochsWavelet.cp_power multiway workflow."""
import jax.numpy as jnp
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import cp_decompose, cp_reconstruct


def _planted(shape, rank, seed=0, nonneg=False):
    rng = np.random.default_rng(seed)
    facs = []
    for s in shape:
        f = rng.standard_normal((s, rank))
        if nonneg:
            f = np.abs(f) + 0.1
        facs.append(f.astype(np.float32))
    w = np.linspace(3.0, 1.0, rank).astype(np.float32)
    x = np.asarray(cp_reconstruct(w, facs))
    return x, w, facs


def _congruence(a, b):
    """max |cosine| match of each column of a against the columns of b."""
    a = a / (np.linalg.norm(a, axis=0, keepdims=True) + 1e-30)
    b = b / (np.linalg.norm(b, axis=0, keepdims=True) + 1e-30)
    return np.abs(a.T @ b)


class TestRecovery:
    def test_rank3_exact(self):
        x, w, facs = _planted((20, 15, 30), 3, seed=1)
        wh, fh, fit = cp_decompose(x, 3, n_iter=200, seed=2)
        assert float(fit) > 0.9999
        # every planted component matched by some recovered one
        for mode in range(3):
            cg = _congruence(np.asarray(fh[mode]), facs[mode])
            assert cg.max(axis=0).min() > 0.999

    def test_nonneg_rank2(self):
        x, w, facs = _planted((16, 12, 24), 2, seed=3, nonneg=True)
        wh, fh, fit = cp_decompose(x, 2, n_iter=300, nonneg=True, seed=4)
        assert float(fit) > 0.999
        for f in fh:
            assert float(jnp.min(f)) >= 0.0
        cg = _congruence(np.asarray(fh[1]), facs[1])
        assert cg.max(axis=0).min() > 0.99

    def test_weights_sorted_and_unit_columns(self):
        x, _, _ = _planted((10, 11, 12), 3, seed=5)
        wh, fh, _ = cp_decompose(x, 3, n_iter=100, seed=6)
        wh = np.asarray(wh)
        assert np.all(np.diff(wh) <= 1e-5)
        for f in fh:
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(f), axis=0), 1.0, atol=1e-4)

    def test_four_way(self):
        x, _, facs = _planted((8, 9, 10, 11), 2, seed=7)
        wh, fh, fit = cp_decompose(x, 2, n_iter=200, seed=8)
        assert float(fit) > 0.999
        assert len(fh) == 4

    def test_reconstruct_identity(self):
        x, w, facs = _planted((6, 7, 8), 2, seed=9)
        np.testing.assert_allclose(np.asarray(cp_reconstruct(w, facs)), x,
                                   atol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            cp_decompose(np.zeros(8, np.float32), 2)
        with pytest.raises(ValueError):
            cp_decompose(np.zeros((4, 4, 4), np.float32), 5)


class FakeEpochs:
    def __init__(self, data, sfreq):
        self._data = data
        self.info = {"sfreq": sfreq}
        self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[1])]

    def get_data(self):
        return self._data

    def __len__(self):
        return self._data.shape[0]


class TestAdapter:
    def _epochs(self):
        rng = np.random.default_rng(11)
        sfreq, n = 250.0, 512
        t = np.arange(n) / sfreq
        # two components: a 10 Hz early burst on channels 0-1 and a
        # 40 Hz late burst on channels 2-3
        g_early = np.exp(-((t - 0.6) / 0.18) ** 2)
        g_late = np.exp(-((t - 1.4) / 0.18) ** 2)
        c1 = np.sin(2 * np.pi * 10.0 * t) * g_early
        c2 = np.sin(2 * np.pi * 40.0 * t) * g_late
        topo1 = np.array([1.0, 0.8, 0.05, 0.05])
        topo2 = np.array([0.05, 0.05, 1.0, 0.7])
        data = (topo1[:, None] * c1 + topo2[:, None] * c2)[None]
        data = np.repeat(data, 8, axis=0)
        data = data + 0.05 * rng.standard_normal(data.shape)
        return FakeEpochs(data.astype(np.float32), sfreq)

    def test_cfn_components(self):
        ep = self._epochs()
        w = nw.Morse(250.0)
        ew = nw.EpochsWavelet(ep, w)
        freqs = np.arange(5.0, 60.0, 2.5)
        # rank 4: HALS needs slack columns to escape the local minimum
        # where everything collapses onto the dominant 40 Hz atom
        wts, facs, fit = ew.cp_power(freqs, rank=4, n_iter=150)
        assert float(fit) > 0.95
        chan, spec, temp = [np.asarray(f) for f in facs]
        # spectral signatures include one near 10 Hz and one near 40 Hz
        peaks = sorted(freqs[np.argmax(spec, axis=0)])
        assert abs(peaks[0] - 10.0) < 5.0
        assert abs(peaks[-1] - 40.0) < 7.6
        # the 40 Hz component loads on channels 2-3
        hi = int(np.argmin(np.abs(freqs[np.argmax(spec, axis=0)] - 40)))
        assert chan[2:, hi].sum() > chan[:2, hi].sum()

    def test_efn_requires_channel(self):
        ep = self._epochs()
        ew = nw.EpochsWavelet(ep, nw.Morse(250.0))
        with pytest.raises(ValueError):
            ew.cp_power([10.0, 20.0], rank=2, tensor="efn")
        with pytest.raises(ValueError):
            ew.cp_power([10.0, 20.0], rank=2, tensor="bogus")

    def test_efn_shapes(self):
        ep = self._epochs()
        ew = nw.EpochsWavelet(ep, nw.Morse(250.0))
        freqs = np.arange(8.0, 48.0, 4.0)
        wts, facs, fit = ew.cp_power(freqs, rank=2, tensor="efn",
                                     ch_name=ep.ch_names[0], n_iter=50)
        assert np.asarray(facs[0]).shape == (8, 2)      # epochs
        assert np.asarray(facs[1]).shape == (10, 2)     # freqs

    def test_nonneg_baseline_guard(self):
        ep = self._epochs()
        ew = nw.EpochsWavelet(ep, nw.Morse(250.0))
        freqs = np.arange(8.0, 48.0, 4.0)
        # explicit nonneg with a signed baselined tensor must raise
        with pytest.raises(ValueError):
            ew.cp_power(freqs, rank=2, nonneg=True, baseline=(0.0, 0.4))
        # default flips to signed ALS and runs
        wts, facs, fit = ew.cp_power(freqs, rank=2, n_iter=30,
                                     baseline=(0.0, 0.4))
        assert len(facs) == 3
