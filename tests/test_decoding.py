"""Time-frequency decoding (`ops/decoding.py`): AUC calibration on null
data, perfect separation on a planted pattern, localization, and a
numpy oracle for the fold arithmetic."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import decoding as dec

RNG = np.random.default_rng(11)


def _groups(e=20, c=4, f=5, n=16, effect=0.0, window=None):
    xa = RNG.standard_normal((e, c, f, n)).astype(np.float32)
    xb = RNG.standard_normal((e, c, f, n)).astype(np.float32)
    if effect:
        pattern = np.array([1.0, -1.0, 0.5, 0.0])[:c]
        fs, ns = window or (slice(1, 3), slice(4, 10))
        xa[:, :, fs, ns] += effect * pattern[None, :, None, None]
    return xa, xb


class TestDecode:
    def test_null_is_chance(self):
        auc = np.asarray(dec.tf_decode(*_groups(e=30), n_folds=5))
        assert abs(auc.mean() - 0.5) < 0.03
        assert auc.max() < 0.85

    def test_planted_pattern_decodes_and_localizes(self):
        xa, xb = _groups(e=24, effect=2.0)
        auc = np.asarray(dec.tf_decode(xa, xb, n_folds=4))
        assert auc[1:3, 4:10].min() > 0.9
        outside = auc.copy()
        outside[1:3, 4:10] = 0.5
        assert abs(outside.mean() - 0.5) < 0.05

    def test_auc_matches_numpy_pairwise(self):
        sa = RNG.standard_normal((6, 2, 3)).astype(np.float32)
        sb = RNG.standard_normal((5, 2, 3)).astype(np.float32)
        va = np.array([1, 1, 0, 1, 0, 1], np.float32)
        vb = np.array([1, 0, 1, 1, 1], np.float32)
        ours = np.asarray(dec.decode_auc(sa, sb, va, vb))
        ref = np.zeros((2, 3))
        pairs = 0
        for i in range(6):
            for j in range(5):
                if va[i] and vb[j]:
                    pairs += 1
                    ref += (sa[i] > sb[j]) + 0.5 * (sa[i] == sb[j])
        np.testing.assert_allclose(ours, ref / pairs, atol=1e-6)

    def test_deterministic_and_validated(self):
        xa, xb = _groups(e=12, effect=1.0)
        a = np.asarray(dec.tf_decode(xa, xb))
        b = np.asarray(dec.tf_decode(xa, xb))
        np.testing.assert_array_equal(a, b)
        with pytest.raises(ValueError):
            dec.tf_decode(xa[:3], xb, n_folds=5)
        with pytest.raises(ValueError):
            dec.tf_decode(xa[:, :2], xb)

    def test_adapter_decode(self):
        rng = np.random.default_rng(3)
        sfreq, n, e = 250.0, 256, 16
        t = np.arange(n) / sfreq
        win = (t > 0.4) & (t < 0.8)
        base = rng.standard_normal((2 * e, 3, n)).astype(np.float32)
        burst = (3.0 * np.sin(2 * np.pi * 30 * t) * win).astype(
            np.float32)
        data_a = base[:e].copy()
        data_a[:, 0] += burst            # condition A: burst on ch 0
        data_b = base[e:]
        mk = lambda d: nw.EpochsWavelet(
            nw.ArrayEpochs(d, sfreq, ch_names=["a", "b", "c"]),
            nw.Morse(sfreq))
        freqs = np.linspace(15, 45, 5)
        auc = np.asarray(mk(data_a).decode(mk(data_b), freqs, n_folds=4))
        assert auc.shape == (5, n)
        # decodable exactly where the burst lives (30 Hz row, 0.4-0.8 s)
        assert auc[2, 110:190].mean() > 0.8
        assert abs(auc[:, :80].mean() - 0.5) < 0.1


class TestTemporalGeneralization:
    def test_sustained_vs_sequential_codes(self):
        rng = np.random.default_rng(7)
        e, c, t_len = 24, 4, 20
        pat1 = np.array([1.0, -1.0, 0.0, 0.5])
        pat2 = np.array([0.0, 0.5, -1.0, 1.0])   # orthogonal-ish
        xa = rng.standard_normal((e, c, t_len)).astype(np.float32)
        xb = rng.standard_normal((e, c, t_len)).astype(np.float32)
        # sequential code: pattern 1 early, pattern 2 late
        xa[:, :, 3:8] += 2.0 * pat1[None, :, None]
        xa[:, :, 12:17] += 2.0 * pat2[None, :, None]
        g = np.asarray(dec.temporal_generalization(xa, xb, n_folds=4))
        assert g.shape == (t_len, t_len)
        # on-diagonal decoding strong in both windows
        assert g[5, 5] > 0.9 and g[14, 14] > 0.9
        # train-early/test-late fails (different pattern): near or below
        # chance — crucially much worse than on-diagonal
        assert g[5, 14] < g[5, 5] - 0.25
        assert g[14, 5] < g[14, 14] - 0.25
        # pre-stimulus: chance
        assert abs(g[0, 0] - 0.5) < 0.25

    def test_sustained_code_generalizes(self):
        rng = np.random.default_rng(8)
        e, c, t_len = 24, 4, 12
        pat = np.array([1.0, -1.0, 0.5, 0.0])
        xa = rng.standard_normal((e, c, t_len)).astype(np.float32)
        xb = rng.standard_normal((e, c, t_len)).astype(np.float32)
        xa[:, :, 2:10] += 2.0 * pat[None, :, None]
        g = np.asarray(dec.temporal_generalization(xa, xb, n_folds=4))
        # square block: off-diagonal generalization inside the window
        assert g[3, 8] > 0.85 and g[8, 3] > 0.85

    def test_adapter(self):
        rng = np.random.default_rng(9)
        sfreq, n, e = 250.0, 256, 16
        t = np.arange(n) / sfreq
        burst = (2.5 * np.sin(2 * np.pi * 30 * t)
                 * ((t > 0.4) & (t < 0.8))).astype(np.float32)
        da = rng.standard_normal((e, 2, n)).astype(np.float32)
        db = rng.standard_normal((e, 2, n)).astype(np.float32)
        da[:, 0] += burst
        mk = lambda d: nw.EpochsWavelet(
            nw.ArrayEpochs(d, sfreq, ch_names=["a", "b"]),
            nw.Morse(sfreq))
        g = np.asarray(mk(da).decode_generalization(
            mk(db), np.linspace(25, 35, 3), n_folds=4, decim=8))
        assert g.shape == (32, 32)
        # decodable inside the burst window (samples 100-200 -> 12-25)
        assert g[15, 20] > 0.75
        # pre-stimulus chance is noisy with 4 held-out trials per fold
        assert abs(g[:8, :8].mean() - 0.5) < 0.15


def test_sharded_matches_single_device():
    import ninwavelets_tpu.parallel as par
    xa, xb = _groups(e=16, f=4, effect=1.5, window=(slice(1, 3),
                                                    slice(4, 10)))
    single = np.asarray(dec.tf_decode(xa, xb, n_folds=4))
    for d, f in ((1, 4), (2, 2)):
        mesh = par.make_mesh(data=d, freq=f)
        out = np.asarray(par.sharded_tf_decode(xa, xb, mesh=mesh,
                                               n_folds=4))
        np.testing.assert_allclose(out, single, atol=1e-6)


def test_sharded_validates_like_single_device():
    import ninwavelets_tpu.parallel as par
    xa, xb = _groups(e=3)
    mesh = par.make_mesh(data=1, freq=1)
    with pytest.raises(ValueError):
        par.sharded_tf_decode(xa, xb, mesh=mesh, n_folds=5)


def test_adapter_decode_with_baseline_is_finite():
    rng = np.random.default_rng(12)
    sfreq, n, e = 250.0, 128, 12
    da = rng.standard_normal((e, 2, n)).astype(np.float32)
    db = rng.standard_normal((e, 2, n)).astype(np.float32)
    mk = lambda d: nw.EpochsWavelet(
        nw.ArrayEpochs(d, sfreq, ch_names=["a", "b"]), nw.Morse(sfreq))
    auc = np.asarray(mk(da).decode(mk(db), [20.0, 30.0], n_folds=4,
                                   baseline=(0.0, 0.2)))
    # zscored-log power must stay finite: chance-level, never all-zero
    assert np.isfinite(auc).all()
    assert abs(auc.mean() - 0.5) < 0.1
    assert auc.max() > 0.0
