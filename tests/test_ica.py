"""FastICA (`ops/ica.py`): blind source separation against ground
truth and sklearn, reconstruction identities, and artifact removal."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import fastica, ica_remove, ica_transform

SFREQ = 250.0
N = 5000
T = np.arange(N) / SFREQ


def _sources(seed=0):
    rng = np.random.default_rng(seed)
    saw = 2.0 * ((3.1 * T) % 1.0) - 1.0
    square = np.sign(np.sin(2 * np.pi * 1.7 * T))
    am = np.sin(2 * np.pi * 9.0 * T) * np.sin(2 * np.pi * 0.31 * T)
    lap = rng.laplace(size=N)
    s = np.stack([saw, square, am, lap])
    return (s - s.mean(1, keepdims=True)) / s.std(1, keepdims=True)


def _mix(s, seed=1):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((s.shape[0], s.shape[0]))
    return (a @ s).astype(np.float32), a


def _match_corr(est, true):
    """Per-true-source best |corr| over estimated components."""
    e = est - est.mean(1, keepdims=True)
    t = true - true.mean(1, keepdims=True)
    e /= np.linalg.norm(e, axis=1, keepdims=True) + 1e-30
    t /= np.linalg.norm(t, axis=1, keepdims=True) + 1e-30
    return np.abs(t @ e.T).max(axis=1)


class TestSeparation:
    def test_ground_truth_recovery(self):
        s = _sources()
        x, _ = _mix(s)
        res = fastica(x, n_iter=300, seed=0)
        corr = _match_corr(np.asarray(res.sources), s)
        assert corr.min() > 0.95
        assert float(res.convergence[-1]) < 1e-4

    def test_matches_sklearn(self):
        from sklearn.decomposition import FastICA
        s = _sources(2)
        x, _ = _mix(s, 3)
        res = fastica(x, n_iter=300, seed=0)
        sk = FastICA(whiten="unit-variance", max_iter=1000,
                     random_state=0).fit_transform(
            np.asarray(x, np.float64).T).T
        corr = _match_corr(np.asarray(res.sources), sk)
        assert corr.min() > 0.98

    def test_nonlinearities(self):
        s = _sources(4)
        x, _ = _mix(s, 5)
        for fun in ("exp", "cube"):
            res = fastica(x, fun=fun, n_iter=300)
            assert _match_corr(np.asarray(res.sources), s).min() > 0.9

    def test_sources_are_white(self):
        x, _ = _mix(_sources(6), 7)
        res = fastica(x, n_iter=200)
        src = np.asarray(res.sources)
        cov = src @ src.T / src.shape[1]
        np.testing.assert_allclose(cov, np.eye(4), atol=2e-2)

    def test_deterministic_order_and_sign(self):
        x, _ = _mix(_sources(8), 9)
        r1 = fastica(x, n_iter=200, seed=0)
        # variance-sorted mixing columns
        p = np.sum(np.asarray(r1.mixing) ** 2, axis=0)
        assert np.all(np.diff(p) <= 1e-4)
        # sign convention: largest-|.| mixing coefficient positive
        m = np.asarray(r1.mixing)
        peaks = m[np.argmax(np.abs(m), axis=0), np.arange(m.shape[1])]
        assert np.all(peaks > 0)


class TestReconstruction:
    def test_full_rank_identity(self):
        x, _ = _mix(_sources(10), 11)
        res = fastica(x, n_iter=200)
        recon = np.asarray(res.mixing) @ np.asarray(res.sources) \
            + np.asarray(res.mean)[:, None]
        scale = np.abs(x).max()
        assert np.max(np.abs(recon - np.asarray(x))) / scale < 1e-3

    def test_transform_matches_fit_sources(self):
        x, _ = _mix(_sources(12), 13)
        res = fastica(x, n_iter=200)
        np.testing.assert_allclose(np.asarray(ica_transform(x, res)),
                                   np.asarray(res.sources), atol=1e-4)

    def test_remove_nothing_is_identity(self):
        x, _ = _mix(_sources(14), 15)
        res = fastica(x, n_iter=200)
        out = np.asarray(ica_remove(x, res, []))
        assert np.max(np.abs(out - np.asarray(x))) / np.abs(x).max() < 1e-3


class TestArtifactRemoval:
    def test_blink_removal(self):
        rng = np.random.default_rng(16)
        # 4 brain sources + 1 shared high-amplitude blink on 6 channels
        # (sources < channels, or separation is underdetermined)
        blink = np.zeros(N)
        for c0 in (900, 2300, 4100):
            blink[c0:c0 + 120] += np.hanning(120)
        blink *= 12.0
        topo = np.array([1.0, 0.8, 0.5, 0.2, 0.1, 0.05])
        brain = np.stack([np.sin(2 * np.pi * f * T + p)
                          for f, p in zip((6, 11, 17, 29),
                                          rng.uniform(0, 6, 4))])
        a = rng.standard_normal((6, 4))
        brain_mix = a @ brain
        x = (brain_mix + topo[:, None] * blink
             + 0.05 * rng.standard_normal((6, N))).astype(np.float32)
        res = fastica(x, n_components=5, n_iter=300)
        src = np.asarray(res.sources)
        bidx = int(np.argmax([abs(np.corrcoef(s, blink)[0, 1])
                              for s in src]))
        cleaned = np.asarray(ica_remove(x, res, [bidx]))
        # blink gone from the worst channel, brain mixture preserved
        c_blink_before = abs(np.corrcoef(x[0], blink)[0, 1])
        c_blink_after = abs(np.corrcoef(cleaned[0], blink)[0, 1])
        assert c_blink_before > 0.7
        assert c_blink_after < 0.15
        c_brain = abs(np.corrcoef(cleaned[0], brain_mix[0])[0, 1])
        assert c_brain > 0.9

    def test_adapter_roundtrip(self):
        class FakeRaw:
            def __init__(self, data, sfreq):
                self._data = data
                self.info = {"sfreq": sfreq}
                self.ch_names = [f"EEG {i}" for i in range(data.shape[0])]

            def get_data(self):
                return self._data

        x, _ = _mix(_sources(17), 18)
        rw = nw.RawWavelet(FakeRaw(np.asarray(x), SFREQ), nw.Morse(SFREQ))
        res = rw.ica(n_components=4, n_iter=150)
        assert res.sources.shape == (4, N)
        cleaned = rw.ica_clean(res, [0])
        assert cleaned.shape == x.shape


class TestValidation:
    def test_errors(self):
        x = np.zeros((4, 100), np.float32)
        with pytest.raises(ValueError):
            fastica(np.zeros(10, np.float32))
        with pytest.raises(ValueError):
            fastica(x, n_components=9)
        with pytest.raises(ValueError):
            fastica(x, fun="kurtosis2")
        with pytest.raises(ValueError):
            fastica(np.zeros((10, 4), np.float32).T @ np.zeros((4, 2),
                                                              np.float32))
        res = fastica(np.random.default_rng(0).standard_normal(
            (3, 400)).astype(np.float32), n_iter=20)
        with pytest.raises(ValueError):
            ica_remove(np.zeros((3, 400), np.float32), res, [5])


def test_preprocess_demo_headless(capsys):
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "preprocess_demo", os.path.join(
            os.path.dirname(__file__), "..", "examples",
            "preprocess_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    assert "[filter]" in out and "[ica]" in out
    assert "[states]" in out and "[cycles]" in out


class TestSharded:
    def test_sharded_matches_single_device(self):
        from ninwavelets_tpu.parallel import sharded_fastica
        from ninwavelets_tpu.parallel.mesh import make_mesh
        x, _ = _mix(_sources(20), 21)      # (4, 5000), 5000 % 8 == 0
        mesh = make_mesh(data=8)
        res_s = sharded_fastica(x, mesh=mesh, n_iter=200, seed=0)
        res_1 = fastica(x, n_iter=200, seed=0)
        np.testing.assert_allclose(np.asarray(res_s.unmixing),
                                   np.asarray(res_1.unmixing),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(res_s.sources),
                                   np.asarray(res_1.sources), atol=5e-3)

    def test_validation(self):
        from ninwavelets_tpu.parallel import sharded_fastica
        from ninwavelets_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=8)
        with pytest.raises(ValueError):
            sharded_fastica(np.zeros((4, 1001), np.float32), mesh=mesh)


class TestFindBads:
    """Automatic artifact-component selection (`ica_find_bads`)."""

    def _blinky(self, seed=5, c=8, n=6000):
        """c-channel mix of brain rhythms + one blink source; returns
        (data, eog_trace, blink_source)."""
        rng = np.random.default_rng(seed)
        t = np.arange(n) / SFREQ
        brain = np.stack([np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
                          + 0.3 * rng.standard_normal(n)
                          for f in (6.0, 10.0, 21.0)])
        blink = np.zeros(n)
        for s in range(300, n - 200, 900):
            blink[s:s + 120] += np.hanning(120)
        blink = 8.0 * blink + 0.05 * rng.standard_normal(n)
        src = np.vstack([brain, blink])
        src = (src - src.mean(1, keepdims=True)) / src.std(1, keepdims=True)
        a = rng.standard_normal((c, 4))
        x = (a @ src + 0.1 * rng.standard_normal((c, n))).astype(np.float32)
        eog = (1.5 * blink + 0.2 * rng.standard_normal(n)).astype(np.float32)
        return x, eog, blink

    def test_eog_correlation_flags_blink(self):
        from ninwavelets_tpu.ops import ica_find_bads, ica_scores
        x, eog, blink = self._blinky()
        res = fastica(x, 4, n_iter=300, seed=0)
        bads, scores = ica_find_bads(res, eog)
        assert len(bads) == 1
        # the flagged component really is the blink source
        s = np.asarray(res.sources[bads[0]])
        r = np.corrcoef(s, blink)[0, 1]
        assert abs(r) > 0.95
        assert scores.shape == (4,)
        assert scores[bads[0]] == scores.max()

    def test_kurtosis_unsupervised(self):
        from ninwavelets_tpu.ops import ica_find_bads, ica_kurtosis
        x, _, blink = self._blinky(seed=7)
        res = fastica(x, 4, n_iter=300, seed=0)
        bads, scores = ica_find_bads(res, None)
        assert len(bads) >= 1
        s = np.asarray(res.sources[bads[0]])
        assert abs(np.corrcoef(s, blink)[0, 1]) > 0.9
        # kurtosis oracle vs scipy on the flagged source
        from scipy.stats import kurtosis as sp_kurt
        k = ica_kurtosis(res)
        np.testing.assert_allclose(
            k, sp_kurt(np.asarray(res.sources), axis=1), atol=1e-2)

    def test_absolute_measure_and_validation(self):
        from ninwavelets_tpu.ops import ica_find_bads, ica_scores
        x, eog, _ = self._blinky(seed=9)
        res = fastica(x, 4, n_iter=200, seed=0)
        bads_z, scores = ica_find_bads(res, eog)
        bads_a, _ = ica_find_bads(res, eog, threshold=0.8,
                                  measure="absolute")
        assert bads_a == bads_z
        with pytest.raises(ValueError, match="measure"):
            ica_find_bads(res, eog, measure="nope")
        with pytest.raises(ValueError, match="length"):
            ica_scores(res, eog[:100])

    def test_adapter_ref_by_name(self):
        x, eog, _ = self._blinky(seed=11, c=6)
        data = np.vstack([x, eog[None, :]]).astype(np.float32)
        names = [f"EEG{i}" for i in range(6)] + ["EOG"]
        raw = type("R", (), {"_d": data, "info": {"sfreq": SFREQ},
                             "ch_names": names,
                             "get_data": lambda s: s._d})()
        rw = nw.RawWavelet(raw, nw.Morse(SFREQ), window=2048)
        res = rw.ica(4, picks=names[:6], n_iter=300)
        bads, scores = rw.ica_find_bads(res, ref="EOG")
        assert len(bads) == 1
        clean = rw.ica_clean(res, bads, picks=names[:6])
        assert clean.shape == data.shape
        # untouched channel passes through bit-exactly
        np.testing.assert_array_equal(clean[6], data[6])
        # the blink projection really left the EEG rows
        r_before = max(abs(np.corrcoef(data[i], eog)[0, 1])
                       for i in range(6))
        r_after = max(abs(np.corrcoef(clean[i], eog)[0, 1])
                      for i in range(6))
        assert r_before > 0.5 and r_after < 0.2
        # mismatched picks on a subset-fitted model fails loudly
        with pytest.raises(ValueError):
            rw.ica_clean(res, bads)
