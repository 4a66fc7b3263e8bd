"""EEG microstates (`ops/microstates.py`): planted-topography recovery,
polarity invariance, sequence statistics vs a numpy oracle, and the
RawWavelet.microstates workflow.  No reference counterpart (extension —
the broadband complement of the spectral HMM)."""
import itertools

import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import (gfp, microstate_backfit, microstate_fit,
                                 microstate_stats)


def _planted(c=16, k=4, t=6000, dwell=50, noise=0.05, seed=0):
    """(C, T) recording of K orthonormal average-referenced topographies
    with geometric dwell times, amplitude-modulated, random polarity per
    segment, plus white noise.  Returns (x, maps, labels)."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((k, c))
    m -= m.mean(axis=1, keepdims=True)           # average-reference space
    q, _ = np.linalg.qr(m.T)                     # orthonormal columns
    maps = q.T[:k]                               # (K, C) unit rows
    labels = np.zeros(t, np.int32)
    pos, state = 0, rng.integers(k)
    while pos < t:
        seg = max(3, int(rng.geometric(1.0 / dwell)))
        labels[pos:pos + seg] = state
        pos += seg
        state = (state + 1 + rng.integers(k - 1)) % k
    amp = 1.0 + 0.5 * np.sin(2 * np.pi * np.arange(t) / 97.0)
    sign = rng.choice([-1.0, 1.0], t)            # polarity flips
    x = maps[labels].T * (amp * sign)[None, :]
    x = x + noise * rng.standard_normal((c, t))
    return x.astype(np.float32), maps, labels


def _match(maps_got, maps_true):
    """Permutation + sign matching by |dot|; returns (perm, min |corr|)."""
    k = maps_true.shape[0]
    d = np.abs(maps_got @ maps_true.T)           # (K, K)
    best_perm, best_score = None, -1.0
    for perm in itertools.permutations(range(k)):
        score = min(d[perm[j], j] for j in range(k))
        if score > best_score:
            best_perm, best_score = perm, score
    return np.asarray(best_perm), best_score


class TestFit:
    def test_planted_recovery(self):
        x, maps, labels = _planted(seed=1)
        res = microstate_fit(x, 4, n_init=8, n_iter=40, seed=0)
        got = np.asarray(res.maps)
        # unit-norm, average-referenced rows
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0,
                                   atol=1e-5)
        np.testing.assert_allclose(got.mean(axis=1), 0.0, atol=1e-5)
        perm, corr = _match(got, maps)
        assert corr > 0.95
        # labels: map each got-state to its planted twin and compare
        inv = np.empty(4, np.int64)
        inv[perm] = np.arange(4)
        acc = float(np.mean(inv[np.asarray(res.labels)] == labels))
        assert acc > 0.90
        assert float(res.gev) > 0.75
        gk = np.asarray(res.gev_per_state)
        np.testing.assert_allclose(gk.sum(), float(res.gev), atol=1e-4)
        # ordered by descending coverage
        cov = np.asarray([np.mean(np.asarray(res.labels) == j)
                          for j in range(4)])
        assert np.all(np.diff(cov) <= 1e-9)

    def test_all_samples_mode(self):
        x, maps, _ = _planted(t=3000, seed=2)
        res = microstate_fit(x, 4, peaks_only=False, n_init=4,
                             n_iter=30, seed=0)
        _, corr = _match(np.asarray(res.maps), maps)
        assert corr > 0.9

    def test_polarity_invariance(self):
        """Backfit labels are identical under arbitrary sample-wise sign
        flips (the defining microstate property)."""
        x, _, _ = _planted(t=2000, seed=3)
        res = microstate_fit(x, 4, n_init=4, n_iter=30, seed=0)
        sign = np.random.default_rng(0).choice([-1.0, 1.0], x.shape[1])
        lab_flipped = microstate_backfit(x * sign[None, :], res.maps)
        np.testing.assert_array_equal(np.asarray(res.labels),
                                      np.asarray(lab_flipped))

    def test_validation(self):
        with pytest.raises(ValueError):
            microstate_fit(np.zeros((4, 10, 3), np.float32), 4)
        # constant-GFP data has no strict peaks: loud error, not NaNs
        flat = np.ones((8, 100), np.float32) * np.linspace(
            -1, 1, 8)[:, None]
        with pytest.raises(ValueError, match="GFP peaks"):
            microstate_fit(flat, 4)
        with pytest.raises(ValueError):
            microstate_fit(np.zeros((4, 100), np.float32), 4)  # K == C
        with pytest.raises(ValueError):
            microstate_fit(np.zeros((8, 100), np.float32), 1)


class TestGFP:
    def test_matches_numpy_std(self):
        x = np.random.default_rng(0).standard_normal((7, 200))
        np.testing.assert_allclose(np.asarray(gfp(x)), x.std(axis=0),
                                   rtol=1e-5, atol=1e-6)


class TestStats:
    def test_hand_sequence_oracle(self):
        # 0 0 0 1 1 0 2 2 2 2  at sfreq=10 -> 1.0 s total
        labels = np.array([0, 0, 0, 1, 1, 0, 2, 2, 2, 2], np.int32)
        s = microstate_stats(labels, 3, sfreq=10.0)
        np.testing.assert_allclose(s["coverage"], [0.4, 0.2, 0.4])
        # segments: state0 x2, state1 x1, state2 x1 over 1 s
        np.testing.assert_allclose(s["occurrence"], [2.0, 1.0, 1.0])
        np.testing.assert_allclose(s["duration"], [0.2, 0.2, 0.4])
        # distinct transitions: 0->1, 1->0, 0->2
        t = np.asarray(s["transitions"])
        np.testing.assert_allclose(t[0], [0.0, 0.5, 0.5])
        np.testing.assert_allclose(t[1], [1.0, 0.0, 0.0])
        np.testing.assert_allclose(t[2], [0.0, 0.0, 0.0])  # no outgoing

    def test_consistency_random(self):
        rng = np.random.default_rng(4)
        labels = rng.integers(0, 4, 5000).astype(np.int32)
        s = microstate_stats(labels, 4, sfreq=250.0)
        np.testing.assert_allclose(np.sum(s["coverage"]), 1.0, atol=1e-5)
        # coverage == occurrence * duration by construction
        np.testing.assert_allclose(
            s["coverage"], s["occurrence"] * s["duration"],
            rtol=1e-4, atol=1e-6)
        rows = np.asarray(s["transitions"]).sum(axis=1)
        assert np.all((np.abs(rows - 1.0) < 1e-4) | (rows == 0.0))


class TestRawAdapter:
    class FakeRaw:
        def __init__(self, data, sfreq=250.0):
            self._data = data
            self.info = {"sfreq": sfreq}
            self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[0])]

        def get_data(self):
            return self._data

    def test_workflow(self):
        x, maps, _ = _planted(c=12, t=4000, seed=5)
        rw = nw.RawWavelet(self.FakeRaw(x), nw.Morse(250.0))
        res, stats = rw.microstates(n_states=4, n_init=4, n_iter=30)
        assert np.asarray(res.maps).shape == (4, 12)
        assert np.asarray(res.labels).shape == (4000,)
        _, corr = _match(np.asarray(res.maps), maps)
        assert corr > 0.9
        np.testing.assert_allclose(np.sum(stats["coverage"]), 1.0,
                                   atol=1e-5)
        assert stats["transitions"].shape == (4, 4)


class TestSyntax:
    def test_directional_sequence_detected(self):
        """A strictly cyclic A->B->C->A syntax is maximally asymmetric;
        a symmetric random walk is not."""
        from ninwavelets_tpu.ops import microstate_syntax_test
        rng = np.random.default_rng(0)
        # cyclic: repeat 0,1,2 with random dwell
        labels = np.repeat(np.tile([0, 1, 2], 60),
                           rng.integers(3, 9, 180))
        asym, p = microstate_syntax_test(labels, 3, n_shuffles=300,
                                         seed=1)
        assert asym > 0 and p < 0.01
        # symmetric: random distinct transitions
        states = [0]
        for _ in range(200):
            nxt = rng.integers(3)
            while nxt == states[-1]:
                nxt = rng.integers(3)
            states.append(nxt)
        labels2 = np.repeat(states, rng.integers(3, 9, len(states)))
        _, p2 = microstate_syntax_test(labels2, 3, n_shuffles=300,
                                       seed=2)
        assert p2 > 0.05

    def test_validation(self):
        from ninwavelets_tpu.ops import microstate_syntax_test
        with pytest.raises(ValueError):
            microstate_syntax_test(np.zeros(5, np.int32), 3)


    def test_null_calibration_iid(self):
        """For i.i.d. labels the segment-permutation null is exchangeable
        (the statistic compresses its input), so p must be ~uniform:
        check the false-positive rate at alpha=0.3 over 40 null sims."""
        from ninwavelets_tpu.ops import microstate_syntax_test
        rng = np.random.default_rng(0)
        hits = 0
        for s in range(40):
            labels = np.repeat(rng.integers(0, 3, 150),
                               rng.integers(2, 6, 150))
            _, p = microstate_syntax_test(labels, 3, n_shuffles=99,
                                          seed=s)
            hits += p <= 0.3
        # Binomial(40, 0.3): mean 12, sd ~2.9 — accept within ~3 sd
        assert 3 <= hits <= 21
