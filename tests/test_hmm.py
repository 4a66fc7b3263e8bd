"""HMM state detection (`ops/hmm.py`): parameter recovery on sampled
chains, EM monotonicity, Viterbi consistency, and the RawWavelet.states
spectral workflow."""
import itertools

import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import hmm_fit, viterbi


def _sample_hmm(t, pi, a, means, stds, seed=0):
    rng = np.random.default_rng(seed)
    k, d = means.shape
    s = np.zeros(t, np.int32)
    s[0] = rng.choice(k, p=pi)
    for i in range(1, t):
        s[i] = rng.choice(k, p=a[s[i - 1]])
    x = means[s] + stds[s] * rng.standard_normal((t, d))
    return x.astype(np.float32), s


def _best_accuracy(pred, true, k):
    best = 0.0
    for perm in itertools.permutations(range(k)):
        mapped = np.asarray(perm)[pred]
        best = max(best, float(np.mean(mapped == true)))
    return best


PI = np.array([0.6, 0.4])
A = np.array([[0.95, 0.05], [0.10, 0.90]])
MEANS = np.array([[0.0, 2.0, -1.0], [2.5, -0.5, 1.0]])
STDS = np.full((2, 3), 0.6)


class TestRecovery:
    def test_two_state_recovery(self):
        x, s = _sample_hmm(3000, PI, A, MEANS, STDS, seed=1)
        res = hmm_fit(x, 2, n_iter=60, seed=0)
        acc = _best_accuracy(np.asarray(res.states), s, 2)
        assert acc > 0.95
        # transition structure: both self-transitions strongly sticky
        at = np.asarray(res.transition)
        assert np.all(np.diag(at) > 0.8)
        rows = np.asarray(at).sum(1)
        np.testing.assert_allclose(rows, 1.0, atol=1e-4)

    def test_loglik_nondecreasing(self):
        x, _ = _sample_hmm(1200, PI, A, MEANS, STDS, seed=2)
        res = hmm_fit(x, 2, n_iter=40, seed=0)
        ll = np.asarray(res.loglik)
        assert np.all(np.diff(ll) > -1e-2 * np.abs(ll[1:]))
        assert ll[-1] > ll[0]

    def test_viterbi_matches_posterior_argmax_when_separated(self):
        means = MEANS * 3.0  # widely separated states
        x, s = _sample_hmm(800, PI, A, means, STDS, seed=3)
        res = hmm_fit(x, 2, n_iter=40, seed=0)
        np.testing.assert_array_equal(
            np.asarray(res.states),
            np.argmax(np.asarray(res.gamma), axis=-1))

    def test_multi_sequence_shared_params(self):
        seqs, labels = [], []
        for seed in range(4):
            x, s = _sample_hmm(600, PI, A, MEANS, STDS, seed=seed)
            seqs.append(x)
            labels.append(s)
        res = hmm_fit(np.stack(seqs), 2, n_iter=60, seed=0)
        assert res.states.shape == (4, 600)
        accs = [_best_accuracy(np.asarray(res.states)[b], labels[b], 2)
                for b in range(4)]
        # one permutation must work for ALL sequences simultaneously
        best = max(
            min(float(np.mean(np.asarray(perm)[np.asarray(
                res.states)[b]] == labels[b])) for b in range(4))
            for perm in itertools.permutations(range(2)))
        assert best > 0.93
        assert min(accs) > 0.93

    def test_viterbi_on_new_data(self):
        x, s = _sample_hmm(1500, PI, A, MEANS, STDS, seed=4)
        res = hmm_fit(x[:1000], 2, n_iter=50, seed=0)
        path = np.asarray(viterbi(x[1000:], res))
        assert path.shape == (500,)
        assert _best_accuracy(path, s[1000:], 2) > 0.9

    def test_validation(self):
        x = np.zeros((100, 3), np.float32)
        with pytest.raises(ValueError):
            hmm_fit(np.zeros(50, np.float32), 2)
        with pytest.raises(ValueError):
            hmm_fit(x, 50)
        with pytest.raises(ValueError):
            hmm_fit(x, 2, n_iter=0)


class FakeRaw:
    def __init__(self, data, sfreq):
        self._data = data
        self.info = {"sfreq": sfreq}
        self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[0])]

    def get_data(self):
        return self._data


class TestRawStates:
    def test_alternating_spectral_regimes(self):
        sfreq, n = 200.0, 2 ** 14        # ~82 s
        t = np.arange(n) / sfreq
        # regime flips every ~10 s between alpha (10 Hz) and beta (25 Hz)
        regime = ((t // 10.0).astype(int) % 2).astype(np.float32)
        rng = np.random.default_rng(0)
        alpha = np.sin(2 * np.pi * 10.0 * t)
        beta = np.sin(2 * np.pi * 25.0 * t)
        sig = (1 - regime) * alpha + regime * beta
        data = np.stack([sig + 0.3 * rng.standard_normal(n)
                         for _ in range(3)]).astype(np.float32)
        rw = nw.RawWavelet(FakeRaw(data, sfreq), nw.Morse(sfreq),
                           window=4096)
        res = rw.states(n_states=2, bands=((8.0, 13.0), (20.0, 30.0)),
                        n_iter=40)
        states = np.asarray(res.states)
        # decimated ground truth at the envelope rate
        decim = max(1, int(sfreq // 20))
        nt = states.shape[0]
        truth = regime[: nt * decim : decim][:nt].astype(int)
        acc = _best_accuracy(states, truth, 2)
        assert acc > 0.85
        # state spectral profiles separate: one loads on the alpha band
        # features, the other on beta (features are z-scored log power,
        # ordered channel-major: [c0_alpha, c0_beta, c1_alpha, ...])
        m = np.asarray(res.means)
        alpha_cols = np.arange(0, 6, 2)
        beta_cols = np.arange(1, 6, 2)
        diff = m[:, alpha_cols].mean(1) - m[:, beta_cols].mean(1)
        assert np.max(diff) > 0.5 and np.min(diff) < -0.5

    def test_restarts_escape_local_optima(self):
        # 4 states with moderate separation: single-init EM often merges
        # states; the best-of-8 restart must match or beat it in loglik
        rng = np.random.default_rng(5)
        k, d, t = 4, 6, 2500
        means = rng.standard_normal((k, d)) * 1.5
        a = np.full((k, k), 0.02)
        np.fill_diagonal(a, 1 - 0.02 * (k - 1))
        s = np.zeros(t, np.int32)
        for i in range(1, t):
            s[i] = rng.choice(k, p=a[s[i - 1]])
        x = (means[s] + 0.7 * rng.standard_normal((t, d))).astype(
            np.float32)
        r1 = hmm_fit(x, k, n_iter=40, seed=0)
        r8 = hmm_fit(x, k, n_iter=40, seed=0, n_restarts=8)
        assert float(r8.loglik[-1]) >= float(r1.loglik[-1]) - 1e-3
        acc = _best_accuracy(np.asarray(r8.states), s, k)
        assert acc > 0.9
        with pytest.raises(ValueError):
            hmm_fit(x, k, n_restarts=0)


class TestSharded:
    def test_sharded_matches_single_device(self):
        from ninwavelets_tpu.parallel import sharded_hmm_fit
        from ninwavelets_tpu.parallel.mesh import make_mesh
        seqs = np.stack([_sample_hmm(400, PI, A, MEANS, STDS, seed=s)[0]
                         for s in range(8)])
        mesh = make_mesh(data=8)
        res_s = sharded_hmm_fit(seqs, mesh=mesh, n_states=2, n_iter=30,
                                seed=0)
        res_1 = hmm_fit(seqs, 2, n_iter=30, seed=0)
        np.testing.assert_allclose(np.asarray(res_s.transition),
                                   np.asarray(res_1.transition),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(res_s.means),
                                   np.asarray(res_1.means), atol=1e-3)
        np.testing.assert_array_equal(np.asarray(res_s.states),
                                      np.asarray(res_1.states))
        np.testing.assert_allclose(np.asarray(res_s.loglik),
                                   np.asarray(res_1.loglik), rtol=1e-5)

    def test_validation(self):
        from ninwavelets_tpu.parallel import sharded_hmm_fit
        from ninwavelets_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(data=8)
        with pytest.raises(ValueError):
            sharded_hmm_fit(np.zeros((6, 100, 3), np.float32),
                            mesh=mesh, n_states=2)
