"""Spatial filtering (GED / CSP / SSD) — scipy generalized-eigh oracle,
planted-topography recovery, Haufe patterns, feature separability."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

from ninwavelets_tpu.ops import spatial as sp


def _spd(rng, c, cond=10.0):
    a = rng.standard_normal((c, c))
    q, _ = np.linalg.qr(a)
    lam = np.linspace(1.0, cond, c)
    return (q * lam) @ q.T


def test_covariance_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((7, 513)).astype(np.float32)
    got = np.asarray(sp.covariance(x))
    want = np.cov(x)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_covariance_epochs_pooled():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 5, 257)).astype(np.float32)
    got = np.asarray(sp.covariance(x))
    want = sum(np.cov(e) for e in x) / 4
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_ged_matches_scipy_generalized_eigh():
    rng = np.random.default_rng(2)
    c = 8
    s = _spd(rng, c)
    r = _spd(rng, c, cond=4.0)
    res = sp.ged(s, r, shrink=0.0)
    w, v = scipy.linalg.eigh(s, r)
    np.testing.assert_allclose(np.asarray(res.eigvals), w[::-1],
                               rtol=1e-4, atol=1e-5)
    # filters match up to sign/scale: normalized column cosines ~ 1
    f = np.asarray(res.filters)
    v = v[:, ::-1]
    cos = np.abs(np.sum(f * v, 0)) / (
        np.linalg.norm(f, axis=0) * np.linalg.norm(v, axis=0))
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_ged_rayleigh_quotient_is_eigval():
    rng = np.random.default_rng(3)
    s, r = _spd(rng, 6), _spd(rng, 6, cond=3.0)
    res = sp.ged(s, r, n_components=3, shrink=0.0)
    f = np.asarray(res.filters)
    quot = np.diag(f.T @ s @ f) / np.diag(f.T @ r @ f)
    np.testing.assert_allclose(quot, np.asarray(res.eigvals),
                               rtol=1e-4)


def _planted(rng, e, c, n, sfreq, freq, snr=3.0):
    """Epochs = topography * narrowband oscillation + spatially white
    pink-ish noise; returns (epochs, topography)."""
    topo = rng.standard_normal(c)
    topo /= np.linalg.norm(topo)
    t = np.arange(n) / sfreq
    osc = np.sin(2 * np.pi * freq * t[None, :]
                 + rng.uniform(0, 2 * np.pi, (e, 1)))
    noise = rng.standard_normal((e, c, n))
    x = snr * topo[None, :, None] * osc[:, None, :] + noise
    return x.astype(np.float32), topo


def test_ged_recovers_planted_topography():
    rng = np.random.default_rng(4)
    sfreq = 128.0
    x, topo = _planted(rng, 12, 6, 512, sfreq, 11.0)
    from ninwavelets_tpu.ops import filtering as ft
    xs = np.asarray(ft.bandpass(x, sfreq, 9.0, 13.0))
    res = sp.ged(sp.covariance(xs), sp.covariance(x))
    pat = np.asarray(res.patterns[:, 0])
    cos = abs(pat @ topo) / np.linalg.norm(pat)
    assert cos > 0.95
    # narrowband/broadband ratio: the rhythmic component is far above
    # the noise floor set by the band's width fraction
    ev = np.asarray(res.eigvals)
    assert ev[0] > 3.0 * np.median(ev)


def test_ssd_recovers_planted_topography():
    rng = np.random.default_rng(5)
    x, topo = _planted(rng, 10, 6, 1024, 128.0, 10.0)
    res = sp.ssd(x, 128.0, 8.0, 12.0, n_components=2)
    pat = np.asarray(res.patterns[:, 0])
    cos = abs(pat @ topo) / np.linalg.norm(pat)
    assert cos > 0.95
    assert float(res.eigvals[0]) > float(res.eigvals[1])


def test_ssd_validation():
    x = np.zeros((3, 256), np.float32)
    with pytest.raises(ValueError):
        sp.ssd(x, 128.0, 1.0, 4.0, flank=2.0)   # f_lo - flank <= 0
    with pytest.raises(ValueError):
        sp.ssd(x, 128.0, 8.0, 12.0, flank=2.0, gap=2.5)


def _two_class(rng, e, c, n, sfreq):
    """Class A: 11 Hz rhythm on topo_a; class B: same on topo_b."""
    t = np.arange(n) / sfreq
    topo_a = np.eye(c)[0] + 0.1 * rng.standard_normal(c)
    topo_b = np.eye(c)[c - 1] + 0.1 * rng.standard_normal(c)
    osc = lambda: np.sin(2 * np.pi * 11.0 * t[None, :]
                         + rng.uniform(0, 2 * np.pi, (e, 1)))
    base = lambda: rng.standard_normal((e, c, n))
    xa = 2.5 * topo_a[None, :, None] * osc()[:, None, :] + base()
    xb = 2.5 * topo_b[None, :, None] * osc()[:, None, :] + base()
    return (xa.astype(np.float32), xb.astype(np.float32),
            topo_a / np.linalg.norm(topo_a),
            topo_b / np.linalg.norm(topo_b))


def test_csp_eigvals_and_patterns():
    rng = np.random.default_rng(6)
    xa, xb, topo_a, topo_b = _two_class(rng, 16, 6, 512, 128.0)
    res = sp.csp(xa, xb, n_components=2, f_lo=9.0, f_hi=13.0,
                 sfreq=128.0)
    ev = np.asarray(res.eigvals)
    assert 0.0 < ev.min() and ev.max() < 1.0
    # component 0 favors class A (lam > .5), component 1 class B
    assert ev[0] > 0.6 and ev[1] < 0.4
    pats = np.asarray(res.patterns)
    cos_a = abs(pats[:, 0] @ topo_a) / np.linalg.norm(pats[:, 0])
    cos_b = abs(pats[:, 1] @ topo_b) / np.linalg.norm(pats[:, 1])
    assert cos_a > 0.9 and cos_b > 0.9


def test_csp_features_separate_classes():
    rng = np.random.default_rng(7)
    xa, xb, _, _ = _two_class(rng, 20, 6, 512, 128.0)
    res = sp.csp(xa, xb, n_components=2, f_lo=9.0, f_hi=13.0,
                 sfreq=128.0)
    fa = np.asarray(sp.csp_features(jnp.asarray(xa), res.filters))
    fb = np.asarray(sp.csp_features(jnp.asarray(xb), res.filters))
    # class A has larger component-0 log variance in every trial pairing
    assert fa[:, 0].mean() > fb[:, 0].mean() + 0.5
    assert fb[:, 1].mean() > fa[:, 1].mean() + 0.5


def test_csp_validation():
    xa = np.zeros((4, 5, 64), np.float32)
    with pytest.raises(ValueError):
        sp.csp(xa, np.zeros((4, 6, 64), np.float32))
    with pytest.raises(ValueError):
        sp.csp(xa, xa, f_lo=8.0, f_hi=12.0)  # missing sfreq


def test_spatial_apply_shapes():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((3, 5, 128)).astype(np.float32)
    f = rng.standard_normal((5, 2)).astype(np.float32)
    assert sp.spatial_apply(x, f).shape == (3, 2, 128)
    assert sp.spatial_apply(x[0], f).shape == (2, 128)
    # projection really is filters.T @ x
    np.testing.assert_allclose(np.asarray(sp.spatial_apply(x[0], f)),
                               f.T @ x[0], rtol=1e-5, atol=1e-5)


def test_ged_sign_deterministic():
    rng = np.random.default_rng(9)
    s, r = _spd(rng, 5), _spd(rng, 5, cond=3.0)
    a = sp.ged(s, r)
    b = sp.ged(s, r)
    np.testing.assert_array_equal(np.asarray(a.filters),
                                  np.asarray(b.filters))
    p = np.asarray(a.patterns)
    assert (p[np.abs(p).argmax(0), np.arange(p.shape[1])] > 0).all()


# -- sharded ----------------------------------------------------------------

def test_sharded_covariance_matches_single_device():
    from ninwavelets_tpu import parallel as par
    rng = np.random.default_rng(10)
    x = rng.standard_normal((8, 5, 256)).astype(np.float32)
    mesh = par.make_mesh(data=4, freq=1)
    got = np.asarray(par.sharded_covariance(x, mesh=mesh))
    want = np.asarray(sp.covariance(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_csp_matches_single_device():
    from ninwavelets_tpu import parallel as par
    rng = np.random.default_rng(11)
    xa, xb, _, _ = _two_class(rng, 16, 6, 256, 128.0)
    mesh = par.make_mesh(data=4, freq=1)
    got = par.sharded_csp(xa, xb, mesh=mesh, n_components=2)
    want = sp.csp(xa, xb, n_components=2)
    np.testing.assert_allclose(np.asarray(got.eigvals),
                               np.asarray(want.eigvals), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.filters),
                               np.asarray(want.filters),
                               rtol=5e-3, atol=5e-4)


def test_sharded_covariance_validates_divisibility():
    from ninwavelets_tpu import parallel as par
    mesh = par.make_mesh(data=4, freq=1)
    with pytest.raises(ValueError):
        par.sharded_covariance(np.zeros((6, 3, 64), np.float32),
                               mesh=mesh)


# -- adapter ----------------------------------------------------------------

def _adapter(rng, e=12, c=5, n=512, sfreq=128.0):
    from ninwavelets_tpu import Morse
    from ninwavelets_tpu.utils.mne_adapter import ArrayEpochs, EpochsWavelet
    data = rng.standard_normal((e, c, n)).astype(np.float32)
    names = [f"ch{i}" for i in range(c)]
    return EpochsWavelet(ArrayEpochs(data, sfreq, names), Morse(sfreq)), data


def test_adapter_csp_and_spatial_epochs():
    rng = np.random.default_rng(12)
    xa, xb, _, _ = _two_class(rng, 8, 5, 512, 128.0)
    from ninwavelets_tpu import Morse
    from ninwavelets_tpu.utils.mne_adapter import ArrayEpochs, EpochsWavelet
    data = np.concatenate([xa, xb])
    y = np.r_[np.zeros(8), np.ones(8)]
    ew = EpochsWavelet(ArrayEpochs(data, 128.0,
                                   [f"ch{i}" for i in range(5)]),
                       Morse(128.0))
    res = ew.csp(y, n_components=2, f_lo=9.0, f_hi=13.0)
    want = sp.csp(xa, xb, n_components=2, f_lo=9.0, f_hi=13.0,
                  sfreq=128.0)
    np.testing.assert_allclose(np.asarray(res.eigvals),
                               np.asarray(want.eigvals), rtol=1e-5)
    comp = ew.spatial_epochs(res)
    assert comp.epochs.ch_names == ["comp0", "comp1"]
    # the component adapter is fully composable: run a TFR on it
    p = comp.power("comp0", [10.0, 20.0])
    assert p.shape == (2, 512)
    with pytest.raises(ValueError):
        ew.csp(y[:5])
    with pytest.raises(ValueError):
        ew.csp(np.zeros(16))


def test_adapter_ged_ssd():
    rng = np.random.default_rng(13)
    ew, data = _adapter(rng)
    g = ew.ged(8.0, 12.0, n_components=3)
    assert np.asarray(g.filters).shape == (5, 3)
    s = ew.ssd(8.0, 12.0, n_components=2)
    assert np.asarray(s.patterns).shape == (5, 2)


# -- CSP decoding -------------------------------------------------------------

def test_csp_decode_separates_planted_classes():
    from ninwavelets_tpu.ops.decoding import csp_decode
    rng = np.random.default_rng(14)
    xa, xb, _, _ = _two_class(rng, 24, 6, 512, 128.0)
    auc = float(csp_decode(xa, xb, n_folds=4, n_components=2,
                           f_lo=9.0, f_hi=13.0, sfreq=128.0))
    assert auc > 0.9


def test_csp_decode_chance_on_identical_distributions():
    from ninwavelets_tpu.ops.decoding import csp_decode
    rng = np.random.default_rng(15)
    xa = rng.standard_normal((40, 5, 256)).astype(np.float32)
    xb = rng.standard_normal((40, 5, 256)).astype(np.float32)
    auc = float(csp_decode(xa, xb, n_folds=4, n_components=2))
    assert abs(auc - 0.5) < 0.15


def test_csp_decode_validation():
    from ninwavelets_tpu.ops.decoding import csp_decode
    x = np.zeros((6, 4, 128), np.float32)
    with pytest.raises(ValueError):
        csp_decode(x, np.zeros((6, 5, 128), np.float32))
    with pytest.raises(ValueError):
        csp_decode(x[:3], x, n_folds=5)
    with pytest.raises(ValueError):
        csp_decode(x, x, f_lo=8.0, f_hi=12.0)  # missing sfreq


def test_adapter_csp_decode():
    rng = np.random.default_rng(16)
    xa, xb, _, _ = _two_class(rng, 12, 5, 512, 128.0)
    from ninwavelets_tpu import Morse
    from ninwavelets_tpu.utils.mne_adapter import ArrayEpochs, EpochsWavelet
    data = np.concatenate([xa, xb])
    y = np.r_[np.zeros(12), np.ones(12)]
    ew = EpochsWavelet(ArrayEpochs(data, 128.0,
                                   [f"ch{i}" for i in range(5)]),
                       Morse(128.0))
    auc = float(ew.csp_decode(y, n_folds=3, n_components=2,
                              f_lo=9.0, f_hi=13.0))
    assert auc > 0.85


class TestSSVEP:
    """CCA-based SSVEP recognition (`ops.decoding.ssvep_cca`)."""

    @staticmethod
    def _trials(stim_freqs, labels, c=8, n=1000, snr=0.4, seed=0,
                sfreq=250.0):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / sfreq
        mix = rng.standard_normal(c)
        x = np.stack([
            snr * mix[:, None] * (np.sin(2 * np.pi * stim_freqs[k] * t)
                                  + 0.4 * np.sin(4 * np.pi
                                                 * stim_freqs[k] * t)
                                  )[None, :]
            + rng.standard_normal((c, n))
            for k in labels])
        return x.astype(np.float32)

    def test_classifies_planted_frequencies(self):
        from ninwavelets_tpu.ops.decoding import ssvep_cca
        stim = [8.0, 10.0, 12.0, 15.0]
        labels = [0, 1, 2, 3, 2, 1, 0, 3, 1, 2]
        x = self._trials(stim, labels)
        got, rho = ssvep_cca(x, stim, 250.0)
        acc = np.mean(np.asarray(got) == np.asarray(labels))
        assert acc >= 0.9, (np.asarray(got), labels)
        assert rho.shape == (10, 4)
        assert np.all((np.asarray(rho) >= 0) & (np.asarray(rho) <= 1))

    def test_harmonics_help_squarewave(self):
        """A square-wave-like stimulus puts energy in harmonics: the
        3-harmonic reference beats the fundamental-only one."""
        from ninwavelets_tpu.ops.decoding import ssvep_cca
        rng = np.random.default_rng(1)
        stim = [7.0, 11.0]
        t = np.arange(1000) / 250.0
        sq = np.sign(np.sin(2 * np.pi * 7.0 * t))
        x = (0.35 * sq[None, :] * rng.standard_normal((6, 1))
             + rng.standard_normal((6, 1000)))[None].transpose(0, 1, 2)
        x = np.repeat(x, 8, axis=0).astype(np.float32)
        x += 0.3 * rng.standard_normal(x.shape).astype(np.float32)
        _, rho3 = ssvep_cca(x, stim, 250.0, n_harmonics=3)
        _, rho1 = ssvep_cca(x, stim, 250.0, n_harmonics=1)
        assert np.asarray(rho3)[:, 0].mean() > np.asarray(
            rho1)[:, 0].mean()

    def test_matches_sklearn_cca(self):
        from ninwavelets_tpu.ops.decoding import cca_reference, ssvep_cca
        from sklearn.cross_decomposition import CCA
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 4, 600)).astype(np.float32)
        stim = [9.0]
        _, rho = ssvep_cca(x, stim, 200.0, n_harmonics=2, lam=1e-9)
        refs = np.asarray(cca_reference(stim, 600, 200.0, 2))[0]
        cca = CCA(n_components=1, max_iter=2000, tol=1e-9)
        u, v = cca.fit_transform(x[0].T, refs.T)
        want = abs(np.corrcoef(u[:, 0], v[:, 0])[0, 1])
        np.testing.assert_allclose(float(rho[0, 0]), want, atol=2e-3)

    def test_adapter_and_validation(self):
        import ninwavelets_tpu as nw
        from tests.test_epochs import FakeEpochs
        from ninwavelets_tpu.ops.decoding import ssvep_cca
        stim = [8.0, 13.0]
        x = self._trials(stim, [0, 1, 1, 0], sfreq=250.0, seed=3)
        ew = nw.EpochsWavelet(FakeEpochs(x, 250.0), nw.Morse(250.0))
        labels, rho = ew.ssvep(stim)
        assert np.array_equal(np.asarray(labels), [0, 1, 1, 0])
        with pytest.raises(ValueError):
            ssvep_cca(x, [], 250.0)


class TestCorrCA:
    def test_planted_shared_component(self):
        """One stimulus-locked source shared by all subjects through a
        common topography + subject-specific noise: the top component
        recovers the topography direction and its ISC is high; on
        unshared noise the ISC collapses."""
        from ninwavelets_tpu.ops.spatial import corrca
        rng = np.random.default_rng(0)
        s, c, n = 6, 10, 4000
        topo = rng.standard_normal(c); topo /= np.linalg.norm(topo)
        shared = np.sin(2 * np.pi * 6 * np.arange(n) / 250.0) \
            + 0.3 * rng.standard_normal(n)
        x = np.stack([topo[:, None] * shared[None, :]
                      + 0.8 * rng.standard_normal((c, n))
                      for _ in range(s)]).astype(np.float32)
        w, isc = corrca(x, n_components=3)
        w = np.asarray(w); isc = np.asarray(isc)
        # ISC sorted descending; top component aligned with the mixing
        # direction up to the within-whitening transform: check the
        # COMPONENT TIME COURSES correlate across subjects instead
        tcs = np.einsum("c,scn->sn", w[0], x)
        cors = [np.corrcoef(tcs[i], tcs[j])[0, 1]
                for i in range(s) for j in range(i + 1, s)]
        assert np.mean(cors) > 0.4
        assert isc[0] > 0.3
        assert isc[0] >= isc[1] >= isc[2]
        # unshared noise: ISC near zero
        xn = rng.standard_normal((s, c, n)).astype(np.float32)
        _, isc0 = corrca(xn, n_components=2)
        assert float(np.asarray(isc0)[0]) < 0.05

    def test_validation(self):
        from ninwavelets_tpu.ops.spatial import corrca
        with pytest.raises(ValueError):
            corrca(np.zeros((4, 100), np.float32))
        with pytest.raises(ValueError):
            corrca(np.zeros((1, 4, 100), np.float32))
        with pytest.raises(ValueError):
            corrca(np.zeros((3, 4, 100), np.float32), n_components=9)


class TestXdawn:
    @staticmethod
    def _p300(c=12, n=60000, n_ev=120, amp=1.0, seed=0, sfreq=250.0):
        rng = np.random.default_rng(seed)
        L = int(0.6 * sfreq)                         # 600 ms response
        t = np.arange(L) / sfreq
        wave = np.exp(-0.5 * ((t - 0.3) / 0.06) ** 2)  # P300-ish bump
        topo = rng.standard_normal(c); topo /= np.linalg.norm(topo)
        ev = np.sort(rng.choice(np.arange(0, n - L, L),
                                n_ev, replace=False))
        x = rng.standard_normal((c, n))
        for s in ev:
            x[:, s:s + L] += amp * topo[:, None] * wave[None, :]
        return (x.astype(np.float32), ev, wave.astype(np.float32),
                topo.astype(np.float32), L)

    def test_enhances_planted_response(self):
        from ninwavelets_tpu.ops.spatial import xdawn
        x, ev, wave, topo, L = self._p300(amp=1.0, seed=1)
        w, evoked, ratios = xdawn(x, ev, L, n_components=3)
        w = np.asarray(w); evoked = np.asarray(evoked)
        ratios = np.asarray(ratios)
        # top component's evoked estimate matches the planted waveform
        r = abs(np.corrcoef(evoked[0], wave)[0, 1])
        assert r > 0.9, r
        # ratios descending; top clearly above the rest
        assert ratios[0] >= ratios[1] >= ratios[2]
        assert ratios[0] > 3 * ratios[1]
        # virtual channel beats the best single channel's evoked SNR
        def esnr(sig):
            seg = np.stack([sig[s:s + L] for s in ev])
            m = seg.mean(0)
            return (m ** 2).mean() / np.maximum(
                (seg - m).var(), 1e-30)
        virt = w[0] @ x
        best_single = max(esnr(x[ch]) for ch in range(x.shape[0]))
        assert esnr(virt) > 2 * best_single

    def test_validation(self):
        from ninwavelets_tpu.ops.spatial import xdawn
        with pytest.raises(ValueError):
            xdawn(np.zeros((4, 100, 2), np.float32), [0], 10)
        with pytest.raises(ValueError):
            xdawn(np.zeros((4, 100), np.float32), [99], 10)
        with pytest.raises(ValueError):
            xdawn(np.zeros((4, 100), np.float32), [0, 20], 10,
                  n_components=9)


class TestLedoitWolf:
    """Analytic shrinkage (`ops.spatial.ledoit_wolf`), sklearn-oracled."""

    def test_matches_sklearn(self):
        from sklearn.covariance import ledoit_wolf as sk_lw
        from ninwavelets_tpu.ops import ledoit_wolf
        rng = np.random.default_rng(0)
        for c, n in [(8, 50), (16, 16), (32, 200)]:
            a = rng.standard_normal((c, c))
            x = (a @ rng.standard_normal((c, n))).astype(np.float32)
            cov, al = ledoit_wolf(x)
            cov_sk, al_sk = sk_lw(np.asarray(x, np.float64).T)
            assert al == pytest.approx(al_sk, abs=1e-5)
            np.testing.assert_allclose(np.asarray(cov), cov_sk,
                                       rtol=1e-4, atol=1e-6)

    def test_pooled_epochs_and_validation(self):
        from ninwavelets_tpu.ops import ledoit_wolf
        rng = np.random.default_rng(1)
        d = rng.standard_normal((6, 5, 128)).astype(np.float32)
        cov_e, al_e = ledoit_wolf(d)
        # pooled == flat per-epoch-centered samples
        flat = (d - d.mean(-1, keepdims=True)).transpose(1, 0, 2) \
            .reshape(5, -1)
        cov_f, al_f = ledoit_wolf(flat)
        np.testing.assert_allclose(np.asarray(cov_e), np.asarray(cov_f),
                                   rtol=1e-5, atol=1e-7)
        assert al_e == pytest.approx(al_f, abs=1e-6)
        with pytest.raises(ValueError):
            ledoit_wolf(np.zeros((3,), np.float32))

    def test_riemann_lw_estimator(self):
        from sklearn.covariance import ledoit_wolf as sk_lw
        from ninwavelets_tpu.ops.riemann import epoch_covariances
        rng = np.random.default_rng(2)
        d = rng.standard_normal((4, 6, 40)).astype(np.float32)
        covs = np.asarray(epoch_covariances(d, shrink="lw"))
        for e in range(4):
            want, _ = sk_lw(np.asarray(d[e], np.float64).T)
            np.testing.assert_allclose(covs[e], want, rtol=1e-4,
                                       atol=1e-6)
        # SPD even at N < C
        short = rng.standard_normal((3, 16, 8)).astype(np.float32)
        cs = np.asarray(epoch_covariances(short, shrink="lw"))
        assert np.linalg.eigvalsh(cs).min() > 0
        with pytest.raises(ValueError, match="lw"):
            epoch_covariances(d, shrink="oas")
