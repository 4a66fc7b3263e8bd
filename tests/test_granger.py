"""Wilson spectral factorization + wavelet Granger causality
(`ops/granger.py`) against analytic VAR oracles: the true spectral
matrix of a known VAR has a closed-form factorization (H with unit
zero-lag, the innovation covariance), so both the factors and Geweke's
GC are checkable exactly — then end-to-end on simulated VAR epochs."""
import numpy as np
import pytest

import jax.numpy as jnp
from ninwavelets_tpu.ops import granger as gr

FS = 200.0


def _var_system():
    """VAR(2): y drives x in the ~40 Hz band; x never drives y."""
    a1 = np.array([[0.55, 0.25], [0.0, 0.55]])
    a2 = np.array([[-0.8, 0.0], [0.0, -0.8]])
    # resonance: roots of 1 - 0.55 z + 0.8 z^2 -> ~|pole| .9, ~48 Hz @ 200
    sig = np.diag([1.0, 0.7])
    return [a1, a2], sig


def _true_spectrum(coeffs, sig, freqs):
    k = len(freqs)
    s = np.zeros((k, 2, 2), np.complex128)
    h = np.zeros((k, 2, 2), np.complex128)
    for idx, f in enumerate(freqs):
        a = np.eye(2, dtype=np.complex128)
        for lag, ak in enumerate(coeffs, start=1):
            a -= ak * np.exp(-2j * np.pi * f * lag / FS)
        h[idx] = np.linalg.inv(a)
        s[idx] = h[idx] @ sig @ h[idx].conj().T
    return s, h


def _simulate(coeffs, sig, e=24, n=2048, seed=0):
    rng = np.random.default_rng(seed)
    p = len(coeffs)
    burn = 200
    out = np.zeros((e, 2, n), np.float32)
    chol = np.linalg.cholesky(sig)
    for ep in range(e):
        x = np.zeros((n + burn, 2))
        eps = rng.standard_normal((n + burn, 2)) @ chol.T
        for t in range(p, n + burn):
            acc = eps[t].copy()
            for lag, ak in enumerate(coeffs, start=1):
                acc += ak @ x[t - lag]
            x[t] = acc
        out[ep] = x[burn:].T
    return out


class TestWilson:
    def setup_method(self):
        self.coeffs, self.sig = _var_system()
        # sharp resonance (poles |z| ~ 0.89): the lag covariance
        # must decay within 2(K-1) lags, so use a fine grid
        self.freqs = gr.uniform_freqs(129, FS)
        self.s, self.h_true = _true_spectrum(self.coeffs, self.sig,
                                             self.freqs)

    def test_reconstructs_spectrum(self):
        h, sig = gr.wilson_factorize(self.s, n_iter=100)
        h, sig = np.asarray(h, np.complex128), np.asarray(sig, np.float64)
        recon = h @ sig[None] @ np.conj(np.swapaxes(h, -1, -2))
        rel = np.abs(recon - self.s).max() / np.abs(self.s).max()
        assert rel < 1e-4

    def test_recovers_innovation_covariance(self):
        _, sig = gr.wilson_factorize(self.s, n_iter=100)
        np.testing.assert_allclose(np.asarray(sig), self.sig, atol=5e-3)

    def test_recovers_transfer_function(self):
        h, _ = gr.wilson_factorize(self.s, n_iter=100)
        np.testing.assert_allclose(np.asarray(h), self.h_true,
                                   atol=5e-3 * np.abs(self.h_true).max())

    def test_gc_matches_analytic(self):
        gc = np.asarray(gr.spectral_granger_pairwise(
            jnp.asarray(self.s, jnp.complex64), n_iter=100))
        analytic = np.asarray(gr.granger_from_factors(
            jnp.asarray(self.h_true, jnp.complex64),
            jnp.asarray(self.sig, jnp.float32),
            jnp.asarray(self.s, jnp.complex64)))
        np.testing.assert_allclose(gc[:, 0, 1], analytic[:, 0],
                                   atol=2e-3)
        np.testing.assert_allclose(gc[:, 1, 0], analytic[:, 1],
                                   atol=2e-3)
        # direction: y drives x, never the reverse
        assert gc[:, 0, 1].max() > 0.05
        assert gc[:, 1, 0].max() < 1e-3
        assert np.all(gc[..., range(2), range(2)] == 0.0)

    def test_batched_matches_loop(self):
        # a (T, K, C, C) batch factorizes each slice independently
        s2 = np.stack([self.s, 1.7 * self.s])
        h, sig = gr.wilson_factorize(s2, n_iter=80)
        h0, sig0 = gr.wilson_factorize(self.s, n_iter=80)
        np.testing.assert_allclose(np.asarray(h)[0], np.asarray(h0),
                                   rtol=2e-4, atol=2e-5)
        # scaling S by c scales Sigma by c, H unchanged
        np.testing.assert_allclose(np.asarray(sig)[1],
                                   1.7 * np.asarray(sig)[0], rtol=2e-3,
                                   atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            gr.wilson_factorize(np.zeros((4, 2, 3)))
        with pytest.raises(ValueError):
            gr.wilson_factorize(np.zeros((2, 2, 2)))


class TestWaveletGranger:
    def test_direction_on_simulated_var(self):
        coeffs, sig = _var_system()
        data = _simulate(coeffs, sig, e=24, n=2048)
        gc = np.asarray(gr.wavelet_granger(data, FS, n_bins=33,
                                           time_decim=32, n_iter=60))
        assert gc.shape == (64, 33, 2, 2)
        m = gc[:, :, :, :].mean(axis=(0,))   # (K, 2, 2) time-mean
        # y -> x dominates everywhere it matters; x -> y stays near zero
        assert m[:, 0, 1].max() > 5 * max(m[:, 1, 0].max(), 1e-6)
        # the driven influence peaks in the resonance band (> 25 Hz)
        freqs = gr.uniform_freqs(33, FS)
        assert freqs[m[:, 0, 1].argmax()] > 25.0

    def test_scale_invariance(self):
        coeffs, sig = _var_system()
        data = _simulate(coeffs, sig, e=8, n=1024, seed=3)
        a = np.asarray(gr.wavelet_granger(data, FS, n_bins=17,
                                          time_decim=64, n_iter=40))
        b = np.asarray(gr.wavelet_granger(3.0 * data, FS, n_bins=17,
                                          time_decim=64, n_iter=40))
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            gr.wavelet_granger(np.zeros((4, 128)), FS)


class TestAdapter:
    def test_epochswavelet_granger(self):
        import ninwavelets_tpu as nw
        coeffs, sig = _var_system()
        data3 = np.concatenate(
            [_simulate(coeffs, sig, e=8, n=512, seed=5),
             np.random.default_rng(9).standard_normal(
                 (8, 1, 512)).astype(np.float32)], axis=1)
        ew = nw.EpochsWavelet(
            nw.ArrayEpochs(data3, FS, ch_names=["x", "y", "z"]),
            nw.Morse(FS))
        gc = np.asarray(ew.granger(picks=["x", "y"], n_bins=17,
                                   time_decim=64, n_iter=40))
        assert gc.shape == (8, 17, 2, 2)
        m = gc.mean(0)
        assert m[:, 0, 1].max() > m[:, 1, 0].max()
        full = np.asarray(ew.granger(n_bins=9, time_decim=128, n_iter=30))
        assert full.shape == (4, 9, 3, 3)


def test_stats_demo_headless(capsys):
    """The statistics walkthrough runs end to end (no plot) and recovers
    its ground truths."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "stats_demo", os.path.join(os.path.dirname(__file__), "..",
                                   "examples", "stats_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(plot=False)
    out = capsys.readouterr().out
    assert "cluster test" in out and "p=0.00" in out
    assert "TFCE" in out and "Granger" in out
    assert "decoding: peak AUC" in out and "network: global" in out


class TestSignificance:
    def test_surrogates_kill_coupling_and_keep_detection(self):
        coeffs, sig = _var_system()
        data = _simulate(coeffs, sig, e=16, n=1024, seed=7)
        gc, p = gr.wavelet_granger_significance(
            data, FS, n_surrogates=19, n_bins=17, time_decim=128,
            n_iter=40)
        gc, p = np.asarray(gc), np.asarray(p)
        assert gc.shape == p.shape == (8, 17, 2, 2)
        # the true direction reaches significance somewhere in the
        # resonance band; the absent direction does not dominate
        m = gc.mean(0)
        band = m[:, 0, 1].argmax()
        assert p[:, band, 0, 1].min() == pytest.approx(0.05, abs=1e-6)
        assert (p[..., range(2), range(2)] == 1.0).all()
        # significant cells are rarer in the reverse direction
        assert (p[..., 0, 1] <= 0.05).sum() > (p[..., 1, 0] <= 0.05).sum()

    def test_gc_matches_plain_wavelet_granger(self):
        coeffs, sig = _var_system()
        data = _simulate(coeffs, sig, e=8, n=512, seed=8)
        gc, _ = gr.wavelet_granger_significance(
            data, FS, n_surrogates=2, n_bins=9, time_decim=128, n_iter=30)
        plain = gr.wavelet_granger(data, FS, n_bins=9, time_decim=128,
                                   n_iter=30)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(plain),
                                   rtol=2e-4, atol=2e-5)


class TestSharded:
    def test_sharded_matches_single_device(self):
        import ninwavelets_tpu.parallel as par
        from ninwavelets_tpu.ops.granger import _granger_inputs
        coeffs, sig = _var_system()
        data = _simulate(coeffs, sig, e=8, n=512, seed=11)
        sigs, bank = _granger_inputs(data, FS, 17, True)
        single = np.asarray(gr.wavelet_granger(data, FS, n_bins=17,
                                               time_decim=64, n_iter=40))
        for d in (2, 4):
            mesh = par.make_mesh(data=d, freq=1)
            out = np.asarray(par.sharded_wavelet_granger(
                sigs, bank, mesh=mesh, time_decim=64, n_iter=40))
            np.testing.assert_allclose(out, single, rtol=5e-3, atol=1e-5)


class TestConditional:
    def _chain(self):
        """x <- z <- y chain (no direct y -> x), order [x, y, z]."""
        a = np.diag([0.5, 0.5, 0.5])
        a[0, 2] = 0.5   # x <- z
        a[2, 1] = 0.5   # z <- y
        return [a], np.diag([1.0, 0.8, 0.9])

    def test_mediated_link_suppressed(self):
        coeffs, sig = self._chain()
        freqs = gr.uniform_freqs(65, FS)
        k = len(freqs)
        s = np.zeros((k, 3, 3), np.complex128)
        for idx, f in enumerate(freqs):
            h = np.linalg.inv(np.eye(3)
                              - coeffs[0] * np.exp(-2j * np.pi * f / FS))
            s[idx] = h @ sig @ h.conj().T
        pw = np.asarray(gr.spectral_granger_pairwise(s, n_iter=100))
        cg = np.asarray(gr.conditional_granger(s, n_iter=100))
        # pairwise is fooled by the indirect route; conditional is not
        assert pw[:, 0, 1].max() > 0.2
        assert cg[:, 0, 1].max() < 1e-3
        # direct links survive conditioning, absent ones stay zero
        assert cg[:, 0, 2].max() > 0.3
        assert cg[:, 2, 1].max() > 0.3
        assert cg[:, 1, 0].max() < 1e-3
        assert cg[:, 1, 2].max() < 1e-3
        assert np.all(cg[:, range(3), range(3)] == 0.0)

    def test_reduces_to_pairwise_when_rest_is_independent(self):
        """With an INDEPENDENT third channel, conditioning changes
        nothing: F_{y->x|z} == F_{y->x}."""
        coeffs, sig2 = _var_system()
        a = np.zeros((3, 3))
        a[:2, :2] = coeffs[0]
        a[2, 2] = 0.3
        a2 = np.zeros((3, 3))
        a2[:2, :2] = coeffs[1]
        sig3 = np.diag([1.0, 0.7, 0.5])
        freqs = gr.uniform_freqs(129, FS)
        k = len(freqs)
        s = np.zeros((k, 3, 3), np.complex128)
        for idx, f in enumerate(freqs):
            z1 = np.exp(-2j * np.pi * f / FS)
            h = np.linalg.inv(np.eye(3) - a * z1 - a2 * z1 * z1)
            s[idx] = h @ sig3 @ h.conj().T
        cg = np.asarray(gr.conditional_granger(s, n_iter=150))
        pw = np.asarray(gr.spectral_granger_pairwise(
            s[:, :2, :2], n_iter=150))
        np.testing.assert_allclose(cg[:, 0, 1], pw[:, 0, 1], atol=2e-3)
        np.testing.assert_allclose(cg[:, 1, 0], pw[:, 1, 0], atol=2e-3)

    def test_wavelet_conditional_on_simulated_chain(self):
        coeffs, sig = self._chain()
        data = _simulate3(coeffs, sig, e=24, n=2048, seed=6)
        cg = np.asarray(gr.wavelet_conditional_granger(
            data, FS, n_bins=33, time_decim=64, n_iter=60))
        pw = np.asarray(gr.wavelet_granger(data, FS, n_bins=33,
                                           time_decim=64, n_iter=60))
        m_c, m_p = cg.mean(0), pw.mean(0)
        # conditioning collapses the mediated y->x link
        assert m_c[:, 0, 1].max() < 0.4 * m_p[:, 0, 1].max()
        # direct links stay comparable
        assert m_c[:, 0, 2].max() > 0.5 * m_p[:, 0, 2].max()

    def test_validation(self):
        with pytest.raises(ValueError):
            gr.conditional_granger(np.zeros((8, 2, 2)))
        with pytest.raises(ValueError):
            gr.wavelet_conditional_granger(np.zeros((4, 2, 128)), FS)


def _simulate3(coeffs, sig, e, n, seed):
    rng = np.random.default_rng(seed)
    p = len(coeffs)
    burn = 200
    c = sig.shape[0]
    out = np.zeros((e, c, n), np.float32)
    chol = np.linalg.cholesky(sig)
    for ep in range(e):
        x = np.zeros((n + burn, c))
        eps = rng.standard_normal((n + burn, c)) @ chol.T
        for t in range(p, n + burn):
            acc = eps[t].copy()
            for lag, ak in enumerate(coeffs, start=1):
                acc += ak @ x[t - lag]
            x[t] = acc
        out[ep] = x[burn:].T
    return out


def test_adapter_conditional_flag():
    import ninwavelets_tpu as nw
    a = np.diag([0.5, 0.5, 0.5])
    a[0, 2] = 0.5
    a[2, 1] = 0.5
    data = _simulate3([a], np.diag([1.0, 0.8, 0.9]), e=8, n=512, seed=12)
    ew = nw.EpochsWavelet(
        nw.ArrayEpochs(data, FS, ch_names=["x", "y", "z"]), nw.Morse(FS))
    cg = np.asarray(ew.granger(n_bins=17, time_decim=128, n_iter=40,
                               conditional=True))
    assert cg.shape == (4, 17, 3, 3)
    assert np.all(cg[..., range(3), range(3)] == 0.0)


class TestDtfPdc:
    def test_pdc_direct_only_dtf_cascades(self):
        # x <- z <- y chain, order [x, y, z]
        a = np.diag([0.5, 0.5, 0.5])
        a[0, 2] = 0.5
        a[2, 1] = 0.5
        sig = np.diag([1.0, 0.8, 0.9])
        freqs = gr.uniform_freqs(65, FS)
        k = len(freqs)
        s = np.zeros((k, 3, 3), np.complex128)
        a_true = np.zeros((k, 3, 3), np.complex128)
        for idx, f in enumerate(freqs):
            at = np.eye(3) - a * np.exp(-2j * np.pi * f / FS)
            a_true[idx] = at
            h = np.linalg.inv(at)
            s[idx] = h @ sig @ h.conj().T
        dtf, pdc = gr.dtf_pdc(s, n_iter=100)
        dtf, pdc = np.asarray(dtf), np.asarray(pdc)
        # PDC: only DIRECT links (A_xy = 0 in the chain)
        assert pdc[:, 0, 1].max() < 0.02        # y->x mediated: ~0
        assert pdc[:, 0, 2].max() > 0.3         # z->x direct
        assert pdc[:, 2, 1].max() > 0.3         # y->z direct
        # DTF: the cascade shows up (H_xy != 0)
        assert dtf[:, 0, 1].max() > 0.1
        # against the closed-form normalizations of the TRUE factors
        h_true = np.linalg.inv(a_true)
        dtf_true = np.abs(h_true) / np.sqrt(
            (np.abs(h_true) ** 2).sum(-1, keepdims=True))
        pdc_true = np.abs(a_true) / np.sqrt(
            (np.abs(a_true) ** 2).sum(-2, keepdims=True))
        np.testing.assert_allclose(dtf, dtf_true, atol=5e-3)
        np.testing.assert_allclose(pdc, pdc_true, atol=5e-3)

    def test_wavelet_dtf_pdc_shapes(self):
        a = np.diag([0.5, 0.5, 0.5])
        a[0, 2] = 0.5
        data = _simulate3([a], np.diag([1.0, 0.8, 0.9]), e=8, n=512,
                          seed=14)
        dtf, pdc = gr.wavelet_dtf_pdc(data, FS, n_bins=17, time_decim=128,
                                      n_iter=40)
        assert np.asarray(dtf).shape == np.asarray(pdc).shape \
            == (4, 17, 3, 3)
        assert float(np.asarray(dtf).max()) <= 1.0 + 1e-5
        assert float(np.asarray(pdc).max()) <= 1.0 + 1e-5
