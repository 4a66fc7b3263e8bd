"""Empirical wavelet transform (`ops/ewt.py`): tight-frame identity,
perfect reconstruction, and mode separation on known multicomponent
signals."""
import numpy as np
import pytest


from ninwavelets_tpu.ops import ewt as ew

SFREQ = 1000.0
N = 4096


def _three_tones(noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(N) / SFREQ
    parts = [np.sin(2 * np.pi * f * t) for f in (20.0, 60.0, 150.0)]
    sig = sum(parts) + noise * rng.standard_normal(N)
    return sig.astype(np.float32), parts


class TestFilterbank:
    def test_tight_frame_identity(self):
        filters = np.asarray(ew.ewt_filterbank([30.0, 100.0], N, SFREQ))
        assert filters.shape == (3, N // 2 + 1)
        np.testing.assert_allclose((filters ** 2).sum(0), 1.0, atol=2e-6)

    def test_gamma_validation(self):
        with pytest.raises(ValueError):
            ew.ewt_filterbank([30.0, 100.0], N, SFREQ, gamma=0.9)
        with pytest.raises(ValueError):
            ew.ewt_filterbank([0.0, 100.0], N, SFREQ)
        with pytest.raises(ValueError):
            ew.ewt_filterbank([30.0, 600.0], N, SFREQ)

    def test_bands_partition_the_axis(self):
        filters = np.asarray(ew.ewt_filterbank([30.0, 100.0], N, SFREQ))
        om = np.arange(N // 2 + 1) * SFREQ / N
        # flat regions: each filter is ~1 in its own band's interior
        assert filters[0][om < 25].min() > 0.99
        assert filters[1][(om > 40) & (om < 90)].min() > 0.99
        assert filters[2][om > 120].min() > 0.99


class TestDecomposition:
    def test_boundaries_isolate_tones(self):
        sig, _ = _three_tones()
        b = ew.ewt_boundaries(sig, SFREQ, 3)
        assert b.shape == (2,)
        assert 20 < b[0] < 60 < b[1] < 150

    def test_perfect_reconstruction(self):
        sig, _ = _three_tones(noise=0.3)
        modes, b = ew.ewt(sig, SFREQ, n_modes=3)
        rec = np.asarray(ew.ewt_reconstruct(modes))
        np.testing.assert_allclose(rec, sig, atol=2e-5)

    def test_modes_match_components(self):
        sig, parts = _three_tones(noise=0.05, seed=1)
        modes, b = ew.ewt(sig, SFREQ, n_modes=3)
        modes = np.asarray(modes)
        assert modes.shape == (3, N)
        for m, part in zip(modes, parts):
            r = np.corrcoef(m, part)[0, 1]
            assert r > 0.95

    def test_batched_and_explicit_boundaries(self):
        sig, _ = _three_tones()
        batch = np.stack([sig, 2.0 * sig])
        modes, b = ew.ewt(batch, SFREQ, n_modes=3,
                          boundaries=[35.0, 100.0])
        assert np.asarray(modes).shape == (2, 3, N)
        np.testing.assert_allclose(np.asarray(modes)[1],
                                   2 * np.asarray(modes)[0], rtol=1e-5,
                                   atol=1e-5)

    def test_too_many_modes_raises(self):
        t = np.arange(N) / SFREQ
        pure = np.sin(2 * np.pi * 50 * t).astype(np.float32)
        with pytest.raises(ValueError):
            ew.ewt_boundaries(pure, SFREQ, 40)
        with pytest.raises(ValueError):
            ew.ewt_boundaries(pure, SFREQ, 1)


class TestVmd:
    def test_three_tones_recovered(self):
        from ninwavelets_tpu.ops.vmd import vmd
        rng = np.random.default_rng(0)
        t = np.arange(N) / SFREQ
        parts = [np.sin(2 * np.pi * f * t) for f in (20.0, 60.0, 150.0)]
        sig = (sum(parts) + 0.1 * rng.standard_normal(N)).astype(
            np.float32)
        modes, w = vmd(sig, SFREQ, n_modes=3, alpha=2000.0, n_iter=200)
        modes, w = np.asarray(modes), np.asarray(w)
        np.testing.assert_allclose(w, [20.0, 60.0, 150.0], atol=0.5)
        for m, part in zip(modes, parts):
            assert np.corrcoef(m, part)[0, 1] > 0.99
        # tau=0: the residual is (approximately) the injected noise
        resid = np.linalg.norm(modes.sum(0) - sig) / np.linalg.norm(sig)
        assert resid < 0.12

    def test_exact_reconstruction_with_dual_ascent(self):
        from ninwavelets_tpu.ops.vmd import vmd
        t = np.arange(N) / SFREQ
        sig = (np.sin(2 * np.pi * 30 * t)
               + np.sin(2 * np.pi * 90 * t)).astype(np.float32)
        modes, _ = vmd(sig, SFREQ, n_modes=2, alpha=2000.0, tau=1.0,
                       n_iter=400)
        rec = np.asarray(modes).sum(0)
        resid = np.linalg.norm(rec - sig) / np.linalg.norm(sig)
        assert resid < 5e-3

    def test_batched(self):
        from ninwavelets_tpu.ops.vmd import vmd
        t = np.arange(1024) / SFREQ
        sig = (np.sin(2 * np.pi * 25 * t)
               + np.sin(2 * np.pi * 80 * t)).astype(np.float32)
        batch = np.stack([sig, 3.0 * sig])
        modes, w = vmd(batch, SFREQ, n_modes=2, n_iter=150)
        modes, w = np.asarray(modes), np.asarray(w)
        assert modes.shape == (2, 2, 1024) and w.shape == (2, 2)
        np.testing.assert_allclose(w[0], w[1], atol=0.5)
        np.testing.assert_allclose(modes[1], 3.0 * modes[0], rtol=1e-3,
                                   atol=1e-3)

    def test_modes_sorted_by_frequency(self):
        from ninwavelets_tpu.ops.vmd import vmd
        t = np.arange(2048) / SFREQ
        sig = (np.sin(2 * np.pi * 120 * t)
               + np.sin(2 * np.pi * 15 * t)).astype(np.float32)
        _, w = vmd(sig, SFREQ, n_modes=2, n_iter=150)
        w = np.asarray(w)
        assert w[0] < w[1]


class TestHilbertSpectrum:
    def test_instantaneous_tracks_chirp(self):
        from ninwavelets_tpu.ops import vmd as vm
        t = np.arange(N) / SFREQ
        f0, f1 = 20.0, 80.0
        k = (f1 - f0) / t[-1]
        chirp = np.sin(2 * np.pi * (f0 * t + 0.5 * k * t ** 2)).astype(
            np.float32)
        if_hz, amp = vm.instantaneous(chirp[None, :], SFREQ, smooth=21)
        if_hz, amp = np.asarray(if_hz)[0], np.asarray(amp)[0]
        true_if = f0 + k * t
        sl = slice(N // 8, -N // 8)
        assert np.abs(if_hz[sl] - true_if[sl]).max() < 1.5
        np.testing.assert_allclose(amp[sl], 1.0, atol=0.05)

    def test_constant_tone(self):
        from ninwavelets_tpu.ops import vmd as vm
        t = np.arange(2048) / SFREQ
        tone = np.sin(2 * np.pi * 60 * t).astype(np.float32)
        if_hz, _ = vm.instantaneous(tone[None, :], SFREQ)
        mid = np.asarray(if_hz)[0][100:-100]
        np.testing.assert_allclose(mid, 60.0, atol=0.5)

    def test_hilbert_spectrum_energy_lands_in_the_right_bins(self):
        from ninwavelets_tpu.ops import vmd as vm
        t = np.arange(2048) / SFREQ
        sig = (np.sin(2 * np.pi * 30 * t)
               + np.sin(2 * np.pi * 120 * t)).astype(np.float32)
        modes, _ = vm.vmd(sig, SFREQ, n_modes=2, n_iter=150)
        hs = np.asarray(vm.hilbert_spectrum(modes, SFREQ, n_bins=50,
                                            fmax=250.0))
        assert hs.shape == (50, 2048)
        mid = hs[:, 200:-200]
        row_energy = mid.sum(-1)
        # 30 Hz and 120 Hz sit exactly on 5 Hz-bin boundaries, so the IF
        # jitter splits energy between the two adjacent bins — check the
        # bands, not single bins
        band_30 = row_energy[5:8].sum()
        band_120 = row_energy[23:26].sum()
        assert (band_30 + band_120) > 0.95 * row_energy.sum()
        assert band_30 > 0.3 * row_energy.sum()
        assert band_120 > 0.3 * row_energy.sum()


class TestMvmd:
    def test_shared_modes_across_channels(self):
        from ninwavelets_tpu.ops import vmd as vm
        rng = np.random.default_rng(3)
        t = np.arange(2048) / SFREQ
        # a common 25 Hz rhythm with channel-specific amplitude/phase,
        # plus a 90 Hz rhythm only on channel 1
        x = np.zeros((2, 2048), np.float32)
        x[0] = 1.0 * np.sin(2 * np.pi * 25 * t)
        x[1] = 0.5 * np.sin(2 * np.pi * 25 * t + 1.0) \
            + np.sin(2 * np.pi * 90 * t)
        x += 0.05 * rng.standard_normal(x.shape).astype(np.float32)
        modes, w = vm.mvmd(x, SFREQ, n_modes=2, n_iter=200)
        modes, w = np.asarray(modes), np.asarray(w)
        assert modes.shape == (2, 2, 2048) and w.shape == (2,)
        np.testing.assert_allclose(w, [25.0, 90.0], atol=1.0)
        # mode 0 carries the common rhythm on BOTH channels, with the
        # amplitude ratio preserved
        rms = np.sqrt((modes[0] ** 2).mean(-1))
        assert rms[0] / rms[1] == pytest.approx(2.0, rel=0.15)
        # mode 1 (90 Hz) lives on channel 1 only
        rms1 = np.sqrt((modes[1] ** 2).mean(-1))
        assert rms1[1] > 5 * rms1[0]

    def test_batched(self):
        from ninwavelets_tpu.ops import vmd as vm
        t = np.arange(1024) / SFREQ
        x = np.stack([np.sin(2 * np.pi * 30 * t),
                      np.sin(2 * np.pi * 30 * t + 0.5)]).astype(
            np.float32)
        batch = np.stack([x, 2.0 * x])
        modes, w = vm.mvmd(batch, SFREQ, n_modes=1, n_iter=100)
        assert np.asarray(modes).shape == (2, 1, 2, 1024)
        assert np.asarray(w).shape == (2, 1)
        np.testing.assert_allclose(np.asarray(w)[:, 0], 30.0, atol=0.5)

    def test_validation(self):
        from ninwavelets_tpu.ops import vmd as vm
        with pytest.raises(ValueError):
            vm.mvmd(np.zeros(64), SFREQ)


def test_decomposition_demo_headless(capsys):
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "decomposition_demo", os.path.join(
            os.path.dirname(__file__), "..", "examples",
            "decomposition_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(plot=False)
    out = capsys.readouterr().out
    assert "EWT boundaries" in out and "VMD center frequencies" in out
    assert "Stockwell ridge" in out and "MVMD shared centers" in out
