"""MODWT subsystem (``ops/dwt.py``) — beyond-reference extension (the
reference is CWT-only): filter construction, transform identities, a
brute-force time-domain pyramid oracle, MRA, variance, shrinkage."""
import numpy as np
import pytest

from ninwavelets_tpu.ops.dwt import (imodwt, max_level, modwt, modwt_bank,
                                     modwt_denoise, modwt_mra, modwt_var,
                                     wavelet_filter)


class TestFilters:
    @pytest.mark.parametrize("name", ["haar", "db2", "db3", "db4", "db7",
                                      "db10", "db16", "db20"])
    def test_orthonormality_identities(self, name):
        """The computed Daubechies filters must satisfy the exact
        orthonormal-filter identities (this is the gate on the spectral
        factorization — no table to compare against)."""
        g, h = wavelet_filter(name)
        assert abs(g.sum() - np.sqrt(2.0)) < 1e-10          # sum g = sqrt2
        assert abs(np.dot(g, g) - 1.0) < 1e-9               # unit energy
        for m in range(1, g.size // 2):                     # even shifts
            assert abs(np.dot(g[2 * m:], g[:g.size - 2 * m])) < 1e-9
        assert abs(h.sum()) < 1e-10                         # sum h = 0
        assert abs(np.dot(g, h)) < 1e-9                     # g ⟂ h

    def test_db2_matches_closed_form(self):
        """db2 has the classical closed form ((1±sqrt3)/(4 sqrt2), ...)."""
        g, _ = wavelet_filter("db2")
        s3 = np.sqrt(3.0)
        want = np.array([1 + s3, 3 + s3, 3 - s3, 1 - s3]) / (4 * np.sqrt(2))
        np.testing.assert_allclose(g, want, atol=1e-12)

    def test_vanishing_moments(self):
        """db-p annihilates polynomials up to degree p-1: the wavelet
        filter's first p moments are zero."""
        for p in (2, 4, 6):
            _, h = wavelet_filter(f"db{p}")
            l = np.arange(h.size, dtype=np.float64)
            for k in range(p):
                assert abs(np.dot(l ** k, h)) < 1e-6, (p, k)

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError):
            wavelet_filter("sym4")
        with pytest.raises(ValueError):
            wavelet_filter("db21")


def _pyramid_modwt(x, name, level):
    """Brute-force time-domain MODWT (the textbook circular cascade,
    Percival & Walden eq. 169) — float64 oracle for the FFT-domain bank."""
    g, h = wavelet_filter(name)
    gt, ht = g / np.sqrt(2.0), h / np.sqrt(2.0)
    n = x.shape[-1]
    v = x.astype(np.float64)
    rows = []
    for j in range(1, level + 1):
        step = 2 ** (j - 1)
        w = np.zeros_like(v)
        vn = np.zeros_like(v)
        for l in range(g.size):
            rolled = np.roll(v, step * l, axis=-1)
            w += ht[l] * rolled
            vn += gt[l] * rolled
        rows.append(w)
        v = vn
    rows.append(v)
    return np.stack(rows, axis=-2)


class TestTransform:
    def test_matches_time_domain_pyramid(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 256)).astype(np.float32)
        for name in ("haar", "db4"):
            want = _pyramid_modwt(x, name, 4)
            got = np.asarray(modwt(x, name, 4))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_haar_level1_closed_form(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((512,)).astype(np.float32)
        w = np.asarray(modwt(x, "haar", 1))
        np.testing.assert_allclose(w[0], (x - np.roll(x, 1)) / 2, atol=1e-6)
        np.testing.assert_allclose(w[1], (x + np.roll(x, 1)) / 2, atol=1e-6)

    def test_perfect_reconstruction_and_energy(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((3, 1024)).astype(np.float32)
        w = modwt(x, "db4", 5)
        np.testing.assert_allclose(np.asarray(imodwt(w, "db4")), x,
                                   atol=2e-6)
        got = float(np.sum(np.asarray(w) ** 2))
        np.testing.assert_allclose(got, float(np.sum(x ** 2)), rtol=1e-6)

    def test_shift_invariance(self):
        """The defining MODWT property the decimated DWT lacks: shifting
        the input circularly shifts every coefficient row."""
        rng = np.random.default_rng(3)
        x = rng.standard_normal((512,)).astype(np.float32)
        w = np.asarray(modwt(x, "db4", 3))
        ws = np.asarray(modwt(np.roll(x, 17), "db4", 3))
        np.testing.assert_allclose(ws, np.roll(w, 17, axis=-1), atol=2e-5)

    def test_tight_frame_identity(self):
        """sum_j |Htil_j|^2 + |Gtil_J|^2 == 1 at every frequency — the
        algebraic reason the conjugate-bank inverse is exact."""
        br, bi = modwt_bank("db4", 5, 1024)
        mag2 = (br.astype(np.float64) ** 2 + bi.astype(np.float64) ** 2)
        np.testing.assert_allclose(mag2.sum(0), 1.0, atol=1e-6)

    def test_default_level_and_validation(self):
        assert max_level(1024, "db4") == 7
        x = np.zeros((64,), np.float32)
        assert np.asarray(modwt(x, "db4")).shape[0] == max_level(64) + 1
        with pytest.raises(ValueError):
            modwt_bank("db4", 0, 64)
        with pytest.raises(ValueError):
            modwt_bank("db4", 9, 64)        # 2^9 > 64


class TestAnalysis:
    def test_mra_adds_back_and_isolates_bands(self):
        """MRA components sum to x; a pure tone lands in the octave its
        frequency belongs to."""
        n, sfreq = 2048, 1000.0
        t = np.arange(n) / sfreq
        # ~41.7 Hz = 1/24 cycles/sample: mid-octave in [1/32, 1/16],
        # level 4.  (An exact power-of-two frequency would sit on an
        # octave BOUNDARY and split 50/50 between adjacent levels.)
        x = np.sin(2 * np.pi * (sfreq / 24.0) * t).astype(np.float32)
        mra = np.asarray(modwt_mra(x, "db8", 7))
        np.testing.assert_allclose(mra.sum(-2), x, atol=2e-5)
        energy = (mra ** 2).sum(-1)
        assert np.argmax(energy) == 3                       # W_4 row
        assert energy[3] > 0.8 * energy.sum()

    def test_variance_partition(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 1024)).astype(np.float32)
        w = np.asarray(modwt(x, "db4", 6))
        v = np.asarray(modwt_var(x, "db4", 6))
        assert v.shape == (2, 6)
        total = v.sum(-1) + (w[:, -1] ** 2).mean(-1)
        np.testing.assert_allclose(total, (x ** 2).mean(-1), rtol=1e-5)

    def test_denoise_recovers_tone(self):
        rng = np.random.default_rng(6)
        n = 4096
        t = np.arange(n) / 1000.0
        clean = np.sin(2 * np.pi * 8 * t).astype(np.float32)
        noisy = clean + 0.4 * rng.standard_normal(n).astype(np.float32)
        for mode in ("soft", "hard"):
            den = np.asarray(modwt_denoise(noisy, "db8", mode=mode))
            mse_in = ((noisy - clean) ** 2).mean()
            mse_out = ((den - clean) ** 2).mean()
            assert mse_out < 0.45 * mse_in, (mode, mse_in, mse_out)
        # explicit sigma and validation paths
        den = np.asarray(modwt_denoise(noisy, "db8", sigma=0.4))
        assert ((den - clean) ** 2).mean() < 0.45 * mse_in
        with pytest.raises(ValueError):
            modwt_denoise(noisy, mode="medium")

    def test_batch_shapes(self):
        x = np.zeros((4, 3, 256), np.float32)
        w = np.asarray(modwt(x, "db2", 3))
        assert w.shape == (4, 3, 4, 256)
        assert np.asarray(imodwt(w, "db2")).shape == (4, 3, 256)
        assert np.asarray(modwt_var(x, "db2", 3)).shape == (4, 3, 3)


class TestDecimatedDWT:
    """``wavedec``/``waverec`` (periodization mode) — gated by perfect
    reconstruction, orthonormal energy, the closed Haar form, and the
    exact MODWT subsampling relation (the cross-oracle tying the two
    transforms together)."""

    @pytest.mark.parametrize("name", ["haar", "db2", "db4", "db8"])
    def test_perfect_reconstruction_and_energy(self, name):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 512)).astype(np.float32)
        from ninwavelets_tpu.ops.dwt import wavedec, waverec
        c = wavedec(x, name, 4)
        assert [np.asarray(a).shape[-1] for a in c] == [32, 32, 64, 128,
                                                        256]
        np.testing.assert_allclose(np.asarray(waverec(c, name)), x,
                                   atol=3e-6)
        e = sum(float((np.asarray(a) ** 2).sum()) for a in c)
        np.testing.assert_allclose(e, float((x ** 2).sum()), rtol=1e-5)

    def test_modwt_subsampling_relation(self):
        """cD_j[t] == 2^{j/2} W^M_j[(2^j (t+1) - 1) mod N] — P&W eq. 96/169
        correspondence between the decimated and maximal-overlap
        transforms."""
        from ninwavelets_tpu.ops.dwt import wavedec
        rng = np.random.default_rng(1)
        x = rng.standard_normal((512,)).astype(np.float32)
        wm = np.asarray(modwt(x, "db4", 4))
        c = wavedec(x, "db4", 4)
        n = x.shape[-1]
        for j in range(1, 5):
            cd = np.asarray(c[5 - j])
            idx = (2 ** j * (np.arange(n >> j) + 1) - 1) % n
            want = 2 ** (j / 2) * wm[j - 1, idx]
            np.testing.assert_allclose(cd, want, atol=2e-5)

    def test_haar_level1_closed_form(self):
        from ninwavelets_tpu.ops.dwt import wavedec
        rng = np.random.default_rng(2)
        x = rng.standard_normal((4, 256)).astype(np.float32)
        c = wavedec(x, "haar", 1)
        want = (x[..., 1::2] - x[..., 0::2]) / np.sqrt(2)
        np.testing.assert_allclose(np.asarray(c[1]), want, atol=1e-6)
        want = (x[..., 1::2] + x[..., 0::2]) / np.sqrt(2)
        np.testing.assert_allclose(np.asarray(c[0]), want, atol=1e-6)

    def test_default_level_and_validation(self):
        from ninwavelets_tpu.ops.dwt import wavedec, waverec
        x = np.zeros((96,), np.float32)     # 96 = 2^5 * 3
        c = wavedec(x, "haar")              # default level capped by 2^J|N
        assert np.asarray(c[0]).shape[-1] * (1 << (len(c) - 1)) == 96
        with pytest.raises(ValueError):
            wavedec(x, "haar", 6)           # 2^6 does not divide 96
        c = wavedec(np.zeros((64,), np.float32), "db2", 3)
        bad = list(c)
        bad[1] = np.zeros((7,), np.float32)
        with pytest.raises(ValueError):
            waverec(tuple(bad), "db2")


class TestIntegration:
    """Sharded + adapter + padding surfaces for the discrete subsystem."""

    def test_sharded_modwt_matches_single_device(self):
        import jax.numpy as jnp

        from ninwavelets_tpu import parallel as par
        from ninwavelets_tpu.ops.dwt import modwt_denoise
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 512)).astype(np.float32))
        mesh = par.make_mesh(data=4)
        want = np.asarray(modwt(x, "db4", 4))
        got = np.asarray(par.sharded_modwt(x, mesh=mesh, wavelet="db4",
                                           level=4))
        np.testing.assert_allclose(got, want, atol=1e-6)
        want = np.asarray(modwt_denoise(x, "db4", 4))
        got = np.asarray(par.sharded_modwt(x, mesh=mesh, wavelet="db4",
                                           level=4, denoise=True))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pow2_pad_denoise_non_pow2(self):
        """Denoising an arbitrary-length signal via reflect-pad + crop:
        interior samples match the pow2 transform's quality."""
        from ninwavelets_tpu.ops.dwt import modwt_denoise, pow2_pad
        rng = np.random.default_rng(1)
        n = 3000                       # not a power of two
        t = np.arange(n) / 1000.0
        clean = np.sin(2 * np.pi * 8 * t).astype(np.float32)
        noisy = clean + 0.4 * rng.standard_normal(n).astype(np.float32)
        den = np.asarray(modwt_denoise(noisy, "db8", 7, pad_pow2=True))
        assert den.shape == (n,)
        assert (((den - clean) ** 2).mean()
                < 0.5 * ((noisy - clean) ** 2).mean())
        import jax.numpy as jnp
        padded, n0 = pow2_pad(jnp.asarray(noisy))
        assert n0 == n and padded.shape[-1] == 4096
        padded2, n2 = pow2_pad(jnp.asarray(noisy[:2048]))
        assert n2 == 2048 and padded2.shape[-1] == 2048

    def test_raw_adapter_surfaces(self):
        import ninwavelets_tpu as nw

        class FakeRaw:
            info = {'sfreq': 1000.0}
            ch_names = ['a', 'b']

            def get_data(self):
                rng = np.random.default_rng(2)
                t = np.arange(3000) / 1000.0
                tone = np.sin(2 * np.pi * 8 * t)
                return np.stack([tone + 0.4 * rng.standard_normal(3000),
                                 rng.standard_normal(3000)])

        rw = nw.RawWavelet(FakeRaw(), nw.Morse(1000.0))
        den = rw.modwt_denoise(wavelet="db8")
        assert den.shape == (2, 3000)
        v = rw.modwt_var('a', wavelet="db4")
        assert v.ndim == 1 and np.all(v >= 0)
        # the 8 Hz tone dominates channel a's variance in its octave
        # (8 Hz at 1 kHz -> ~level 6: [7.8, 15.6] Hz)
        assert int(np.argmax(v)) in (5, 6)

    def test_epochs_adapter_surfaces(self):
        """EpochsWavelet.modwt_var / modwt_denoise: event-locked analogs
        of the Raw surfaces, composable with the CWT pipeline."""
        import ninwavelets_tpu as nw

        rng = np.random.default_rng(3)
        t = np.arange(1500) / 1000.0
        tone = np.sin(2 * np.pi * 8 * t)
        data = np.stack([np.stack([tone + 0.5 * rng.standard_normal(1500),
                                   rng.standard_normal(1500)])
                         for _ in range(6)])          # (6, 2, 1500)

        class FakeEpochs:
            info = {'sfreq': 1000.0}
            ch_names = ['a', 'b']

            def get_data(self):
                return data

        ew = nw.EpochsWavelet(FakeEpochs(), nw.Morse(1000.0))
        v = np.asarray(ew.modwt_var('a', wavelet="db4"))
        assert v.ndim == 1 and np.all(v >= 0)
        assert int(np.argmax(v)) in (5, 6)            # the 8 Hz octave
        ve = np.asarray(ew.modwt_var('a', wavelet="db4", mean=False))
        assert ve.shape == (6, v.shape[0])
        np.testing.assert_allclose(ve.mean(0), v, rtol=1e-5)

        den = ew.modwt_denoise(wavelet="db8")
        assert isinstance(den, nw.EpochsWavelet)
        assert den.epochs.ch_names == ['a', 'b']
        dd = den._host_data()
        assert dd.shape == data.shape
        clean = np.broadcast_to(tone, (6, 1500))
        assert (((dd[:, 0] - clean) ** 2).mean()
                < 0.6 * ((data[:, 0] - clean) ** 2).mean())
        # composable downstream: power on the cleaned trials
        p = np.asarray(den.power('a', np.arange(4.0, 20.0, 2.0)))
        assert p.shape == (8, 1500)

    def test_modwt_cov_corr(self):
        """Covariance partitions across scales; correlation is a
        scale-resolved Pearson r: +1 for identical signals, sign follows
        the relation, bandlimited independence shows near zero."""
        from ninwavelets_tpu.ops.dwt import modwt_corr, modwt_cov
        rng = np.random.default_rng(7)
        n = 4096
        x = rng.standard_normal(n).astype(np.float32)
        # self: corr == 1 at every level
        c = np.asarray(modwt_corr(x, x, "db4", 6))
        np.testing.assert_allclose(c, 1.0, atol=1e-5)
        # anti-correlated pair
        c = np.asarray(modwt_corr(x, -x, "db4", 6))
        np.testing.assert_allclose(c, -1.0, atol=1e-5)
        # covariance partition: levels + smooth == sample covariance
        y = rng.standard_normal(n).astype(np.float32)
        wx = np.asarray(modwt(x, "db4", 6))
        wy = np.asarray(modwt(y, "db4", 6))
        cov = np.asarray(modwt_cov(x, y, "db4", 6))
        total = cov.sum(-1) + (wx[-1] * wy[-1]).mean(-1)
        np.testing.assert_allclose(total, (x * y).mean(-1), atol=1e-5)
        # band-limited coupling: shared 40 Hz tone + independent noise
        t = np.arange(n) / 1000.0
        tone = np.sin(2 * np.pi * 40 * t)
        a = (tone + 0.5 * rng.standard_normal(n)).astype(np.float32)
        b = (tone + 0.5 * rng.standard_normal(n)).astype(np.float32)
        c = np.asarray(modwt_corr(a, b, "db8", 6))
        # 40 Hz at 1 kHz -> level 4 octave [31.25, 62.5] Hz
        assert int(np.argmax(c)) == 3
        assert c[3] > 0.8

    def test_unbiased_estimators(self):
        """Boundary-free estimators: white noise of known variance —
        the unbiased level-j wavelet variance targets sigma^2 / 2^j
        exactly (band fraction); levels whose span exceeds N go NaN;
        unbiased self-correlation is still 1."""
        from ninwavelets_tpu.ops.dwt import (_interior_masks, modwt_corr,
                                             modwt_var)
        rng = np.random.default_rng(8)
        x = rng.standard_normal((64, 2048)).astype(np.float32)
        v = np.asarray(modwt_var(x, "db4", 5, unbiased=True))
        for j in range(1, 6):
            band = np.median(v[:, j - 1]) * 2 ** j
            assert 0.8 < band < 1.2, (j, band)      # ~sigma^2 = 1
        # mask bookkeeping: counts = N - L_j + 1
        mask, counts = _interior_masks("db4", 5, 2048)
        L = 8
        for j in range(1, 6):
            lj = (2 ** j - 1) * (L - 1) + 1
            assert counts[j - 1] == 2048 - lj + 1
            assert mask[j - 1].sum() == counts[j - 1]
        # span > N -> NaN
        v = np.asarray(modwt_var(np.zeros(64, np.float32), "db8", 5,
                                 unbiased=True))
        assert np.isnan(v[-1])
        c = np.asarray(modwt_corr(x[0], x[0], "db4", 5, unbiased=True))
        np.testing.assert_allclose(c, 1.0, atol=1e-5)

    def test_variance_confidence_intervals(self):
        """CI brackets the truth for white noise (~95% coverage checked
        loosely over independent realizations), hi > var > lo > 0."""
        from ninwavelets_tpu.ops.dwt import modwt_var_ci
        rng = np.random.default_rng(9)
        x = rng.standard_normal((40, 2048)).astype(np.float32)
        v, lo, hi = (np.asarray(a) for a in modwt_var_ci(x, "db4", 4))
        assert v.shape == lo.shape == hi.shape == (40, 4)
        assert np.all(lo < v) and np.all(v < hi) and np.all(lo > 0)
        truth = 1.0 / 2.0 ** np.arange(1, 5)        # sigma^2 / 2^j
        cover = ((lo <= truth) & (truth <= hi)).mean(0)
        assert np.all(cover > 0.75), cover          # loose 95% gate
