"""Power-envelope correlations (`ops/envelope.py`) against a literal
numpy oracle and the Hipp orthogonalization's defining behaviors."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
import ninwavelets_tpu.parallel as par
from ninwavelets_tpu.ops import envelope as env
from ninwavelets_tpu.ops.bank import make_fft_bank

SFREQ = 250.0
N = 512


def _bank(freqs, n):
    import jax.numpy as jnp
    m = nw.Morse(SFREQ)
    return np.asarray(make_fft_bank(m._wdef(), jnp.asarray(
        np.asarray(freqs, np.float32)), n, SFREQ, True), np.float32)


def _numpy_env_corr(sigs, bank, orthogonalize, log=True, eps=1e-12):
    e, c, n = sigs.shape
    spec = np.fft.fft(sigs, axis=-1)
    mask = np.zeros(n)
    mask[: n // 2] = 1.0  # interpolate=True analytic trick
    spec = spec * mask
    out = np.zeros((len(bank), c, c))
    for fi, row in enumerate(bank):
        w = np.fft.ifft(spec * row, axis=-1)
        envs = np.log(np.abs(w) ** 2 + eps) if log else np.abs(w) ** 2
        r = np.zeros((c, c))
        for a in range(c):
            if orthogonalize:
                proj = np.imag(w * np.conj(w[:, a][:, None, :])) \
                    / np.maximum(np.abs(w[:, a])[:, None, :], 1e-20)
                target = np.log(proj ** 2 + eps) if log else proj ** 2
            else:
                target = envs
            for b in range(c):
                acc = 0.0
                for ep in range(e):
                    x = envs[ep, a] - envs[ep, a].mean()
                    y = target[ep, b] - target[ep, b].mean()
                    den = np.sqrt((x * x).sum() * (y * y).sum())
                    acc += (x * y).sum() / den if den > 0 else 0.0
                r[a, b] = acc / e
        if orthogonalize:
            r = 0.5 * (r + r.T)
            np.fill_diagonal(r, 0.0)
        out[fi] = r
    return out


def _coupled_data(e=6, seed=0, leak=0.0):
    """Two sources with a COMMON slow amplitude modulation on independent
    carriers (true envelope coupling), plus an optional zero-lag leakage
    mix, plus an independent third channel."""
    rng = np.random.default_rng(seed)
    t = np.arange(N) / SFREQ
    out = np.zeros((e, 3, N), np.float32)
    for ep in range(e):
        am = 1.0 + 0.8 * np.sin(2 * np.pi * 1.3 * t + rng.uniform(0, 6.3))
        ph1, ph2 = rng.uniform(0, 6.3, 2)
        s1 = am * np.sin(2 * np.pi * 30 * t + ph1)
        s2 = am * np.sin(2 * np.pi * 30 * t + ph2)
        s3 = rng.standard_normal(N)
        noise = 0.2 * rng.standard_normal((3, N))
        out[ep, 0] = s1 + leak * s2 + noise[0]
        out[ep, 1] = s2 + leak * s1 + noise[1]
        out[ep, 2] = s3 + noise[2]
    return out


class TestEnvCorr:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(3)
        sigs = rng.standard_normal((3, 3, 128)).astype(np.float32)
        bank = _bank([20.0, 40.0], 128)
        for orth in (True, False):
            ours = np.asarray(env.env_corr_matrix(
                sigs, bank, orthogonalize=orth, interpolate=True))
            ref = _numpy_env_corr(sigs, bank, orth)
            np.testing.assert_allclose(ours, ref, atol=2e-4)

    def test_detects_envelope_coupling(self):
        r = np.asarray(env.env_corr_matrix(
            _coupled_data(), _bank([30.0], N), orthogonalize=True,
            interpolate=True))[0]
        assert r[0, 1] > 0.4          # common amplitude modulation
        assert abs(r[0, 2]) < 0.25    # independent channel
        assert r[0, 1] > 3 * abs(r[0, 2])

    def test_orthogonalization_kills_pure_leakage(self):
        """Channels that are zero-lag mixtures of ONE source: plain AEC
        saturates, orthogonalized AEC collapses."""
        rng = np.random.default_rng(5)
        t = np.arange(N) / SFREQ
        e = 6
        sigs = np.zeros((e, 2, N), np.float32)
        for ep in range(e):
            am = 1.0 + 0.8 * np.sin(2 * np.pi * 1.1 * t
                                    + rng.uniform(0, 6.3))
            s = am * np.sin(2 * np.pi * 30 * t + rng.uniform(0, 6.3))
            n1, n2 = 0.05 * rng.standard_normal((2, N))
            sigs[ep, 0] = s + n1
            sigs[ep, 1] = 0.7 * s + n2   # pure zero-lag leak
        bank = _bank([30.0], N)
        plain = np.asarray(env.env_corr_matrix(
            sigs, bank, orthogonalize=False, interpolate=True))[0]
        orth = np.asarray(env.env_corr_matrix(
            sigs, bank, orthogonalize=True, interpolate=True))[0]
        assert plain[0, 1] > 0.9
        assert orth[0, 1] < 0.4
        assert np.allclose(np.diag(orth), 0.0)
        assert np.allclose(np.diag(plain), 1.0)

    def test_sharded_matches_single_device(self):
        sigs = _coupled_data(e=8)
        bank = _bank([20.0, 30.0, 40.0, 50.0], N)
        single = np.asarray(env.env_corr_matrix(
            sigs, bank, orthogonalize=True, interpolate=True))
        for d, f in ((2, 2), (4, 1)):
            mesh = par.make_mesh(data=d, freq=f)
            out = np.asarray(par.sharded_env_corr(
                sigs, bank, mesh=mesh, orthogonalize=True,
                interpolate=True))
            np.testing.assert_allclose(out, single, rtol=2e-4, atol=2e-5)

    def test_adapter(self):
        ew = nw.EpochsWavelet(
            nw.ArrayEpochs(_coupled_data(), SFREQ,
                           ch_names=["a", "b", "c"]),
            nw.Morse(SFREQ, interpolate=True))
        r = np.asarray(ew.env_corr([25.0, 30.0, 35.0]))
        assert r.shape == (3, 3, 3)
        assert r[1, 0, 1] > 0.3
        plain = np.asarray(ew.env_corr([30.0], orthogonalize=False))
        assert plain[0, 0, 1] > r[1, 0, 1] - 0.2


class TestWaveletEntropy:
    def test_flat_and_peaked(self):
        from ninwavelets_tpu.ops import wavelet_entropy
        flat = np.ones((4, 10, 7))
        np.testing.assert_allclose(np.asarray(wavelet_entropy(flat)),
                                   1.0, rtol=1e-5)
        peak = np.zeros((10, 7))
        peak[3] = 1.0
        np.testing.assert_allclose(np.asarray(wavelet_entropy(peak)),
                                   0.0, atol=1e-6)

    def test_matches_numpy(self):
        from ninwavelets_tpu.ops import wavelet_entropy
        rng = np.random.default_rng(8)
        p = rng.random((5, 6, 9)).astype(np.float32)
        ours = np.asarray(wavelet_entropy(p, normalized=False))
        q = p / p.sum(axis=-2, keepdims=True)
        ref = -(q * np.log(q)).sum(axis=-2)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_unnormalized_scale(self):
        from ninwavelets_tpu.ops import wavelet_entropy
        flat = np.ones((4, 8))
        assert float(np.asarray(
            wavelet_entropy(flat, normalized=False))[0]) == \
            pytest.approx(np.log(4))


class TestWtcSignificance:
    def test_shared_tone_exceeds_red_noise_level(self):
        import jax.numpy as jnp
        from ninwavelets_tpu.ops import wavelet_coherence, wtc_significance
        from ninwavelets_tpu.ops.bank import make_fft_bank
        n = 1024
        rng = np.random.default_rng(1)
        t = np.arange(n) / SFREQ
        freqs = np.arange(10.0, 40.0, 5.0).astype(np.float32)
        m = nw.Morse(SFREQ)
        bank = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(freqs), n, SFREQ, True), np.float32))
        shared = np.sin(2 * np.pi * 20 * t)
        a = (shared + 0.5 * rng.standard_normal(n)).astype(np.float32)
        b = (shared + 0.5 * rng.standard_normal(n)).astype(np.float32)
        wtc = np.asarray(wavelet_coherence(a, b, bank, freqs, SFREQ,
                                           interpolate=True))
        thr = np.asarray(wtc_significance(a, b, bank, freqs, SFREQ,
                                          n_surrogates=50,
                                          interpolate=True))
        assert thr.shape == (6,)
        assert np.all((0.3 < thr) & (thr < 0.999))
        row20 = 2  # 20 Hz
        assert (wtc[row20] > thr[row20]).mean() > 0.9
        # uncoupled row stays mostly below its level (q=0.95 null)
        assert (wtc[5] > thr[5]).mean() < 0.35

    def test_deterministic(self):
        import jax.numpy as jnp
        from ninwavelets_tpu.ops import wtc_significance
        from ninwavelets_tpu.ops.bank import make_fft_bank
        n = 256
        rng = np.random.default_rng(3)
        a = rng.standard_normal(n).astype(np.float32)
        b = rng.standard_normal(n).astype(np.float32)
        freqs = np.array([15.0, 30.0], np.float32)
        m = nw.Morse(SFREQ)
        bank = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(freqs), n, SFREQ, True), np.float32))
        t1 = np.asarray(wtc_significance(a, b, bank, freqs, SFREQ,
                                         n_surrogates=20, seed=5))
        t2 = np.asarray(wtc_significance(a, b, bank, freqs, SFREQ,
                                         n_surrogates=20, seed=5))
        np.testing.assert_array_equal(t1, t2)


class TestPacSignificance:
    def test_detects_theta_gamma_coupling(self):
        import jax.numpy as jnp
        from ninwavelets_tpu.ops import pac_significance
        from ninwavelets_tpu.ops.bank import make_fft_bank
        sfreq, n, e = 500.0, 2048, 8
        rng = np.random.default_rng(0)
        t = np.arange(n) / sfreq
        sig = np.zeros((e, n), np.float32)
        for ep in range(e):
            th = np.sin(2 * np.pi * 6 * t + rng.uniform(0, 6.3))
            gam = (1 + 0.8 * th) * np.sin(2 * np.pi * 60 * t
                                          + rng.uniform(0, 6.3))
            sig[ep] = th + 0.5 * gam + 0.3 * rng.standard_normal(n)
        m = nw.Morse(sfreq)
        bp = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.array([3.0, 6.0], np.float32)),
            n, sfreq, True), np.float32))
        ba = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.array([30.0, 60.0], np.float32)),
            n, sfreq, True), np.float32))
        pac, p = pac_significance(sig, bp, ba, interpolate=True,
                                  n_surrogates=99)
        pac, p = np.asarray(pac), np.asarray(p)
        assert pac.shape == p.shape == (2, 2)
        assert p[1, 1] == pytest.approx(0.01)   # 6 Hz phase -> 60 Hz amp
        assert p[0, 0] > 0.05                   # uncoupled pair
        assert pac[1, 1] > 2 * pac[0, 0]


def test_adapter_entropy_and_raw_wtc_significance():
    rng = np.random.default_rng(9)
    n = 512
    t = np.arange(n) / SFREQ
    data = (np.sin(2 * np.pi * 20 * t)[None]
            + 0.3 * rng.standard_normal((2, n))).astype(np.float32)
    # EpochsWavelet.wavelet_entropy
    ew = nw.EpochsWavelet(
        nw.ArrayEpochs(data[None], SFREQ, ch_names=["a", "b"]),
        nw.Morse(SFREQ))
    freqs = np.arange(10.0, 40.0, 5.0)
    h = np.asarray(ew.wavelet_entropy("a", freqs))
    assert h.shape == (n,) and np.all((h >= 0) & (h <= 1 + 1e-5))

    class FakeRaw:
        info = {"sfreq": SFREQ}
        ch_names = ["a", "b"]
        def get_data(self):
            return data

    rw = nw.RawWavelet(FakeRaw(), nw.Morse(SFREQ), window=256)
    wtc, thr = rw.coherence("a", "b", freqs, significance=20)
    assert np.asarray(wtc).shape == (6, n)
    assert np.asarray(thr).shape == (6,)
    # the shared 20 Hz tone is coherent above its red-noise level
    assert (np.asarray(wtc)[2] > np.asarray(thr)[2]).mean() > 0.8


def test_adapter_cross_channel_pac():
    rng = np.random.default_rng(0)
    n, e = 2048, 6
    sf = 500.0
    t = np.arange(n) / sf
    data = np.zeros((e, 2, n), np.float32)
    for ep in range(e):
        th = np.sin(2 * np.pi * 6 * t + rng.uniform(0, 6.3))
        gam = (1 + 0.8 * th) * np.sin(2 * np.pi * 60 * t
                                      + rng.uniform(0, 6.3))
        data[ep, 0] = th + 0.3 * rng.standard_normal(n)
        data[ep, 1] = 0.5 * gam + 0.3 * rng.standard_normal(n)
    ew = nw.EpochsWavelet(
        nw.ArrayEpochs(data, sf, ch_names=["p", "a"]),
        nw.Morse(sf, interpolate=True))
    cross = float(np.asarray(ew.pac("p", [6.0], [60.0],
                                    ch_amp="a"))[0, 0])
    same = float(np.asarray(ew.pac("p", [6.0], [60.0]))[0, 0])
    assert cross > 3 * same          # the coupling crosses channels
    pacv, p = ew.pac("p", [6.0], [60.0], significance=19)
    assert np.asarray(p).shape == (1, 1)
    with pytest.raises(ValueError):
        ew.pac("p", [6.0], [60.0], ch_amp="a", significance=9)


class TestErpac:
    def test_time_resolved_coupling_window(self):
        import jax.numpy as jnp
        from ninwavelets_tpu.ops import erpac
        from ninwavelets_tpu.ops.bank import make_fft_bank
        sfreq, n, e = 500.0, 1024, 40
        rng = np.random.default_rng(2)
        t = np.arange(n) / sfreq
        window = (t > 1.0) & (t < 1.6)
        sig = np.zeros((e, n), np.float32)
        for ep in range(e):
            ph = rng.uniform(0, 6.3)
            th = np.sin(2 * np.pi * 6 * t + ph)
            gam = np.sin(2 * np.pi * 60 * t + rng.uniform(0, 6.3))
            depth = np.where(window, 0.9, 0.0)
            sig[ep] = th + 0.4 * (1 + depth * th) * gam \
                + 0.2 * rng.standard_normal(n)
        m = nw.Morse(sfreq)
        bp = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.array([6.0], np.float32)), n,
            sfreq, True), np.float32))
        ba = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.array([60.0], np.float32)), n,
            sfreq, True), np.float32))
        rho = np.asarray(erpac(sig, bp, ba, interpolate=True))[0, 0]
        assert rho.shape == (n,)
        inside = rho[(t > 1.1) & (t < 1.5)].mean()
        outside = rho[(t > 0.2) & (t < 0.8)].mean()
        assert inside > 2 * outside
        assert inside > 0.4

    def test_matches_numpy_circular_linear(self):
        import jax.numpy as jnp
        from ninwavelets_tpu.ops import erpac
        from ninwavelets_tpu.ops.bank import make_fft_bank
        sfreq, n, e = 250.0, 128, 12
        rng = np.random.default_rng(5)
        sig = rng.standard_normal((e, n)).astype(np.float32)
        m = nw.Morse(sfreq)
        bp = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.array([8.0], np.float32)), n,
            sfreq, True), np.float32))
        ba = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.array([40.0], np.float32)), n,
            sfreq, True), np.float32))
        rho = np.asarray(erpac(sig, bp, ba, interpolate=True))[0, 0]
        # numpy oracle from the analytic coefficients
        spec = np.fft.fft(sig, axis=-1)
        mask = np.zeros(n)
        mask[: n // 2] = 1.0
        wp = np.fft.ifft(spec * mask * np.asarray(bp)[0], axis=-1)
        wa = np.fft.ifft(spec * mask * np.asarray(ba)[0], axis=-1)
        phi = np.angle(wp)
        amp = np.abs(wa)

        def corr(x, y):
            xc = x - x.mean(0)
            yc = y - y.mean(0)
            return (xc * yc).sum(0) / np.sqrt(
                (xc * xc).sum(0) * (yc * yc).sum(0))

        rca = corr(np.cos(phi), amp)
        rsa = corr(np.sin(phi), amp)
        rcs = corr(np.cos(phi), np.sin(phi))
        ref = np.sqrt(np.clip(
            (rca ** 2 + rsa ** 2 - 2 * rca * rsa * rcs)
            / (1 - rcs ** 2), 0, 1))
        np.testing.assert_allclose(rho, ref, atol=2e-4)

    def test_adapter_and_validation(self):
        from ninwavelets_tpu.ops import erpac
        rng = np.random.default_rng(1)
        data = rng.standard_normal((8, 1, 256)).astype(np.float32)
        ew = nw.EpochsWavelet(
            nw.ArrayEpochs(data, 250.0, ch_names=["c"]), nw.Morse(250.0))
        rho = np.asarray(ew.erpac("c", [6.0, 8.0], [40.0, 60.0, 80.0]))
        assert rho.shape == (2, 3, 256)
        assert np.all((rho >= 0) & (rho <= 1))
        with pytest.raises(ValueError):
            erpac(np.zeros(64), np.zeros((1, 64)), np.zeros((1, 64)))


class TestCfd:
    def _sim(self, d_samp, e=24, n=4096, sfreq=500.0, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / sfreq
        out = np.zeros((e, n), np.float32)
        f_axis = np.fft.rfftfreq(n, 1 / sfreq)
        for ep in range(e):
            spec = np.fft.rfft(rng.standard_normal(n))
            spec[(f_axis < 5.0) | (f_axis > 12.0)] = 0
            slow = np.fft.irfft(spec, n)
            slow = (slow / slow.std()).astype(np.float32)
            lag = np.roll(slow, d_samp)
            fast = (1 + 0.5 * np.tanh(lag)) * np.sin(
                2 * np.pi * 70 * t + rng.uniform(0, 6.3))
            out[ep] = slow + 0.5 * fast \
                + 0.1 * rng.standard_normal(n)
        return out

    def test_direction_follows_the_lag(self):
        import jax.numpy as jnp
        from ninwavelets_tpu.ops import cfd
        from ninwavelets_tpu.ops.bank import make_fft_bank
        sfreq, n = 500.0, 4096
        m = nw.Morse(sfreq)
        bs = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.arange(5.0, 13.0, 1.0,
                                             dtype=np.float32)),
            n, sfreq, True), np.float32))
        bf = jnp.asarray(np.asarray(make_fft_bank(
            m._wdef(), jnp.asarray(np.arange(60.0, 81.0, 5.0,
                                             dtype=np.float32)),
            n, sfreq, True), np.float32))
        mid = slice(300, -300)
        fwd = float(np.asarray(cfd(self._sim(10), bs, bf,
                                   interpolate=True))[mid].mean())
        rev = float(np.asarray(cfd(self._sim(-10), bs, bf,
                                   interpolate=True))[mid].mean())
        zero = float(np.asarray(cfd(self._sim(0), bs, bf,
                                    interpolate=True))[mid].mean())
        assert fwd > 0.05          # slow phase leads fast amplitude
        assert rev < -0.05         # reversed lag flips the sign
        assert abs(zero) < 0.03    # zero-lag comodulation: no direction

    def test_adapter(self):
        sfreq = 500.0
        data = self._sim(10, e=10, n=1024)[:, None, :]
        ew = nw.EpochsWavelet(
            nw.ArrayEpochs(data, sfreq, ch_names=["c"]),
            nw.Morse(sfreq, interpolate=True))
        v = np.asarray(ew.cfd("c", np.arange(5.0, 13.0, 1.0),
                              np.arange(60.0, 81.0, 5.0)))
        assert v.shape == (1024,)
        assert v[200:-200].mean() > 0.02
