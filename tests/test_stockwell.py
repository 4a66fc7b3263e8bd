"""Stockwell transform (`ops/stockwell.py`) against a literal numpy
transcription, the exact Fourier-mean inverse identity, and the
absolutely-referenced-phase property that distinguishes it from the
CWT."""
import numpy as np
import pytest

from ninwavelets_tpu.ops import istockwell, stockwell, stockwell_ri

SFREQ = 256.0
N = 512


def _numpy_st(x, freqs):
    n = x.size
    spec = np.fft.fft(x)
    nu = np.fft.fftfreq(n, 1.0 / SFREQ)
    out = []
    for f in freqs:
        k = int(round(f * n / SFREQ))
        gauss = np.exp(-2.0 * (np.pi * nu) ** 2 / (k * SFREQ / n) ** 2)
        out.append(np.fft.ifft(np.roll(spec, -k) * gauss))
    return np.stack(out)


class TestStockwell:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(N).astype(np.float32)
        freqs = [8.0, 32.0, 64.0]
        ours = stockwell(x, freqs, SFREQ)
        ref = _numpy_st(x.astype(np.float64), freqs)
        np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_fourier_mean_identity(self):
        # mean over time of each row = X(f_k) / N, exactly
        rng = np.random.default_rng(1)
        x = rng.standard_normal(N).astype(np.float32)
        freqs = [16.0, 40.0]
        st = stockwell(x, freqs, SFREQ)
        spec = np.fft.fft(x.astype(np.float64))
        for row, f in zip(st, freqs):
            k = int(round(f * N / SFREQ))
            np.testing.assert_allclose(row.mean() * N, spec[k],
                                       rtol=1e-4, atol=1e-4)

    def test_absolute_phase_reference(self):
        # a cosine at f0 has S-transform phase ~0 at every t near the
        # ridge (the phase is referenced to t=0, unlike the CWT)
        t = np.arange(N) / SFREQ
        f0 = 32.0
        x = np.cos(2 * np.pi * f0 * t).astype(np.float32)
        st = stockwell(x, [f0], SFREQ)[0]
        mid = st[N // 4: -N // 4]
        phase_drift = np.angle(mid * np.exp(2j * np.pi * f0
                                            * t[N // 4: -N // 4]))
        # absolutely referenced: after removing e^{i2pi f t}... the
        # S-transform phase itself is ~constant 0 (voice referenced)
        assert np.abs(np.angle(mid)).max() < 0.05

    def test_inverse_on_banded_signal(self):
        t = np.arange(N) / SFREQ
        x = (np.sin(2 * np.pi * 16 * t)
             + 0.5 * np.cos(2 * np.pi * 48 * t)).astype(np.float32)
        freqs = [16.0, 48.0]
        r, i = stockwell_ri(x, freqs, SFREQ)
        rec = np.asarray(istockwell(r, i, freqs, SFREQ, N))
        np.testing.assert_allclose(rec, x, atol=1e-4)

    def test_spectrogram_localizes(self):
        t = np.arange(N) / SFREQ
        burst = np.zeros(N, np.float32)
        sel = (t > 1.0) & (t < 1.5)
        burst[sel] = np.sin(2 * np.pi * 40 * t[sel]).astype(np.float32)
        st = stockwell(burst, [20.0, 40.0, 80.0], SFREQ)
        p = np.abs(st) ** 2
        assert p[1].max() > 5 * max(p[0].max(), p[2].max())
        assert abs(p[1].argmax() / SFREQ - 1.25) < 0.3

    def test_validation(self):
        with pytest.raises(ValueError):
            stockwell(np.zeros(N, np.float32), [0.0], SFREQ)
        with pytest.raises(ValueError):
            stockwell(np.zeros(N, np.float32), [200.0], SFREQ)

    def test_batched(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((3, N)).astype(np.float32)
        st = stockwell(x, [16.0, 32.0], SFREQ)
        assert st.shape == (3, 2, N)
        one = stockwell(x[1], [16.0, 32.0], SFREQ)
        np.testing.assert_allclose(st[1], one, atol=1e-6)


def test_sharded_matches_single_device():
    import jax.numpy as jnp
    import ninwavelets_tpu.parallel as par
    rng = np.random.default_rng(4)
    sigs = rng.standard_normal((4, N)).astype(np.float32)
    freqs = [16.0, 32.0, 48.0, 64.0]
    r0, i0 = stockwell_ri(sigs, freqs, SFREQ)
    for d, f in ((2, 2), (4, 2)):
        mesh = par.make_mesh(data=d, freq=f)
        r, i = par.sharded_stockwell(jnp.asarray(sigs), freqs, mesh=mesh,
                                     sfreq=SFREQ)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r0),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(i), np.asarray(i0),
                                   atol=1e-6)


def test_sharded_stockwell_validates_frequencies():
    import jax.numpy as jnp
    import ninwavelets_tpu.parallel as par
    mesh = par.make_mesh(data=1, freq=2)
    with pytest.raises(ValueError):
        par.sharded_stockwell(jnp.zeros((2, N)), [0.0, 16.0], mesh=mesh,
                              sfreq=SFREQ)
