"""2-D time-frequency reassignment (ops/reassign.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.cwt import analytic_spectrum, mean_power
from ninwavelets_tpu.ops.reassign import (reassigned_mean_power,
                                          reassigned_power)
from ninwavelets_tpu.ops.sst import _bin_nu

SFREQ = 500.0
N = 1024


def _bank(freqs):
    morse = nw.Morse(SFREQ)
    return np.asarray(
        make_fft_bank(morse._wdef(), jnp.asarray(np.asarray(freqs,
                                                            np.float32)),
                      N, SFREQ, True), np.float32)


def _oracle(sig, bank, f_grid, t_decim, rel_threshold=1e-6):
    """Direct float64 scatter implementation of the same estimator."""
    spec = np.asarray(analytic_spectrum(jnp.asarray(sig), True),
                      np.complex128)
    nu = np.asarray(_bin_nu(N, SFREQ))
    w = np.fft.ifft(spec[None] * bank)
    dw = np.fft.ifft(spec[None] * (bank * (1j * 2 * np.pi * nu)))
    dbank = np.gradient(bank, axis=-1) * (N / SFREQ)
    wt = np.fft.ifft(spec[None] * (dbank * (1j / (2 * np.pi))))
    p = np.abs(w) ** 2
    g = np.maximum(p, 1e-30)
    omega = (dw.imag * w.real - dw.real * w.imag) / (2 * np.pi * g)
    t_hat = np.arange(N)[None] + (wt.real * w.real + wt.imag * w.imag) \
        / g * SFREQ
    gate = p < rel_threshold * p.max()
    omega = np.where(gate, np.asarray(f_grid)[:, None], omega)
    t_hat = np.where(gate, np.arange(N)[None], t_hat)
    mid = 0.5 * (np.asarray(f_grid)[1:] + np.asarray(f_grid)[:-1])
    row = np.searchsorted(mid, omega, side="left")
    n_t = -(-N // t_decim)
    col = np.clip(np.floor(t_hat / t_decim), 0, n_t - 1).astype(int)
    out = np.zeros((len(f_grid), n_t))
    np.add.at(out, (row.ravel(), col.ravel()), p.ravel())
    return out


class TestReassign:
    freqs = np.arange(5.0, 100.0, 5.0)

    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        sig = rng.standard_normal(N).astype(np.float32)
        bank = self._b = _bank(self.freqs)
        got = np.asarray(reassigned_power(sig, bank, self.freqs, SFREQ,
                                          interpolate=True, t_decim=8))
        ref = _oracle(sig.astype(np.float64), bank.astype(np.float64),
                      self.freqs, 8)
        # float32 engine vs float64 oracle; bin-boundary cells can land
        # one bin over, so compare energy after a tiny blur
        assert got.shape == ref.shape
        np.testing.assert_allclose(got.sum(), ref.sum(), rtol=1e-5)
        k = np.ones((3, 3))
        from scipy.signal import convolve2d
        gb = convolve2d(got, k, mode="same")
        rb = convolve2d(ref, k, mode="same")
        np.testing.assert_allclose(gb, rb, rtol=5e-3,
                                   atol=5e-4 * ref.max())

    def test_impulse_localizes_in_time(self):
        sig = np.zeros(N, np.float32)
        sig[400] = 1.0
        out = np.asarray(reassigned_power(sig, _bank(self.freqs),
                                          self.freqs, SFREQ,
                                          interpolate=True, t_decim=8))
        prof = out.sum(0)
        c = 400 // 8
        assert prof.argmax() == c
        assert prof[c - 1:c + 2].sum() / prof.sum() > 0.5

    def test_tone_localizes_in_frequency(self):
        t = np.arange(N) / SFREQ
        sig = np.sin(2 * np.pi * 40 * t).astype(np.float32)
        out = np.asarray(reassigned_power(sig, _bank(self.freqs),
                                          self.freqs, SFREQ,
                                          interpolate=True, t_decim=8))
        rows = out.sum(-1)
        assert self.freqs[rows.argmax()] == 40.0
        assert rows.max() / rows.sum() > 0.95

    def test_energy_conserved(self):
        rng = np.random.default_rng(1)
        sig = rng.standard_normal(N).astype(np.float32)
        bank = _bank(self.freqs)
        out = np.asarray(reassigned_power(sig, bank, self.freqs, SFREQ,
                                          interpolate=True, t_decim=16))
        raw = np.asarray(mean_power(sig[None], jnp.asarray(bank),
                                    interpolate=True))
        np.testing.assert_allclose(out.sum(), raw.sum(), rtol=1e-5)

    def test_sharper_than_scalogram(self):
        """Linear chirp: reassignment concentrates energy far harder
        than the raw scalogram (the point of the method)."""
        t = np.arange(N) / SFREQ
        sig = np.sin(2 * np.pi * (10 * t + 35 * t ** 2 / t[-1])) \
            .astype(np.float32)
        bank = _bank(self.freqs)
        ra = np.asarray(reassigned_power(sig, bank, self.freqs, SFREQ,
                                         interpolate=True, t_decim=8))
        raw = np.asarray(mean_power(sig[None], jnp.asarray(bank),
                                    interpolate=True))
        raw = raw.reshape(len(self.freqs), -1, 8).sum(-1)

        def top5(p):
            v = np.sort(p.ravel())[::-1]
            k = max(1, int(0.05 * v.size))
            return v[:k].sum() / v.sum()

        assert top5(ra) > 0.8
        assert top5(ra) > 1.8 * top5(raw)

    def test_lead_dims_and_mean(self):
        rng = np.random.default_rng(2)
        sigs = rng.standard_normal((3, 2, N)).astype(np.float32)
        bank = _bank(self.freqs)
        out = np.asarray(reassigned_power(sigs, bank, self.freqs, SFREQ,
                                          t_decim=32))
        assert out.shape == (3, 2, len(self.freqs), N // 32)
        m = np.asarray(reassigned_mean_power(sigs, bank, self.freqs,
                                             SFREQ, t_decim=32))
        np.testing.assert_allclose(m, out.mean(0), rtol=1e-6)

    def test_complex_bank_rejected(self):
        with pytest.raises(ValueError):
            reassigned_power(np.zeros(N, np.float32),
                             np.zeros((4, 2, N), np.float32),
                             self.freqs[:4], SFREQ)

    def test_adapter_surface(self):
        rng = np.random.default_rng(3)
        t = np.arange(N) / SFREQ
        data = (np.sin(2 * np.pi * 20 * t)[None, None]
                + 0.1 * rng.standard_normal((4, 2, N)))

        class FE:
            info = {"sfreq": SFREQ}
            ch_names = ["a", "b"]
            def get_data(self):
                return data

        ew = nw.EpochsWavelet(FE(), nw.Morse(SFREQ))
        out = np.asarray(ew.reassigned_power("a", np.arange(5.0, 50.0, 5.0),
                                             t_decim=16))
        assert out.shape == (9, N // 16)
        assert np.arange(5.0, 50.0, 5.0)[out.sum(-1).argmax()] == 20.0
