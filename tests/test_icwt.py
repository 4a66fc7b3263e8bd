"""Inverse CWT round-trip tests."""
import jax.numpy as jnp
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import icwt
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.cwt import cwt_from_bank

SFREQ = 1000.0


def _dense_bank(n, lo=5.0, hi=200.0, step=1.0, interpolate=True):
    m = nw.Morse(SFREQ)
    return make_fft_bank(m._wdef(), jnp.arange(lo, hi, step), n, SFREQ,
                         interpolate)


def test_round_trip_band_limited_signal():
    """CWT -> iCWT recovers a signal whose content lies inside the bank's
    covered band, to float32."""
    n = 1000
    t = np.arange(n) / SFREQ
    sig = (np.sin(2 * np.pi * 40 * t) + 0.5 * np.sin(2 * np.pi * 97 * t)
           ).astype(np.float32)
    bank = _dense_bank(n)
    c = cwt_from_bank(jnp.asarray(sig), bank, True)
    rec = np.asarray(icwt.icwt_from_bank(c, bank).real)
    err = np.abs(rec - sig)
    assert err.max() < 1e-3 * np.abs(sig).max()


def test_round_trip_ri_wrapper():
    # Tone periodic in the window (bin 32 = 62.5 Hz) so there is no
    # spectral leakage outside the bank's covered band.
    n = 512
    f = 32 * SFREQ / n
    sig = np.sin(2 * np.pi * f * np.arange(n) / SFREQ).astype(np.float32)
    bank = _dense_bank(n)
    c = cwt_from_bank(jnp.asarray(sig), bank, True)
    r, i = icwt.icwt_ri(c.real, c.imag, bank)
    np.testing.assert_allclose(np.asarray(r), sig, atol=2e-3)


def test_uncovered_band_is_dropped_not_exploded():
    """Content outside the bank's band cannot be reconstructed, but the
    Tikhonov floor keeps the estimate finite and the in-band part intact."""
    n = 1000
    t = np.arange(n) / SFREQ
    inband = np.sin(2 * np.pi * 50 * t)
    outband = np.sin(2 * np.pi * 450 * t)          # bank stops at 200 Hz
    sig = (inband + outband).astype(np.float32)
    bank = _dense_bank(n)
    c = cwt_from_bank(jnp.asarray(sig), bank, True)
    rec = np.asarray(icwt.icwt_from_bank(c, bank).real)
    assert np.isfinite(rec).all()
    # The reconstruction should resemble the in-band part far more than
    # the full signal.
    err_inband = np.abs(rec - inband).max()
    err_full = np.abs(rec - sig).max()
    assert err_inband < 0.2
    assert err_full > 0.5


def test_coverage_shape_and_band():
    n = 1000
    bank = _dense_bank(n)
    cov = np.asarray(icwt.coverage(bank))
    assert cov.shape == (n,)
    grid = np.arange(n) * SFREQ / n
    inband = (grid > 20) & (grid < 150)
    assert cov[inband].min() > 0.1 * cov.max()


def test_batched_round_trip():
    n = 512
    rng = np.random.default_rng(0)
    t = np.arange(n) / SFREQ
    tone = np.sin(2 * np.pi * (32 * SFREQ / n) * t)   # bin-aligned: no leakage
    sigs = (tone[None, None]
            + 0.1 * rng.standard_normal((3, 2, n))).astype(np.float32)
    bank = _dense_bank(n)
    c = cwt_from_bank(jnp.asarray(sigs), bank, True)
    rec = np.asarray(icwt.icwt_from_bank(c, bank).real)
    assert rec.shape == sigs.shape
    # noise is broadband; compare only the tone's reconstruction quality
    c_tone = cwt_from_bank(jnp.asarray(tone.astype(np.float32)), bank, True)
    rec_tone = np.asarray(icwt.icwt_from_bank(c_tone, bank).real)
    assert np.abs(rec_tone - tone).max() < 2e-3


class TestDenoise:
    SFREQ = 1000.0

    def _bank(self, n):
        import ninwavelets_tpu as nw
        from ninwavelets_tpu.ops.bank import make_fft_bank
        morse = nw.Morse(self.SFREQ)
        freqs = np.geomspace(5.0, 300.0, 60).astype(np.float32)
        return jnp.asarray(np.asarray(make_fft_bank(
            morse._wdef(), jnp.asarray(freqs), n, self.SFREQ, False),
            np.float32))

    def _snr(self, clean, est):
        m = slice(200, -200)          # interior (edge transients)
        err = est[m] - clean[m]
        return 10 * np.log10(np.sum(clean[m] ** 2) / np.sum(err ** 2))

    def test_soft_denoise_improves_snr(self):
        from ninwavelets_tpu.ops.denoise import denoise
        rng = np.random.default_rng(0)
        t = np.arange(0, 2.0, 1 / self.SFREQ)
        clean = (np.sin(2 * np.pi * 40 * t)
                 + 0.5 * np.sin(2 * np.pi * 11 * t))
        noisy = (clean + 0.7 * rng.standard_normal(t.size)).astype(
            np.float32)
        bank = self._bank(t.size)
        out = np.asarray(denoise(jnp.asarray(noisy), bank))
        snr_in = self._snr(clean, noisy.astype(np.float64))
        snr_out = self._snr(clean, out.astype(np.float64))
        assert snr_out > snr_in + 5.0, (snr_in, snr_out)

    def test_hard_runs_and_clean_signal_roundtrips(self):
        from ninwavelets_tpu.ops.denoise import denoise
        t = np.arange(0, 2.0, 1 / self.SFREQ)
        clean = np.sin(2 * np.pi * 40 * t).astype(np.float32)
        bank = self._bank(t.size)
        out = np.asarray(denoise(jnp.asarray(clean), bank, method="hard"))
        # A noiseless tone must survive nearly untouched.
        assert self._snr(clean.astype(np.float64),
                         out.astype(np.float64)) > 20.0

    def test_bad_method_raises(self):
        from ninwavelets_tpu.ops.denoise import denoise_from_bank
        with pytest.raises(ValueError):
            denoise_from_bank(jnp.zeros(256), jnp.ones((4, 256)),
                              method="median")


def test_class_level_denoise():
    """WaveletBase.denoise: same numbers as the ops-level call through the
    class bank cache."""
    import ninwavelets_tpu as nw
    from ninwavelets_tpu.ops.denoise import denoise as ops_denoise
    from ninwavelets_tpu.ops.bank import make_fft_bank
    rng = np.random.default_rng(2)
    t = np.arange(0, 2.0, 1 / 1000.0)
    noisy = (np.sin(2 * np.pi * 40 * t)
             + 0.5 * rng.standard_normal(t.size)).astype(np.float32)
    freqs = np.geomspace(5.0, 300.0, 40).astype(np.float32)
    m = nw.Morse(1000.0)
    got = np.asarray(m.denoise(noisy, freqs))
    bank = jnp.asarray(np.asarray(make_fft_bank(
        m._wdef(), jnp.asarray(freqs), t.size, 1000.0, False), np.float32))
    want = np.asarray(ops_denoise(jnp.asarray(noisy), bank))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
