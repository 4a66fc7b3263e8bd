"""Unit tests for the functional core (ops/): grids, signal utils, spectra
properties, and physical correctness of the CWT (peak localization).
"""
import numpy as np
import pytest

import jax.numpy as jnp

import ninwavelets_tpu.ops as ops
from conftest import make_example


def test_fft_bin_freqs():
    g = np.asarray(ops.fft_bin_freqs(1000, 1000.0))
    np.testing.assert_allclose(g, np.arange(1000.0), rtol=1e-6)
    g2 = np.asarray(ops.fft_bin_freqs(500, 250.0))
    np.testing.assert_allclose(g2, np.arange(500) * 0.5, rtol=1e-6)


def test_analytic_mask_matches_interpolate_alias():
    x = np.arange(10.0) + 1.0
    got = np.asarray(ops.interpolate_alias(x))
    want = np.pad(x[:5], [0, 5])
    np.testing.assert_allclose(got, want)
    # odd length: half = n // 2
    x = np.arange(7.0) + 1.0
    got = np.asarray(ops.interpolate_alias(x))
    want = np.pad(x[:3], [0, 4])
    np.testing.assert_allclose(got, want)


def test_pad_to_semantics():
    # pad: center, extra zero at tail (base.py:75-82)
    w = np.ones(4)
    to = np.zeros(7)
    got = np.asarray(ops.pad_to(w, to))
    np.testing.assert_allclose(got, [0, 1, 1, 1, 1, 0, 0])
    # truncate: keep head
    got = np.asarray(ops.pad_to(np.arange(9.0), np.zeros(5)))
    np.testing.assert_allclose(got, np.arange(5.0))


def test_normalize_and_hamming():
    w = np.array([3.0, 4.0])
    np.testing.assert_allclose(np.linalg.norm(np.asarray(ops.normalize(w, 2.0))),
                               2.0, rtol=1e-6)
    h = np.asarray(ops.hamming_window(np.zeros(100)))
    assert h.shape == (100,)
    np.testing.assert_allclose(h[0], 0.08, atol=1e-6)


def test_morse_spectrum_peak_at_analysis_freq():
    """GMW peaks at w==1 with amplitude 2 (peak-normalized form)."""
    g = ops.fft_bin_freqs(1000, 1000.0)
    for f in [10.0, 60.0, 300.0]:
        s = np.asarray(ops.morse_spectrum(g, f))
        assert abs(np.argmax(s) - f) <= 1
        np.testing.assert_allclose(s.max(), 2.0, rtol=1e-5)
    # no NaN/inf anywhere even at w = 999 (float32 overflow territory)
    s = np.asarray(ops.morse_spectrum(g, 1.0))
    assert np.all(np.isfinite(s))


def test_morlet_spectrum_peak():
    g = ops.fft_bin_freqs(1000, 1000.0)
    s = np.asarray(ops.morlet_spectrum(g, 60.0))
    assert abs(np.argmax(s) - 60) <= 1


def test_cwt_peak_frequencies(example_signal):
    """Power of the composite golden signal peaks at 60/160/300 Hz rows and
    the burst is localized in time — physical correctness, oracle-free."""
    freqs = jnp.arange(1.0, 500.0, 1.0)
    bank = ops.make_fft_bank(
        ops.WaveletDef(mode=ops.WaveletMode.Reverse,
                       trans_formula=lambda g, f: ops.morse_spectrum(g, f)),
        freqs, 1000, 1000.0)
    p = np.asarray(ops.power_from_bank(jnp.asarray(example_signal), bank))
    mean_p = p.mean(axis=-1)
    # 60 Hz is the strongest sustained component
    assert abs(int(np.argmax(mean_p)) - 59) <= 2  # row i is freq i+1
    # 160 and 300 are local maxima
    for hz in (160, 300):
        row = hz - 1
        window = mean_p[row - 10: row + 10]
        assert abs(int(np.argmax(window)) - 10) <= 2
    # the 300 Hz burst occupies only the middle of the record
    burst = p[299]
    mid = burst[400:600].mean()
    edge = burst[:150].mean()
    assert mid > 5 * edge


def test_mean_power_streaming_matches_direct(example_signal):
    """scan-based mean_power == vmap+mean, validating the streaming path."""
    sig = jnp.stack([jnp.asarray(example_signal)] * 3) * jnp.array(
        [[1.0], [2.0], [0.5]])
    freqs = jnp.arange(10.0, 100.0, 20.0)
    bank = ops.make_fft_bank(
        ops.WaveletDef(mode=ops.WaveletMode.Reverse,
                       trans_formula=lambda g, f: ops.morse_spectrum(g, f)),
        freqs, 1000, 1000.0)
    got = np.asarray(ops.mean_power_from_bank(sig, bank))
    direct = np.asarray(ops.power_from_bank(sig, bank)).mean(axis=0)
    np.testing.assert_allclose(got, direct, rtol=1e-5, atol=1e-7)


def test_cwt_batch_shapes():
    sig = jnp.ones((2, 3, 500))
    bank = jnp.ones((7, 500))
    out = ops.cwt_from_bank(sig, bank)
    assert out.shape == (2, 3, 7, 500)
    assert out.dtype == jnp.complex64


def test_log_freqs():
    from ninwavelets_tpu.ops.grids import log_freqs
    f = np.asarray(log_freqs(1.0, 100.0, 21))
    assert f.shape == (21,)
    assert f[0] == pytest.approx(1.0, rel=1e-5)
    assert f[-1] == pytest.approx(100.0, rel=1e-5)
    ratios = f[1:] / f[:-1]
    np.testing.assert_allclose(ratios, ratios[0], rtol=1e-4)
    with pytest.raises(ValueError):
        log_freqs(0.0, 10.0, 5)


def test_array_valued_hyperparameter_keys_the_jit_cache():
    """A custom family with an ARRAY hyper-parameter: mutating the array
    must retrace (round-1 review noted scalars-only snapshotting would
    silently reuse the stale compiled bank)."""
    import ninwavelets_tpu as nw

    class Comb(nw.WaveletBase):
        def __init__(self, sfreq=1000.0):
            super().__init__(sfreq, interpolate=False)
            self.mode = nw.WaveletMode.Reverse
            self.weights = np.array([1.0, 0.5], np.float32)

        def trans_formula(self, freqs, freq=1.0):
            w = freqs / freq
            ws = jnp.asarray(self.weights)
            return (ws[0] * jnp.exp(-jnp.square(w - 1.0) * 8.0)
                    + ws[1] * jnp.exp(-jnp.square(w - 2.0) * 8.0))

        def peak_freq(self, freq):
            return freq

    c = Comb()
    sig = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    p1 = np.asarray(c.power(sig, [20.0]))
    c.weights = np.array([1.0, 0.0], np.float32)   # kill the 2nd harmonic
    p2 = np.asarray(c.power(sig, [20.0], reuse=False))
    assert not np.allclose(p1, p2)                 # retraced, not stale


def test_derived_wavelet_cache_does_not_churn_jit_key():
    """make_wavelets caches self.wavelets (reference parity) — a DERIVED
    value, which must NOT enter the static jit key (a review found it
    invalidated every compiled program after any plotting call)."""
    import ninwavelets_tpu as nw
    m = nw.Morse(1000.0)
    before = m._wdef()
    m.make_wavelets([10.0, 20.0])          # populates m.wavelets
    after = m._wdef()
    assert before == after and hash(before) == hash(after)
