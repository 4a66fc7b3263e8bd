"""Independent numeric cross-validation of wavelet synthesis (VERDICT r1,
missing #2).

The reference's only numeric check prints wavelet norms next to
``mne.time_frequency.tfr.morlet``'s (``/root/reference/ninwavelets/
test.py:42-78, 59-61``) for eyeball comparison.  mne is not installable
here, so the oracles are stronger: CLOSED-FORM integrals (Gaussian moments
for Morlet, the gamma function for the Morse spectrum) and a from-scratch
textbook Morlet construction — none of which share any code with the
library's synthesis path.
"""
import math

import numpy as np
import jax.numpy as jnp
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.grids import fft_bin_freqs

SFREQ = 1000.0


def test_morlet_discrete_norm_matches_gaussian_integral():
    """||psi||_2 of the sampled Morlet against the closed form.

    psi(t) = c pi^{-1/4} e^{-t^2/2} (e^{i sigma t} - k) on the timeline
    t_i = (i - N/2) * dt with dt = 2 pi f / (sfreq * peak_freq)
    (``ops.grids.wavelet_timeline``, reference ``base.py:196-216``).

    integral |psi|^2 dt = c^2 (1 + k^2 - 2 k e^{-sigma^2/4})
    (Gaussian moments: int e^{-t^2} dt = sqrt(pi),
     int e^{-t^2} cos(sigma t) dt = sqrt(pi) e^{-sigma^2/4}),
    so sum_i |psi(t_i)|^2 ~= integral / dt.
    """
    for freq in (5.0, 20.0, 60.0):
        for gabor in (False, True):
            m = nw.Morlet(SFREQ, gabor=gabor)
            w = np.asarray(m.make_wavelets([freq])[0])
            c, k = float(m.c), float(m.k)
            sigma = float(m.sigma)
            integral = c * c * (1.0 + k * k
                                - 2.0 * k * math.exp(-sigma * sigma / 4.0))
            dt = (2.0 * math.pi * freq
                  / (SFREQ * float(m.peak_freq(freq))))
            want = math.sqrt(integral / dt)
            got = float(np.linalg.norm(w))
            assert abs(got - want) / want < 1e-2, (freq, gabor, got, want)


def test_morse_spectrum_norm_matches_gamma_integral():
    """||bank row||_2 of the sampled Morse spectrum against the gamma
    function.

    The row samples Psi(omega) = 2 H(omega) omega^b e^{(b/r)(1 - omega^r)}
    at omega_i = i * (sfreq/n) / freq (``ops.grids.fft_bin_freqs`` divided
    by the analysis frequency inside ``trans_formula``), so

    sum |Psi|^2 * d_omega ~= int_0^inf 4 omega^{2b} e^{(2b/r)(1-omega^r)}
        = 4 e^{2b/r} (1/r) (2b/r)^{-(2b+1)/r} Gamma((2b+1)/r).
    """
    b, r = 17.5, 3.0
    morse = nw.Morse(SFREQ, b, r)
    n = 4096
    integral = (4.0 * math.exp(2.0 * b / r) / r
                * (2.0 * b / r) ** (-(2.0 * b + 1.0) / r)
                * math.gamma((2.0 * b + 1.0) / r))
    for freq in (10.0, 50.0, 100.0):
        row = np.asarray(make_fft_bank(
            morse._wdef(), jnp.asarray([freq], jnp.float32), n, SFREQ,
            False))[0].astype(np.float64)
        d_omega = (SFREQ / n) / freq
        got = float(np.sum(np.abs(row) ** 2) * d_omega)
        assert abs(got - integral) / integral < 1e-2, (freq, got, integral)


def _textbook_morlet(t, sigma):
    """Independent construction: Gaussian-windowed complex exponential with
    the zero-mean correction (the mne-python / standard-texts form, up to
    overall scale)."""
    k = math.exp(-sigma * sigma / 2.0)
    return np.exp(-t * t / 2.0) * (np.exp(1j * sigma * t) - k)


def test_morlet_shape_matches_textbook_construction():
    """Shape (not scale) of the synthesized Morlet against a from-scratch
    textbook construction on the same timeline — the analog of the
    reference's mne.tfr.morlet 3-D shape comparisons (test.py:42-78).
    Cosine similarity of the complex traces must be ~1; the reference's own
    exp(-sigma^2) normalization quirk only scales, never reshapes.
    """
    freq = 40.0
    m = nw.Morlet(SFREQ)
    w = np.asarray(m.make_wavelets([freq])[0]).astype(np.complex128)
    n = w.shape[0]
    dt = 2.0 * math.pi * freq / (SFREQ * float(m.peak_freq(freq)))
    t = (np.arange(n) - 0.5 * n) * dt
    ref = _textbook_morlet(t, float(m.sigma))
    sim = np.abs(np.vdot(w, ref)) / (np.linalg.norm(w)
                                     * np.linalg.norm(ref))
    assert sim > 0.999, sim


def test_morse_time_wavelet_is_analytic():
    """The Morse time wavelet built from its spectrum must be (numerically)
    analytic: its own FFT carries negligible negative-frequency energy —
    a property the synthesis path must preserve and an independent sanity
    check on the mirror+slice construction (reference base.py:350-355)."""
    morse = nw.Morse(SFREQ)
    w = np.asarray(morse.make_wavelets([30.0])[0]).astype(np.complex128)
    spec = np.fft.fft(w)
    n = spec.shape[0]
    pos = np.sum(np.abs(spec[: n // 2]) ** 2)
    neg = np.sum(np.abs(spec[n // 2:]) ** 2)
    assert neg / pos < 1e-3, neg / pos
