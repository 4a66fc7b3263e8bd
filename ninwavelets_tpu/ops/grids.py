"""Frequency / time grids used for on-device wavelet synthesis.

The reference builds its grids with ``np.arange`` inside per-frequency Python
loops (``/root/reference/ninwavelets/base.py:173-216``).  Here every grid is a
statically-shaped device array, so that an entire (F, N) wavelet bank can be
synthesized in one fused XLA computation with no host round-trips.

Grid semantics preserved from the reference:

* ``trans`` grid (frequency-domain synthesis, ``base.py:192-194``):
  ``one = 1/T`` Hz resolution and ``total = sfreq`` Hz extent for a signal of
  duration ``T = n / sfreq`` seconds — i.e. bin *i* carries the physical
  frequency ``i * sfreq / n``.
* ``wavelet`` timeline (time-domain synthesis, ``base.py:212-216``): exactly
  ``sfreq`` samples spanning ``±pi * freq / peak_freq`` in phase units,
  zero-mean.
* ``reverse`` timeline used by ``make_wavelet`` (``base.py:350``): bin values
  ``i / freq`` over ``sfreq * real_wave_length`` samples.
"""
from __future__ import annotations

import jax.numpy as jnp


def fft_bin_freqs(n: int, sfreq: float, dtype=jnp.float32) -> jnp.ndarray:
    """Physical frequency of each FFT bin: ``grid[i] = i * sfreq / n``.

    Matches the values produced by the reference's
    ``_setup_trans_shape(freq=T, real_wave_length=T)`` call
    (``base.py:192-194`` with ``one = 1/T``, ``total = sfreq``), but computed
    from integer bin indices so there is no float-accumulation drift and the
    shape is static.
    """
    i = jnp.arange(n, dtype=dtype)
    return i * (float(sfreq) / float(n))


def analytic_mask(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """1 for bins below ``n // 2``, 0 above — the reference's
    ``interpolate_alias`` (``base.py:107-123``): keep the lower half of the
    spectrum, zero the negative-frequency half.  Multiplying a spectrum by
    this mask is the analytic-signal trick behind ``interpolate=True``.
    """
    half = n // 2
    i = jnp.arange(n)
    return (i < half).astype(dtype)


def wavelet_timeline(sfreq: float, freq, peak_freq,
                     real_length: float = 1.0, zero_mean: bool = True,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Zero-mean phase timeline for time-domain synthesis.

    Reference: ``_setup_waveletshape`` (``base.py:196-216``):
    ``total = real_length / peak * freq * 2*pi`` and
    ``one = (1 / sfreq) * 2*pi * freq / peak`` — which always yields exactly
    ``sfreq * real_length`` samples regardless of ``freq``.

    ``freq`` / ``peak_freq`` may be traced scalars (for vmap over the
    analysis-frequency axis); only ``sfreq * real_length`` must be static.
    """
    import math
    n = int(round(sfreq * real_length))
    scale = (2.0 * math.pi) * jnp.asarray(freq, dtype) / (
        float(sfreq) * jnp.asarray(peak_freq, dtype))
    i = jnp.arange(n, dtype=dtype)
    if zero_mean:
        # total / 2 = (real_length * sfreq / 2) * one
        return (i - 0.5 * float(sfreq) * float(real_length)) * scale
    return i * scale


def reverse_timeline(sfreq: float, freq, real_wave_length: float,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Grid for ``make_wavelet`` in Reverse/Twice modes (``base.py:350``):
    ``one = 1/freq``, ``total = sfreq/freq * real_wave_length`` — i.e.
    ``sfreq * real_wave_length`` samples with values ``i / freq``.

    ``freq`` may be a traced scalar.
    """
    n = int(round(sfreq * real_wave_length))
    i = jnp.arange(n, dtype=dtype)
    return i / jnp.asarray(freq, dtype)


def log_freqs(lo: float, hi: float, n: int, dtype=jnp.float32) -> jnp.ndarray:
    """``n`` log-spaced analysis frequencies in [lo, hi] — the natural grid
    for constant-Q wavelets like Morse/Morlet, whose bandwidth scales with
    frequency (linear grids oversample the top of the band)."""
    import math
    if lo <= 0 or hi <= lo or n < 2:
        raise ValueError("need 0 < lo < hi and n >= 2")
    return jnp.logspace(math.log10(lo), math.log10(hi), n, dtype=dtype)
