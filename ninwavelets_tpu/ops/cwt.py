"""The CWT hot path: batched FFT x bank x iFFT, fused post-ops.

Reference hot loop: ``/root/reference/ninwavelets/base.py:378-407`` — one
signal FFT, a broadcast multiply against the (F, N) bank, one batched iFFT.
The reference runs this per signal with host<->GPU copies on every call
(``base.py:398-404``); here the whole thing is a single jitted XLA program
that stays in HBM, batches over arbitrary leading axes, and fuses the
power / ITC / baseline epilogues so the complex coefficient tensor for a
whole epochs batch is never materialized (the reference computes
``np.abs(...)**2`` on host afterwards, ``base.py:409-443``).

Epoch reductions (mean power, inter-trial coherence — the reference's
``EpochsWavelet`` loops, ``mneutils.py:26-71``) stream over the epoch axis
with ``lax.scan`` so peak memory is O(C*F*N), independent of the number of
epochs.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .grids import analytic_mask


def analytic_spectrum(signal: jnp.ndarray, interpolate: bool) -> jnp.ndarray:
    """FFT of the signal, optionally with the negative-frequency half zeroed
    (the reference's ``interpolate_alias`` applied to the signal spectrum,
    ``base.py:399-401``).

    For real signals on the analytic path the masked spectrum is just the
    rFFT's lower bins zero-padded — half the FFT work.
    """
    n = signal.shape[-1]
    if interpolate and not jnp.iscomplexobj(signal):
        half = jnp.fft.rfft(signal)[..., :n // 2]
        pad = [(0, 0)] * (signal.ndim - 1) + [(0, n - n // 2)]
        return jnp.pad(half, pad)
    spec = jnp.fft.fft(signal.astype(jnp.complex64))
    if interpolate:
        spec = spec * analytic_mask(n, jnp.float32)
    return spec


def cwt_from_bank(signal: jnp.ndarray, bank: jnp.ndarray,
                  interpolate: bool = False) -> jnp.ndarray:
    """Continuous wavelet transform of ``signal`` against a prebuilt bank.

    Args:
      signal: (..., N) real or complex.
      bank: (F, N) frequency-domain wavelet bank (real or complex).
      interpolate: zero the signal spectrum above Nyquist (analytic trick).

    Returns:
      (..., F, N) complex64 CWT coefficients — ``ifft(bank * fft(signal))``
      exactly as ``base.py:399-406``.
    """
    spec = analytic_spectrum(signal, interpolate)
    return jnp.fft.ifft(spec[..., None, :] * bank)


def power_from_bank(signal: jnp.ndarray, bank: jnp.ndarray,
                    interpolate: bool = False) -> jnp.ndarray:
    """``|cwt|**2`` fused on device (reference: ``base.py:409-425``)."""
    c = cwt_from_bank(signal, bank, interpolate)
    return jnp.square(c.real) + jnp.square(c.imag)


def abs_from_bank(signal: jnp.ndarray, bank: jnp.ndarray,
                  interpolate: bool = False) -> jnp.ndarray:
    """``|cwt|`` fused on device (reference: ``base.py:427-443``)."""
    return jnp.abs(cwt_from_bank(signal, bank, interpolate))


# ----------------------------------------------------------------------------
# Streaming epoch reductions (EpochsWavelet equivalents, mneutils.py:42-71)
# ----------------------------------------------------------------------------

def _scan_mean(signals: jnp.ndarray, bank: jnp.ndarray, interpolate: bool,
               per_epoch, vma_axes=()):
    """Mean of ``per_epoch(cwt)`` over the leading (epoch) axis via scan —
    O(1) memory in the number of epochs.

    ``vma_axes``: when called inside ``shard_map``, the mesh axis names the
    scan body output varies over — the zero init must be cast to the same
    varying-manual-axes type or the scan carry types mismatch.
    """
    n_epochs = signals.shape[0]

    def step(acc, sig):
        c = cwt_from_bank(sig, bank, interpolate)
        return acc + per_epoch(c), None

    shape = signals.shape[1:-1] + (bank.shape[0], signals.shape[-1])
    init = jnp.zeros(shape, dtype=per_epoch(jnp.zeros((), jnp.complex64)).dtype)
    if vma_axes:
        init = lax.pcast(init, tuple(vma_axes), to="varying")
    total, _ = lax.scan(step, init, signals)
    return total / n_epochs


def mean_power_from_bank(signals: jnp.ndarray, bank: jnp.ndarray,
                         interpolate: bool = False) -> jnp.ndarray:
    """Epoch-mean power TFR: ``mean_E |cwt|**2``.

    Equivalent of ``EpochsWavelet.power`` (``mneutils.py:42-55``) with the
    Python epoch loop replaced by an on-device scan.

    Args:
      signals: (E, ..., N) — epochs leading, time trailing.
    Returns:
      (..., F, N) float32.
    """
    return _scan_mean(signals, bank, interpolate,
                      lambda c: jnp.square(c.real) + jnp.square(c.imag))


def itc_from_bank(signals: jnp.ndarray, bank: jnp.ndarray,
                  interpolate: bool = False,
                  eps: float = 0.0) -> jnp.ndarray:
    """Inter-trial coherence: ``| mean_E (cwt / |cwt|) |``.

    Equivalent of ``EpochsWavelet.itc`` (``mneutils.py:57-71``).  ``eps``
    guards the division for exactly-zero coefficients (the reference would
    emit NaN there; default 0.0 preserves that behavior).
    """
    def unit_phase(c):
        mag = jnp.abs(c)
        if eps:
            mag = jnp.maximum(mag, eps)
        return c / mag

    return jnp.abs(_scan_mean(signals, bank, interpolate, unit_phase))


# ----------------------------------------------------------------------------
# Complex-free program boundaries
#
# TPU runtimes do not reliably support complex64 arrays crossing the
# host<->device / jit boundary (the axon PJRT backend raises UNIMPLEMENTED on
# any complex transfer or constant), while complex math INSIDE a compiled
# program lowers fine.  So every jitted entry point below takes the bank as a
# (real, imag-or-None) float pair and returns floats; complex exists only
# inside the XLA program.  ``_as_bank`` / ``_as_signal`` rebuild the complex
# view on the traced side.
# ----------------------------------------------------------------------------


def _as_bank(bank_r: jnp.ndarray, bank_i: Optional[jnp.ndarray]):
    if bank_i is None:
        return bank_r
    return lax.complex(bank_r, bank_i)


def _as_signal(sig_r: jnp.ndarray, sig_i: Optional[jnp.ndarray]):
    if sig_i is None:
        return sig_r
    return lax.complex(sig_r, sig_i)


@partial(jax.jit, static_argnames=("interpolate",))
def cwt_ri(signal_r, bank_r, bank_i=None, signal_i=None,
           interpolate: bool = False):
    """CWT with float-only boundaries: returns ``(real, imag)`` float32."""
    c = cwt_from_bank(_as_signal(signal_r, signal_i),
                      _as_bank(bank_r, bank_i), interpolate)
    return c.real, c.imag


@partial(jax.jit, static_argnames=("interpolate",))
def power(signal_r, bank_r, bank_i=None, signal_i=None,
          interpolate: bool = False):
    return power_from_bank(_as_signal(signal_r, signal_i),
                           _as_bank(bank_r, bank_i), interpolate)


@partial(jax.jit, static_argnames=("interpolate",))
def cwt_abs(signal_r, bank_r, bank_i=None, signal_i=None,
            interpolate: bool = False):
    return abs_from_bank(_as_signal(signal_r, signal_i),
                         _as_bank(bank_r, bank_i), interpolate)


@partial(jax.jit, static_argnames=("interpolate",))
def mean_power(signal_r, bank_r, bank_i=None, signal_i=None,
               interpolate: bool = False):
    return mean_power_from_bank(_as_signal(signal_r, signal_i),
                                _as_bank(bank_r, bank_i), interpolate)


@partial(jax.jit, static_argnames=("interpolate", "eps"))
def itc(signal_r, bank_r, bank_i=None, signal_i=None,
        interpolate: bool = False, eps: float = 0.0):
    return itc_from_bank(_as_signal(signal_r, signal_i),
                         _as_bank(bank_r, bank_i), interpolate, eps)


def split_complex(x):
    """Host helper: (real, imag-or-None) float arrays from any array."""
    import numpy as np
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return (jnp.asarray(np.ascontiguousarray(x.real)),
                jnp.asarray(np.ascontiguousarray(x.imag)))
    return jnp.asarray(x), None
