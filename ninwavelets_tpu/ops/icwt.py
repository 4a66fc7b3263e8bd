"""Inverse CWT: reconstruct the signal from its coefficients.

No reference counterpart (the reference is analysis-only).  Because this
engine's CWT is exactly a bank of linear frequency-domain filters
(``ops.cwt``: ``W_f = ifft(B_f . fft(x))``), the least-squares inverse has
a closed form per FFT bin:

    x_hat(w) = sum_f conj(B_f(w)) . FFT(W_f)(w) / sum_f |B_f(w)|^2

This is EXACT wherever the bank covers the spectrum (sum |B|^2 > 0) —
unlike the classic Morlet "delta reconstruction" with its empirical C_delta
constants — and degrades gracefully outside the covered band, where the
Tikhonov term ``eps`` keeps the division finite and the estimate simply
lacks the uncovered components.

Float-only program boundaries, like the rest of the engine.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def icwt_from_bank(coeffs: jnp.ndarray, bank: jnp.ndarray,
                   eps: float = 1e-6,
                   real_signal: bool = True,
                   support_floor: float = 0.0) -> jnp.ndarray:
    """Least-squares signal estimate from (..., F, N) complex coefficients.

    Args:
      coeffs: (..., F, N) complex CWT coefficients (as from
        ``cwt_from_bank`` with the same bank).
      bank: (F, N) frequency-domain bank used for the analysis.
      eps: Tikhonov floor for the energy normalization, relative to the
        peak of ``sum_f |B_f|^2``.
      real_signal: the engine's banks live on the positive-frequency half
        (analytic families; the grid maps bins to 0..sfreq), so the LS
        estimate only populates positive bins — for a real input the
        negative half is its conjugate mirror, which this restores (without
        it the real part comes back at half amplitude).  Set False when
        reconstructing a genuinely complex signal.
      support_floor: zero the estimate at bins whose coverage is below
        this fraction of the peak (band-limited inverse).  0 keeps the
        pure Tikhonov behavior — correct for coefficients that genuinely
        came from this bank; NONLINEARLY modified coefficients (e.g. the
        shrinkage in ``ops.denoise``) leak energy outside the covered
        band, where 1/coverage would amplify it enormously — use ~1e-3
        there.

    Returns:
      (..., N) complex reconstruction (take ``.real`` for real signals).
    """
    n = coeffs.shape[-1]
    spec_w = jnp.fft.fft(coeffs)                       # (..., F, N)
    bconj = jnp.conj(bank)
    num = jnp.sum(bconj * spec_w, axis=-2)             # (..., N)
    energy = jnp.sum(jnp.abs(bank) ** 2, axis=0)       # (N,)
    floor = float(eps) * jnp.max(energy)
    x_spec = num / jnp.maximum(energy, floor)
    if support_floor:
        x_spec = jnp.where(energy >= float(support_floor) * jnp.max(energy),
                           x_spec, 0.0)
    if real_signal:
        # Hermitian completion: bin k > N/2 := conj(bin N-k).
        rev = jnp.conj(jnp.roll(jnp.flip(x_spec, -1), 1, -1))
        mask_hi = jnp.arange(n) > n // 2
        x_spec = jnp.where(mask_hi, rev, x_spec)
    return jnp.fft.ifft(x_spec)


@partial(jax.jit, static_argnames=("eps", "real_signal"))
def icwt_ri(coeff_r, coeff_i, bank_r, bank_i=None, eps: float = 1e-6,
            real_signal: bool = True):
    """Float-boundary jitted wrapper: (real, imag) coefficient planes in,
    (real, imag) signal estimate out."""
    coeffs = lax.complex(coeff_r, coeff_i)
    bank = bank_r if bank_i is None else lax.complex(bank_r, bank_i)
    x = icwt_from_bank(coeffs, bank, eps, real_signal)
    return x.real, x.imag


def coverage(bank: jnp.ndarray) -> jnp.ndarray:
    """(N,) spectral energy ``sum_f |B_f|^2`` — reconstruction is reliable
    where this is well above zero; inspect it to choose analysis freqs that
    cover the band of interest."""
    return jnp.sum(jnp.abs(bank) ** 2, axis=0)
