"""Wavelet-domain signal denoising (soft / hard coefficient shrinkage).

No reference counterpart (the reference is analysis-only) — but denoising
is THE classic application of an invertible wavelet transform, and this
engine has the exact least-squares inverse (``ops.icwt``), so the full
loop is three fused device ops: CWT -> shrink -> iCWT.

Method: one GLOBAL input-noise variance, estimated robustly as the minimum
over rows of (MAD of the coefficient real part / 0.6745)^2 normalized by
that row's white-noise gain ``mean|B_f|^2 / 2`` — a per-row MAD alone
would read a sustained tone as "noise" and kill its whole row (a CWT row
is not sparse in time the way a DWT detail band is), while the minimum
over gain-normalized rows needs only ONE noise-dominated row anywhere in
the bank.  Each row then gets the Donoho-Johnstone universal threshold at
its own gain: ``lambda_f = k * sqrt(var_in * mean|B_f|^2 / 2) *
sqrt(2 ln N)``, applied to the complex magnitude: soft shrinkage
``c * max(1 - lambda/|c|, 0)`` or hard keep/kill.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .cwt import cwt_from_bank
from .icwt import icwt_from_bank

__all__ = ["denoise_from_bank", "denoise"]


def denoise_from_bank(signal: jnp.ndarray, bank: jnp.ndarray,
                      interpolate: bool = False, method: str = "soft",
                      threshold_scale: float = 1.0,
                      eps: float = 1e-6) -> jnp.ndarray:
    """Denoised reconstruction of ``signal``: (..., N) -> (..., N) real.

    Args:
      signal: (..., N) real signal(s).
      bank: (F, N) analysis bank — reconstruction quality needs the bank to
        cover the signal band (see ``ops.icwt.coverage``).
      method: "soft" (shrink toward zero — smoother, small bias) or "hard"
        (keep/kill — edge-preserving, noisier).
      threshold_scale: multiplier on the universal threshold; < 1 keeps
        more detail, > 1 smooths harder.
    """
    if method not in ("soft", "hard"):
        raise ValueError("method must be 'soft' or 'hard'")
    c = cwt_from_bank(signal, bank, interpolate)          # (..., F, N)
    n = signal.shape[-1]
    # Per-row white-noise gain (per real/imag component): E|W_f|^2 / 2 for
    # unit input variance = mean|B_f|^2 / 2 (see ops.tc_stats).
    gain = jnp.mean(jnp.square(jnp.abs(bank)), axis=-1) / 2.0   # (F,)
    gain = jnp.maximum(gain, 1e-30)
    # Robust global noise variance: MAD per row, normalized by the row's
    # gain, minimized over rows (>= one row is noise-dominated).
    mad = jnp.median(jnp.abs(c.real), axis=-1) / 0.6745   # (..., F)
    var_in = jnp.min(jnp.square(mad) / gain, axis=-1,
                     keepdims=True)                        # (..., 1)
    sigma = jnp.sqrt(var_in[..., None] * gain[:, None])    # (..., F, 1)
    lam = float(threshold_scale) * sigma * jnp.sqrt(2.0 * jnp.log(n))
    mag = jnp.abs(c)
    if method == "soft":
        shrink = jnp.maximum(1.0 - lam / jnp.maximum(mag, 1e-30), 0.0)
    else:
        shrink = (mag > lam).astype(c.real.dtype)
    # Band-limited inverse: shrinkage is nonlinear, so the modified
    # coefficients leak outside the bank's covered band where 1/coverage
    # would amplify the leakage — support_floor clips those bins to zero.
    return icwt_from_bank(c * shrink, bank, eps=eps, real_signal=True,
                          support_floor=1e-3).real


@partial(jax.jit, static_argnames=("interpolate", "method",
                                   "threshold_scale", "eps"))
def _denoise_jit(signal_r, bank_r, bank_i=None, *, interpolate, method,
                 threshold_scale, eps):
    bank = bank_r if bank_i is None else lax.complex(bank_r, bank_i)
    return denoise_from_bank(signal_r, bank, interpolate, method,
                             threshold_scale, eps)


def denoise(signal_r, bank_r, bank_i=None, *, interpolate: bool = False,
            method: str = "soft", threshold_scale: float = 1.0,
            eps: float = 1e-6):
    """Jitted float-boundary wrapper for ``denoise_from_bank``."""
    return _denoise_jit(signal_r, bank_r, bank_i, interpolate=interpolate,
                        method=method,
                        threshold_scale=float(threshold_scale),
                        eps=float(eps))
