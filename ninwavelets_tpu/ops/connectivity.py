"""Cross-channel connectivity metrics: phase locking and phase-amplitude
coupling.

No reference counterpart — the reference stops at single-signal TFRs plus
the epochs ITC (``mneutils.py:57-71``); these are the standard next
statistics an EEG pipeline computes from exactly the coefficients this
engine already produces.  Everything is built on ``cwt_from_bank`` and
formulated for the TPU:

* PLV is the cross-channel analog of ITC — a unit-phase epoch mean,
  streamed through ``lax.scan`` at O(F*N) memory; the sharded variant
  (``parallel.sharded_plv``) reduces shard-local sums with one ``psum``.
* PAC collapses the time axis with MATMULS: the mean-vector-length
  comodulogram is ``unit_phase @ amplitude.T`` and the Tort binned-
  amplitude histogram is ``one_hot(phase_bin) @ amplitude.T`` — both MXU
  contractions over N, not scatter loops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .cwt import cwt_from_bank

__all__ = ["plv_from_bank", "plv", "plv_sums", "pac_from_banks", "pac"]


# ----------------------------------------------------------------------------
# Phase-locking value
# ----------------------------------------------------------------------------

def plv_sums(sigs_a, sigs_b, bank, interpolate: bool = False,
             eps: float = 0.0, vma_axes=()):
    """Epoch-SUMMED unit cross-phase planes ``(sum_r, sum_i)`` — the
    shard-local half of ``plv_from_bank`` (mirrors ``coherence_sums``).

    The unit cross-phase of epoch e is ``X / |X|`` with
    ``X = Wa * conj(Wb)``; zero-magnitude cells follow the ITC convention
    (0/0 -> NaN) unless ``eps`` floors the magnitude.
    """
    shape = sigs_a.shape[1:-1] + (bank.shape[0], sigs_a.shape[-1])
    zeros = jnp.zeros(shape, jnp.float32)
    if vma_axes:
        zeros = lax.pcast(zeros, tuple(vma_axes), to="varying")

    def step(acc, sigs):
        sa, sb = sigs
        x = (cwt_from_bank(sa, bank, interpolate)
             * jnp.conj(cwt_from_bank(sb, bank, interpolate)))
        mag = jnp.abs(x)
        if eps:
            mag = jnp.maximum(mag, eps)
        return (acc[0] + x.real / mag, acc[1] + x.imag / mag), None

    (sr, si), _ = lax.scan(step, (zeros, zeros), (sigs_a, sigs_b))
    return sr, si


def plv_from_bank(sigs_a: jnp.ndarray, sigs_b: jnp.ndarray,
                  bank: jnp.ndarray, interpolate: bool = False,
                  eps: float = 0.0) -> jnp.ndarray:
    """Phase-locking value between two channels over epochs:

        ``PLV = | mean_E exp(i (phi_a - phi_b)) |``

    the cross-channel analog of the reference's inter-trial coherence
    (same unit-phase mean, phase DIFFERENCE instead of phase): 1 where the
    two channels keep a fixed phase relation across trials at that
    (frequency, time) cell, ~1/sqrt(E) under independence.

    Args:
      sigs_a, sigs_b: (E, ..., N) epoch batches (same shape).
      bank: (F, N) frequency-domain bank.
      eps: optional magnitude floor; 0 keeps the ITC convention that
        zero-power cells go NaN rather than inventing a phase.

    Returns:
      (..., F, N) float32 in [0, 1].
    """
    sr, si = plv_sums(sigs_a, sigs_b, bank, interpolate, eps)
    return jnp.sqrt(sr * sr + si * si) / sigs_a.shape[0]


@partial(jax.jit, static_argnames=("interpolate", "eps"))
def _plv_jit(sa, sb, bank_r, *, interpolate, eps):
    return plv_from_bank(sa, sb, bank_r, interpolate, eps)


def plv(sigs_a_r, sigs_b_r, bank_r, interpolate: bool = False,
        eps: float = 0.0):
    """Jitted float-boundary wrapper for ``plv_from_bank`` (real analytic
    banks)."""
    return _plv_jit(sigs_a_r, sigs_b_r, bank_r,
                    interpolate=bool(interpolate), eps=float(eps))


# ----------------------------------------------------------------------------
# Phase-amplitude coupling
# ----------------------------------------------------------------------------

def _phase_amp(sig, bank_phase, bank_amp, interpolate, eps):
    """Unit phase vectors (complex, (..., Fp, N)) of the low band and
    amplitudes ((..., Fa, N)) of the high band."""
    wp = cwt_from_bank(sig, bank_phase, interpolate)
    wa = cwt_from_bank(sig, bank_amp, interpolate)
    u = wp / jnp.maximum(jnp.abs(wp), eps)
    return u, jnp.abs(wa)


def pac_from_banks(signal: jnp.ndarray, bank_phase: jnp.ndarray,
                   bank_amp: jnp.ndarray, interpolate: bool = False,
                   method: str = "mvl", n_bins: int = 18,
                   eps: float = 1e-20):
    """Phase-amplitude coupling comodulogram: (..., N) ->
    (..., F_phase, F_amp).

    For every (low, high) frequency pair: does the amplitude envelope of
    the high band depend on the instantaneous phase of the low band?
    Both estimators collapse the time axis with a single matmul:

    * ``method="mvl"`` — amplitude-normalized mean vector length
      (Canolty 2006 / Ozkurt 2010): ``|sum_t A u| / sqrt(N sum_t A^2)``
      with ``u = exp(i phi_low)``; the sum is ``u @ A.T``.  In [0, 1].
    * ``method="tort"`` — Tort 2010 modulation index: bin the low-band
      phase into ``n_bins``, average the high-band amplitude per bin
      (``one_hot(bin) @ A.T``), and score the bin distribution's KL
      divergence from uniform, normalized by ``log(n_bins)``.  In [0, 1],
      0 for phase-independent amplitude.

    Batch dims are vmapped; epochs should be averaged by the caller (the
    ``pac`` wrapper does a scan-mean over a leading epoch axis).
    """
    u, a = _phase_amp(signal, bank_phase, bank_amp, interpolate, eps)
    n = signal.shape[-1]
    if method == "mvl":
        # (..., Fp, N) @ (..., N, Fa) -> (..., Fp, Fa)
        mr = u.real @ jnp.swapaxes(a, -1, -2)
        mi = u.imag @ jnp.swapaxes(a, -1, -2)
        denom = jnp.sqrt(n * jnp.sum(a * a, axis=-1))       # (..., Fa)
        return jnp.sqrt(mr * mr + mi * mi) / jnp.maximum(
            denom[..., None, :], eps)
    if method != "tort":
        raise ValueError("method must be 'mvl' or 'tort'")
    # Tort MI: phase bins from the unit vector (atan2 is fine inside jit).
    phase = jnp.arctan2(u.imag, u.real)                     # (..., Fp, N)
    idx = jnp.clip(((phase + jnp.pi) * (n_bins / (2.0 * jnp.pi)))
                   .astype(jnp.int32), 0, n_bins - 1)
    onehot = jax.nn.one_hot(idx, n_bins, dtype=jnp.float32,
                            axis=-2)                        # (..., Fp, B, N)
    counts = jnp.sum(onehot, axis=-1)                       # (..., Fp, B)
    sums = onehot @ jnp.swapaxes(a, -1, -2)[..., None, :, :]
    # sums: (..., Fp, B, Fa); mean amplitude per bin (empty bins -> 0).
    mean_amp = sums / jnp.maximum(counts, 1.0)[..., None]
    p = mean_amp / jnp.maximum(jnp.sum(mean_amp, axis=-2, keepdims=True),
                               eps)                         # over bins
    plogp = jnp.where(p > 0, p * jnp.log(p), 0.0)
    kl = jnp.log(float(n_bins)) + jnp.sum(plogp, axis=-2)   # (..., Fp, Fa)
    return kl / jnp.log(float(n_bins))


@partial(jax.jit, static_argnames=("interpolate", "method", "n_bins",
                                   "mean_epochs"))
def _pac_jit(sig, bp, ba, *, interpolate, method, n_bins, mean_epochs):
    if not mean_epochs:
        return pac_from_banks(sig, bp, ba, interpolate, method, n_bins)
    one = lambda s: pac_from_banks(s, bp, ba, interpolate, method, n_bins)
    zero = jnp.zeros(sig.shape[1:-1] + (bp.shape[0], ba.shape[0]),
                     jnp.float32)
    total = lax.scan(lambda acc, s: (acc + one(s), None), zero, sig)[0]
    return total / sig.shape[0]


def pac(signal_r, bank_phase_r, bank_amp_r, interpolate: bool = False,
        method: str = "mvl", n_bins: int = 18,
        mean_epochs: bool = False):
    """Jitted float-boundary wrapper for ``pac_from_banks``.  With
    ``mean_epochs=True`` the leading axis is an epoch axis: the
    comodulogram is computed per epoch and averaged through a scan
    (O(Fp*Fa) accumulator)."""
    return _pac_jit(signal_r, bank_phase_r, bank_amp_r,
                    interpolate=bool(interpolate), method=str(method),
                    n_bins=int(n_bins), mean_epochs=bool(mean_epochs))
