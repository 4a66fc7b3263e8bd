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
* The all-pairs matrices (``plv_matrix``, ``coherence_matrix``) contract
  the EPOCH axis with matmuls: the (C, C) pairwise epoch sums at every
  (frequency, time) cell are one batched ``(C, 2E) @ (2E, C)`` product,
  streamed one bank row at a time (one signal FFT up front, one iFFT per
  row) so memory stays O(E*C*N + C*C*N).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .cwt import analytic_spectrum, cwt_from_bank

__all__ = ["plv_from_bank", "plv", "plv_sums", "pac_from_banks", "pac",
           "plv_auto", "pair_matrix_scan", "plv_matrix_from_bank", "plv_matrix",
           "pac_mean_from_banks",
           "coherence_matrix_from_bank", "coherence_matrix"]


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
    banks) — always the exact XLA path; ``plv_auto`` opts into the fused
    kernel (the mean_power/mean_power_auto convention)."""
    return _plv_jit(sigs_a_r, sigs_b_r, bank_r,
                    interpolate=bool(interpolate), eps=float(eps))


def plv_auto(sigs_a_r, sigs_b_r, bank_r, interpolate: bool = False,
             eps: float = 0.0, precision: str = "fast3"):
    """PLV with automatic kernel dispatch: the fused ``plv`` epilogue on
    TPU when the geometry conforms and eps is 0 (the kernel has no floor;
    unit-phase round-off is the itc class, ~1e-3 at fast3 — see the
    on-chip parity artifact), the exact XLA path otherwise."""
    if eps == 0.0:
        from .fused import supports
        if (jax.default_backend() == "tpu"
                and supports(sigs_a_r.shape, bank_r, epilogue="itc")):
            from .fused import fused_plv
            return fused_plv(sigs_a_r, sigs_b_r, bank_r,
                             interpolate=interpolate, precision=precision)
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


def pac_mean_from_banks(sig, bank_phase, bank_amp, interpolate, method,
                        n_bins, vma_axes=()):
    """Epoch-mean comodulogram via a scan (O(Fp*Fa) accumulator); shared
    by the jitted wrapper and the per-shard path (``parallel.sharded`` —
    vma_axes casts the zero init to the shard_map varying-axes type)."""
    zero = jnp.zeros(sig.shape[1:-1] + (bank_phase.shape[0],
                                        bank_amp.shape[0]), jnp.float32)
    if vma_axes:
        zero = lax.pcast(zero, tuple(vma_axes), to="varying")

    def step(acc, s):
        return acc + pac_from_banks(s, bank_phase, bank_amp, interpolate,
                                    method, n_bins), None

    return lax.scan(step, zero, sig)[0] / sig.shape[0]


@partial(jax.jit, static_argnames=("interpolate", "method", "n_bins",
                                   "mean_epochs"))
def _pac_jit(sig, bp, ba, *, interpolate, method, n_bins, mean_epochs):
    if not mean_epochs:
        return pac_from_banks(sig, bp, ba, interpolate, method, n_bins)
    return pac_mean_from_banks(sig, bp, ba, interpolate, method, n_bins)


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


# ----------------------------------------------------------------------------
# All-pairs connectivity matrices
# ----------------------------------------------------------------------------

def _pair_sums(w: jnp.ndarray):
    """Pairwise epoch sums ``S[a, b, n] = sum_e w[e, a, n] conj(w[e, b, n])``
    as a (real, imag) pair of (C, C, n) planes.

    One complex Hermitian contraction folded into TWO real batched matmuls
    of shape (n: C x 2E @ 2E x C): with ``u = [wr; wi]`` stacked on the
    epoch axis, ``S_r = u . u`` and ``S_i = [wi; -wr] . u`` — the epoch
    axis is the MXU contraction, the time axis the batch.
    """
    u = jnp.concatenate([w.real, w.imag], axis=0)             # (2E, C, n)
    v = jnp.concatenate([w.imag, -w.real], axis=0)
    sr = jnp.einsum('ean,ebn->abn', u, u)
    si = jnp.einsum('ean,ebn->abn', v, u)
    return sr, si


def pair_matrix_scan(sigs: jnp.ndarray, bank: jnp.ndarray, per_row,
                     interpolate: bool = False, unit: bool = False,
                     eps: float = 0.0, time_range=None):
    """Stream an all-pairs statistic over the bank rows.

    For each frequency row: iFFT the (E, C, N) coefficient slab (the
    signal spectrum is computed ONCE up front), optionally unit-normalize
    (PLV), window the time axis, form the pairwise epoch sums with
    ``_pair_sums``, and hand ``(sr, si)`` to ``per_row`` to finish the
    statistic.  Memory is O(E*C*N + C*C*n) — the (E, C, F, N) coefficient
    tensor never exists.

    Args:
      sigs: (E, C, N) epochs-by-channels batch.
      bank: (F, N) frequency-domain bank (real or complex).
      per_row: ``(sr, si) -> (C, C)`` row epilogue (runs traced).
      unit: normalize coefficients to unit magnitude (phase-only).
      eps: magnitude floor for the unit normalization; 0 keeps the ITC
        convention that zero-power cells go NaN.
      time_range: optional (start, stop) SAMPLE window the statistic is
        averaged over (transform first, window after — no edge aliasing).
    Returns:
      (F, C, C) stacked row results.
    """
    spec = analytic_spectrum(sigs, interpolate)               # (E, C, N)
    n0, n1 = time_range if time_range is not None else (0, sigs.shape[-1])

    def row(_, bank_row):
        w = jnp.fft.ifft(spec * bank_row)                     # (E, C, N)
        if unit:
            mag = jnp.abs(w)
            if eps:
                mag = jnp.maximum(mag, eps)
            w = w / mag
        return None, per_row(*_pair_sums(w[..., n0:n1]))

    return lax.scan(row, None, bank)[1]


def plv_matrix_from_bank(sigs: jnp.ndarray, bank: jnp.ndarray,
                         interpolate: bool = False, eps: float = 0.0,
                         time_range=None) -> jnp.ndarray:
    """All-pairs phase-locking matrix: (E, C, N) -> (F, C, C).

    ``PLV[f, a, b] = mean_t | mean_E exp(i (phi_a - phi_b)) |`` — the
    pairwise form of ``plv_from_bank`` for every channel pair at once,
    time-averaged (over ``time_range`` samples if given) into the (C, C)
    connectivity matrix per frequency that source-connectivity pipelines
    consume.  Symmetric with unit diagonal; ~1/sqrt(E) under independence.
    """
    e = sigs.shape[0]

    def per_row(sr, si):
        return jnp.mean(jnp.sqrt(sr * sr + si * si), axis=-1) / e

    return pair_matrix_scan(sigs, bank, per_row, interpolate, unit=True,
                            eps=eps, time_range=time_range)


def coherence_matrix_from_bank(sigs: jnp.ndarray, bank: jnp.ndarray,
                               interpolate: bool = False,
                               eps: float = 1e-12,
                               time_range=None) -> jnp.ndarray:
    """All-pairs epoch-wise wavelet coherence: (E, C, N) -> (F, C, C).

    ``|mean_E Wa conj(Wb)|^2 / (mean_E |Wa|^2 mean_E |Wb|^2)`` per cell
    (the pairwise form of ``extensions.epoch_coherence_from_bank``),
    time-averaged into the (C, C) matrix per frequency.  The per-channel
    power sums are the DIAGONAL of the pairwise sums — free.
    """
    e = sigs.shape[0]

    def per_row(sr, si):
        num = (sr * sr + si * si) / (e * e)                   # (C, C, n)
        p = jnp.einsum('aan->an', sr) / e                     # (C, n)
        den = p[:, None, :] * p[None, :, :]
        if eps:
            # Relative floor (matches coherence_from_sums): dead rows -> 0.
            den = jnp.maximum(den, eps * jnp.max(den))
        return jnp.mean(num / den, axis=-1)

    return pair_matrix_scan(sigs, bank, per_row, interpolate,
                            time_range=time_range)


@partial(jax.jit, static_argnames=("interpolate", "eps", "time_range"))
def _plv_matrix_jit(sigs, bank_r, *, interpolate, eps, time_range):
    return plv_matrix_from_bank(sigs, bank_r, interpolate, eps, time_range)


def plv_matrix(sigs_r, bank_r, interpolate: bool = False, eps: float = 0.0,
               time_range=None):
    """Jitted float-boundary wrapper for ``plv_matrix_from_bank`` (real
    analytic banks only — phase needs the analytic signal)."""
    tr = None if time_range is None else (int(time_range[0]),
                                          int(time_range[1]))
    return _plv_matrix_jit(sigs_r, bank_r, interpolate=bool(interpolate),
                           eps=float(eps), time_range=tr)


@partial(jax.jit, static_argnames=("interpolate", "eps", "time_range"))
def _coh_matrix_jit(sigs, bank_r, bank_i, *, interpolate, eps, time_range):
    bank = bank_r if bank_i is None else lax.complex(bank_r, bank_i)
    return coherence_matrix_from_bank(sigs, bank, interpolate, eps,
                                      time_range)


def coherence_matrix(sigs_r, bank_r, bank_i=None, interpolate: bool = False,
                     eps: float = 1e-12, time_range=None):
    """Jitted float-boundary wrapper for ``coherence_matrix_from_bank``
    (real or complex banks, the latter as a float pair)."""
    tr = None if time_range is None else (int(time_range[0]),
                                          int(time_range[1]))
    return _coh_matrix_jit(sigs_r, bank_r, bank_i,
                           interpolate=bool(interpolate), eps=float(eps),
                           time_range=tr)
