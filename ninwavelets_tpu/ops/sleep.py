"""Sleep-EEG event detection: spindles and slow oscillations.

No reference counterpart — these are the standard sleep-staging /
memory-consolidation events (the YASA / Massimini workflows), detected
here with the same static-shape segment machinery as ``ops/cycles.py``
and ``ops/bursts.py``:

* **spindles**: sigma-band (11-16 Hz) moving-RMS envelope crossing a
  robust (median-based) threshold, segments by cumsum of mask rising
  edges, per-segment bounds/amplitude/frequency via scatter reductions,
  duration criteria applied as validity flags — the detection table is
  a fixed (K,) padded structure, never a dynamic shape;
* **slow oscillations**: delta-band negative-to-positive zero-crossing
  cycles (Massimini 2004 criteria — negative-phase duration, negative
  peak and peak-to-peak amplitude), with adaptive amplitude thresholds
  (multiples of the channel's robust sigma) when absolute ones are not
  given, so unit-free data works out of the box.

Everything runs per-channel inside one jit and ``vmap``s over channels;
a night of 256 Hz EEG is a few million samples — one device pass.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .cycles import _bandpass

__all__ = ["EventTable", "detect_spindles", "detect_slow_oscillations"]


class EventTable(NamedTuple):
    """Padded per-row detection table (leading dims mirror the input's
    batch dims; K is the static event capacity).  ``start``/``stop``
    are sample indices (stop inclusive), ``duration`` seconds,
    ``peak_amp`` signal units (envelope peak for spindles, negative
    peak for slow oscillations), ``freq`` Hz (spindle oscillation
    frequency; the slow-oscillation cycle frequency), ``valid`` marks
    real events — padded rows are zero.  ``overflow`` (per row) is True
    when the recording produced MORE threshold crossings than ``kmax``
    bins — the detectors raise on it rather than silently dropping the
    tail, so you never see it in a returned table."""
    start: jnp.ndarray
    stop: jnp.ndarray
    duration: jnp.ndarray
    peak_amp: jnp.ndarray
    freq: jnp.ndarray
    valid: jnp.ndarray
    overflow: jnp.ndarray


def _moving_rms(x, w: int):
    """Centered moving RMS over ``w`` samples via one cumsum (edges use
    the partial window)."""
    c = jnp.cumsum(x * x, axis=-1)
    n = x.shape[-1]
    idx = jnp.arange(n)
    hi = jnp.minimum(idx + w // 2, n - 1)
    lo = jnp.maximum(idx - (w - w // 2), -1)
    tot = jnp.take(c, hi, axis=-1) - jnp.where(
        lo >= 0, jnp.take(c, jnp.maximum(lo, 0), axis=-1), 0.0)
    cnt = (hi - lo).astype(jnp.float32)
    return jnp.sqrt(jnp.maximum(tot, 0.0) / cnt)


def _segments_from_mask(mask, kmax: int):
    """(seg_ids, overflow): 1-based in-mask segment ids (0 =
    background), ids beyond ``kmax`` clipped into bin ``kmax``;
    ``overflow`` True when clipping actually merged segments."""
    m = mask.astype(jnp.int32)
    rising = jnp.concatenate([m[:1], jnp.maximum(m[1:] - m[:-1], 0)])
    raw = jnp.cumsum(rising) * m
    return jnp.minimum(raw, kmax), jnp.max(raw) > kmax


def _seg_bounds(seg, kmax: int):
    n = seg.shape[-1]
    idx = jnp.arange(n)
    start = jax.ops.segment_min(jnp.where(seg > 0, idx, n), seg,
                                num_segments=kmax + 1)
    stop = jax.ops.segment_max(jnp.where(seg > 0, idx, -1), seg,
                               num_segments=kmax + 1)
    found = stop >= start
    return (jnp.where(found, start, 0)[1:], jnp.where(found, stop, 0)[1:],
            found[1:])


@partial(jax.jit, static_argnames=("sfreq", "f_lo", "f_hi", "rms_win",
                                   "kmax", "thresh", "dur_lo", "dur_hi"))
def _spindles_row(x, *, sfreq, f_lo, f_hi, rms_win, kmax, thresh,
                  dur_lo, dur_hi):
    xf = _bandpass(x, sfreq, f_lo, f_hi)
    env = _moving_rms(xf, rms_win)
    thr = thresh * jnp.median(env)
    seg, overflow = _segments_from_mask(env > thr, kmax)
    start, stop, found = _seg_bounds(seg, kmax)
    dur = (stop - start + 1).astype(jnp.float32) / sfreq
    ok = found & (dur >= dur_lo) & (dur <= dur_hi)
    # envelope peak per segment
    peak = jax.ops.segment_max(
        jnp.where(seg > 0, env, -jnp.inf), seg,
        num_segments=kmax + 1)[1:]
    peak = jnp.where(ok, peak, 0.0)
    # oscillation frequency: zero crossings of the filtered trace
    zx = (jnp.signbit(xf[:-1]) != jnp.signbit(xf[1:])).astype(jnp.float32)
    zc = jax.ops.segment_sum(
        zx * (seg[:-1] > 0), seg[:-1], num_segments=kmax + 1)[1:]
    freq = jnp.where(ok & (dur > 0), zc / (2.0 * jnp.maximum(dur, 1e-9)),
                     0.0)
    z = jnp.zeros_like(dur)
    return EventTable(
        start=jnp.where(ok, start, 0).astype(jnp.int32),
        stop=jnp.where(ok, stop, 0).astype(jnp.int32),
        duration=jnp.where(ok, dur, z), peak_amp=peak, freq=freq,
        valid=ok, overflow=overflow)


def detect_spindles(x, sfreq: float, freq_range=(11.0, 16.0),
                    thresh: float = 3.0, duration=(0.5, 2.0),
                    rms_win_s: float = 0.2,
                    kmax: int = 4096) -> EventTable:
    """Sleep-spindle detection on (..., N) recordings (YASA-style
    moving-RMS rule): sigma-band envelope above ``thresh`` x its median
    for a duration inside ``duration`` seconds.  ``kmax`` caps the
    per-row event table (static shapes); if a recording produces MORE
    threshold crossings than ``kmax`` the call RAISES (no silent
    truncation) — pass a larger ``kmax``.  Returns an
    :class:`EventTable` with the spindle frequency estimated from
    in-segment zero crossings.
    """
    x = jnp.asarray(x, jnp.float32)
    if x.shape[-1] < int(sfreq):
        raise ValueError("need at least one second of data")
    f_lo, f_hi = float(freq_range[0]), float(freq_range[1])
    if not 0 < f_lo < f_hi < sfreq / 2:
        raise ValueError("freq_range must be inside (0, sfreq/2)")
    dur_lo, dur_hi = float(duration[0]), float(duration[1])
    fn = partial(_spindles_row, sfreq=float(sfreq), f_lo=f_lo, f_hi=f_hi,
                 rms_win=max(2, int(round(rms_win_s * sfreq))),
                 kmax=int(kmax), thresh=float(thresh), dur_lo=dur_lo,
                 dur_hi=dur_hi)
    for _ in range(x.ndim - 1):
        fn = jax.vmap(fn)
    tab = fn(x)
    if bool(jnp.any(tab.overflow)):
        raise ValueError(
            f"more than kmax={kmax} threshold crossings in at least "
            "one row — raise kmax (tables are cheap) or the threshold")
    return tab


@partial(jax.jit, static_argnames=("sfreq", "f_lo", "f_hi", "kmax",
                                   "dur_lo", "dur_hi", "neg_mult",
                                   "ptp_mult"))
def _so_row(x, amp_neg, amp_ptp, *, sfreq, f_lo, f_hi, kmax, dur_lo,
            dur_hi, neg_mult, ptp_mult):
    xf = _bandpass(x, sfreq, f_lo, f_hi)
    if amp_neg is None:
        sigma = 1.4826 * jnp.median(jnp.abs(xf))     # robust std
        amp_neg = neg_mult * sigma
        amp_ptp = ptp_mult * sigma
    neg = xf < 0
    seg, oneg = _segments_from_mask(neg, kmax)       # negative phases
    start, stop, found = _seg_bounds(seg, kmax)
    dur_neg = (stop - start + 1).astype(jnp.float32) / sfreq
    # negative and following-positive peaks: the positive phase runs
    # from stop+1 to the next negative phase; bound it by scanning the
    # positive-segment ids (complement mask shares the numbering shift)
    neg_peak = -jax.ops.segment_max(
        jnp.where(seg > 0, -xf, -jnp.inf), seg,
        num_segments=kmax + 1)[1:]
    pos_seg, opos = _segments_from_mask(~neg, kmax)
    pstart, pstop, pfound = _seg_bounds(pos_seg, kmax)
    pos_peak_all = jax.ops.segment_max(
        jnp.where(pos_seg > 0, xf, -jnp.inf), pos_seg,
        num_segments=kmax + 1)[1:]
    # align: the positive phase FOLLOWING negative phase k starts at
    # stop_k + 1; positive segments are numbered in order too, so the
    # follower of neg k is pos j with pstart_j = stop_k + 1.  When the
    # row starts positive, pos numbering leads by one.
    leads = pstart[0] == 0
    j = jnp.arange(kmax)
    follower = jnp.where(leads, j + 1, j)
    follower = jnp.minimum(follower, kmax - 1)
    pos_peak = pos_peak_all[follower]
    pos_ok = pfound[follower] & (pos_peak > -jnp.inf)
    ptp = jnp.where(pos_ok, pos_peak - neg_peak, 0.0)
    ok = (found & (dur_neg >= dur_lo) & (dur_neg <= dur_hi)
          & (neg_peak <= -amp_neg) & pos_ok & (ptp >= amp_ptp))
    stop_full = jnp.where(pos_ok, pstop[follower], stop)
    dur_full = (stop_full - start + 1).astype(jnp.float32) / sfreq
    z = jnp.zeros_like(dur_full)
    return EventTable(
        start=jnp.where(ok, start, 0).astype(jnp.int32),
        stop=jnp.where(ok, stop_full, 0).astype(jnp.int32),
        duration=jnp.where(ok, dur_full, z),
        peak_amp=jnp.where(ok, neg_peak, z),
        freq=jnp.where(ok & (dur_full > 0),
                       1.0 / jnp.maximum(dur_full, 1e-9), z),
        valid=ok, overflow=oneg | opos)


def detect_slow_oscillations(x, sfreq: float, freq_range=(0.3, 1.5),
                             duration_neg=(0.3, 1.5),
                             amp_neg: Optional[float] = None,
                             amp_ptp: Optional[float] = None,
                             neg_mult: float = 4.0,
                             ptp_mult: float = 6.0,
                             kmax: int = 32768) -> EventTable:
    """Slow-oscillation detection on (..., N) recordings (Massimini
    2004 criteria): delta-band negative half-waves of
    ``duration_neg`` seconds whose negative peak exceeds ``amp_neg``
    and whose trough-to-following-peak amplitude exceeds ``amp_ptp``.
    With ``amp_neg``/``amp_ptp`` None (default) the thresholds adapt
    per row: ``neg_mult`` / ``ptp_mult`` times the filtered trace's
    robust sigma (1.4826 x MAD) — scale-free data works unchanged; the
    4/6 defaults sit just above the deepest troughs a 2-minute
    Gaussian delta background produces (measured ~3.6 sigma), so
    prefer ABSOLUTE microvolt criteria (Massimini: 40 uV trough,
    75 uV peak-to-peak) whenever units are known.
    ``peak_amp`` is the (negative) trough amplitude; ``freq`` the full
    trough-to-positive-phase-end cycle frequency.
    """
    x = jnp.asarray(x, jnp.float32)
    if x.shape[-1] < 4 * sfreq / float(freq_range[0]):
        raise ValueError("recording too short for the delta band")
    both_given = (amp_neg is None) == (amp_ptp is None)
    if not both_given:
        raise ValueError("give both amp_neg and amp_ptp, or neither")
    fn = partial(_so_row, sfreq=float(sfreq),
                 f_lo=float(freq_range[0]), f_hi=float(freq_range[1]),
                 kmax=int(kmax), dur_lo=float(duration_neg[0]),
                 dur_hi=float(duration_neg[1]),
                 neg_mult=float(neg_mult), ptp_mult=float(ptp_mult))
    amps = (None if amp_neg is None else jnp.float32(amp_neg),
            None if amp_ptp is None else jnp.float32(amp_ptp))
    for _ in range(x.ndim - 1):
        fn = jax.vmap(fn, in_axes=(0, None, None))
    tab = fn(x, amps[0], amps[1])
    if bool(jnp.any(tab.overflow)):
        raise ValueError(
            f"more than kmax={kmax} delta half-waves in at least one "
            "row — raise kmax (tables are cheap)")
    return tab
