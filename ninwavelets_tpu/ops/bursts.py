"""Oscillatory burst detection and statistics on single-trial TFRs
(the beta-burst methodology of Shin, Law, Tsutsui, Moore & Jones,
eLife 2017: transient suprathreshold events, not sustained rhythms,
carry most task effects).

No reference counterpart.  A burst is a 4-connected suprathreshold
component of one trial's (F, N) power plane above ``factor`` x the
median power of its frequency row (medians taken across trials and
time, the standard normalization).  Every per-burst statistic here is a
scatter reduction over the component labels that
``ops.cluster.label_components`` already computes batched on device:
count (roots), duration (scatter-min/max of the time index), frequency
span, peak power (scatter-max) — so the whole analysis is one compiled
program per epoch batch, with only the per-epoch summaries (or the
compact host burst table) leaving the device.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .cluster import label_components

__all__ = ["burst_threshold", "burst_summary", "burst_table",
           "BurstSummary"]


def burst_threshold(trials: jnp.ndarray, factor: float = 6.0):
    """(F,) burst threshold: ``factor`` x the median power of each
    frequency row across trials and time (Shin et al. use 6x median)."""
    trials = jnp.asarray(trials, jnp.float32)
    return factor * jnp.median(trials, axis=(0, -1))


class BurstSummary(NamedTuple):
    """Per-epoch burst statistics (all (E,) float arrays): ``count``,
    ``rate`` (bursts/s), ``mean_duration`` (s), ``mean_span`` (Hz),
    ``mean_peak`` (power units)."""
    count: jnp.ndarray
    rate: jnp.ndarray
    mean_duration: jnp.ndarray
    mean_span: jnp.ndarray
    mean_peak: jnp.ndarray


def _scatter(labels_flat, vals_flat, init, op):
    """Per-root scatter reduction into (E, FN + 1) bins."""
    e, fn = labels_flat.shape
    bins = jnp.full((e, fn + 1), init, vals_flat.dtype)
    rows = jnp.arange(e)[:, None]
    return getattr(bins.at[rows, labels_flat], op)(vals_flat)


@partial(jax.jit, static_argnames=("sfreq", "freq_step", "min_area"))
def _summary_jit(trials, threshold, *, sfreq, freq_step, min_area):
    e, f, n = trials.shape
    fn = f * n
    mask = trials > threshold[None, :, None]
    labels = label_components(mask)
    flat_l = labels.reshape(e, fn)
    is_root = (flat_l == jnp.arange(fn)[None, :]) & mask.reshape(e, fn)
    # discard spurious specks: component pixel area >= min_area
    areas = _scatter(flat_l, jnp.ones((e, fn), jnp.float32), 0.0,
                     "add")[:, :fn]
    is_root = is_root & (areas >= min_area)
    count = jnp.sum(is_root, -1).astype(jnp.float32)

    t_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32), (f, n))
    f_idx = jnp.broadcast_to(jnp.arange(f, dtype=jnp.float32)[:, None],
                             (f, n))
    big = jnp.float32(fn + 1)

    def spread(idx):
        v = jnp.broadcast_to(idx.reshape(1, fn), (e, fn))
        lo = _scatter(flat_l, v, big, "min")
        hi = _scatter(flat_l, v, -1.0, "max")
        return hi[:, :fn] - lo[:, :fn] + 1.0      # extent per root bin

    dur = spread(t_idx.reshape(fn)) / sfreq
    span = spread(f_idx.reshape(fn)) * freq_step
    peak = _scatter(flat_l, trials.reshape(e, fn), 0.0, "max")[:, :fn]

    root_bins = is_root  # (E, FN): which bins hold real bursts
    safe = jnp.maximum(count, 1.0)

    def mean_of(stat):
        return jnp.where(count > 0,
                         jnp.sum(jnp.where(root_bins, stat, 0.0), -1)
                         / safe, 0.0)

    seconds = n / sfreq
    return (count, count / seconds, mean_of(dur), mean_of(span),
            mean_of(peak))


def burst_summary(trials, threshold=None, sfreq: float = 1000.0,
                  freq_step: float = 1.0, factor: float = 6.0,
                  min_area: int = 1) -> BurstSummary:
    """Per-epoch burst statistics of (E, F, N) single-trial power planes.

    ``threshold`` is an (F,) row threshold (default: ``burst_threshold``
    with ``factor``); ``freq_step`` converts frequency-bin spans to Hz
    (the analysis grid's step); components smaller than ``min_area``
    pixels are discarded (single-pixel noise crossings are ubiquitous at
    the conventional 6x-median threshold).
    """
    trials = jnp.asarray(trials, jnp.float32)
    if trials.ndim != 3:
        raise ValueError("expected (epochs, F, N), got %s"
                         % (trials.shape,))
    if threshold is None:
        threshold = burst_threshold(trials, factor)
    out = _summary_jit(trials, jnp.asarray(threshold, jnp.float32),
                       sfreq=float(sfreq), freq_step=float(freq_step),
                       min_area=int(min_area))
    return BurstSummary(*out)


def burst_table(trials, threshold=None, sfreq: float = 1000.0,
                freqs=None, factor: float = 6.0,
                min_area: int = 1) -> list:
    """Host-side burst listing: one dict per detected burst with
    ``epoch``, ``t_start``/``t_stop`` (s), ``f_lo``/``f_hi`` (Hz when
    ``freqs`` is given, else row indices), ``peak`` power, ``area``
    (pixel count).  For plotting / downstream stats; the device does the
    labeling, the host only walks the roots.
    """
    trials = np.asarray(trials, np.float32)
    if threshold is None:
        threshold = np.asarray(burst_threshold(trials, factor))
    labels = np.asarray(label_components(
        trials > np.asarray(threshold)[None, :, None]))
    e, f, n = trials.shape
    freqs = np.arange(f, dtype=np.float64) if freqs is None \
        else np.asarray(freqs, np.float64)
    out = []
    for ep in range(e):
        lab = labels[ep]
        roots = np.unique(lab[lab < f * n])
        for r in roots:
            sel = lab == r
            if int(sel.sum()) < min_area:
                continue
            fi, ti = np.nonzero(sel)
            out.append({
                "epoch": ep,
                "t_start": float(ti.min() / sfreq),
                "t_stop": float((ti.max() + 1) / sfreq),
                "f_lo": float(freqs[fi.min()]),
                "f_hi": float(freqs[fi.max()]),
                "peak": float(trials[ep][sel].max()),
                "area": int(sel.sum()),
            })
    return out
