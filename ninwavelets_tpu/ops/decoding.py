"""Time-frequency decoding (MVPA): cross-validated two-class decoding
from the multichannel pattern at EVERY time-frequency pixel — the
wavelet-domain analog of MNE's SlidingEstimator / temporal decoding,
answering "WHEN and at WHICH frequency does the channel pattern carry
condition information".

No reference counterpart.  The per-pixel classifier is diagonal LDA
(shrinkage to the diagonal is the standard, and for C channels with few
trials the full covariance is unestimable anyway):

    w = (mu_1 - mu_0) / (pooled_var + lam),   score = w . x

evaluated with k-fold cross-validation and scored by ROC AUC on the
held-out trials.

Design notes (TPU):
* every pixel's classifier is fit and scored SIMULTANEOUSLY — the class
  means/variances are masked reductions over the trial axis and the AUC
  is a pairwise comparison matrix, so the whole CV loop is a fixed
  ``lax.scan`` over folds of elementwise work on (E, C, F, N) blocks;
* fold assignment is a static round-robin (deterministic, no RNG needed
  — trials are exchangeable under the null the caller tests against);
* only the (F, N) AUC map (and optional per-fold maps) leave the device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["tf_decode", "decode_auc", "temporal_generalization"]


def _masked_stats(x, keep):
    """Mean/variance over the trial axis using only ``keep`` trials:
    x (E, ...), keep (E,) -> ((...,), (...,), count)."""
    k = keep.reshape(keep.shape + (1,) * (x.ndim - 1))
    cnt = jnp.sum(keep)
    mean = jnp.sum(x * k, 0) / jnp.maximum(cnt, 1.0)
    var = jnp.sum(jnp.square(x - mean) * k, 0) / jnp.maximum(cnt - 1.0,
                                                             1.0)
    return mean, var, cnt


def decode_auc(scores_a, scores_b, valid_a, valid_b):
    """Held-out ROC AUC per pixel from decision scores: the fraction of
    (class-a, class-b) trial pairs ranked correctly (ties count half).
    scores_* (E, ...); valid_* (E,) mask the held-out trials.

    The pairwise comparison streams one class-a trial at a time through
    a ``lax.scan`` so memory stays O(Eb * plane) — a materialized
    (Ea, Eb, plane) tensor OOMs at ordinary trial counts."""
    ones = (1,) * (scores_b.ndim - 1)
    vb = valid_b.reshape(valid_b.shape + ones)

    def one_a(acc, ab):
        sa_i, va_i = ab
        diff = sa_i[None] - scores_b                    # (Eb, ...)
        wins = jnp.where(diff > 0, 1.0, jnp.where(diff == 0, 0.5, 0.0))
        return acc + va_i * jnp.sum(wins * vb, 0), None

    total, _ = lax.scan(one_a, jnp.zeros_like(scores_b[0]),
                        (scores_a, valid_a))
    n_pairs = jnp.maximum(jnp.sum(valid_a) * jnp.sum(valid_b), 1.0)
    return total / n_pairs


@partial(jax.jit, static_argnames=("n_folds", "lam", "vma_axes"))
def _tf_decode_jit(xa, xb, *, n_folds, lam, vma_axes=()):
    ea, eb = xa.shape[0], xb.shape[0]
    fold_a = jnp.arange(ea) % n_folds
    fold_b = jnp.arange(eb) % n_folds

    def fold(acc, f):
        tr_a = (fold_a != f).astype(jnp.float32)
        tr_b = (fold_b != f).astype(jnp.float32)
        te_a = 1.0 - tr_a
        te_b = 1.0 - tr_b
        m0, v0, n0 = _masked_stats(xa, tr_a)
        m1, v1, n1 = _masked_stats(xb, tr_b)
        pooled = ((n0 - 1.0) * v0 + (n1 - 1.0) * v1) \
            / jnp.maximum(n0 + n1 - 2.0, 1.0)
        w = (m0 - m1) / (pooled + lam)                  # (C, F, N)
        # no bias term: AUC depends only on score DIFFERENCES, so any
        # per-pixel threshold cancels in the pairwise comparison
        sa = jnp.einsum("ecfn,cfn->efn", xa, w)
        sb = jnp.einsum("ecfn,cfn->efn", xb, w)
        return acc + decode_auc(sa, sb, te_a, te_b), None

    init = jnp.zeros(xa.shape[2:], jnp.float32)
    if vma_axes:
        # shard_map scan carries must share the body's varying-axes type
        init = lax.pcast(init, tuple(vma_axes), to="varying")
    auc, _ = lax.scan(fold, init, jnp.arange(n_folds))
    return auc / n_folds


def tf_decode(xa, xb, n_folds: int = 5, lam: float = 1e-3) -> jnp.ndarray:
    """(F, N) cross-validated decoding AUC between two trial groups of
    single-trial feature planes (Ea, C, F, N) vs (Eb, C, F, N) —
    typically ``EpochsWavelet.single_trial_power_all`` outputs.

    Diagonal-LDA per pixel, ``n_folds``-fold round-robin CV, ROC AUC on
    held-out trials (0.5 = chance).  ``lam`` is the variance shrinkage
    floor (also guards zero-variance pixels).  Feature scale: AUC is
    invariant to monotone transforms of the score, but heavy-tailed
    power benefits from a log transform on the caller side.
    """
    xa = jnp.asarray(xa, jnp.float32)
    xb = jnp.asarray(xb, jnp.float32)
    if xa.ndim != 4 or xb.ndim != 4 or xa.shape[1:] != xb.shape[1:]:
        raise ValueError("expected (Ea, C, F, N) and (Eb, C, F, N) with "
                         "matching planes, got %s and %s"
                         % (xa.shape, xb.shape))
    if min(xa.shape[0], xb.shape[0]) < n_folds:
        raise ValueError("need at least n_folds trials per class")
    return _tf_decode_jit(xa, xb, n_folds=int(n_folds), lam=float(lam))


@partial(jax.jit, static_argnames=("n_folds", "lam"))
def _temporal_gen_jit(xa, xb, *, n_folds, lam):
    ea, eb = xa.shape[0], xb.shape[0]
    fold_a = jnp.arange(ea) % n_folds
    fold_b = jnp.arange(eb) % n_folds

    def fold(acc, f):
        tr_a = (fold_a != f).astype(jnp.float32)
        tr_b = (fold_b != f).astype(jnp.float32)
        te_a, te_b = 1.0 - tr_a, 1.0 - tr_b
        m0, v0, n0 = _masked_stats(xa, tr_a)
        m1, v1, n1 = _masked_stats(xb, tr_b)
        pooled = ((n0 - 1.0) * v0 + (n1 - 1.0) * v1) / jnp.maximum(
            n0 + n1 - 2.0, 1.0)
        w = (m0 - m1) / (pooled + lam)                 # (C, T) per train t
        # no bias: it cancels in decode_auc's pairwise differences
        sa = jnp.einsum("ecs,ct->ets", xa, w)
        sb = jnp.einsum("ecs,ct->ets", xb, w)
        return acc + decode_auc(sa, sb, te_a, te_b), None

    auc, _ = lax.scan(fold, jnp.zeros((xa.shape[-1], xa.shape[-1]),
                                      jnp.float32), jnp.arange(n_folds))
    return auc / n_folds


def temporal_generalization(xa, xb, n_folds: int = 5,
                            lam: float = 1e-3) -> jnp.ndarray:
    """(T, T) temporal generalization matrix (King & Dehaene 2014):
    ``out[t_train, t_test]`` is the cross-validated AUC of a diagonal-LDA
    decoder FIT on the channel pattern at ``t_train`` and TESTED at
    ``t_test``, from (Ea, C, T) vs (Eb, C, T) feature courses (e.g. a
    band's power per channel, decimated).  A diagonal-only matrix means
    a sequential code; a square block means a sustained, stable code.
    All T decoders fit simultaneously; every (train, test) pair scores
    in one einsum + pairwise-comparison tensor per fold.
    """
    xa = jnp.asarray(xa, jnp.float32)
    xb = jnp.asarray(xb, jnp.float32)
    if xa.ndim != 3 or xb.ndim != 3 or xa.shape[1:] != xb.shape[1:]:
        raise ValueError("expected (Ea, C, T) and (Eb, C, T) with "
                         "matching planes, got %s and %s"
                         % (xa.shape, xb.shape))
    if min(xa.shape[0], xb.shape[0]) < n_folds:
        raise ValueError("need at least n_folds trials per class")
    return _temporal_gen_jit(xa, xb, n_folds=int(n_folds),
                             lam=float(lam))
