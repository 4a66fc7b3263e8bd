"""Riemannian geometry of covariance matrices: AIRM distances, the
geometric (Karcher) mean, tangent-space features, and the two standard
covariance classifiers (MDM, tangent-space LDA).

No reference counterpart — this is the pyRiemann workflow (Barachant
2012), the state-of-the-art feature space for motor-imagery BCI and a
strong complement to the CSP pipeline in ``ops/decoding.py``: trial
covariances live on the SPD manifold, and respecting its geometry
(affine-invariant metric) instead of flattening them Euclidean-style is
worth real accuracy at low trial counts.

TPU design: every manifold primitive reduces to a batched ``eigh`` on
tiny (C, C) Hermitian stacks —

* ``logm``/``expm``/``sqrtm`` transform the eigenvalues and sandwich
  back (one eigh + two matmuls each, batched over trials);
* the Karcher mean is the classical fixed point ``G <- G^{1/2}
  exp(mean_k log(G^{-1/2} C_k G^{-1/2})) G^{1/2}`` run a fixed number
  of ``lax.scan`` steps (quadratic convergence — 15 is plenty);
* tangent vectors are upper-triangle flattenings with sqrt(2)
  off-diagonal weights so the Euclidean inner product equals the
  manifold metric at the reference;
* everything runs at HIGHEST matmul precision (the repo rule for any
  path feeding eigensolves/inverses).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["epoch_covariances", "spd_logm", "spd_expm", "spd_sqrtm",
           "riemannian_distance", "riemannian_mean", "tangent_space",
           "mdm_decode", "tangent_decode"]

_HP = jax.lax.Precision.HIGHEST


def epoch_covariances(x, shrink=0.05) -> jnp.ndarray:
    """(E, C, N) -> (E, C, C) per-trial covariance with shrinkage
    toward the scaled identity — keeps every trial SPD even when
    N < C.  ``shrink`` is either a fixed relative weight (of the
    average eigenvalue) or ``"lw"`` for the per-trial analytic
    Ledoit–Wolf intensity (``ops.spatial.ledoit_wolf``, pyRiemann's
    ``lwf`` estimator — self-calibrating across trial lengths)."""
    x = jnp.asarray(x, jnp.float32)
    if x.ndim != 3:
        raise ValueError("x must be (E, C, N)")
    if isinstance(shrink, str):
        if shrink != "lw":
            raise ValueError("shrink must be a float or 'lw'")
        from .spatial import _lw_jit
        return jax.vmap(lambda e: _lw_jit(e)[0])(x)
    xm = x - jnp.mean(x, axis=-1, keepdims=True)
    c = jnp.einsum("ecn,edn->ecd", xm, xm, precision=_HP) / x.shape[-1]
    tr = jnp.trace(c, axis1=-2, axis2=-1) / x.shape[1]
    eye = jnp.eye(x.shape[1], dtype=c.dtype)
    return (1.0 - shrink) * c + shrink * tr[:, None, None] * eye


def _eig_fn(p, fn):
    d, v = jnp.linalg.eigh(p)
    d = jnp.maximum(d, 1e-12 * d[..., -1:])
    return jnp.einsum("...ij,...j,...kj->...ik", v, fn(d), v,
                      precision=_HP)


def spd_logm(p) -> jnp.ndarray:
    """Batched matrix logarithm of SPD stacks (eigh-based)."""
    return _eig_fn(jnp.asarray(p, jnp.float32), jnp.log)


def spd_expm(p) -> jnp.ndarray:
    """Batched matrix exponential of symmetric stacks."""
    p = jnp.asarray(p, jnp.float32)
    d, v = jnp.linalg.eigh(p)
    return jnp.einsum("...ij,...j,...kj->...ik", v, jnp.exp(d), v,
                      precision=_HP)


def spd_sqrtm(p) -> jnp.ndarray:
    """Batched matrix square root of SPD stacks (and its inverse via
    ``spd_sqrtm(p) @ x`` patterns — see ``_isqrtm``)."""
    return _eig_fn(jnp.asarray(p, jnp.float32), jnp.sqrt)


def _isqrtm(p):
    return _eig_fn(p, lambda d: 1.0 / jnp.sqrt(d))


def riemannian_distance(a, b) -> jnp.ndarray:
    """Affine-invariant distance ``|| logm(A^{-1/2} B A^{-1/2}) ||_F``
    between SPD stacks (broadcasting batch dims): congruence-invariant
    (``d(WAW', WBW') = d(A, B)``), the geodesic metric the mean and
    classifiers below use."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ia = _isqrtm(a)
    m = jnp.einsum("...ij,...jk,...kl->...il", ia, b, ia, precision=_HP)
    lg = spd_logm(m)
    return jnp.sqrt(jnp.sum(lg * lg, axis=(-2, -1)))


@partial(jax.jit, static_argnames=("n_iter",))
def _karcher_jit(covs, weights, *, n_iter):
    g0 = jnp.einsum("e,ecd->cd", weights, covs, precision=_HP)

    def step(g, _):
        # one eigh serves both the sqrt and inverse-sqrt factors
        d, v = jnp.linalg.eigh(g)
        d = jnp.maximum(d, 1e-12 * d[..., -1:])
        gs = jnp.einsum("ij,j,kj->ik", v, jnp.sqrt(d), v, precision=_HP)
        gis = jnp.einsum("ij,j,kj->ik", v, 1.0 / jnp.sqrt(d), v,
                         precision=_HP)
        m = jnp.einsum("ij,ejk,kl->eil", gis, covs, gis, precision=_HP)
        t = jnp.einsum("e,ecd->cd", weights, spd_logm(m), precision=_HP)
        g_new = jnp.einsum("ij,jk,kl->il", gs, spd_expm(t), gs,
                           precision=_HP)
        return 0.5 * (g_new + g_new.T), None       # re-symmetrize

    g, _ = lax.scan(step, 0.5 * (g0 + g0.T), None, length=n_iter)
    return g


def riemannian_mean(covs, weights=None, n_iter: int = 15) -> jnp.ndarray:
    """Karcher (geometric) mean of an (E, C, C) SPD stack under the
    affine-invariant metric — the fixed point where the weighted
    tangent vectors sum to zero.  ``weights`` default uniform."""
    covs = jnp.asarray(covs, jnp.float32)
    if covs.ndim != 3 or covs.shape[-1] != covs.shape[-2]:
        raise ValueError("covs must be (E, C, C)")
    e = covs.shape[0]
    if weights is None:
        weights = jnp.full((e,), 1.0 / e, jnp.float32)
    else:
        weights = jnp.asarray(weights, jnp.float32)
        weights = weights / jnp.sum(weights)
    return _karcher_jit(covs, weights, n_iter=int(n_iter))


def tangent_space(covs, ref) -> jnp.ndarray:
    """Project an (E, C, C) SPD stack to the tangent space at ``ref``:
    ``S_e = logm(ref^{-1/2} C_e ref^{-1/2})`` flattened to the upper
    triangle with sqrt(2)-weighted off-diagonals — (E, C(C+1)/2)
    Euclidean features whose inner product matches the manifold metric
    at the reference (Barachant's tangent-space mapping)."""
    covs = jnp.asarray(covs, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    ir = _isqrtm(ref)
    m = jnp.einsum("ij,ejk,kl->eil", ir, covs, ir, precision=_HP)
    s = spd_logm(m)
    c = s.shape[-1]
    iu, ju = np.triu_indices(c)
    w = np.where(iu == ju, 1.0, np.sqrt(2.0)).astype(np.float32)
    return s[:, iu, ju] * w[None, :]


def _fold_ids(e, n_folds):
    return np.mod(np.arange(e), n_folds)


def _karcher_masked(covs, w, n_iter):
    """Weighted Karcher mean with the weights already normalized —
    traced inline inside the CV jits (a zero weight excludes a trial
    exactly: the fixed-point update never sees it)."""
    return _karcher_jit(covs, w / jnp.sum(w), n_iter=n_iter)


@partial(jax.jit, static_argnames=("n_folds", "n_iter"))
def _mdm_cv_jit(ca, cb, *, n_folds, n_iter):
    # folds ride a vmap (NOT a scan): nesting the fold loop around the
    # Karcher scan gives scan(scan(eigh)), which the TPU backend takes
    # unboundedly long to compile — vmapped folds keep one scan level
    # with batched (n_folds, C, C) eighs inside it.
    fold_a = jnp.arange(ca.shape[0]) % n_folds
    fold_b = jnp.arange(cb.shape[0]) % n_folds

    def fold(f):
        tr_a = (fold_a != f).astype(jnp.float32)
        tr_b = (fold_b != f).astype(jnp.float32)
        te_a, te_b = 1.0 - tr_a, 1.0 - tr_b
        ma = _karcher_masked(ca, tr_a, n_iter)
        mb = _karcher_masked(cb, tr_b, n_iter)
        daa = riemannian_distance(ca, ma[None])
        dab = riemannian_distance(ca, mb[None])
        dba = riemannian_distance(cb, ma[None])
        dbb = riemannian_distance(cb, mb[None])
        correct = (jnp.sum(te_a * (daa < dab))
                   + jnp.sum(te_b * (dbb < dba)))
        return correct, jnp.sum(te_a) + jnp.sum(te_b)

    correct, total = jax.vmap(fold)(jnp.arange(n_folds))
    return jnp.sum(correct) / jnp.sum(total)


def mdm_decode(xa, xb, n_folds: int = 5, shrink: float = 0.05,
               n_iter: int = 15):
    """Cross-validated MDM (minimum distance to Riemannian mean)
    accuracy between two-class epochs (Ea, C, N) vs (Eb, C, N) —
    the pyRiemann baseline classifier: per fold, each class's Karcher
    mean from the training trials, held-out trials labeled by the
    smaller affine-invariant distance.  Returns scalar accuracy
    (0.5 = chance).

    The whole CV is one compiled program (folds VMAPPED with mask
    weights — a zero Karcher weight excludes a trial exactly; a fold
    scan would nest scan(scan(eigh)), which the TPU backend compiles
    pathologically slowly); the eager per-fold loop it replaces
    dispatched hundreds of tiny ops over the device link per call."""
    ca, cb, _, _, nf = _decode_setup(xa, xb, n_folds, shrink)
    return float(_mdm_cv_jit(ca, cb, n_folds=nf, n_iter=int(n_iter)))


@partial(jax.jit, static_argnames=("n_folds", "n_iter", "lam"))
def _tangent_cv_jit(ca, cb, *, n_folds, n_iter, lam):
    # vmapped folds, not a fold scan — see _mdm_cv_jit
    from .decoding import decode_auc
    fold_a = jnp.arange(ca.shape[0]) % n_folds
    fold_b = jnp.arange(cb.shape[0]) % n_folds
    covs = jnp.concatenate([ca, cb], 0)

    def fold(f):
        tr_a = (fold_a != f).astype(jnp.float32)
        tr_b = (fold_b != f).astype(jnp.float32)
        ref = _karcher_masked(covs, jnp.concatenate([tr_a, tr_b]),
                              n_iter)
        fa, fb = tangent_space(ca, ref), tangent_space(cb, ref)
        na, nb = jnp.sum(tr_a), jnp.sum(tr_b)
        mu_a = jnp.einsum("e,ek->k", tr_a, fa, precision=_HP) / na
        mu_b = jnp.einsum("e,ek->k", tr_b, fb, precision=_HP) / nb
        da, db = fa - mu_a, fb - mu_b
        cov = (jnp.einsum("e,ek,el->kl", tr_a, da, da, precision=_HP)
               + jnp.einsum("e,ek,el->kl", tr_b, db, db, precision=_HP)) \
            / jnp.maximum(na + nb - 2.0, 1.0)
        cov = cov + lam * jnp.trace(cov) / cov.shape[0] \
            * jnp.eye(cov.shape[0])
        wvec = jnp.linalg.solve(cov, mu_a - mu_b)
        return decode_auc(fa @ wvec, fb @ wvec, 1.0 - tr_a, 1.0 - tr_b)

    return jnp.mean(jax.vmap(fold)(jnp.arange(n_folds)))


def tangent_decode(xa, xb, n_folds: int = 5, shrink: float = 0.05,
                   n_iter: int = 15, lam: float = 1e-3):
    """Cross-validated tangent-space LDA AUC between two-class epochs:
    per fold, the POOLED training trials' Karcher mean is the tangent
    reference, both classes map to tangent vectors, and a ridge LDA
    scores the held-out trials (ROC AUC, 0.5 = chance) — Barachant's
    tangent-space pipeline, usually the strongest linear decoder on
    motor-imagery covariances.

    One compiled program for the full CV (masked folds VMAPPED — see
    :func:`mdm_decode` for why not a scan — with weighted LDA moments):
    numerically identical to a per-fold loop (the weighted Karcher
    init is the same weighted sum the train-subset init would be) but
    without the per-fold eager dispatch that made this a 38-second
    call on a tunneled device."""
    ca, cb, _, _, nf = _decode_setup(xa, xb, n_folds, shrink)
    return float(_tangent_cv_jit(ca, cb, n_folds=nf, n_iter=int(n_iter),
                                 lam=float(lam)))


def _decode_setup(xa, xb, n_folds, shrink):
    xa = jnp.asarray(xa, jnp.float32)
    xb = jnp.asarray(xb, jnp.float32)
    if xa.ndim != 3 or xb.ndim != 3 or xa.shape[1:] != xb.shape[1:]:
        raise ValueError("expected (Ea, C, N) and (Eb, C, N) with "
                         "matching (C, N)")
    nf = int(n_folds)
    if min(xa.shape[0], xb.shape[0]) < nf:
        raise ValueError("need at least n_folds trials per class")
    ca = epoch_covariances(xa, shrink)
    cb = epoch_covariances(xb, shrink)
    return ca, cb, _fold_ids(xa.shape[0], nf), _fold_ids(xb.shape[0],
                                                         nf), nf
