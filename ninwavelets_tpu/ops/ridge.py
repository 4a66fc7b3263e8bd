"""Ridge extraction from time-frequency planes.

No reference counterpart.  Given a scalogram (raw power or the
synchrosqueezed plane from ``ops.sst``), recovers the dominant
instantaneous-frequency track as the max-energy path under a frequency-
jump penalty — the classic penalized dynamic program (Carmona, Hwang &
Torresani 1997), phrased TPU-natively: one ``lax.scan`` over time with an
(F, F) broadcast relaxation per step (F ~ 100, so the relaxation is a tiny
VPU op), and a reverse scan for the backtrack — no Python loops, no
data-dependent shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["extract_ridge", "ridge_frequencies"]


@partial(jax.jit, static_argnames=("penalty",))
def _ridge_indices(log_e: jnp.ndarray, penalty: float) -> jnp.ndarray:
    """(F, N) log-energy -> (N,) int32 row indices of the optimal path.

    Maximizes ``sum_t log_e[f_t, t] - penalty * (f_t - f_{t-1})^2`` (index
    units) by forward DP + backtrack.
    """
    n_f = log_e.shape[0]
    fi = jnp.arange(n_f)
    jump = penalty * jnp.square(fi[:, None] - fi[None, :])   # (to, from)

    def forward(score, col):
        # relax: best previous row for each current row
        cand = score[None, :] - jump                         # (to, from)
        best_prev = jnp.argmax(cand, axis=1)
        new_score = col + jnp.max(cand, axis=1)
        return new_score, best_prev

    first = log_e[:, 0]
    final, back = jax.lax.scan(forward, first, log_e[:, 1:].T)

    def backward(idx, prev_rows):
        idx = prev_rows[idx]
        return idx, idx

    last = jnp.argmax(final)
    _, rest = jax.lax.scan(backward, last, back, reverse=True)
    return jnp.concatenate([rest, jnp.array([last])]).astype(jnp.int32)


def extract_ridge(tf: jnp.ndarray, penalty: float = 0.5,
                  floor: float = 1e-30):
    """Dominant ridge of a (F, N) time-frequency plane.

    Args:
      tf: (F, N) nonnegative energy plane (power or synchrosqueezed).
      penalty: frequency-jump penalty in (log-energy per squared row-index)
        units; 0 reduces to per-column argmax, larger values force smoother
        tracks.

    Returns:
      (indices, refined): (N,) int32 row indices and (N,) float32
      sub-row-resolution positions from a parabolic fit of log-energy
      around the ridge (clamped to +-0.5 rows).
    """
    tf = jnp.asarray(tf)
    log_e = jnp.log(jnp.maximum(tf, floor))
    idx = _ridge_indices(log_e, float(penalty))

    n_f, n = tf.shape
    t = jnp.arange(n)
    up = jnp.minimum(idx + 1, n_f - 1)
    dn = jnp.maximum(idx - 1, 0)
    c = log_e[idx, t]
    l, r = log_e[dn, t], log_e[up, t]
    denom = l - 2.0 * c + r
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (l - r) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    # Edge rows have no two-sided neighborhood; keep the integer position.
    delta = jnp.where((idx == 0) | (idx == n_f - 1), 0.0, delta)
    return idx, idx.astype(jnp.float32) + delta


def ridge_frequencies(tf, freqs, penalty: float = 0.5) -> np.ndarray:
    """(N,) ridge in Hz: ``extract_ridge`` positions linearly interpolated
    onto the analysis-frequency grid (host convenience)."""
    freqs = np.asarray(freqs, np.float64)
    _, pos = extract_ridge(tf, penalty)
    pos = np.asarray(pos, np.float64)
    return np.interp(pos, np.arange(freqs.size), freqs)
