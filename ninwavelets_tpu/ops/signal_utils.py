"""Spectrum/signal shape helpers mirroring the reference's free functions.

Reference: ``/root/reference/ninwavelets/base.py:75-123`` (``pad_to``,
``hamming_window``, ``normalize``, ``interpolate_alias``) and the constants
at ``base.py:15`` — rebuilt as pure jnp functions with static shapes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

#: Reference constant (base.py:15) — unused there, kept for API parity.
MNE_CONSTANT = math.sqrt(2.0)


class SizeError(Exception):
    """Shape-mismatch error.  The reference version *prints* its message
    instead of raising with it (``base.py:71-72``) — fixed here to behave
    like a real exception (documented deviation).
    """


def pad_last_axis_to(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Canonical reference ``pad_to`` semantics (``base.py:75-82``) on the
    last axis: head-truncate if longer than ``n``, otherwise center-pad
    (the extra zero goes on the tail)."""
    x = jnp.asarray(x)
    m = x.shape[-1]
    if m == n:
        return x
    if m > n:
        return x[..., :n]
    side1 = (n - m) // 2
    side2 = n - m - side1
    pad = [(0, 0)] * (x.ndim - 1) + [(side1, side2)]
    return jnp.pad(x, pad)


def pad_to(wave_from: jnp.ndarray, wave_to: jnp.ndarray) -> jnp.ndarray:
    """Length-match ``wave_from`` to ``wave_to`` along the last axis
    (reference ``base.py:75-82``)."""
    return pad_last_axis_to(wave_from, jnp.asarray(wave_to).shape[-1])


def hamming_window(wave: jnp.ndarray) -> jnp.ndarray:
    """Hamming window sized to the wave (reference ``base.py:85-88``)."""
    length = jnp.asarray(wave).shape[-1]
    window = jnp.arange(length, dtype=jnp.float32) / length
    return 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * window)


def normalize(wave: jnp.ndarray, length: float) -> jnp.ndarray:
    """Scale a (complex) wave to the given L2 norm (reference
    ``base.py:91-104``; the reference's unused ``cuda`` flag is dropped).
    """
    wave = jnp.asarray(wave)
    return wave * (length / jnp.linalg.norm(wave))


def interpolate_alias(wave: jnp.ndarray) -> jnp.ndarray:
    """Zero everything at/above the Nyquist bin — keep the lower half of the
    spectrum, zero the upper half.  Reference: ``base.py:107-123``.  Works on
    the last axis of any batch shape.
    """
    wave = jnp.asarray(wave)
    n = wave.shape[-1]
    half = n // 2
    i = jnp.arange(n)
    return jnp.where(i < half, wave, jnp.zeros((), wave.dtype))
