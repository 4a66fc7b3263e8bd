"""2-D continuous wavelet transform: directional Morlet over images.

The reference's roadmap names "2D wavelet" as its one unbuilt item
(`/root/reference/README.md:524`); this module completes it on the
continuous side.  The analyzing family is the standard directional 2-D
Morlet (Antoine & Murenzi 1996): in the frequency domain

    psi_hat(k; s, theta) = exp(-sigma^2 |s k - k0 e_theta|^2 / 2),

a Gaussian blob centered at wavenumber ``omega0 / s`` along direction
``theta`` — each (scale, orientation) row responds to oriented
oscillation at one spatial frequency, the image analog of the 1-D
Morlet's time-frequency atom.  (The DC leak exp(-sigma^2 omega0^2 / 2)
is ~1e-7 at the omega0 = 5.5 default — the usual admissibility
approximation, same as the 1-D Morlet.)

TPU design: the whole (F, T)-bank transform is ONE batched fft2 /
ifft2 pair inside a cached jit — the bank multiplies a broadcast of the
image spectrum, exactly the 1-D engine's shape (``ops/cwt.py``) lifted
to two dimensions.  H and W must be powers of two (non-pow2 FFTs lower
to dense DFT matmuls on TPU — the CLAUDE.md rule); ``pow2_pad2`` wraps
reflect-padding for arbitrary sizes.  Boundaries are float pairs
(complex64 must never cross jit/host on the axon runtime).

Frequencies are in CYCLES PER PIXEL (Nyquist 0.5); scale
``s = omega0 / (2 pi f)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["morlet2d_bank", "cwt2", "power2d", "pow2_pad2"]

OMEGA0 = 5.5


@functools.lru_cache(maxsize=32)
def _bank_np(freqs_key: tuple, thetas_key: tuple, h: int, w: int,
             sigma: float, omega0: float) -> np.ndarray:
    """(F, T, H, W) float32 frequency-domain bank — cached NUMPY (the
    jit-boundary rule), peak value 1 at each row's center wavenumber."""
    ky = 2.0 * np.pi * np.fft.fftfreq(h)[:, None]     # radians / pixel
    kx = 2.0 * np.pi * np.fft.fftfreq(w)[None, :]
    rows = np.empty((len(freqs_key), len(thetas_key), h, w), np.float32)
    for i, f in enumerate(freqs_key):
        s = omega0 / (2.0 * np.pi * f)
        for j, th in enumerate(thetas_key):
            k0y, k0x = omega0 * np.sin(th), omega0 * np.cos(th)
            d2 = (s * kx - k0x) ** 2 + (s * ky - k0y) ** 2
            rows[i, j] = np.exp(-0.5 * sigma ** 2 * d2)
    return rows


def morlet2d_bank(freqs, thetas, h: int, w: int, sigma: float = 1.0,
                  omega0: float = OMEGA0) -> jnp.ndarray:
    """(F, T, H, W) real directional-Morlet bank for fft2-domain use."""
    fk = tuple(float(f) for f in np.atleast_1d(freqs))
    tk = tuple(float(t) for t in np.atleast_1d(thetas))
    if any(f <= 0 or f > 0.5 for f in fk):
        raise ValueError("freqs are cycles/pixel in (0, 0.5]")
    return jnp.asarray(_bank_np(fk, tk, int(h), int(w), float(sigma),
                                float(omega0)))


def pow2_pad2(img):
    """Reflect-pad the trailing two axes up to the next powers of two;
    returns ``(padded, (h, w))`` with the original sizes for cropping."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape[-2:]
    hp = 1 << max(int(np.ceil(np.log2(max(h, 2)))), 1)
    wp = 1 << max(int(np.ceil(np.log2(max(w, 2)))), 1)
    if (hp, wp) != (h, w):
        pad = [(0, 0)] * (img.ndim - 2) + [(0, hp - h), (0, wp - w)]
        img = jnp.pad(img, pad, mode="reflect")
    return img, (h, w)


@functools.partial(jax.jit, static_argnames=("power",))
def _cwt2_jit(img, bank, *, power: bool):
    spec = jnp.fft.fft2(img.astype(jnp.complex64))
    prod = spec[..., None, None, :, :] * bank          # (..., F, T, H, W)
    wv = jnp.fft.ifft2(prod)
    if power:
        return jnp.square(wv.real) + jnp.square(wv.imag)
    return wv.real, wv.imag


def _check_pow2(h: int, w: int):
    if h & (h - 1) or w & (w - 1):
        raise ValueError(
            f"H={h}, W={w} must be powers of two on TPU (non-pow2 FFTs "
            "lower to dense DFT matmuls); use pow2_pad2")


def cwt2(img, freqs, thetas=None, sigma: float = 1.0,
         omega0: float = OMEGA0):
    """Directional 2-D CWT of a real (..., H, W) image: returns the
    coefficient planes as a float pair ``(wr, wi)`` of shape
    (..., F, T, H, W).  ``thetas`` defaults to 6 orientations over
    [0, pi) (the transform of a real image at theta + pi is the
    conjugate — half the circle carries all the information)."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape[-2:]
    _check_pow2(h, w)
    if thetas is None:
        thetas = np.arange(6) * np.pi / 6.0
    bank = morlet2d_bank(freqs, thetas, h, w, sigma, omega0)
    return _cwt2_jit(img, bank, power=False)


def power2d(img, freqs, thetas=None, sigma: float = 1.0,
            omega0: float = OMEGA0) -> jnp.ndarray:
    """(..., F, T, H, W) scalogram ``|W|^2`` of :func:`cwt2`."""
    img = jnp.asarray(img, jnp.float32)
    h, w = img.shape[-2:]
    _check_pow2(h, w)
    if thetas is None:
        thetas = np.arange(6) * np.pi / 6.0
    bank = morlet2d_bank(freqs, thetas, h, w, sigma, omega0)
    return _cwt2_jit(img, bank, power=True)
