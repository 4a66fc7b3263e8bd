"""Single-chip streaming CWT for recordings too long for one FFT.

BASELINE config 4 is a 10-minute 1 kHz recording (600k samples): the
reference would run one 600k-point host FFT per frequency-batch
(``/root/reference/ninwavelets/base.py:399``); the multi-chip path shards
time across a mesh (``parallel.chunked``).  This module is the *sequential*
counterpart for one chip / host pipelines: overlap-discard convolution over
fixed-size windows, one compiled program reused for every window, O(window)
device memory regardless of recording length.

Same math as ``parallel.chunked``: each window is extended by ``halo``
samples of real signal on both sides, convolved against a bank synthesized
at the extended length, and the halo regions are discarded — interiors match
the whole-signal transform to float32 for any wavelet whose time support
fits in the halo (see ``halo_samples``).
"""
from __future__ import annotations

from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bank import WaveletDef, make_fft_bank_ri
from ..ops.cwt import _as_bank
from ..ops.grids import analytic_mask
from .chunked import halo_samples, pow2_halo


@partial(jax.jit, static_argnames=("halo", "interpolate"))
def _window_power(ext_window, bank_r, bank_i=None, *, halo: int,
                  interpolate: bool = False):
    """|cwt|^2 of one extended window, halos discarded: (..., L+2h) -> (..., F, L)."""
    bank = _as_bank(bank_r, bank_i)
    spec = jnp.fft.fft(ext_window.astype(jnp.complex64))
    if interpolate:
        spec = spec * analytic_mask(ext_window.shape[-1], jnp.float32)
    c = jnp.fft.ifft(spec[..., None, :] * bank)
    p = jnp.square(c.real) + jnp.square(c.imag)
    return p[..., halo:p.shape[-1] - halo]


class StreamingCWT:
    """Overlap-discard streaming power TFR over an arbitrarily long signal.

    Parameters
    ----------
    wdef: the wavelet definition (``WaveletBase._wdef()`` or a raw
        ``WaveletDef``) — must be a Reverse/Both-mode family.
    freqs: analysis frequencies (Hz).
    sfreq: sampling frequency (Hz).
    window: window length in samples (compiled once; power of two keeps the
        FFT fast).
    halo: overlap in samples; default derives it from the wavelet's envelope
        decay at the lowest analysis frequency.  Either way the halo is then
        rounded UP so the extended window is a power of two — XLA lowers
        non-power-of-two FFT lengths on TPU to a dense O(N^2) DFT matmul.
    interpolate: the reference's analytic / Nyquist-alias trick.
    """

    def __init__(self, wdef: WaveletDef, freqs, sfreq: float,
                 window: int = 65536, halo: Optional[int] = None,
                 interpolate: bool = False, halo_tol: float = 1e-4) -> None:
        self.wdef = wdef
        self.freqs = np.asarray(freqs, dtype=np.float32)
        self.sfreq = float(sfreq)
        self.window = int(window)
        if halo is None:
            halo = halo_samples(wdef, float(self.freqs.min()), self.sfreq,
                                tol=halo_tol)
        if halo >= self.window:
            raise ValueError(f"halo {halo} must be smaller than the window "
                             f"{self.window}; raise `window` or `halo_tol`")
        halo = pow2_halo(self.window, int(halo))
        self.halo = int(halo)
        self.interpolate = interpolate
        # Jitted float-boundary builder: eager .real/.imag on a complex bank
        # would hit the TPU runtime's unsupported eager-complex path.
        self._bank = make_fft_bank_ri(wdef, jnp.asarray(self.freqs),
                                      self.window + 2 * self.halo, self.sfreq,
                                      interpolate)

    def blocks(self, signal: np.ndarray) -> Iterator[Tuple[int, np.ndarray]]:
        """Yield ``(start_sample, (F, block_len) power)`` blocks in order.

        The signal is consumed window by window; edges are zero-padded
        (linear convolution at the global boundary, like the chunked mesh
        path).  The final block may be shorter than ``window``.
        """
        signal = np.asarray(signal, dtype=np.float32)
        n = signal.shape[-1]
        h, w = self.halo, self.window
        for start in range(0, n, w):
            stop = min(start + w, n)
            lo, hi = start - h, stop + h
            ext = np.zeros(w + 2 * h, dtype=np.float32)
            src_lo, src_hi = max(lo, 0), min(hi, n)
            ext[src_lo - lo:src_lo - lo + (src_hi - src_lo)] = (
                signal[src_lo:src_hi])
            block = _window_power(jnp.asarray(ext), self._bank[0],
                                  self._bank[1], halo=h,
                                  interpolate=self.interpolate)
            yield start, np.asarray(block)[..., :stop - start]

    def power(self, signal: np.ndarray) -> np.ndarray:
        """Full (F, N) power TFR assembled on host from streamed blocks."""
        signal = np.asarray(signal, dtype=np.float32)
        out = np.empty((self.freqs.shape[0], signal.shape[-1]),
                       dtype=np.float32)
        for start, block in self.blocks(signal):
            out[:, start:start + block.shape[-1]] = block
        return out
