"""Adaptive decomposition walkthrough: EWT, VMD, MVMD, Hilbert-Huang
attributes, and the Stockwell transform on a known multicomponent signal.

    python examples/decomposition_demo.py          # prints a summary
    python examples/decomposition_demo.py --plot   # + figure into out/

Ground truth: 20 Hz tone + 60 Hz tone + a 120->180 Hz linear chirp,
plus noise.  The chirp is what separates the methods: the EWT's hard
spectral segmentation smears it across bands, VMD (with a bandwidth
penalty loose enough for a 60 Hz sweep) tracks it as one drifting mode,
and the Hilbert spectrum of the VMD modes draws its instantaneous
frequency as a sharp line.
"""
import sys

import numpy as np

from ninwavelets_tpu.ops import ewt as ew
from ninwavelets_tpu.ops import vmd as vm
from ninwavelets_tpu.ops import stockwell  # noqa: E402

SFREQ = 1000.0
N = 4096


def make_signal(seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(N) / SFREQ
    tone20 = np.sin(2 * np.pi * 20 * t)
    tone60 = np.sin(2 * np.pi * 60 * t)
    k = (180.0 - 120.0) / t[-1]
    chirp = np.sin(2 * np.pi * (120.0 * t + 0.5 * k * t ** 2))
    sig = tone20 + tone60 + chirp + 0.1 * rng.standard_normal(N)
    return sig.astype(np.float32), t


def main(plot: bool = False) -> None:
    sig, t = make_signal()

    # --- EWT: hard segmentation at detected boundaries -------------------
    modes_e, bounds = ew.ewt(sig, SFREQ, n_modes=3)
    rec = np.asarray(ew.ewt_reconstruct(modes_e))
    print(f"EWT boundaries: {np.round(bounds, 1)} Hz; "
          f"reconstruction max err {np.abs(rec - sig).max():.2e}")

    # --- VMD: modes and center frequencies converge jointly --------------
    modes_v, w = vm.vmd(sig, SFREQ, n_modes=3, alpha=200.0, n_iter=300)
    modes_v, w = np.asarray(modes_v), np.asarray(w)
    print(f"VMD center frequencies: {np.round(w, 1)} Hz "
          f"(truth: 20, 60, ~150 time-mean of the chirp)")

    # --- Hilbert-Huang attributes of the VMD modes ------------------------
    if_hz, amp = vm.instantaneous(modes_v, SFREQ, smooth=31)
    if_hz = np.asarray(if_hz)
    sl = slice(N // 8, -N // 8)
    print("instantaneous frequency (interior mean/drift):")
    for k_i in range(3):
        row = if_hz[k_i][sl]
        print(f"  mode {k_i}: {row.mean():7.1f} Hz, "
              f"drift {row.max() - row.min():6.1f} Hz")

    # --- MVMD: one shared mode index across channels ----------------------
    two_ch = np.stack([sig, np.roll(sig, 17)])
    mv_modes, mv_w = vm.mvmd(two_ch, SFREQ, n_modes=3, alpha=200.0,
                             n_iter=300)
    print(f"MVMD shared centers: {np.round(np.asarray(mv_w), 1)} Hz "
          f"(modes {np.asarray(mv_modes).shape})")

    # --- Stockwell transform ----------------------------------------------
    st_freqs = np.arange(10.0, 250.0, 10.0)
    st = stockwell(sig, st_freqs, SFREQ)
    p = np.abs(st) ** 2
    ridge = st_freqs[p[:, sl].argmax(0)]
    print(f"Stockwell ridge spans {ridge.min():.0f}-{ridge.max():.0f} Hz "
          f"(chirp + tones)")

    if plot:
        import pathlib

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        hs = np.asarray(vm.hilbert_spectrum(modes_v, SFREQ, n_bins=100,
                                            fmax=250.0, smooth=31))
        fig, axes = plt.subplots(2, 2, figsize=(11, 7))
        for k_i in range(3):
            axes[0, 0].plot(t, np.asarray(modes_v)[k_i] + 3.0 * k_i,
                            lw=0.5)
        axes[0, 0].set_title("VMD modes (offset)")
        axes[0, 1].imshow(np.log1p(hs), aspect="auto", origin="lower",
                          extent=[0, N / SFREQ, 0, 250])
        axes[0, 1].set_title("Hilbert spectrum (VMD modes)")
        axes[1, 0].imshow(np.log1p(p), aspect="auto", origin="lower",
                          extent=[0, N / SFREQ, 10, 250])
        axes[1, 0].set_title("Stockwell spectrogram")
        filters = np.asarray(ew.ewt_filterbank(bounds, N, SFREQ))
        om = np.arange(N // 2 + 1) * SFREQ / N
        for f_row in filters:
            axes[1, 1].plot(om, f_row, lw=0.8)
        axes[1, 1].set_xlim(0, 250)
        axes[1, 1].set_title("EWT filterbank")
        fig.tight_layout()
        out = pathlib.Path(__file__).parent / "out"
        out.mkdir(exist_ok=True)
        fig.savefig(out / "decomposition_demo.png", dpi=110)
        print(f"figure -> {out / 'decomposition_demo.png'}")


if __name__ == "__main__":
    main(plot="--plot" in sys.argv[1:])
