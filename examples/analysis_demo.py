"""End-to-end spectral-analysis walkthrough of the beyond-reference tools:
synchrosqueezing, ridge extraction, AR(1) significance, cone of influence
and the global wavelet spectrum — on the reference's golden composite
signal (``/root/reference/ninwavelets/test.py:17-27``: 60 Hz sine +
amplitude-modulated 160 Hz + a time-windowed 300 Hz burst).

    python examples/analysis_demo.py          # prints a summary
    python examples/analysis_demo.py --plot   # + four-panel figure
"""
import sys

import numpy as np
import jax.numpy as jnp

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import (coi_mask, efolding_times, global_spectrum,
                                 ridge_frequencies, significant_mask,
                                 ssq_power, tc_stats)
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.cwt import power as cwt_power

SFREQ = 1000.0


def make_example(seconds: float = 2.048) -> np.ndarray:
    """The reference's golden signal (test.py:17-27)."""
    t = np.arange(0.0, seconds, 1.0 / SFREQ)
    sin60 = np.sin(t * 60.0 * 2.0 * np.pi)
    am160 = np.sin(t * 160.0 * 2.0 * np.pi) * np.sin(t * 5.0 * 2.0 * np.pi)
    burst = np.sin(t * 300.0 * 2.0 * np.pi)
    burst[:int(0.3 * SFREQ)] = 0.0
    burst[int(0.6 * SFREQ):] = 0.0
    return (sin60 + am160 + burst).astype(np.float32)


def main(plot: bool = False) -> None:
    sig = make_example()
    n = sig.size
    freqs = np.arange(20.0, 350.0, 2.0)
    morse = nw.Morse(SFREQ)
    wdef = morse._wdef()
    bank = jnp.asarray(np.asarray(
        make_fft_bank(wdef, jnp.asarray(freqs, jnp.float32), n, SFREQ,
                      True), np.float32))

    power = cwt_power(jnp.asarray(sig), bank, interpolate=True)
    ssq = ssq_power(jnp.asarray(sig), bank, freqs, SFREQ)

    alpha = tc_stats.ar1_coefficient(sig)
    sig_mask = np.asarray(significant_mask(power, bank, SFREQ, alpha,
                                           float(np.var(sig))))
    tau = efolding_times(wdef, freqs, SFREQ)
    coi = coi_mask(n, SFREQ, tau)
    gs = np.asarray(global_spectrum(power, jnp.asarray(coi)))
    ridge = ridge_frequencies(np.asarray(power), freqs, penalty=0.5)

    p_np, s_np = np.asarray(power), np.asarray(ssq)
    print(f"signal: {n} samples @ {SFREQ:.0f} Hz, AR1 alpha = {alpha:.3f}")
    for f0 in (60.0, 160.0, 300.0):
        row = int(np.argmin(np.abs(freqs - f0)))
        print(f"  {f0:5.0f} Hz row: significant fraction "
              f"{sig_mask[row].mean():.2f}, global spectrum rank "
              f"{int((gs > gs[row]).sum()) + 1}")
    band = np.abs(freqs - 60.0) <= 4.0
    m = 200
    print(f"ssq 60 Hz concentration: "
          f"{s_np[band, m:-m].sum() / s_np[:, m:-m].sum():.2f} "
          f"(raw: {p_np[band, m:-m].sum() / p_np[:, m:-m].sum():.2f})")
    print(f"ridge (steady 60 Hz segment 1.0-2.0 s): "
          f"median {np.median(ridge[1000:2000]):.1f} Hz")

    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(2, 2, figsize=(12, 8))
        for ax, (img, title) in zip(
                axes.flat[:3],
                [(p_np, "power"), (s_np, "synchrosqueezed"),
                 (np.where(sig_mask & coi, p_np, np.nan),
                  "significant & inside COI")]):
            ax.imshow(img, aspect="auto", origin="lower", cmap="RdBu_r")
            ax.set_title(title)
        axes.flat[3].plot(freqs, gs)
        axes.flat[3].set_title("global wavelet spectrum (COI-masked)")
        fig.savefig("analysis_demo.png", dpi=100)
        print("wrote analysis_demo.png")


if __name__ == "__main__":
    main(plot="--plot" in sys.argv)
