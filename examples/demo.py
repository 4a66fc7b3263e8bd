"""Visual demo driver — the reference's ``test.py`` rebuilt (C18, SURVEY §4).

The reference dispatches eyeball checks by argv flag
(``/root/reference/ninwavelets/test.py:190-205``); same here, but figures
are saved to ``examples/out/`` (headless-friendly) instead of shown.

    python examples/demo.py sin          # 60 Hz sine -> Morse power heatmap
    python examples/demo.py wave         # wavelet shape plots
    python examples/demo.py cwt          # Morse vs Morlet side by side
    python examples/demo.py eeg FILE.fif # real-EEG end-to-end (needs mne)
    python examples/demo.py coherence    # epoch wavelet coherence (extension)
    python examples/demo.py icwt         # CWT -> inverse-CWT round trip
    python examples/demo.py bench        # quick wall-clock probe

Flags compose: ``python examples/demo.py sin interpolate``.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import ninwavelets_tpu as nw  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "out")


def make_example(length: float = 3.0) -> np.ndarray:
    """The reference's composite golden signal (``test.py:17-27``): 60 Hz
    sine + amplitude-modulated 160 Hz + time-windowed 300 Hz burst."""
    time_ax = np.arange(0, length, 0.001)
    burst_t = np.pad(np.arange(0, length / 2, 0.001),
                     [int(length * 250), int(length * 250)], 'constant')
    return (np.sin(time_ax * 60 * 2 * np.pi)
            + np.sin(time_ax * 160 * 2 * np.pi) * np.sin(time_ax * np.pi)
            + np.sin(burst_t * 300 * 2 * np.pi))


def _save(fig_or_ax, name: str) -> None:
    import matplotlib.pyplot as plt
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name)
    plt.gcf().savefig(path, dpi=120)
    plt.close('all')
    print("wrote", path)


def demo_sin(interpolate: bool) -> None:
    """README headline: Morse power of a 60 Hz sine (``test.py:30-39``)."""
    morse = nw.Morse(1000, interpolate=interpolate)
    sin = np.sin(np.arange(0, 3, 0.001) * 60 * 2 * np.pi)
    power = np.asarray(morse.power(sin, range(1, 100)))
    nw.plot_tf(power, show=False)
    _save(None, "sin_morse_power.png")
    peak = int(np.argmax(power.mean(-1))) + 1
    print(f"peak analysis frequency: {peak} Hz (expect 60)")


def demo_wave(interpolate: bool) -> None:
    """Wavelet shape plots (``test.py:42-78``)."""
    for w, freq in [(nw.Morse(1000, interpolate=interpolate), 10.0),
                    (nw.Morlet(1000, interpolate=interpolate), 10.0),
                    (nw.MexicanHat(1000, interpolate=interpolate), 10.0)]:
        name = type(w).__name__
        w.plot(freq, show=False)
        _save(None, f"wavelet_{name.lower()}.png")
        wl = np.asarray(w.make_wavelets([freq])[0])
        print(f"{name}: |w| = {np.linalg.norm(wl):.4f}, len = {wl.shape[0]}")


def demo_cwt(interpolate: bool) -> None:
    """Morse vs Morlet power heatmaps on the golden signal
    (``test.py:95-123``)."""
    import matplotlib.pyplot as plt
    sig = make_example(3.0)
    freqs = range(1, 500)
    fig, axes = plt.subplots(2, 1, figsize=(8, 8))
    for ax, w in zip(axes, [nw.Morse(1000, interpolate=interpolate),
                            nw.Morlet(1000, interpolate=interpolate)]):
        p = np.asarray(w.power(sig, freqs))
        ax.imshow(p, aspect='auto', origin='lower', cmap='RdBu_r')
        ax.set_title(type(w).__name__)
    _save(None, "cwt_morse_vs_morlet.png")


def demo_eeg(path: str, interpolate: bool) -> None:
    """Real-EEG end-to-end: Baseline zscore + Morse power + plot_tf
    (``test.py:170-187``; the reference hardcodes a personal path — here it
    is an argument)."""
    import mne
    raw = mne.io.read_raw_fif(path, preload=True)
    sfreq = raw.info['sfreq']
    data = raw.get_data()[0]
    corrected = np.asarray(
        nw.Baseline(data, sfreq, 0, 0.2).zscore())
    morse = nw.Morse(sfreq, interpolate=interpolate)
    power = np.asarray(morse.power(corrected[:int(3 * sfreq)],
                                   range(1, 100)))
    nw.plot_tf(power, sfreq, show=False)
    _save(None, "eeg_morse_power.png")


def demo_coherence(interpolate: bool) -> None:
    """Extension demo: epoch-wise wavelet coherence between two channels
    sharing a lagged 40 Hz component."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.extensions import epoch_coherence_from_bank
    rng = np.random.default_rng(0)
    t = np.arange(1000) / 1000.0
    common = np.sin(2 * np.pi * 40 * t)
    a = (common[None] + 0.7 * rng.standard_normal((20, 1000))).astype(
        np.float32)
    b = (np.sin(2 * np.pi * 40 * (t - 0.004))[None]
         + 0.7 * rng.standard_normal((20, 1000))).astype(np.float32)
    morse = nw.Morse(1000, interpolate=interpolate)
    bank = make_fft_bank(morse._wdef(), jnp.arange(5.0, 100.0), 1000,
                         1000.0, interpolate)
    coh = np.asarray(epoch_coherence_from_bank(jnp.asarray(a),
                                               jnp.asarray(b), bank,
                                               interpolate))
    plt.figure()
    plt.imshow(coh, aspect='auto', origin='lower', vmin=0, vmax=1,
               cmap='viridis')
    plt.colorbar(label='coherence')
    plt.title('epoch wavelet coherence (40 Hz shared component)')
    _save(None, "coherence.png")
    print(f"coherence at 40 Hz row: {coh[35, 200:800].mean():.3f} "
          "(expect high); background:", f"{np.median(coh):.3f}")


def demo_icwt(interpolate: bool) -> None:
    """Extension demo: reconstruct the golden signal from its CWT."""
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.cwt import cwt_from_bank
    from ninwavelets_tpu.ops.icwt import icwt_from_bank
    sig = make_example(1.0).astype(np.float32)
    morse = nw.Morse(1000, interpolate=interpolate)
    bank = make_fft_bank(morse._wdef(), jnp.arange(5.0, 400.0), 1000,
                         1000.0, interpolate)
    c = cwt_from_bank(jnp.asarray(sig), bank, interpolate)
    rec = np.asarray(icwt_from_bank(c, bank).real)
    err = np.abs(rec - sig).max()
    plt.figure(figsize=(9, 4))
    plt.plot(sig[:400], label='original')
    plt.plot(rec[:400], '--', label='reconstructed')
    plt.legend(); plt.title(f'inverse CWT round trip (max err {err:.2e})')
    _save(None, "icwt_roundtrip.png")
    print(f"icwt max err: {err:.2e}")


def demo_bench(interpolate: bool) -> None:
    """Quick wall-clock probe, reference README workload
    (``README.md:455-465``)."""
    import jax
    morse = nw.Morse(1000, interpolate=interpolate)
    for seconds in (1, 50):
        sig = np.sin(np.arange(0, seconds, 0.001) * 60 * 2 * np.pi)
        p = morse.power(sig, range(1, 100), reuse=False)   # warm compile
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        jax.block_until_ready(morse.power(sig, range(1, 100)))
        dt = time.perf_counter() - t0
        print(f"{seconds:3d} s signal: {dt:.4f} s "
              f"(reference numpy: {'0.872' if seconds == 1 else '15.9'} s)")


def main(argv) -> None:
    interpolate = 'interpolate' in argv
    if 'sin' in argv:
        demo_sin(interpolate)
    if 'wave' in argv:
        demo_wave(interpolate)
    if 'cwt' in argv:
        demo_cwt(interpolate)
    if 'eeg' in argv:
        fifs = [a for a in argv if a.endswith('.fif')]
        if not fifs:
            sys.exit("usage: demo.py eeg /path/to/recording.fif")
        demo_eeg(fifs[0], interpolate)
    if 'coherence' in argv:
        demo_coherence(interpolate)
    if 'icwt' in argv:
        demo_icwt(interpolate)
    if 'bench' in argv:
        demo_bench(interpolate)
    if not any(k in argv for k in ('sin', 'wave', 'cwt', 'eeg', 'coherence',
                                   'icwt', 'bench')):
        print(__doc__)


if __name__ == '__main__':
    import matplotlib
    matplotlib.use('Agg')
    main(sys.argv[1:])
