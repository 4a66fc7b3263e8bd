"""Preprocess-to-states walkthrough: the full on-device cleaning loop
(notch -> bandpass -> ICA blink removal -> resample) followed by HMM
spectral-state segmentation and cycle-by-cycle waveform analysis.

    python examples/preprocess_demo.py

Ground truth: a 6-channel, 80-second recording alternating every 10 s
between an alpha (10 Hz) and a beta (25 Hz) regime, contaminated by
50 Hz line noise and a shared high-amplitude blink artifact.  The demo
prints what each stage removed/recovered so the whole chain is
checkable by eye.
"""
import numpy as np

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import cycle_features

SFREQ = 250.0
N = 1 << 14                      # ~65 s
C = 6


class ArrayRaw:
    def __init__(self, data, sfreq):
        self._data = data
        self.info = {"sfreq": sfreq}
        self.ch_names = [f"EEG {i}" for i in range(data.shape[0])]

    def get_data(self):
        return self._data


def make_recording(seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(N) / SFREQ
    regime = ((t // 10.0).astype(int) % 2).astype(np.float32)
    alpha = np.sin(2 * np.pi * 10.0 * t) * (1 - regime)
    beta = np.sin(2 * np.pi * 25.0 * t) * regime
    rhythm = alpha + beta
    line = 0.8 * np.sin(2 * np.pi * 50.0 * t)
    blink = np.zeros(N)
    for c0 in rng.integers(200, N - 200, 12):
        blink[c0:c0 + 80] += np.hanning(80)
    blink *= 10.0
    topo = np.linspace(1.0, 0.05, C)
    gains = rng.uniform(0.5, 1.0, C)
    x = (gains[:, None] * rhythm + line
         + topo[:, None] * blink
         + 0.2 * rng.standard_normal((C, N))).astype(np.float32)
    return x, regime, blink


def main() -> None:
    x, regime, blink = make_recording()
    raw = ArrayRaw(x, SFREQ)
    rw = nw.RawWavelet(raw, nw.Morse(SFREQ), window=4096)

    # 0. channel QC: kill one electrode, find it, spline-repair it
    xq = x.copy()
    xq[3] = 0.0
    rwq = nw.RawWavelet(ArrayRaw(xq, SFREQ), nw.Morse(SFREQ),
                        window=4096)
    qc = rwq.find_bad_channels()
    th = np.linspace(0, 2 * np.pi, x.shape[0], endpoint=False)
    pos = np.stack([np.cos(th) * 0.9, np.sin(th) * 0.9,
                    np.full(x.shape[0], 0.436)], 1)
    repaired = rwq.interpolate_bads(pos, qc["bads"])
    r = np.corrcoef(repaired[3], x[3])[0, 1]
    print(f"[qc]       bads {qc['bads']} -> spline repair corr "
          f"{r:.2f} vs the true channel")

    # 1. zero-phase cleanup: 50 Hz notch + 1-40 Hz bandpass
    filtered = rw.filter(f_lo=1.0, f_hi=40.0, notch_hz=50.0)
    line = np.sin(2 * np.pi * 50.0 * np.arange(N) / SFREQ)
    g_line = abs(filtered[0] @ line) / (line @ line)
    print(f"[filter]   50 Hz line gain after notch+bandpass: {g_line:.4f}")

    # 2. ICA: find and remove the blink component
    rw2 = nw.RawWavelet(ArrayRaw(filtered, SFREQ), nw.Morse(SFREQ),
                        window=4096)
    ica = rw2.ica(n_components=5, n_iter=200)
    bads_k, _ = rw2.ica_find_bads(ica)     # unsupervised: kurtosis
    bidx = bads_k[0]
    cleaned = rw2.ica_clean(ica, bads_k)
    b_before = abs(np.corrcoef(filtered[0], blink)[0, 1])
    b_after = abs(np.corrcoef(cleaned[0], blink)[0, 1])
    print(f"[ica]      blink corr ch0: {b_before:.2f} -> {b_after:.2f} "
          f"(removed component {bidx})")

    # 3. resample 250 -> 125 Hz (pow2 ratio: exact spectrum truncation)
    rw3 = nw.RawWavelet(ArrayRaw(cleaned, SFREQ), nw.Morse(SFREQ),
                        window=4096)
    down, sf = rw3.resample(125.0)
    print(f"[resample] {cleaned.shape} @250 Hz -> {down.shape} @{sf} Hz")

    # 4. HMM spectral states on the cleaned recording
    rw4 = nw.RawWavelet(ArrayRaw(down.astype(np.float32), sf),
                        nw.Morse(sf), window=4096)
    res = rw4.states(n_states=2, bands=((8.0, 13.0), (20.0, 30.0)),
                     n_iter=40)
    states = np.asarray(res.states)
    decim = max(1, int(sf // 20))
    nt = states.shape[0]
    truth = regime[::2][: nt * decim : decim][:nt].astype(int)
    acc = max(np.mean(states == truth), np.mean(1 - states == truth))
    print(f"[states]   2-state HMM vs ground-truth regime: "
          f"{100 * acc:.1f}% agreement over {nt} frames")

    # 5. cycle-by-cycle shape of the alpha regime
    tab = cycle_features(cleaned[0], SFREQ, (6.0, 15.0))
    k = int(tab.n_cycles)
    rd = float(np.median(np.asarray(tab.rdsym)[:k]))
    bf = float(np.mean(np.asarray(tab.is_burst)[:k]))
    print(f"[cycles]   {k} alpha-band cycles, median rise fraction "
          f"{rd:.2f}, burst fraction {bf:.2f}")


if __name__ == "__main__":
    main()
