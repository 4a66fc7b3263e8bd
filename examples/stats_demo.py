"""Inferential-statistics walkthrough of the beyond-reference tools:
cluster permutation tests (Maris-Oostenveld), TFCE, multitaper Morse
power, and time-resolved wavelet Granger causality — on a simulated
two-condition, three-channel EEG experiment with a known ground truth.

    python examples/stats_demo.py          # prints a summary
    python examples/stats_demo.py --plot   # + figure into examples/out/

Ground truth: channels "c0"/"c1" carry a 40 Hz burst at 0.5-0.8 s in
condition A only (c0, c1 are adjacent sensors); "c2" is pure noise; a
broadband lagged coupling drives c1 from c0.
"""
import sys

import numpy as np

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import cluster as cl
from ninwavelets_tpu.ops import granger as gr
from ninwavelets_tpu.ops.multitaper import multitaper_power

SFREQ = 250.0
N = 512
EPOCHS = 20


def simulate(condition_a: bool, seed: int) -> np.ndarray:
    """(E, 3, N): noise + (condition A only) a 40 Hz burst on c0/c1, with
    c1 lag-driven by c0 so Granger sees c0 -> c1."""
    rng = np.random.default_rng(seed)
    t = np.arange(N) / SFREQ
    x = rng.standard_normal((EPOCHS, 3, N)).astype(np.float32)
    # directed coupling: c1 += lagged, filtered copy of c0
    lag = 3
    x[:, 1, lag:] += 0.6 * x[:, 0, :-lag]
    if condition_a:
        win = ((t > 0.5) & (t < 0.8)).astype(np.float32)
        burst = 3.0 * np.sin(2 * np.pi * 40.0 * t) * win
        x[:, 0, :] += burst
        x[:, 1, :] += burst
    return x


def main(plot: bool = False) -> None:
    cond_a = simulate(True, seed=1)
    cond_b = simulate(False, seed=2)
    names = ["c0", "c1", "c2"]
    ew_a = nw.EpochsWavelet(nw.ArrayEpochs(cond_a, SFREQ, ch_names=names),
                            nw.Morse(SFREQ))
    ew_b = nw.EpochsWavelet(nw.ArrayEpochs(cond_b, SFREQ, ch_names=names),
                            nw.Morse(SFREQ))
    freqs = np.linspace(15.0, 60.0, 10)

    # --- 1. spatio-spectral cluster test: condition A vs B -------------
    adjacency = np.array([[0, 1], [1, 2]], np.int32)  # sensor chain
    res = ew_a.cluster_test_all(freqs, other=ew_b, adjacency=adjacency,
                                n_perm=199)
    print("cluster test (A vs B, channel-adjacent clusters):")
    for c in res.clusters[:3]:
        print(f"  sign={c['sign']:+d} size={c['size']:5d} "
              f"mass={c['mass']:9.1f} p={c['p']:.3f}")
    sig = res.p_map < 0.05
    print(f"  significant pixels per channel: "
          f"{[int(s.sum()) for s in sig]}  (burst lives on c0+c1)")

    # --- 2. TFCE on the single-channel one-sample problem --------------
    xa = np.asarray(ew_a.single_trial_power("c0", freqs,
                                            baseline=(0.0, 0.4)))
    tf = cl.tfce_test_one_sample(xa, n_perm=99, stop=25.0)
    k = np.unravel_index(np.abs(tf.tfce_obs).argmax(), tf.tfce_obs.shape)
    print(f"TFCE (c0 vs baseline): min corrected p = {tf.p_map.min():.3f} "
          f"at {freqs[k[0]]:.0f} Hz, t = {k[1] / SFREQ:.2f} s")

    # --- 3. multitaper variance reduction -------------------------------
    p1 = np.asarray(multitaper_power(cond_a[:, 0], freqs, SFREQ,
                                     n_tapers=1))
    p4 = np.asarray(multitaper_power(cond_a[:, 0], freqs, SFREQ,
                                     n_tapers=4))
    cv1 = float(p1.std(0).mean() / p1.mean())
    cv4 = float(p4.std(0).mean() / p4.mean())
    print(f"multitaper: single-trial coefficient of variation "
          f"{cv1:.2f} (K=1) -> {cv4:.2f} (K=4)")

    # --- 4. directed coupling: wavelet Granger causality ----------------
    gc = np.asarray(ew_a.granger(picks=["c0", "c1"], n_bins=33,
                                 time_decim=32, n_iter=60))
    m = gc.mean(0)  # (K, 2, 2) time-mean
    gfreqs = gr.uniform_freqs(33, SFREQ)
    fwd = m[:, 1, 0]   # c0 -> c1
    rev = m[:, 0, 1]   # c1 -> c0
    print(f"Granger: c0->c1 peak {fwd.max():.3f} at "
          f"{gfreqs[fwd.argmax()]:.0f} Hz; reverse peak {rev.max():.3f} "
          f"(true direction is c0->c1)")

    # --- 5. MVPA decoding: WHERE in (f, t) is condition decodable? ------
    auc = np.asarray(ew_a.decode(ew_b, freqs, n_folds=5))
    k = np.unravel_index(auc.argmax(), auc.shape)
    print(f"decoding: peak AUC {auc.max():.2f} at {freqs[k[0]]:.0f} Hz, "
          f"t = {k[1] / SFREQ:.2f} s (chance elsewhere: "
          f"{np.median(auc):.2f})")

    # --- 6. network summary of the PLV graph ----------------------------
    net = ew_a.network(freqs[:4], method="plv")
    eff = np.asarray(net["efficiency"])
    print(f"network: global efficiency by frequency "
          f"{np.round(eff, 2)} (3 sensors; c0-c1 share the burst)")

    if plot:
        import pathlib

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(11, 7))
        axes[0, 0].imshow(res.t_obs[0], aspect="auto", origin="lower",
                          extent=[0, N / SFREQ, freqs[0], freqs[-1]])
        axes[0, 0].contour(np.linspace(0, N / SFREQ, N), freqs,
                           sig[0], levels=[0.5], colors="r")
        axes[0, 0].set_title("c0: t-map + significant cluster")
        axes[0, 1].imshow(tf.tfce_obs, aspect="auto", origin="lower",
                          extent=[0, N / SFREQ, freqs[0], freqs[-1]])
        axes[0, 1].set_title("c0: TFCE enhancement")
        axes[1, 0].plot(freqs, p1.mean((0, 2)), label="K=1")
        axes[1, 0].plot(freqs, p4.mean((0, 2)), label="K=4")
        axes[1, 0].set_title("multitaper mean spectra")
        axes[1, 0].legend()
        axes[1, 1].plot(gfreqs, fwd, label="c0→c1")
        axes[1, 1].plot(gfreqs, rev, label="c1→c0")
        axes[1, 1].set_title("Granger causality")
        axes[1, 1].legend()
        fig.tight_layout()
        out = pathlib.Path(__file__).parent / "out"
        out.mkdir(exist_ok=True)
        fig.savefig(out / "stats_demo.png", dpi=110)
        print(f"figure -> {out / 'stats_demo.png'}")


if __name__ == "__main__":
    main(plot="--plot" in sys.argv[1:])
