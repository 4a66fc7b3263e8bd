"""Tour of the beyond-reference extensions on a synthetic EEG-like set.

The reference stops at single-channel TFRs + ITC; this walks the rest of
the surface end to end on one small multi-channel epochs batch:

  1. connectivity — PLV between a phase-locked channel pair, the
     all-pairs (F, C, C) matrix, and a phase-amplitude comodulogram
  2. denoising — wavelet shrinkage pulling a tone out of noise
  3. time scattering — telling a pure tone from the same tone tremolo'd
  4. gradients — ``ops.fit.fit_frequencies`` learning analysis
     frequencies onto a tone by gradient descent
  5. the config pipeline — power + ITC (+ connectivity matrices) from a
     dataclass description

Run: python examples/extensions_demo.py  (headless; ~seconds on CPU)
"""
import numpy as np

import jax
import jax.numpy as jnp

import ninwavelets_tpu as nw

SFREQ = 1000.0


class FakeEpochs:
    """Duck-typed mne.Epochs stand-in (info/ch_names/get_data)."""

    def __init__(self, data):
        self.info = {"sfreq": SFREQ}
        self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[1])]
        self._data = data

    def get_data(self):
        return self._data


def make_epochs(e=12, n=2048, seed=0):
    """ch0/ch1 phase-locked at 40 Hz (60 deg lag); ch2 carries an 8 Hz ->
    70 Hz phase-amplitude coupling; everything plus noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SFREQ
    data = np.empty((e, 3, n), np.float32)
    for i in range(e):
        base = rng.uniform(0, 2 * np.pi)
        data[i, 0] = np.sin(2 * np.pi * 40 * t + base)
        data[i, 1] = np.sin(2 * np.pi * 40 * t + base + np.pi / 3)
        slow = np.sin(2 * np.pi * 8 * t + rng.uniform(0, 2 * np.pi))
        data[i, 2] = slow + (1 + slow) * np.sin(2 * np.pi * 70 * t)
        data[i] += 0.3 * rng.standard_normal((3, n))
    return FakeEpochs(data)


def main():
    ew = nw.EpochsWavelet(make_epochs(), nw.Morse(SFREQ))
    freqs = np.arange(20.0, 90.0, 5.0)

    # 1 — connectivity
    v = np.asarray(ew.plv("EEG 000", "EEG 001", freqs))
    row40 = int(np.argmin(np.abs(freqs - 40.0)))
    print(f"PLV(ch0, ch1) @ 40 Hz: {v[row40, 300:-300].mean():.3f} "
          f"(locked pair; independent rows sit near 1/sqrt(E))")
    m = np.asarray(ew.plv_matrix(freqs, time_range=(0.3, 1.7)))
    print(f"PLV matrix @ 40 Hz: 01={m[row40, 0, 1]:.2f} "
          f"02={m[row40, 0, 2]:.2f} 12={m[row40, 1, 2]:.2f}")
    fp = np.arange(4.0, 13.0, 1.0)
    fa = np.arange(40.0, 100.0, 5.0)
    mi = np.asarray(ew.pac("EEG 002", fp, fa, method="mvl"))
    r8 = int(np.argmin(np.abs(fp - 8.0)))
    c70 = int(np.argmin(np.abs(fa - 70.0)))
    print(f"PAC(8 Hz phase, 70 Hz amp): {mi[r8, c70]:.3f} vs uncoupled "
          f"(4 Hz, 70 Hz): {mi[0, c70]:.3f}")

    # 2 — denoising
    rng = np.random.default_rng(1)
    t = np.arange(2048) / SFREQ
    clean = np.sin(2 * np.pi * 60 * t).astype(np.float32)
    noisy = clean + 0.8 * rng.standard_normal(2048).astype(np.float32)
    morse = nw.Morse(SFREQ)
    den = np.asarray(morse.denoise(noisy, np.arange(30.0, 100.0, 2.0)))
    snr = lambda x: 10 * np.log10((clean ** 2).sum()
                                  / ((x - clean) ** 2).sum())
    print(f"denoise: {snr(noisy):.1f} dB -> {snr(den):.1f} dB")

    # 3 — scattering separates tone from tremolo
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.scattering import scattering
    b1 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.geomspace(20.0, 200.0, 16),
                                   jnp.float32), 2048, SFREQ, True),
        np.float32))
    b2 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.geomspace(2.0, 32.0, 8),
                                   jnp.float32), 2048, SFREQ, False),
        np.float32))
    tone = np.sin(2 * np.pi * 60 * t).astype(np.float32)
    trem = (np.sin(2 * np.pi * 60 * t)
            * (1 + 0.8 * np.sin(2 * np.pi * 8 * t))).astype(np.float32)
    pair = jnp.asarray(np.stack([tone, trem]))
    s1, s2 = scattering(pair, b1, b2, SFREQ, stride=32)
    e2 = np.asarray(s2).reshape(2, -1)
    e2 = (e2 ** 2).sum(axis=1)
    print(f"scattering order-2 energy: tone {e2[0]:.3f} vs tremolo "
          f"{e2[1]:.3f} (the tremolo's 8 Hz modulation lives here)")

    # 4 — learn analysis frequencies by gradient descent (ops.fit)
    from ninwavelets_tpu.ops.fit import fit_frequencies
    f_fit, losses = fit_frequencies(tone[None, None, :], morse._wdef(),
                                    [45.0, 80.0], SFREQ, steps=120)
    print(f"fit_frequencies: [45, 80] Hz -> "
          f"{np.round(np.asarray(f_fit), 1).tolist()} Hz "
          f"(tone at 60; loss {float(losses[0]):.3f} -> "
          f"{float(losses[-1]):.3f})")

    # 5 — the config pipeline
    from ninwavelets_tpu import config as cfg
    pipe = cfg.PipelineConfig(freqs=(20.0, 90.0, 5.0),
                              connectivity="plv",
                              connectivity_window=(0.3, 1.7))
    out = cfg.run_pipeline(pipe, make_epochs())
    print(f"pipeline: power {np.asarray(out['power']).shape}, itc "
          f"{np.asarray(out['itc']).shape}, plv_matrix "
          f"{np.asarray(out['plv_matrix']).shape}")

    # 6 — superresolution: superlets split tones a 3-cycle Morlet smears
    two = (np.sin(2 * np.pi * 50 * t)
           + np.sin(2 * np.pi * 56 * t)).astype(np.float32)
    grid = np.arange(40.0, 67.0, 1.0)
    slt = nw.Superlet(SFREQ, sigma=3.0, order_min=12, order_max=12,
                      adaptive=False)
    prof = np.asarray(slt.power(two, grid))[:, 400:-400].mean(-1)
    prof /= prof.max()
    p1 = np.asarray(nw.Morlet(SFREQ, sigma=3.0).power(two, grid))
    p1 = p1[:, 400:-400].mean(-1)
    p1 /= p1.max()
    i53 = int(np.argmin(np.abs(grid - 53.0)))
    print(f"superlet: 50/56 Hz valley {prof[i53]:.2f} of peak "
          f"(order-12) vs {p1[i53]:.2f} for one 3-cycle Morlet "
          f"(1.0 = unresolved)")

    # 7 — mode extraction: peel a chirp off a tone
    chirp = np.sin(2 * np.pi * (60 * t + 5 * t * t)).astype(np.float32)
    tone150 = (0.5 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    morse_i = nw.Morse(SFREQ, interpolate=True)
    modes, tracks, resid = morse_i.extract_modes(
        chirp + tone150, np.arange(40.0, 171.0, 2.5), n_modes=2)
    modes = np.asarray(modes)
    sl = slice(400, -400)
    c0 = np.corrcoef(modes[0][sl], chirp[sl])[0, 1]
    c1 = np.corrcoef(modes[1][sl], tone150[sl])[0, 1]
    print(f"extract_modes: chirp r={c0:.3f}, tone r={c1:.3f}, residual "
          f"{np.linalg.norm(np.asarray(resid)[sl]):.2f}")

    # 8 — bicoherence: quadratic phase coupling (20 + 35 -> 55 Hz)
    rng2 = np.random.default_rng(7)
    e_bc = 10

    def bc_epochs(coupled):
        data = np.empty((e_bc, 1, 2048), np.float32)
        for i in range(e_bc):
            p1_, p2_ = rng2.uniform(0, 2 * np.pi, 2)
            p3_ = p1_ + p2_ if coupled else rng2.uniform(0, 2 * np.pi)
            data[i, 0] = (np.cos(2 * np.pi * 20 * t + p1_)
                          + np.cos(2 * np.pi * 35 * t + p2_)
                          + 0.7 * np.cos(2 * np.pi * 55 * t + p3_)
                          + 0.1 * rng2.standard_normal(2048))
        return FakeEpochs(data)

    cell = lambda ep: np.asarray(nw.EpochsWavelet(
        ep, nw.Morse(SFREQ)).bicoherence("EEG 000", [20.0], [35.0]))[0, 0]
    print(f"bicoherence at (20, 35)->55: phase-coupled "
          f"{cell(bc_epochs(True)):.2f} vs independent-phase control "
          f"{cell(bc_epochs(False)):.2f}")

    # 9 — event-locked epoching of a continuous recording
    rec = 0.05 * rng2.standard_normal((1, 10_000)).astype(np.float32)
    events = np.arange(1_000, 9_000, 1_000)
    burst = np.sin(2 * np.pi * 60.0 * t[:200]).astype(np.float32)
    for ev in events:
        rec[0, ev:ev + 200] += burst

    class FakeRaw:
        info = {"sfreq": SFREQ}
        ch_names = ["EEG 000"]

        def get_data(self):
            return rec

    rw = nw.RawWavelet(FakeRaw(), nw.Morse(SFREQ))
    itc = np.asarray(rw.itc(np.arange(30.0, 95.0, 10.0), events,
                            tmin=0.0, tmax=0.2))
    print(f"raw event-locked ITC @ 60 Hz: {itc[0, 3, 50:150].mean():.2f} "
          f"(phase-locked bursts; off-band rows sit near 1/sqrt(E))")

    # 8 — volume conduction: a common source at ZERO lag fools PLV but
    # not the phase-lag family; a true lag drives both, and the phase
    # slope index reads the direction off the phase-vs-frequency slope.
    rng = np.random.default_rng(9)
    n, e = 2048, 24
    t = np.arange(n) / SFREQ
    zl = np.empty((e, 2, n), np.float32)
    lg = np.empty((e, 2, n), np.float32)
    for i in range(e):
        src = sum(np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
                  for f in (32.0, 40.0, 48.0))
        zl[i, 0] = src + 0.4 * rng.standard_normal(n)
        zl[i, 1] = src + 0.4 * rng.standard_normal(n)      # zero lag
        lg[i, 0] = src + 0.4 * rng.standard_normal(n)
        lg[i, 1] = np.roll(src, 8) + 0.4 * rng.standard_normal(n)
    cfreqs = np.arange(24.0, 60.0, 4.0)
    row = int(np.argmin(np.abs(cfreqs - 40.0)))
    ez = nw.EpochsWavelet(FakeEpochs(zl), nw.Morse(SFREQ))
    el = nw.EpochsWavelet(FakeEpochs(lg), nw.Morse(SFREQ))
    m = 300
    plv_z = np.asarray(ez.plv("EEG 000", "EEG 001", cfreqs))[row,
                                                             m:-m].mean()
    wpli_z = np.asarray(ez.wpli("EEG 000", "EEG 001", cfreqs))[row,
                                                               m:-m].mean()
    wpli_l = np.asarray(el.wpli("EEG 000", "EEG 001", cfreqs))[row,
                                                               m:-m].mean()
    psi_l = np.asarray(el.psi("EEG 000", "EEG 001", cfreqs))[m:-m].mean()
    print(f"volume conduction: PLV {plv_z:.2f} vs wPLI {wpli_z:.2f} on a "
          f"zero-lag common source; true 8 ms lag: wPLI {wpli_l:.2f}, "
          f"PSI {psi_l:+.3f} (positive: ch0 leads)")

    # 9 — discrete subsystem: MODWT shrinkage, scale variance, and a
    # best-basis packet cover isolating a narrowband component.
    from ninwavelets_tpu.ops.dwt import modwt_denoise, modwt_var
    from ninwavelets_tpu.ops.wpt import (best_basis,
                                         best_basis_reconstruct,
                                         node_band)
    n2 = 4096
    t2 = np.arange(n2) / SFREQ
    # Shrinkage favors signals that are SPARSE in the wavelet domain —
    # a slow (8 Hz) component surviving in the coarse levels/smooth;
    # for a steady mid-band tone the packet-domain band filter is the
    # right tool, so the demo shows each on its own turf.
    slow_c = np.sin(2 * np.pi * 8.0 * t2).astype(np.float32)
    slow_n = slow_c + 0.5 * rng.standard_normal(n2).astype(np.float32)
    den = np.asarray(modwt_denoise(slow_n, "db8"))
    snr = lambda x, c: 10 * np.log10((c ** 2).mean()
                                     / ((x - c) ** 2).mean())
    clean = np.sin(2 * np.pi * 166.0 * t2).astype(np.float32)
    noisy = clean + 0.5 * rng.standard_normal(n2).astype(np.float32)
    v = np.asarray(modwt_var(noisy, "db8", 6))
    nodes, coeffs = best_basis(noisy, "db8", 4)
    keep = [nd for nd in nodes
            if node_band(*nd)[0] <= 166.0 / SFREQ < node_band(*nd)[1]]
    bb = np.asarray(best_basis_reconstruct(nodes, coeffs, "db8",
                                           keep=keep))
    print(f"modwt: 8 Hz shrinkage {snr(slow_n, slow_c):.1f} -> "
          f"{snr(den, slow_c):.1f} dB; 166 Hz variance peaks at level "
          f"{int(np.argmax(v)) + 1} (its octave); best-basis band "
          f"filter {snr(noisy, clean):.1f} -> {snr(bb, clean):.1f} dB "
          f"keeping {len(keep)}/{len(nodes)} packet nodes")


if __name__ == "__main__":
    main()
