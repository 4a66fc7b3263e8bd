"""End-to-end clinical-style workflow on the round-4 feature wave:

    reject bad trials -> repair a bad channel -> CSD -> ERP measures
    -> microstates (+ scalp maps) -> complexity tables -> partial
    coherence / directed PSI -> sleep events -> envelope DFA

    python examples/workflow_demo.py

Ground truth is planted throughout (artifact trials, a dead channel, a
300 ms evoked component, a 3-state topographic sequence, 13 Hz sleep
spindles, a long-range-correlated alpha envelope), and every stage
prints what it recovered so the chain is checkable by eye.
"""
import numpy as np

import ninwavelets_tpu as nw

SFREQ = 250.0


class ArrayEpochsLike:
    def __init__(self, data, sfreq, names=None):
        self._data = data
        self.info = {"sfreq": sfreq}
        self.ch_names = names or [f"EEG {i:03d}"
                                  for i in range(data.shape[1])]

    def get_data(self):
        return self._data

    def __len__(self):
        return self._data.shape[0]


class ArrayRaw:
    def __init__(self, data, sfreq):
        self._data = data
        self.info = {"sfreq": sfreq}
        self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[0])]

    def get_data(self):
        return self._data


def _scalp(c):
    i = np.arange(c, dtype=np.float64) + 0.5
    phi = np.arccos(1 - i / c)              # upper hemisphere
    th = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(th),
                     np.sin(phi) * np.sin(th), np.cos(phi)], axis=1)


def main() -> None:
    rng = np.random.default_rng(0)
    e, c, n = 40, 16, 512
    pos = _scalp(c)
    t = np.arange(n) / SFREQ

    # --- epochs with a planted ERP, artifact trials, a dead channel ---
    erp = 4.0 * np.exp(-0.5 * ((t - 0.3) / 0.04) ** 2)
    gain = np.exp(-np.linalg.norm(pos - pos[0], axis=1))    # focal
    x = gain[None, :, None] * erp[None, None, :] \
        + 0.8 * rng.standard_normal((e, c, n))
    bad_trials = np.zeros(e, bool)
    bad_trials[rng.choice(e, 5, replace=False)] = True
    for i in np.flatnonzero(bad_trials):
        x[i, rng.integers(c), 100:180] += 15.0
    x[:, 7] = 0.05 * rng.standard_normal((e, n))            # dead ch
    x = x.astype(np.float32)

    ew = nw.EpochsWavelet(ArrayEpochsLike(x, SFREQ), nw.Morse(SFREQ))

    # 1. cross-validated trial rejection
    clean = ew.drop_bad()
    kept = len(clean.epochs)
    print(f"drop_bad: kept {kept}/{e} trials "
          f"(threshold {clean.reject_result.threshold:.1f}); planted "
          f"artifacts {int(bad_trials.sum())} -> dropped "
          f"{e - kept}")

    # 2. channel repair + reference-free CSD
    fixed = clean.interpolate_bads(pos, ["EEG 007"])
    lap = fixed.csd(pos)
    print("interpolate_bads + csd: dead channel rebuilt from its "
          "neighbours, CSD applied (reference-free)")

    # 3. ERP measurement on the cleaned evoked
    pk = fixed.erp_peak(window=(0.2, 0.4))
    ch0_lat = float(np.asarray(pk.latency)[0]) / SFREQ
    ons, mean_on, se_on = fixed.erp_onset((0.1, 0.45))
    print(f"erp: channel-0 peak at {ch0_lat * 1e3:.0f} ms "
          f"(planted 300), jackknife onset "
          f"{float(np.asarray(mean_on)[0]) / SFREQ * 1e3:.0f} ms "
          f"+- {float(np.asarray(se_on)[0]) / SFREQ * 1e3:.1f}")

    # 4. microstates on a continuous 3-topography recording
    m = rng.standard_normal((3, c))
    m -= m.mean(1, keepdims=True)
    q, _ = np.linalg.qr(m.T)
    maps_true = q.T[:3]
    nlong = 30000
    lab = (np.arange(nlong) // 75) % 3
    cont = (maps_true[lab].T * (1 + 0.3 * np.sin(np.arange(nlong) / 41))
            + 0.05 * rng.standard_normal((c, nlong))).astype(np.float32)
    rw = nw.RawWavelet(ArrayRaw(cont, SFREQ), nw.Morse(SFREQ))
    res, stats = rw.microstates(n_states=3, n_init=4, n_iter=30)
    corr = np.abs(np.asarray(res.maps) @ maps_true.T).max(0)
    print(f"microstates: gev={float(res.gev):.2f}, planted-map "
          f"|corr| min={corr.min():.2f}, mean duration "
          f"{1e3 * float(np.mean(stats['duration'])):.0f} ms (planted 300)")
    try:
        import matplotlib
        matplotlib.use("Agg")
        fig = nw.plot_microstates(np.asarray(res.maps), pos,
                                  stats=stats, show=False)
        fig.savefig("examples/out/microstate_maps.png", dpi=80)
        print("microstate scalp maps -> examples/out/microstate_maps.png")
    except Exception as err:  # pragma: no cover - plotting optional
        print("plotting skipped:", err)

    # 5. complexity tables on the cleaned epochs
    se = np.asarray(fixed.sample_entropy())
    pe = np.asarray(fixed.permutation_entropy())
    print(f"complexity: sampen mean {se.mean():.2f}, perm-entropy "
          f"mean {pe.mean():.2f} over {se.shape} (epoch, channel)")

    # 6. conditional + directed connectivity via the pipeline
    from ninwavelets_tpu import config as cfgmod
    z = rng.standard_normal((12, 1, 1024))
    e2 = 0.5 * rng.standard_normal((12, 1, 1024))
    e3 = 0.5 * rng.standard_normal((12, 1, 1024))
    chain = np.concatenate([z, z + e2, z + e2 + e3], 1).astype(np.float32)
    out = cfgmod.run_pipeline(
        cfgmod.PipelineConfig(freqs=(15.0, 60.0, 5.0),
                              connectivity="pcoh,psi"),
        ArrayEpochsLike(chain, 1000.0, ["a", "b", "c"]))
    pc = np.asarray(out["partial_coherence"]).mean(0)
    print(f"pipeline pcoh: marginal a-c coupling is mediated by b -> "
          f"partial coherence {pc[0, 2]:.3f} (direct a-b {pc[0, 1]:.2f})")

    # 7. sleep events
    nsl = int(60 * SFREQ)
    tsl = np.arange(nsl) / SFREQ
    sleep = 0.3 * rng.standard_normal(nsl)
    for t0 in (12.0, 31.0, 47.0):
        msk = (tsl >= t0) & (tsl < t0 + 1.0)
        sleep[msk] += 3.0 * np.sin(np.pi * (tsl[msk] - t0)) ** 2 \
            * np.sin(2 * np.pi * 13.0 * (tsl[msk] - t0))
    rws = nw.RawWavelet(ArrayRaw(sleep[None].astype(np.float32), SFREQ),
                        nw.Morse(SFREQ))
    sp = rws.spindles()
    v = np.asarray(sp.valid)[0]
    print(f"spindles: {int(v.sum())}/3 planted events found at "
          f"{np.round(np.asarray(sp.start)[0][v] / SFREQ, 1).tolist()} s, "
          f"freq {[round(float(q), 1) for q in np.asarray(sp.freq)[0][v]]} Hz")

    # 8. long-range temporal correlation of the alpha envelope
    from ninwavelets_tpu.ops.sim import powerlaw_noise
    nd = 65536
    env = np.asarray(powerlaw_noise(7, (nd,), exponent=-1.0))
    env = 1.0 + 0.8 * (env - env.min()) / (env.max() - env.min())
    xa = (env * np.sin(2 * np.pi * 10 * np.arange(nd) / SFREQ)
          ).astype(np.float32)
    rwd = nw.RawWavelet(ArrayRaw(xa[None], SFREQ), nw.Morse(SFREQ))
    alpha, _ = rwd.dfa("EEG 000", 10.0)
    print(f"dfa: alpha-envelope scaling exponent {float(alpha):.2f} "
          f"(> 0.5 = long-range correlated, as planted)")

    # 9. one shareable HTML report for the whole run
    try:
        import matplotlib
        matplotlib.use("Agg")
        rep = nw.Report(title="workflow demo — planted ground truth")
        rep.add_dict("Cleaning", {
            "trials_kept": kept, "trials_total": e,
            "reject_threshold": clean.reject_result.threshold})
        rep.add_table("Microstates", {
            "state": ["A", "B", "C"],
            "coverage": np.asarray(stats["coverage"]),
            "duration_ms": 1e3 * np.asarray(stats["duration"])})
        fig = nw.plot_microstates(np.asarray(res.maps), pos,
                                  stats=stats, show=False)
        rep.add_figure("Microstate maps", fig)
        rep.add_dict("Connectivity", {
            "pcoh_mediated": float(pc[0, 2]),
            "pcoh_direct": float(pc[0, 1])})
        rep.add_dict("DFA", {"alpha": float(alpha)})
        out_path = rep.save("examples/out/workflow_report.html")
        print(f"report -> {out_path}")
    except Exception as err:  # pragma: no cover - report optional
        print("report skipped:", err)


if __name__ == "__main__":
    main()
