"""Torrence-Compo statistics and synchrosqueezing (beyond-reference
extensions; no reference counterpart — the reference stops at the raw
power plane)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import tc_stats
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.cwt import power as cwt_power
from ninwavelets_tpu.ops.sst import ssq_power

SFREQ = 1000.0


def _bank(freqs, n, interpolate=True):
    morse = nw.Morse(SFREQ)
    return morse._wdef(), jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(freqs, jnp.float32), n, SFREQ,
        interpolate), np.float32))


class TestTorrenceCompo:
    def test_ar1_recovers_known_coefficient(self):
        rng = np.random.default_rng(0)
        alpha = 0.7
        x = np.zeros(20000)
        for i in range(1, x.size):
            x[i] = alpha * x[i - 1] + rng.standard_normal()
        est = tc_stats.ar1_coefficient(x)
        assert abs(est - alpha) < 0.05, est

    def test_red_noise_spectrum_white_is_flat(self):
        p = np.asarray(tc_stats.red_noise_spectrum(
            np.arange(1.0, 100.0), SFREQ, 0.0))
        np.testing.assert_allclose(p, 1.0)

    def test_background_matches_measured_white_noise_power(self):
        """The bank-aware null level must equal the measured mean power of
        white noise row by row (the whole point of background_power)."""
        rng = np.random.default_rng(3)
        sig = rng.standard_normal((16, 4096)).astype(np.float32)
        freqs = np.arange(20.0, 120.0, 10.0)
        _, bank = _bank(freqs, 4096)
        p = np.asarray(cwt_power(jnp.asarray(sig), bank, interpolate=True))
        measured = p.mean(axis=(0, -1))
        want = np.asarray(tc_stats.background_power(bank, SFREQ, 0.0, 1.0))
        np.testing.assert_allclose(measured, want, rtol=0.1)

    def test_white_noise_exceedance_rate(self):
        """~5% of scalogram points in white noise exceed the 95% level."""
        rng = np.random.default_rng(1)
        sig = rng.standard_normal(8192).astype(np.float32)
        freqs = np.arange(20.0, 120.0, 5.0)
        _, bank = _bank(freqs, sig.size)
        p = cwt_power(jnp.asarray(sig), bank, interpolate=True)
        mask = np.asarray(tc_stats.significant_mask(
            p, bank, SFREQ, 0.0, float(np.var(sig))))
        assert 0.02 < mask.mean() < 0.09, mask.mean()

    def test_tone_is_significant_noise_is_mostly_not(self):
        rng = np.random.default_rng(2)
        t = np.arange(0, 4.0, 1 / SFREQ)
        sig = (np.sin(2 * np.pi * 60 * t)
               + 0.3 * rng.standard_normal(t.size)).astype(np.float32)
        freqs = np.arange(20.0, 120.0, 5.0)
        _, bank = _bank(freqs, sig.size)
        p = cwt_power(jnp.asarray(sig), bank, interpolate=True)
        mask = np.asarray(tc_stats.significant_mask(
            p, bank, SFREQ, tc_stats.ar1_coefficient(sig),
            float(np.var(sig))))
        tone_row = int(np.argmin(np.abs(freqs - 60.0)))
        far_rows = np.abs(freqs - 60.0) > 25.0
        assert mask[tone_row].mean() > 0.5
        assert mask[far_rows].mean() < mask[tone_row].mean() / 3

    def test_efolding_and_coi_mask(self):
        freqs = np.array([10.0, 40.0])
        wdef, _ = _bank(freqs, 1024)
        tau = tc_stats.efolding_times(wdef, freqs, SFREQ)
        assert tau[0] > tau[1] > 0          # lower freq -> wider cone
        assert tau[0] < 2.0                 # sane: sub-2-seconds at 10 Hz
        m = tc_stats.coi_mask(4000, SFREQ, tau)
        assert m.shape == (2, 4000)
        assert m[:, 2000].all()             # record center always valid
        assert not m[0, 0] and not m[0, -1] # edges excluded
        assert m[1].sum() > m[0].sum()      # higher freq keeps more

    def test_global_spectrum_peaks_at_tone(self):
        t = np.arange(0, 2.0, 1 / SFREQ)
        sig = np.sin(2 * np.pi * 45 * t).astype(np.float32)
        freqs = np.arange(10.0, 100.0, 5.0)
        wdef, bank = _bank(freqs, sig.size)
        p = cwt_power(jnp.asarray(sig), bank, interpolate=True)
        tau = tc_stats.efolding_times(wdef, freqs, SFREQ)
        gs = np.asarray(tc_stats.global_spectrum(
            p, jnp.asarray(tc_stats.coi_mask(sig.size, SFREQ, tau))))
        assert freqs[int(np.argmax(gs))] == 45.0


class TestSynchrosqueeze:
    FREQS = np.arange(20.0, 80.0, 1.0)

    def test_energy_conserved_and_concentrated_on_tone(self):
        t = np.arange(0, 2.048, 1 / SFREQ)
        sig = np.sin(2 * np.pi * 40 * t).astype(np.float32)
        _, bank = _bank(self.FREQS, sig.size)
        raw = np.asarray(cwt_power(jnp.asarray(sig), bank,
                                   interpolate=True))
        ssq = np.asarray(ssq_power(jnp.asarray(sig), bank, self.FREQS,
                                   SFREQ))
        assert ssq.shape == raw.shape
        np.testing.assert_allclose(ssq.sum(), raw.sum(), rtol=1e-4)
        # Concentration: fraction of energy within +-2 Hz of the tone.
        band = np.abs(self.FREQS - 40.0) <= 2.0
        m = 200   # interior (skip edge transients)
        conc_ssq = ssq[band, m:-m].sum() / ssq[:, m:-m].sum()
        conc_raw = raw[band, m:-m].sum() / raw[:, m:-m].sum()
        assert conc_ssq > 0.95, conc_ssq
        assert conc_ssq > conc_raw + 0.2    # genuinely sharper

    def test_chirp_ridge_tracks_instantaneous_frequency(self):
        t = np.arange(0, 2.048, 1 / SFREQ)
        f0, f1 = 30.0, 70.0
        finst = f0 + (f1 - f0) * t / t[-1]
        phase = 2 * np.pi * np.cumsum(finst) / SFREQ
        sig = np.sin(phase).astype(np.float32)
        _, bank = _bank(self.FREQS, sig.size)
        ssq = np.asarray(ssq_power(jnp.asarray(sig), bank, self.FREQS,
                                   SFREQ))
        m = 300
        ridge = self.FREQS[np.argmax(ssq[:, m:-m], axis=0)]
        err = np.abs(ridge - finst[m:-m])
        assert np.median(err) < 1.5, np.median(err)

    def test_batched_signals_do_not_cross(self):
        """Two different tones in one batch must reassign independently."""
        t = np.arange(0, 2.048, 1 / SFREQ)
        sig = np.stack([np.sin(2 * np.pi * 30 * t),
                        np.sin(2 * np.pi * 60 * t)]).astype(np.float32)
        _, bank = _bank(self.FREQS, t.size)
        ssq = np.asarray(ssq_power(jnp.asarray(sig), bank, self.FREQS,
                                   SFREQ))
        assert ssq.shape == (2, self.FREQS.size, t.size)
        m = 200
        assert self.FREQS[np.argmax(ssq[0, :, m:-m].sum(-1))] == 30.0
        assert self.FREQS[np.argmax(ssq[1, :, m:-m].sum(-1))] == 60.0


class TestRidge:
    FREQS = np.arange(20.0, 80.0, 1.0)

    def test_unrolled_dp_matches_sequential_oracle(self):
        """The production DP (16-column unrolled scan + forward/backward
        scores, no backtrack) must find a path with EXACTLY the score
        of the textbook forward-DP+backtrack oracle on random planes —
        ties may pick different equal-score paths, so the gate is the
        penalized path score, not the indices."""
        from ninwavelets_tpu.ops.ridge import (_ridge_indices,
                                               _ridge_indices_seq)
        rng = np.random.default_rng(3)
        for _ in range(8):
            nf = int(rng.integers(3, 40))
            n = int(rng.integers(2, 200))
            log_e = rng.standard_normal((nf, n)).astype(np.float32)
            for pen in (0.0, 0.5):
                a = np.asarray(_ridge_indices_seq(log_e, pen))
                b = np.asarray(_ridge_indices(log_e, pen))

                def score(idx):
                    s = float(log_e[idx, np.arange(n)].sum())
                    return s - pen * float(
                        np.sum(np.diff(idx.astype(np.float64)) ** 2))

                assert abs(score(a) - score(b)) <= 1e-3 * max(
                    1.0, abs(score(a))), (nf, n, pen)

    def _chirp(self, noise=0.0, seed=0):
        t = np.arange(0, 2.048, 1 / SFREQ)
        finst = 30.0 + 40.0 * t / t[-1]
        phase = 2 * np.pi * np.cumsum(finst) / SFREQ
        sig = np.sin(phase)
        if noise:
            sig = sig + noise * np.random.default_rng(seed
                                                      ).standard_normal(t.size)
        return sig.astype(np.float32), finst

    def test_tone_ridge_is_flat_and_exact(self):
        from ninwavelets_tpu.ops.ridge import ridge_frequencies
        t = np.arange(0, 2.048, 1 / SFREQ)
        sig = np.sin(2 * np.pi * 47 * t).astype(np.float32)
        _, bank = _bank(self.FREQS, t.size)
        p = cwt_power(jnp.asarray(sig), bank, interpolate=True)
        ridge = ridge_frequencies(p, self.FREQS)
        m = 200
        assert np.abs(ridge[m:-m] - 47.0).max() < 1.0

    def test_noisy_chirp_penalty_beats_argmax(self):
        """On a noisy chirp the DP ridge (smoothness penalty) must track
        the true instantaneous frequency better than per-column argmax."""
        from ninwavelets_tpu.ops.ridge import ridge_frequencies
        sig, finst = self._chirp(noise=1.0)
        _, bank = _bank(self.FREQS, sig.size)
        p = np.asarray(cwt_power(jnp.asarray(sig), bank, interpolate=True))
        m = 300
        dp = ridge_frequencies(p, self.FREQS, penalty=1.0)
        am = self.FREQS[np.argmax(p, axis=0)]
        err_dp = np.abs(dp[m:-m] - finst[m:-m]).mean()
        err_am = np.abs(am[m:-m] - finst[m:-m]).mean()
        assert err_dp < err_am
        assert err_dp < 2.0, err_dp

    def test_ridge_on_synchrosqueezed_plane(self):
        from ninwavelets_tpu.ops.ridge import ridge_frequencies
        sig, finst = self._chirp()
        _, bank = _bank(self.FREQS, sig.size)
        ssq = ssq_power(jnp.asarray(sig), bank, self.FREQS, SFREQ)
        ridge = ridge_frequencies(np.asarray(ssq), self.FREQS, penalty=0.5)
        m = 300
        assert np.median(np.abs(ridge[m:-m] - finst[m:-m])) < 1.0


def test_analysis_demo_headless(capsys):
    """The examples walkthrough runs end to end (no plot)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "analysis_demo", os.path.join(os.path.dirname(__file__), "..",
                                      "examples", "analysis_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(plot=False)
    out = capsys.readouterr().out
    assert "60 Hz row: significant fraction 1.00" in out
    assert "ridge" in out


def test_class_level_ssq_power():
    """WaveletBase.ssq_power: same numbers as the ops-level call, bank
    cached/reused; Normal-mode (complex-bank) families are rejected."""
    t = np.arange(0, 2.048, 1 / SFREQ)
    sig = np.sin(2 * np.pi * 40 * t).astype(np.float32)
    freqs = np.arange(20.0, 80.0, 2.0)
    morse = nw.Morse(SFREQ)
    got = np.asarray(morse.ssq_power(sig, freqs))
    _, bank = _bank(freqs, t.size, interpolate=False)
    want = np.asarray(ssq_power(jnp.asarray(sig), bank, freqs, SFREQ,
                                interpolate=False))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * want.max())
    with pytest.raises(ValueError, match="analytic"):
        nw.MexicanHat(SFREQ).ssq_power(sig, freqs)


def test_epoch_mean_significance_tightens_with_e():
    """The epoch-mean null is chi2 with 2E DOF / 2E: thresholds shrink
    toward the mean as E grows, and white-noise epoch-mean exceedance at
    p=0.95 stays ~5%."""
    rng = np.random.default_rng(11)
    e, n = 12, 4096
    sig = rng.standard_normal((e, 1, n)).astype(np.float32)
    freqs = np.arange(20.0, 120.0, 10.0)
    _, bank = _bank(freqs, n)
    from ninwavelets_tpu.ops.cwt import mean_power
    p = mean_power(jnp.asarray(sig), bank, interpolate=True)[0]
    thr1 = np.asarray(tc_stats.significance_level(bank, SFREQ, 0.0, 1.0,
                                                  n_epochs=1))
    thrE = np.asarray(tc_stats.significance_level(bank, SFREQ, 0.0, 1.0,
                                                  n_epochs=e))
    assert np.all(thrE < thr1)
    mask = np.asarray(tc_stats.significant_mask(p, bank, SFREQ, 0.0, 1.0,
                                                n_epochs=e))
    assert 0.01 < mask.mean() < 0.12, mask.mean()


def test_pipeline_statistics_stages():
    """run_pipeline with the optional stages: significance mask, COI-masked
    global spectrum, ridge tracks."""
    import ninwavelets_tpu.config as cfg
    rng = np.random.default_rng(3)
    t = np.arange(2048) / SFREQ
    base = np.sin(2 * np.pi * 60 * t)
    data = np.stack([np.stack([base + 0.2 * rng.normal(size=t.size)] * 2)
                     for _ in range(5)])

    class Fake:
        def __init__(self, d):
            self._data, self.info = d, {"sfreq": SFREQ}
            self.ch_names = ["a", "b"]
        def get_data(self):
            return self._data
        def __len__(self):
            return self._data.shape[0]

    pipe = cfg.PipelineConfig(freqs=(10.0, 100.0, 10.0),
                              significance=0.95, global_spectrum=True,
                              ridge=True)
    out = cfg.run_pipeline(pipe, Fake(data))
    assert out["power"].shape == (2, 9, 2048)
    assert out["significant"].shape == (2, 9, 2048)
    assert out["global_spectrum"].shape == (2, 9)
    assert out["coi"].shape == (9, 2048)
    assert out["ridge_hz"].shape == (2, 2048)
    freqs = out["freqs"]
    row60 = int(np.argmin(np.abs(freqs - 60.0)))
    sig_mask = np.asarray(out["significant"])
    assert sig_mask[:, row60].mean() > 0.8          # the tone is detected
    gs = np.asarray(out["global_spectrum"])
    assert int(np.argmax(gs[0])) == row60
    assert np.abs(np.asarray(out["ridge_hz"])[:, 500:-500] - 60.0).max() < 10.0


class TestSsqEpochMean:
    FREQS = np.arange(20.0, 80.0, 2.0)

    def test_mean_matches_batched_per_epoch_mean(self):
        """ssq_mean_power (scanned, O(C*F*N) memory) must equal the mean of
        per-epoch ssq_power planes exactly — same math, different
        streaming."""
        from ninwavelets_tpu.ops.sst import ssq_mean_power
        rng = np.random.default_rng(7)
        t = np.arange(0, 1.024, 1 / SFREQ)
        base = np.sin(2 * np.pi * 40 * t)
        sig = (base[None, None, :]
               + 0.2 * rng.standard_normal((5, 2, t.size))).astype(
                   np.float32)
        _, bank = _bank(self.FREQS, t.size)
        per = np.asarray(ssq_power(jnp.asarray(sig), bank, self.FREQS,
                                   SFREQ))
        want = per.mean(axis=0)
        got = np.asarray(ssq_mean_power(jnp.asarray(sig), bank, self.FREQS,
                                        SFREQ))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)

    def test_epochs_adapter_ssq_power(self):
        """EpochsWavelet.ssq_power: epoch-mean reassigned plane for one
        channel, matching the ops-level call; complex-bank families
        rejected."""
        from ninwavelets_tpu.ops.sst import ssq_mean_power
        from ninwavelets_tpu.utils.mne_adapter import EpochsWavelet

        class FakeEpochs:
            def __init__(self, data, sfreq):
                self._d = data
                self.info = {"sfreq": sfreq}
                self.ch_names = [f"ch{i}" for i in range(data.shape[1])]
                self.times = np.arange(data.shape[-1]) / sfreq

            def __len__(self):
                return self._d.shape[0]

            def get_data(self):
                return self._d

        rng = np.random.default_rng(8)
        t = np.arange(0, 1.024, 1 / SFREQ)
        data = (np.sin(2 * np.pi * 40 * t)[None, None, :]
                + 0.2 * rng.standard_normal((4, 2, t.size)))
        ew = EpochsWavelet(FakeEpochs(data, SFREQ), nw.Morse(SFREQ))
        got = np.asarray(ew.ssq_power("ch1", self.FREQS))
        sig = jnp.asarray(data[:, 1:2, :].astype(np.float32))
        _, bank = _bank(self.FREQS, t.size)
        want = np.asarray(ssq_mean_power(sig, bank, self.FREQS, SFREQ))[0]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)
        allp = np.asarray(ew.ssq_power_all(self.FREQS))
        np.testing.assert_allclose(allp[1], got, rtol=2e-5, atol=1e-7)
        with pytest.raises(ValueError):
            EpochsWavelet(FakeEpochs(data, SFREQ),
                          nw.MexicanHat(SFREQ)).ssq_power("ch0", self.FREQS)


def test_ssq_mean_power_vma_axes_inside_shard_map():
    """Regression (code review): ssq_mean_power_from_bank(vma_axes=...)
    must forward the axes into _reassigned_power's internal scans, or the
    edge-count carry lacks the varying-axes type under shard_map."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ninwavelets_tpu import parallel as par
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.sst import ssq_mean_power_from_bank

    mesh = par.flat_mesh(par.DATA_AXIS)
    morse = nw.Morse(1000.0)
    freqs = np.arange(20.0, 52.0, dtype=np.float32)
    bank = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(freqs), 1024, 1000.0, True), np.float32))
    sig = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((8, 2, 1024)).astype(np.float32))

    def local(s):
        return ssq_mean_power_from_bank(s, bank, freqs, 1000.0,
                                        vma_axes=(par.DATA_AXIS,))

    out = jax.shard_map(local, mesh=mesh, in_specs=P(par.DATA_AXIS),
                        out_specs=P(par.DATA_AXIS))(sig)
    # data-sharded epochs -> each shard's epoch mean stacks on axis 0
    assert np.asarray(out).shape == (2 * mesh.size, freqs.size, 1024)


def test_uniform_grid_closed_form_matches_scan():
    """The uniform-grid row mapping (closed-form ceil) must reproduce the
    edge-count scan bit-for-bit away from edges — and detection must
    reject non-uniform grids."""
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.sst import (ssq_power_from_bank,
                                         uniform_grid_hint)
    assert uniform_grid_hint(np.arange(5.0, 50.0, 5.0))[0] == "lin"
    assert uniform_grid_hint(np.geomspace(5.0, 50.0, 10))[0] == "log"
    assert uniform_grid_hint([10.0]) is None
    assert uniform_grid_hint([5.0, 9.0, 11.0]) is None  # irregular

    morse = nw.Morse(1000.0)
    freqs = np.arange(10.0, 90.0, 4.0, dtype=np.float32)
    n = 1024
    bank = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(freqs), n, 1000.0, True), np.float32))
    sig = jnp.asarray(np.random.default_rng(4)
                      .standard_normal((3, n)).astype(np.float32))
    f_grid = jnp.asarray(freqs)
    scan = np.asarray(ssq_power_from_bank(sig, bank, f_grid, 1000.0))
    closed = np.asarray(ssq_power_from_bank(
        sig, bank, f_grid, 1000.0,
        uniform_grid=uniform_grid_hint(freqs)))
    np.testing.assert_allclose(closed, scan, rtol=1e-6, atol=1e-7)


def test_piecewise_grid_closed_form_matches_scan():
    """Piecewise-regular grids (concatenated runs at different
    resolutions) get the summed per-segment closed forms — must reproduce
    the edge-count scan; detection only fires when the segment count is a
    strict win over the blocked scan."""
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.sst import (ssq_power_from_bank,
                                         uniform_grid_hint, _edge_segments)

    # standard neuro sweep: fine linear theta/alpha/beta + coarse gamma
    freqs = np.concatenate([np.arange(4.0, 40.0, 2.0),
                            np.arange(40.0, 100.0, 5.0)]).astype(np.float32)
    hint = uniform_grid_hint(freqs)
    assert hint is not None and hint[0] == "pw"
    assert sum(s[3] for s in hint[1]) == freqs.size - 1
    # a log sweep joined to a linear tail segments too
    mixed = np.concatenate([np.geomspace(2.0, 32.0, 24),
                            np.arange(36.0, 120.0, 4.0)])
    h2 = uniform_grid_hint(mixed)
    assert h2 is not None and h2[0] == "pw"
    assert any(s[0] == "log" for s in h2[1])
    # truly irregular (every spacing distinct) -> no hint
    rng = np.random.default_rng(11)
    jitter = np.cumsum(0.5 + rng.random(40)) + 5.0
    assert uniform_grid_hint(jitter) is None
    # host segmentation is exact: per-segment closed forms == bisect
    edges = 0.5 * (np.asarray(mixed[1:]) + np.asarray(mixed[:-1]))
    segs = _edge_segments(edges)
    probe = np.linspace(0.0, 150.0, 1201)
    want = np.searchsorted(edges, probe, side="left")
    got = np.zeros_like(probe)
    for kind, p0, step, m in segs:
        x = np.log(np.maximum(probe, 1e-30)) if kind == "log" else probe
        c = np.where(probe > 0, np.ceil((x - p0) / step), 0.0)
        got += np.clip(c, 0.0, m)
    # away from exact edge hits the counts agree everywhere
    off_edge = np.abs(probe[:, None] - edges[None, :]).min(1) > 1e-9
    np.testing.assert_array_equal(got[off_edge], want[off_edge])

    morse = nw.Morse(1000.0)
    n = 1024
    bank = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(freqs), n, 1000.0, True), np.float32))
    sig = jnp.asarray(np.random.default_rng(9)
                      .standard_normal((3, n)).astype(np.float32))
    f_grid = jnp.asarray(freqs)
    scan = np.asarray(ssq_power_from_bank(sig, bank, f_grid, 1000.0))
    closed = np.asarray(ssq_power_from_bank(
        sig, bank, f_grid, 1000.0, uniform_grid=hint))
    np.testing.assert_allclose(closed, scan, rtol=1e-6, atol=1e-7)


def test_log_grid_closed_form_matches_scan():
    """Geometric grids get the log-space closed form — must reproduce the
    edge-count scan (and detection distinguishes lin / log / irregular)."""
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.sst import (ssq_power_from_bank,
                                         uniform_grid_hint)
    assert uniform_grid_hint(np.arange(5.0, 50.0, 5.0))[0] == "lin"
    assert uniform_grid_hint(np.geomspace(5.0, 80.0, 12))[0] == "log"
    assert uniform_grid_hint([5.0, 7.0, 20.0]) is None

    morse = nw.Morse(1000.0)
    freqs = np.geomspace(10.0, 120.0, 20).astype(np.float32)
    n = 1024
    bank = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(freqs), n, 1000.0, True), np.float32))
    sig = jnp.asarray(np.random.default_rng(6)
                      .standard_normal((3, n)).astype(np.float32))
    f_grid = jnp.asarray(freqs)
    scan = np.asarray(ssq_power_from_bank(sig, bank, f_grid, 1000.0))
    closed = np.asarray(ssq_power_from_bank(
        sig, bank, f_grid, 1000.0,
        uniform_grid=uniform_grid_hint(freqs)))
    np.testing.assert_allclose(closed, scan, rtol=1e-6, atol=1e-7)


class TestModeExtraction:
    """Iterative ridge peeling (ops.ridge.extract_modes)."""

    def test_two_tone_decomposition(self):
        from ninwavelets_tpu.ops.bank import make_fft_bank
        from ninwavelets_tpu.ops.ridge import extract_modes_ri
        sfreq, n = 1000.0, 4096
        t = np.arange(n) / sfreq
        m1 = (1.0 * np.sin(2 * np.pi * 40 * t)).astype(np.float32)
        m2 = (0.6 * np.sin(2 * np.pi * 90 * t)).astype(np.float32)
        sig = m1 + m2
        freqs = np.arange(25.0, 111.0, 2.5, dtype=np.float32)
        bank = jnp.asarray(np.asarray(make_fft_bank(
            nw.Morse(sfreq)._wdef(), jnp.asarray(freqs), n, sfreq, True),
            np.float32))
        modes, tracks, resid = extract_modes_ri(
            jnp.asarray(sig), bank, n_modes=2, interpolate=True)
        modes, tracks, resid = (np.asarray(modes), np.asarray(tracks),
                                np.asarray(resid))
        assert modes.shape == (2, n) and tracks.shape == (2, n)
        e = 400      # trim reconstruction edges
        sl = slice(e, -e)

        def corr(a, b):
            a, b = a[sl] - a[sl].mean(), b[sl] - b[sl].mean()
            return float(np.dot(a, b)
                         / (np.linalg.norm(a) * np.linalg.norm(b)))

        # the stronger 40 Hz mode peels first, then the 90 Hz one
        assert corr(modes[0], m1) > 0.99
        assert corr(modes[1], m2) > 0.99
        # tracks sit on the right rows
        hz0 = np.interp(tracks[0, sl], np.arange(freqs.size), freqs)
        hz1 = np.interp(tracks[1, sl], np.arange(freqs.size), freqs)
        assert abs(np.median(hz0) - 40.0) < 2.5
        assert abs(np.median(hz1) - 90.0) < 2.5
        # residual energy is small in the interior
        assert (np.linalg.norm(resid[sl])
                < 0.15 * np.linalg.norm(sig[sl]))

    def test_chirp_plus_tone_class_api(self):
        sfreq, n = 1000.0, 4096
        t = np.arange(n) / sfreq
        chirp = np.sin(2 * np.pi * (60 * t + 5 * t * t)).astype(np.float32)
        tone = (0.5 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
        morse = nw.Morse(sfreq, interpolate=True)
        freqs = np.arange(40.0, 171.0, 2.5)
        modes, tracks, resid = morse.extract_modes(
            chirp + tone, freqs, n_modes=2, bw_rows=3.0)
        modes = np.asarray(modes)
        e = 400
        sl = slice(e, -e)

        def corr(a, b):
            a, b = a[sl] - a[sl].mean(), b[sl] - b[sl].mean()
            return float(np.dot(a, b)
                         / (np.linalg.norm(a) * np.linalg.norm(b)))

        assert corr(modes[0], chirp) > 0.98
        assert corr(modes[1], tone) > 0.98
        # the chirp track RISES (60 -> ~100 Hz instantaneous)
        hz = np.interp(np.asarray(tracks)[0], np.arange(freqs.size), freqs)
        assert hz[3500] - hz[500] > 20.0
        import pytest
        with pytest.raises(ValueError):
            morse.extract_modes(np.zeros((2, 128), np.float32),
                                [50.0, 60.0])
