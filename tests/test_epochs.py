"""EpochsWavelet: the MNE batch adapter, validated against per-epoch calls
and reference semantics (``/root/reference/ninwavelets/mneutils.py:9-71``)
using a duck-typed fake Epochs (mne itself is optional).
"""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from conftest import make_example


class FakeEpochs:
    """Duck-typed mne.Epochs: the three members the adapter touches."""

    def __init__(self, data, sfreq):
        self._data = data
        self.info = {"sfreq": sfreq}
        self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[1])]

    def get_data(self):
        return self._data

    def __len__(self):
        return self._data.shape[0]

    @property
    def times(self):
        return np.arange(self._data.shape[-1]) / self.info["sfreq"]


@pytest.fixture
def epochs():
    rng = np.random.default_rng(42)
    base = make_example(1.0)
    # 6 epochs x 3 channels: phase-consistent 60 Hz + noise
    data = np.stack([
        np.stack([base + 0.1 * rng.normal(size=base.shape)
                  for _ in range(3)])
        for _ in range(6)])
    return FakeEpochs(data, 1000.0)


FREQS = np.arange(10.0, 100.0, 15.0)


def test_sfreq_override(epochs):
    w = nw.Morse(sfreq=123.0)
    nw.EpochsWavelet(epochs, w)
    assert w.sfreq == 1000.0  # mneutils.py:24 semantics


def test_cwt_matches_per_epoch_loop(epochs):
    w = nw.Morse(1000.0)
    ew = nw.EpochsWavelet(epochs, w)
    got = np.asarray(ew.cwt("EEG 001", FREQS))
    # reference semantics: loop epochs, one cwt per epoch (mneutils.py:37-40)
    waves = epochs.get_data()[:, 1, :]
    want = np.stack([np.asarray(nw.Morse(1000.0).cwt(x, FREQS))
                     for x in waves])
    assert got.shape == (6, len(FREQS), 1000)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_power_is_epoch_mean(epochs):
    w = nw.Morse(1000.0)
    ew = nw.EpochsWavelet(epochs, w)
    p = np.asarray(ew.power("EEG 000", FREQS))
    c = np.asarray(ew.cwt("EEG 000", FREQS))
    np.testing.assert_allclose(p, (np.abs(c) ** 2).mean(axis=0),
                               rtol=1e-4, atol=1e-7)


def test_itc_identical_epochs_is_one():
    """Phase-locked identical epochs => ITC == 1 everywhere (where the
    coefficient is nonzero)."""
    base = make_example(1.0)
    data = np.stack([np.stack([base]) for _ in range(5)])  # (5, 1, N)
    ew = nw.EpochsWavelet(FakeEpochs(data, 1000.0), nw.Morse(1000.0))
    itc = np.asarray(ew.itc("EEG 000", FREQS))
    assert np.nanmax(itc) <= 1.0 + 1e-5
    c = np.abs(np.asarray(ew.cwt("EEG 000", FREQS)))[0]
    np.testing.assert_allclose(itc[c > 1e-3], 1.0, atol=1e-5)


def test_itc_matches_reference_formula(epochs):
    ew = nw.EpochsWavelet(epochs, nw.Morse(1000.0))
    got = np.asarray(ew.itc("EEG 002", FREQS))
    c = np.asarray(ew.cwt("EEG 002", FREQS)).astype(np.complex128)
    want = np.abs((c / np.abs(c)).mean(axis=0))  # mneutils.py:68-71
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_all_channel_batch(epochs):
    ew = nw.EpochsWavelet(epochs, nw.Morse(1000.0))
    p_all = np.asarray(ew.power_all(FREQS))
    assert p_all.shape == (3, len(FREQS), 1000)
    p_one = np.asarray(
        nw.EpochsWavelet(epochs, nw.Morse(1000.0)).power("EEG 001", FREQS))
    np.testing.assert_allclose(p_all[1], p_one, rtol=1e-4, atol=1e-7)


def test_cache_invalidation_on_mutation(epochs):
    """The data cache refetches when the epochs object visibly changes
    (crop / pick); invalidate() forces a refetch for invisible mutations."""
    ew = nw.EpochsWavelet(epochs, nw.Morse(1000.0))
    p0 = np.asarray(ew.power("EEG 000", FREQS))
    # Visible mutation: crop the epochs to half length.
    epochs._data = epochs._data[..., :500]
    p1 = np.asarray(ew.power("EEG 000", FREQS[:1]))
    assert p1.shape[-1] == 500          # refetched, not the stale 1000
    # Invisible mutation (same shapes): scaled data, explicit invalidate.
    epochs._data = epochs._data * 2.0
    ew.invalidate()
    p2 = np.asarray(ew.power("EEG 000", FREQS[:1]))
    np.testing.assert_allclose(p2, p1 * 4.0, rtol=1e-5)


def test_power_baseline_and_decim(epochs):
    """mne-style conveniences on the adapter: baseline window z-score per
    row + result decimation."""
    from ninwavelets_tpu.ops.baseline import baseline_tf
    ew = nw.EpochsWavelet(epochs, nw.Morse(1000.0))
    plain = ew.power("EEG 000", FREQS)
    got = np.asarray(ew.power("EEG 000", FREQS, baseline=(0.0, 0.2),
                              decim=4))
    want = np.asarray(baseline_tf(plain, 1000.0, 0.0, 0.2,
                                  "zscore"))[..., ::4]
    assert got.shape == (len(FREQS), 250)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    all_got = np.asarray(ew.power_all(FREQS, baseline=(0.0, 0.2), decim=4))
    assert all_got.shape == (3, len(FREQS), 250)
    np.testing.assert_allclose(all_got[0], got, rtol=1e-4, atol=1e-5)


class TestConnectivity:
    """Adapter-level connectivity conveniences vs the ops they wrap."""

    def _locked_epochs(self, e=8, n=1024, sfreq=1000.0, seed=0):
        """ch0/ch1 phase-locked at 40 Hz, ch2 independent."""
        rng = np.random.default_rng(seed)
        t = np.arange(n) / sfreq
        data = np.empty((e, 3, n), np.float32)
        for i in range(e):
            base = rng.uniform(0, 2 * np.pi)
            for ch in range(3):
                lag = ch * np.pi / 4 if ch < 2 else rng.uniform(0, 2 * np.pi)
                data[i, ch] = np.sin(2 * np.pi * 40 * t + base + lag) + \
                    0.3 * rng.standard_normal(n)
        return FakeEpochs(data, sfreq)

    FREQS = np.arange(20.0, 60.0, 5.0)

    def test_plv_matches_op(self):
        from ninwavelets_tpu.ops.bank import make_fft_bank_ri
        from ninwavelets_tpu.ops.connectivity import plv as plv_op
        import jax.numpy as jnp
        ep = self._locked_epochs()
        ew = nw.EpochsWavelet(ep, nw.Morse(1000.0))
        got = np.asarray(ew.plv("EEG 000", "EEG 001", self.FREQS))
        assert got.shape == (self.FREQS.size, 1024)
        w = nw.Morse(1000.0)
        br, _ = make_fft_bank_ri(w._wdef(),
                                 jnp.asarray(self.FREQS, jnp.float32),
                                 1024, 1000.0, w.interpolate,
                                 w.real_wave_length)
        data = ep.get_data()
        want = np.asarray(plv_op(jnp.asarray(data[:, 0]),
                                 jnp.asarray(data[:, 1]), br,
                                 interpolate=w.interpolate))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        row = int(np.argmin(np.abs(self.FREQS - 40.0)))
        assert got[row, 200:-200].mean() > 0.9

    def test_coherence_self_is_one(self):
        ew = nw.EpochsWavelet(self._locked_epochs(), nw.Morse(1000.0))
        c = np.asarray(ew.coherence("EEG 000", "EEG 000", self.FREQS))
        np.testing.assert_allclose(c, 1.0, rtol=1e-4)

    def test_matrix_conveniences(self):
        ew = nw.EpochsWavelet(self._locked_epochs(e=16),
                              nw.Morse(1000.0))
        m = np.asarray(ew.plv_matrix(self.FREQS,
                                     time_range=(0.2, 0.8)))
        assert m.shape == (self.FREQS.size, 3, 3)
        row = int(np.argmin(np.abs(self.FREQS - 40.0)))
        assert m[row, 0, 1] > 0.85 and m[row, 0, 2] < 0.55
        c = np.asarray(ew.coherence_matrix(self.FREQS))
        assert c.shape == (self.FREQS.size, 3, 3)
        np.testing.assert_allclose(c[:, np.arange(3), np.arange(3)], 1.0,
                                   rtol=1e-4)

    def test_pac_epoch_mean(self):
        """Coupled envelope peaks at the (8 Hz, ~60 Hz) cell."""
        rng = np.random.default_rng(1)
        n, sfreq = 4096, 1000.0
        t = np.arange(n) / sfreq
        data = np.empty((4, 1, n), np.float32)
        for i in range(4):
            slow = np.sin(2 * np.pi * 8 * t + rng.uniform(0, 2 * np.pi))
            data[i, 0] = slow + (1 + slow) * np.sin(2 * np.pi * 60 * t) \
                + 0.2 * rng.standard_normal(n)
        ew = nw.EpochsWavelet(FakeEpochs(data, sfreq), nw.Morse(sfreq))
        fp = np.arange(4.0, 13.0, 1.0)
        fa = np.arange(40.0, 100.0, 5.0)
        mi = np.asarray(ew.pac("EEG 000", fp, fa, method="mvl"))
        assert mi.shape == (fp.size, fa.size)
        # The Morse bank is broad at low frequencies — neighbouring phase
        # rows are near-identical, so an exact-argmax assertion is a coin
        # toss.  Assert coupled-vs-uncoupled contrast instead: the
        # (8 Hz, 60 Hz) cell must dominate both uncoupled axes.
        r8 = int(np.argmin(np.abs(fp - 8.0)))
        c60 = int(np.argmin(np.abs(fa - 60.0)))
        assert mi[r8, c60] > 3 * mi[0, c60]    # 4 Hz phase: uncoupled
        assert mi[r8, c60] > 3 * mi[r8, 0]     # 40 Hz amp: uncoupled

    def test_phase_metrics_reject_complex_banks(self):
        ew = nw.EpochsWavelet(self._locked_epochs(),
                              nw.MexicanHat(1000.0))
        with pytest.raises(ValueError, match="analytic"):
            ew.plv("EEG 000", "EEG 001", self.FREQS)
        # coherence is magnitude-based: complex banks are fine
        c = np.asarray(ew.coherence("EEG 000", "EEG 000", self.FREQS))
        assert c.shape == (self.FREQS.size, 1024)


def test_extensions_demo_headless(capsys):
    """The beyond-reference tour runs end to end and its quantitative
    claims hold (locking, coupling contrast, denoise gain, scattering
    separation, frequency learned by descent)."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "extensions_demo", os.path.join(os.path.dirname(__file__), "..",
                                        "examples", "extensions_demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out
    assert "PLV(ch0, ch1) @ 40 Hz: 0.99" in out
    import re
    m = re.search(r"denoise: .* -> ([-\d.]+) dB", out)
    assert m and float(m.group(1)) > 3.5    # gain floor, not a pin
    assert "tremolo" in out
    assert "fit_frequencies" in out and "60" in out
    # volume conduction: PLV fooled, wPLI not; PSI direction positive
    m = re.search(r"PLV ([\d.]+) vs wPLI ([\d.]+) on a\s+zero-lag", out)
    assert m and float(m.group(1)) > 0.9 > float(m.group(2)) + 0.4
    assert re.search(r"PSI \+", out)
    # discrete subsystem lines hold their gains
    m = re.search(r"8 Hz shrinkage ([-\d.]+) ->\s+([-\d.]+) dB", out)
    assert m and float(m.group(2)) > float(m.group(1)) + 3.0
    m = re.search(r"band\s+filter ([-\d.]+) -> ([-\d.]+) dB", out)
    assert m and float(m.group(2)) > float(m.group(1)) + 8.0


class TestRawWavelet:
    """Continuous-recording adapter over the streaming path."""

    class FakeRaw:
        def __init__(self, data, sfreq=1000.0):
            self._data = data
            self.info = {"sfreq": sfreq}
            self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[0])]

        def get_data(self):
            return self._data

    def test_power_matches_whole_signal_interior(self):
        from ninwavelets_tpu.ops.bank import make_fft_bank
        from ninwavelets_tpu.ops.cwt import power as power_jit
        import jax.numpy as jnp
        sfreq, n = 1000.0, 8192
        t = np.arange(n) / sfreq
        data = np.stack([np.sin(2 * np.pi * 60 * t),
                         np.sin(2 * np.pi * 31 * t)]).astype(np.float32)
        rw = nw.RawWavelet(self.FakeRaw(data), nw.Morse(sfreq),
                           window=2048)
        freqs = np.arange(25.0, 80.0, 5.0)
        got = np.asarray(rw.power(freqs))
        assert got.shape == (2, freqs.size, n)
        bank = make_fft_bank(nw.Morse(sfreq)._wdef(), jnp.asarray(
            freqs.astype(np.float32)), n, sfreq)
        want = np.asarray(power_jit(jnp.asarray(data), jnp.asarray(
            np.asarray(bank, np.float32))))
        # interiors match the whole-signal transform; edges differ by the
        # zero-padded halo (linear vs circular convolution)
        m = 1024
        err = np.abs(got[..., m:-m] - want[..., m:-m]).max()
        assert err < 1e-3 * np.abs(want).max()
        one = np.asarray(rw.power_channel("EEG 001", freqs))
        np.testing.assert_allclose(one, got[1], rtol=1e-6, atol=1e-7)

    def test_picks(self):
        data = np.random.default_rng(0).standard_normal((3, 3000)).astype(
            np.float32)
        rw = nw.RawWavelet(self.FakeRaw(data), nw.Morse(1000.0),
                           window=1024)
        p = np.asarray(rw.power([40.0, 50.0], picks=["EEG 002"]))
        assert p.shape == (1, 2, 3000)


class TestRawEpoching:
    """Event-locked epoching of a continuous recording (RawWavelet.epochs)."""

    def _raw(self, sfreq=1000.0):
        # 10 s, 2 channels; a 0.2 s 60 Hz burst begins at every event with
        # the same phase -> strong event-locked ITC at 60 Hz.
        n = 10_000
        rng = np.random.default_rng(7)
        data = 0.05 * rng.standard_normal((2, n)).astype(np.float32)
        events = np.arange(1_000, 9_000, 1_000)
        tt = np.arange(200) / sfreq
        burst = np.sin(2 * np.pi * 60.0 * tt).astype(np.float32)
        for e in events:
            data[:, e:e + 200] += burst
        return TestRawWavelet.FakeRaw(data, sfreq), events

    def test_windows_match_manual_slices(self):
        raw, events = self._raw()
        rw = nw.RawWavelet(raw, nw.Morse(1000.0))
        ew = rw.epochs(events, tmin=-0.1, tmax=0.3)
        got = ew.epochs.get_data()
        # mne convention: both endpoints included
        assert got.shape == (len(events), 2, 401)
        want = np.stack([raw.get_data()[:, e - 100:e + 301] for e in events])
        np.testing.assert_array_equal(got, want.astype(np.float32))
        np.testing.assert_allclose(ew.epochs.times,
                                   -0.1 + np.arange(401) / 1000.0)

    def test_mne_style_events_and_edge_drop(self):
        raw, events = self._raw()
        rw = nw.RawWavelet(raw, nw.Morse(1000.0))
        # (E, 3) events array; add one event too close to each edge
        ev3 = np.stack([np.concatenate([[20], events, [9_990]]),
                        np.zeros(len(events) + 2, int),
                        np.ones(len(events) + 2, int)], axis=1)
        ew = rw.epochs(ev3, tmin=-0.1, tmax=0.3)
        assert len(ew.epochs) == len(events)   # edge events dropped
        with pytest.raises(ValueError):
            rw.epochs([5], tmin=-1.0, tmax=11.0)

    def test_event_locked_itc_and_power(self):
        raw, events = self._raw()
        rw = nw.RawWavelet(raw, nw.Morse(1000.0))
        freqs = np.arange(30.0, 95.0, 10.0)
        itc = np.asarray(rw.itc(freqs, events, tmin=0.0, tmax=0.2))
        assert itc.shape == (2, freqs.size, 201)
        row = int(np.argmin(np.abs(freqs - 60.0)))
        # phase-locked burst: ITC near 1 on its row mid-window, low off-row
        assert itc[0, row, 50:150].mean() > 0.9
        assert itc[0, 0, 50:150].mean() < 0.7
        pw = np.asarray(rw.epoch_power(freqs, events, tmin=0.0, tmax=0.2,
                                       picks=["EEG 001"]))
        assert pw.shape == (1, freqs.size, 201)
        # parity with the epochs adapter over the same windows
        ew = rw.epochs(events, tmin=0.0, tmax=0.2, picks=["EEG 001"])
        np.testing.assert_allclose(pw, np.asarray(ew.power_all(freqs)),
                                   rtol=1e-6, atol=1e-8)


def test_array_epochs_container():
    data = np.random.default_rng(3).standard_normal((4, 2, 500)).astype(
        np.float32)
    ep = nw.ArrayEpochs(data, 250.0, ch_names=["a", "b"])
    assert len(ep) == 4 and ep.info['sfreq'] == 250.0
    ew = nw.EpochsWavelet(ep, nw.Morse(250.0))
    p = np.asarray(ew.power("b", [30.0, 40.0]))
    assert p.shape == (2, 500)
    with pytest.raises(ValueError):
        nw.ArrayEpochs(data[0], 250.0)
    with pytest.raises(ValueError):
        nw.ArrayEpochs(data, 250.0, ch_names=["a"])


def test_induced_evoked_power_split(epochs):
    """induced + evoked decompose total power: a phase-locked tone lives
    in the evoked part; induced drops it (epoch-mean subtracted)."""
    ew = nw.EpochsWavelet(epochs, nw.Morse(1000.0))
    freqs = np.arange(40.0, 90.0, 10.0)
    total = np.asarray(ew.power("EEG 000", freqs))
    induced = np.asarray(ew.induced_power("EEG 000", freqs))
    evoked = np.asarray(ew.evoked_power("EEG 000", freqs))
    assert induced.shape == evoked.shape == total.shape
    # the 60 Hz component is phase-consistent across these epochs:
    row = int(np.argmin(np.abs(freqs - 60.0)))
    m = 200
    assert evoked[row, m:-m].mean() > 5 * induced[row, m:-m].mean()
    assert induced[row, m:-m].mean() < 0.5 * total[row, m:-m].mean()


def test_rawwavelet_ssq(capsys):
    data = (np.sin(np.arange(4096) / 1000.0 * 2 * np.pi * 60)
            .astype(np.float32))[None, :].repeat(2, axis=0)
    rw = nw.RawWavelet(TestRawWavelet.FakeRaw(data), nw.Morse(1000.0),
                       window=1024)
    freqs = np.arange(40.0, 85.0, 5.0)
    s = np.asarray(rw.ssq_power(freqs))
    assert s.shape == (2, freqs.size, 4096)
    row = int(np.argmin(np.abs(freqs - 60.0)))
    m = 500
    # reassignment concentrates the tone onto its row
    assert s[0, row, m:-m].sum() > 0.9 * s[0, :, m:-m].sum()


def test_epochs_superlet_power(epochs):
    ew = nw.EpochsWavelet(epochs, nw.Morse(1000.0))
    freqs = np.arange(40.0, 90.0, 5.0)
    p = np.asarray(ew.superlet_power("EEG 000", freqs, order_max=4))
    assert p.shape == (freqs.size, 1000)
    # the golden composite's 60 Hz survives the multiplicative fusion
    assert freqs[int(np.argmax(p[:, 200:-200].mean(-1)))] == 60.0


class TestSubsetSplit:
    def test_subset_and_split_compose(self):
        rng = np.random.default_rng(0)
        data = rng.standard_normal((12, 3, 256)).astype(np.float32)
        labels = np.array([0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1])
        ew = nw.EpochsWavelet(FakeEpochs(data, 250.0), nw.Morse(250.0))
        sub = ew.subset(labels == 0)
        assert len(sub.epochs) == 6
        np.testing.assert_array_equal(np.asarray(sub._all_data()),
                                      data[labels == 0])
        groups = ew.split(labels)
        assert set(groups) == {0, 1}
        assert len(groups[1].epochs) == 6
        # downstream transforms run on the subset
        p = np.asarray(groups[0].power_all([20.0]))
        assert p.shape == (3, 1, 256)
        # integer-index selection, order preserved
        s2 = ew.subset([3, 1])
        np.testing.assert_array_equal(np.asarray(s2._all_data()),
                                      data[[3, 1]])
        with pytest.raises(ValueError):
            ew.subset(np.zeros(12, bool))
        with pytest.raises(ValueError):
            ew.split(np.zeros(5))


class TestRejectByAnnotation:
    """`RawWavelet.epochs(reject_spans= / reject_annotations=)`."""

    def _raw(self, x, sfreq=250.0):
        raw = type("R", (), {"_d": x.astype(np.float32),
                             "info": {"sfreq": sfreq},
                             "ch_names": [f"c{i}"
                                          for i in range(x.shape[0])],
                             "get_data": lambda s: s._d})()
        return nw.RawWavelet(raw, nw.Morse(sfreq), window=1024)

    def test_explicit_spans(self):
        rng = np.random.default_rng(0)
        rw = self._raw(rng.standard_normal((2, 5000)))
        ev = np.array([500, 1500, 2500, 3500, 4200])
        # bad span 5.8..7.0 s (samples 1450..1750): overlaps the
        # [1475, 1526) window of event 1500 only
        ew = rw.epochs(ev, -0.1, 0.1, reject_spans=[(5.8, 1.2)])
        assert ew._host_data().shape[0] == 4
        # zero-duration annotation: drops only windows containing it
        ew2 = rw.epochs(ev, -0.1, 0.1, reject_spans=[(10.0, 0.0)])
        assert ew2._host_data().shape[0] == 4      # event 2500's window
        ew3 = rw.epochs(ev, -0.1, 0.1, reject_spans=[(8.0, 0.0)])
        assert ew3._host_data().shape[0] == 5      # between windows
        with pytest.raises(ValueError, match="bad-span"):
            rw.epochs(ev, -0.1, 0.1, reject_spans=[(0.0, 30.0)])

    def test_edf_annotations(self, tmp_path):
        from ninwavelets_tpu.io.edf import write_edf
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        p = str(tmp_path / "rec.edf")
        write_edf(p, x, 250.0, annotations=[
            (5.8, 1.2, "BAD_motion"), (14.0, 0.5, "stim")])
        rw = nw.RawWavelet.from_edf(p, nw.Morse(250.0), window=1024)
        ev = np.array([500, 1500, 2500, 3500])
        ew = rw.epochs(ev, -0.1, 0.1, reject_annotations="bad")
        assert ew._host_data().shape[0] == 3       # only 1500 dropped
        # non-matching prefix rejects nothing
        ew2 = rw.epochs(ev, -0.1, 0.1, reject_annotations="nonsense")
        assert ew2._host_data().shape[0] == 4

    def test_annotations_need_reader(self):
        rng = np.random.default_rng(2)
        rw = self._raw(rng.standard_normal((2, 4000)))
        with pytest.raises(ValueError, match="reject_spans"):
            rw.epochs(np.array([1000]), -0.1, 0.1,
                      reject_annotations="bad")


class TestEventCodes:
    """Event-id column survives RawWavelet.epochs -> split()."""

    def test_codes_filtered_and_split(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        raw = type("R", (), {"_d": x, "info": {"sfreq": 250.0},
                             "ch_names": ["a", "b"],
                             "get_data": lambda s: s._d})()
        rw = nw.RawWavelet(raw, nw.Morse(250.0), window=1024)
        # last event falls off the recording edge and must drop WITH
        # its code
        events = np.array([[500, 0, 1], [1500, 0, 2], [2500, 0, 1],
                           [3500, 0, 2], [4999, 0, 7]])
        ew = rw.epochs(events, -0.1, 0.1)
        np.testing.assert_array_equal(ew.event_codes, [1, 2, 1, 2])
        groups = ew.split()
        assert set(groups) == {1, 2}
        assert groups[1]._host_data().shape[0] == 2
        # plain (E,) events carry no codes; bare split() says so
        ew2 = rw.epochs(events[:, 0], -0.1, 0.1)
        assert not hasattr(ew2, "event_codes")
        with pytest.raises(ValueError, match="event_codes"):
            ew2.split()

    def test_subset_carries_codes_and_marker_descriptions(self, tmp_path):
        from ninwavelets_tpu.io.brainvision import write_brainvision
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 250.0, markers=[
            (500, "Stimulus", "S  1"), (1500, "Stimulus", "S  2"),
            (2500, "Stimulus", "S  1"), (3500, "Stimulus", "S  2")])
        rw = nw.RawWavelet.from_brainvision(p, nw.Morse(250.0),
                                            window=1024)
        ew = rw.epochs_from_markers(-0.1, 0.1, kind="Stimulus")
        np.testing.assert_array_equal(
            ew.event_codes, ["S  1", "S  2", "S  1", "S  2"])
        groups = ew.split()
        assert set(groups) == {"S  1", "S  2"}
        sub = ew.subset(np.array([0, 1, 2]))
        np.testing.assert_array_equal(sub.event_codes,
                                      ["S  1", "S  2", "S  1"])
        with pytest.raises(ValueError, match="per event"):
            rw.epochs(np.array([500, 1500]), -0.1, 0.1,
                      codes=np.array([1]))

    def test_codes_survive_composable_cleaning(self):
        """drop_bad / modwt_denoise / regress_out keep event_codes
        aligned, so split() works down the chain."""
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 20000)).astype(np.float32)
        raw = type("R", (), {"_d": x, "info": {"sfreq": 250.0},
                             "ch_names": ["a", "b"],
                             "get_data": lambda s: s._d})()
        rw = nw.RawWavelet(raw, nw.Morse(250.0), window=1024)
        ev = np.stack([np.arange(500, 19500, 1000),
                       np.zeros(19, int),
                       np.tile([1, 2], 10)[:19]], 1)
        ew = rw.epochs(ev, -0.2, 0.2)
        # plant one huge artifact trial; its code must drop with it
        d = ew._host_data().copy()
        d[4] *= 100.0
        ep = type("E", (), {"_d": d, "info": {"sfreq": 250.0},
                            "ch_names": ["a", "b"],
                            "get_data": lambda s: s._d})()
        ew2 = nw.EpochsWavelet(ep, nw.Morse(250.0))
        ew2.event_codes = np.asarray(ew.event_codes)
        tp = np.asarray(
            (d.max(-1) - d.min(-1)).max(-1))      # per-trial worst ptp
        thr = float((np.sort(tp)[-2] + tp.max()) / 2.0)
        clean = ew2.drop_bad(threshold=thr)       # drops only trial 4
        assert clean._host_data().shape[0] == 18
        want = np.delete(np.asarray(ew.event_codes), 4)
        np.testing.assert_array_equal(clean.event_codes, want)
        groups = clean.split()
        assert sum(g._host_data().shape[0]
                   for g in groups.values()) == 18
        # E-preserving transforms pass codes through unchanged
        den = ew2.modwt_denoise()
        np.testing.assert_array_equal(den.event_codes, ew2.event_codes)
