"""Spectral parametrization (`ops/specparam.py`): synthetic spectra with
known aperiodic and peak parameters must be recovered."""
import numpy as np
import pytest

from ninwavelets_tpu.ops import specparam

FREQS = np.arange(2.0, 80.0, 0.5)


def _spectrum(offset, exponent, peaks=(), noise=0.0, seed=0, knee=0.0):
    rng = np.random.default_rng(seed)
    logp = offset - np.log10(knee + FREQS ** exponent)
    for c, a, w in peaks:
        logp = logp + a * np.exp(-0.5 * ((FREQS - c) / w) ** 2)
    logp = logp + noise * rng.standard_normal(FREQS.size)
    return 10.0 ** logp


class TestSpecparam:
    def test_recovers_aperiodic_and_peaks(self):
        power = _spectrum(1.2, 1.5, [(10.0, 0.6, 1.5), (22.0, 0.3, 3.0)],
                          noise=0.02)
        fit = specparam(power, FREQS, max_peaks=4)
        assert float(fit.offset) == pytest.approx(1.2, abs=0.05)
        assert float(fit.exponent) == pytest.approx(1.5, abs=0.05)
        assert float(fit.r_squared) > 0.99
        peaks = fit.peaks(min_amplitude=0.1)
        assert len(peaks) == 2
        assert peaks[0]["center"] == pytest.approx(10.0, abs=0.5)
        assert peaks[0]["amplitude"] == pytest.approx(0.6, abs=0.1)
        assert peaks[1]["center"] == pytest.approx(22.0, abs=1.0)

    def test_pure_aperiodic_has_no_peaks(self):
        power = _spectrum(0.5, 2.0, noise=0.01, seed=3)
        fit = specparam(power, FREQS, max_peaks=3)
        assert float(fit.exponent) == pytest.approx(2.0, abs=0.05)
        assert fit.peaks(min_amplitude=0.1) == []

    def test_batched(self):
        p1 = _spectrum(1.0, 1.0, [(12.0, 0.5, 2.0)], noise=0.01, seed=1)
        p2 = _spectrum(0.3, 2.5, noise=0.01, seed=2)
        fit = specparam(np.stack([p1, p2]), FREQS, max_peaks=3)
        assert fit.exponent.shape == (2,)
        assert fit.exponent[0] == pytest.approx(1.0, abs=0.07)
        assert fit.exponent[1] == pytest.approx(2.5, abs=0.07)
        assert fit.amplitudes[0].max() > 0.3
        assert fit.amplitudes[1].max() < 0.1

    def test_knee(self):
        power = _spectrum(2.0, 2.0, knee=100.0, noise=0.005, seed=4)
        fit = specparam(power, FREQS, max_peaks=2, fit_knee=True,
                        n_steps=4000)
        assert float(fit.r_squared) > 0.995
        # the knee model must beat the knee-less fit on this spectrum
        flat = specparam(power, FREQS, max_peaks=2, fit_knee=False)
        assert float(fit.r_squared) > float(flat.r_squared)

    def test_validation(self):
        with pytest.raises(ValueError):
            specparam(np.ones(10), np.linspace(0.0, 5.0, 10))
        with pytest.raises(ValueError):
            specparam(np.ones(9), FREQS)

    def test_on_engine_spectrum(self):
        # end to end off the global wavelet spectrum of a noisy alpha
        import ninwavelets_tpu as nw
        rng = np.random.default_rng(5)
        sfreq, n = 250.0, 4096
        t = np.arange(n) / sfreq
        # 1/f-ish noise: cumulative sum of white noise (brown, exp ~2)
        sig = np.cumsum(rng.standard_normal(n)).astype(np.float32)
        sig = sig - sig.mean()
        sig = sig / sig.std()
        sig = sig + 1.5 * np.sin(2 * np.pi * 10 * t).astype(np.float32)
        freqs = np.arange(2.0, 40.0, 0.5)
        power = np.asarray(nw.Morse(sfreq).power(sig, freqs)).mean(-1)
        fit = specparam(power, freqs, max_peaks=3)
        assert 1.0 < float(fit.exponent) < 3.2   # brownian-ish slope
        peaks = fit.peaks(min_amplitude=0.15)
        assert peaks and abs(peaks[0]["center"] - 10.0) < 1.5


def test_adapter_specparam():
    import ninwavelets_tpu as nw
    rng = np.random.default_rng(6)
    sfreq, n = 250.0, 2048
    t = np.arange(n) / sfreq
    data = (np.cumsum(rng.standard_normal((6, 1, n)), -1)
            / 20.0).astype(np.float32)
    data[:, 0] += (2.0 * np.sin(2 * np.pi * 11 * t)).astype(np.float32)
    ew = nw.EpochsWavelet(nw.ArrayEpochs(data, sfreq, ch_names=["c"]),
                          nw.Morse(sfreq))
    fit = ew.specparam("c", np.arange(3.0, 40.0, 0.5))
    assert float(fit.r_squared) > 0.9
    peaks = fit.peaks(min_amplitude=0.15)
    # a very tall line decomposes into stacked Gaussians; at least one
    # sits on the 11 Hz oscillation
    assert peaks and min(abs(p["center"] - 11.0) for p in peaks) < 2.5


def test_pipeline_specparam_stage():
    import ninwavelets_tpu.config as cfg

    class FakeEpochs:
        info = {'sfreq': 250.0}
        ch_names = ['a']
        def get_data(self):
            rng = np.random.default_rng(1)
            t = np.arange(1024) / 250.0
            x = np.cumsum(rng.standard_normal((6, 1, 1024)), -1) / 10.0
            return x + 2.0 * np.sin(2 * np.pi * 10 * t)

    out = cfg.run_pipeline(
        cfg.PipelineConfig(freqs=(3.0, 40.0, 1.0), global_spectrum=True,
                           specparam=True), FakeEpochs())
    fit = out["specparam"]
    assert fit.exponent.shape == (1,)
    assert float(fit.r_squared[0]) > 0.8
    with pytest.raises(ValueError, match="global_spectrum"):
        cfg.run_pipeline(cfg.PipelineConfig(freqs=(3.0, 40.0, 1.0),
                                            specparam=True), FakeEpochs())


def test_raw_specparam():
    import ninwavelets_tpu as nw
    rng = np.random.default_rng(9)
    sfreq, n = 250.0, 4096
    t = np.arange(n) / sfreq
    data = np.cumsum(rng.standard_normal((2, n)), -1).astype(np.float32)
    data /= data.std(-1, keepdims=True)
    data[0] += (2.0 * np.sin(2 * np.pi * 10 * t)).astype(np.float32)

    class FakeRaw:
        info = {"sfreq": sfreq}
        ch_names = ["a", "b"]
        def get_data(self):
            return data

    rw = nw.RawWavelet(FakeRaw(), nw.Morse(sfreq), window=1024)
    freqs = np.arange(3.0, 40.0, 0.5)
    fit = rw.specparam(freqs)
    assert fit.exponent.shape == (2,)
    # wavelet-smoothed brownian spectra flatten somewhat at these freqs
    assert all(0.4 < e < 3.5 for e in fit.exponent)
    # channel a has the alpha line, channel b does not
    amp_a = fit.amplitudes[0].max()
    amp_b = fit.amplitudes[1].max()
    assert amp_a > 0.2 and amp_a > 2 * amp_b
