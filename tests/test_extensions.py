"""Extension families (Paul, DOG, Bump) and cross-signal ops."""
import jax.numpy as jnp
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import extensions as ext
from ninwavelets_tpu.ops.bank import make_fft_bank


SFREQ = 1000.0


@pytest.mark.parametrize("cls,kw", [(nw.Paul, {"m": 4.0}),
                                    (nw.DOG, {"m": 2.0}),
                                    (nw.Bump, {"sigma": 0.6})])
class TestExtensionFamilies:
    def test_spectrum_peaks_at_analysis_freq(self, cls, kw):
        w = cls(SFREQ, **kw)
        grid = jnp.linspace(0.0, 500.0, 4001)
        spec = np.asarray(w.trans_formula(grid, 60.0))
        peak = float(grid[int(np.argmax(spec))])
        assert abs(peak - 60.0) < 1.0
        assert spec.max() == pytest.approx(2.0, rel=1e-3)
        assert spec[0] == 0.0          # analytic: nothing at DC

    def test_cwt_finds_sine(self, cls, kw):
        w = cls(SFREQ, **kw)
        sig = np.sin(2 * np.pi * 60 * np.arange(2000) / SFREQ)
        p = np.asarray(w.power(sig, np.arange(20.0, 101.0, 2.0)))
        found = 20.0 + 2.0 * int(np.argmax(p.mean(-1)))
        assert abs(found - 60.0) <= 2.0

    def test_float32_stability_far_from_peak(self, cls, kw):
        """High grid values (w >> 1) must underflow to 0, not NaN/inf."""
        w = cls(SFREQ, **kw)
        spec = np.asarray(w.trans_formula(jnp.asarray([0.0, 1e4, 5e4]), 1.0))
        assert np.isfinite(spec).all()


class TestCrossOps:
    def _bank(self, n):
        m = nw.Morse(SFREQ)
        return make_fft_bank(m._wdef(), jnp.arange(20.0, 80.0, 5.0), n,
                             SFREQ)

    def test_cross_power_self_is_power(self):
        sig = np.sin(2 * np.pi * 40 * np.arange(1000) / SFREQ).astype(
            np.float32)
        bank = self._bank(1000)
        xr, xi = ext.cross_power_from_bank(jnp.asarray(sig),
                                           jnp.asarray(sig), bank)
        from ninwavelets_tpu.ops.cwt import power_from_bank
        want = np.asarray(power_from_bank(jnp.asarray(sig), bank))
        np.testing.assert_allclose(np.asarray(xr), want, rtol=1e-4,
                                   atol=1e-6)
        assert np.abs(np.asarray(xi)).max() < 1e-5 * want.max()

    def test_coherence_identical_signals_is_one(self):
        rng = np.random.default_rng(0)
        sigs = rng.standard_normal((6, 1000)).astype(np.float32)
        bank = self._bank(1000)
        coh = np.asarray(ext.epoch_coherence_from_bank(
            jnp.asarray(sigs), jnp.asarray(sigs), bank))
        np.testing.assert_allclose(coh, 1.0, atol=1e-3)

    def test_coherence_independent_noise_is_low(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((40, 1000)).astype(np.float32)
        b = rng.standard_normal((40, 1000)).astype(np.float32)
        bank = self._bank(1000)
        coh = np.asarray(ext.epoch_coherence_from_bank(
            jnp.asarray(a), jnp.asarray(b), bank))
        # E[coherence] ~ 1/E for independent signals.
        assert np.median(coh) < 0.15
        assert coh.min() >= 0.0 and coh.max() <= 1.0 + 1e-4

    def test_coherent_signal_with_phase_lag(self):
        """A common 40 Hz component with fixed lag -> coherence ~1 at 40 Hz
        with the lag visible in the cross-spectrum phase."""
        rng = np.random.default_rng(1)
        t = np.arange(1000) / SFREQ
        common = np.sin(2 * np.pi * 40 * t)
        lagged = np.sin(2 * np.pi * 40 * (t - 0.005))   # 5 ms lag
        a = (common[None] + 0.5 * rng.standard_normal((12, 1000))).astype(
            np.float32)
        b = (lagged[None] + 0.5 * rng.standard_normal((12, 1000))).astype(
            np.float32)
        bank = self._bank(1000)
        coh = np.asarray(ext.epoch_coherence_from_bank(
            jnp.asarray(a), jnp.asarray(b), bank))
        row_40 = 4  # freqs 20,25,...: 40 Hz is index 4
        assert coh[row_40, 200:800].mean() > 0.8
        xr, xi = ext.cross_power_from_bank(jnp.asarray(a[0]),
                                           jnp.asarray(b[0]), bank)
        phase = np.angle(np.asarray(xr)[row_40, 500]
                         + 1j * np.asarray(xi)[row_40, 500])
        # 5 ms at 40 Hz = 0.2 cycles = 1.257 rad lead of a over b.
        assert abs(phase - 2 * np.pi * 40 * 0.005) < 0.35
