"""EMD / EEMD (`ops/emd.py`): spline envelopes against scipy oracles,
exact completeness, tone separation, ensemble averaging, and degenerate
inputs."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.interpolate import Akima1DInterpolator, CubicSpline

# `ops.emd` the function shadows the module attribute; import by path
from ninwavelets_tpu.ops import emd as em

SFREQ = 500.0
N = 2048


def _two_tones(a_hi=1.0, a_lo=1.0, f_hi=40.0, f_lo=4.0):
    t = np.arange(N) / SFREQ
    hi = a_hi * np.sin(2 * np.pi * f_hi * t)
    lo = a_lo * np.sin(2 * np.pi * f_lo * t)
    return (hi + lo).astype(np.float32), hi, lo


def _corr(a, b):
    a = np.asarray(a, np.float64) - np.mean(a)
    b = np.asarray(b, np.float64) - np.mean(b)
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-30))


class TestSplineOracle:
    """The batched padded-knot spline evaluators against scipy, on knot
    sets built by the module's own boundary rule."""

    def _knot_set(self, seed, n=256):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal(n).astype(np.float32)
        x = np.convolve(x, np.hanning(21) / np.hanning(21).sum(),
                        mode="same").astype(np.float32)  # smooth-ish
        xj = jnp.asarray(x)[None]
        mask = em._interior_extrema(xj, "max")
        t, y, k, mask_full = em._knots(xj, mask)
        return x, t, y, k, mask_full

    def test_natural_matches_scipy(self):
        for seed in range(4):
            x, t, y, k, mask = self._knot_set(seed)
            n = x.shape[-1]
            kv = int(k[0])
            assert kv >= 4  # needs real interior knots to be a test
            env = np.asarray(em._envelope(
                jnp.asarray(x)[None], em._interior_extrema(
                    jnp.asarray(x)[None], "max"), "natural"))[0]
            tt = np.asarray(t[0, :kv], np.float64)
            yy = np.asarray(y[0, :kv], np.float64)
            ref = CubicSpline(tt, yy, bc_type="natural")(np.arange(n))
            scale = np.max(np.abs(ref)) + 1e-9
            assert np.max(np.abs(env - ref)) / scale < 2e-4

    def test_akima_matches_scipy(self):
        for seed in range(4):
            x, t, y, k, mask = self._knot_set(seed)
            n = x.shape[-1]
            kv = int(k[0])
            if kv < 5:
                continue  # scipy akima needs >= 5 for interior rule
            env = np.asarray(em._envelope(
                jnp.asarray(x)[None], em._interior_extrema(
                    jnp.asarray(x)[None], "max"), "akima"))[0]
            tt = np.asarray(t[0, :kv], np.float64)
            yy = np.asarray(y[0, :kv], np.float64)
            ref = Akima1DInterpolator(tt, yy)(np.arange(n))
            # scipy's akima differs at the two boundary knots (it uses a
            # different end rule than the classic ghost-point extension)
            # — compare the interior span.
            lo, hi = int(tt[2]), int(tt[-3])
            scale = np.max(np.abs(ref[lo:hi])) + 1e-9
            assert np.max(np.abs(env[lo:hi] - ref[lo:hi])) / scale < 2e-4


class TestEMD:
    def test_completeness_exact(self):
        sig, _, _ = _two_tones()
        imfs, res = em.emd(sig)
        recon = np.asarray(jnp.sum(imfs, axis=-2) + res)
        np.testing.assert_allclose(recon, sig, atol=2e-5)

    def test_two_tone_separation(self):
        sig, hi, lo = _two_tones()
        imfs, res = em.emd(sig, n_imfs=4)
        imfs = np.asarray(imfs)
        # IMF 1 carries the fast tone; the slow tone lands in a later
        # IMF (possibly split with the residual trend).
        assert _corr(imfs[0], hi) > 0.95
        rest = imfs[1:].sum(0) + np.asarray(res)
        assert _corr(rest, lo) > 0.95

    def test_akima_two_tone(self):
        sig, hi, lo = _two_tones()
        imfs, res = em.emd(sig, n_imfs=4, spline="akima")
        assert _corr(np.asarray(imfs)[0], hi) > 0.95

    def test_batched_matches_single(self):
        sig1, _, _ = _two_tones()
        sig2, _, _ = _two_tones(a_hi=0.5, f_hi=60.0)
        both = np.stack([sig1, sig2])
        ib, rb = em.emd(both, n_imfs=3)
        i1, r1 = em.emd(sig1, n_imfs=3)
        np.testing.assert_allclose(np.asarray(ib)[0], np.asarray(i1),
                                   atol=1e-6)

    def test_monotone_input_freezes(self):
        ramp = np.linspace(-1.0, 1.0, N).astype(np.float32)
        imfs, res = em.emd(ramp, n_imfs=3)
        np.testing.assert_allclose(np.asarray(imfs), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(res), ramp, atol=1e-7)

    def test_constant_input(self):
        const = np.full(N, 0.7, np.float32)
        imfs, res = em.emd(const, n_imfs=2)
        np.testing.assert_allclose(np.asarray(imfs), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(res), const, atol=1e-7)

    def test_validation(self):
        with pytest.raises(ValueError):
            em.emd(np.zeros(4, np.float32))
        with pytest.raises(ValueError):
            em.emd(np.zeros(64, np.float32), spline="pchip")

    def test_float32_surface(self):
        sig, _, _ = _two_tones()
        imfs, res = em.emd(sig.astype(np.float64), n_imfs=2)
        assert imfs.dtype == jnp.float32 and res.dtype == jnp.float32


class TestEEMD:
    def test_reconstruction_and_separation(self):
        sig, hi, lo = _two_tones()
        imfs, res = em.eemd(sig, n_imfs=4, n_ensembles=24,
                            noise_strength=0.2, seed=3)
        recon = np.asarray(jnp.sum(imfs, axis=-2) + res)
        np.testing.assert_allclose(recon, sig, atol=2e-5)
        # with added noise the tone may shift one IMF down (IMF 1 of the
        # perturbed copies is part noise) — check the best match, and
        # that the first two IMFs jointly carry the fast tone.
        assert max(_corr(np.asarray(imfs)[j], hi) for j in range(2)) > 0.7
        assert _corr(np.asarray(imfs)[:2].sum(0), hi) > 0.9

    def test_intermittent_mode_mixing_improved(self):
        # classic EEMD demo: a weak intermittent burst riding a tone
        # mode-mixes in plain EMD; the ensemble average separates the
        # carrier more cleanly.
        t = np.arange(N) / SFREQ
        carrier = np.sin(2 * np.pi * 8.0 * t)
        burst = 0.4 * np.sin(2 * np.pi * 80.0 * t)
        burst *= (np.sin(2 * np.pi * 1.0 * t) > 0.95)
        sig = (carrier + burst).astype(np.float32)
        i_emd, _ = em.emd(sig, n_imfs=4)
        i_eemd, _ = em.eemd(sig, n_imfs=4, n_ensembles=32, seed=1)
        # the carrier should be concentrated in ONE eemd IMF
        best_eemd = max(_corr(np.asarray(i_eemd)[j], carrier)
                        for j in range(4))
        best_emd = max(_corr(np.asarray(i_emd)[j], carrier)
                       for j in range(4))
        assert best_eemd > 0.95
        assert best_eemd >= best_emd - 0.02


class TestHilbertHuang:
    def test_imf_instantaneous_frequency(self):
        # the Hilbert-Huang pipeline: EMD modes feed ops.vmd.instantaneous
        from ninwavelets_tpu.ops import instantaneous
        sig, hi, lo = _two_tones()
        imfs, _ = em.emd(sig, n_imfs=2)
        if_hz, amp = instantaneous(imfs, SFREQ, smooth=9)
        mid = slice(N // 4, 3 * N // 4)
        f0 = float(np.median(np.asarray(if_hz)[0, mid]))
        assert abs(f0 - 40.0) < 2.0
