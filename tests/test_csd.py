"""Spherical-spline CSD + channel interpolation (`ops/csd.py`):
scipy-Legendre oracle, the analytic surface-Laplacian eigenrelation
(CSD of a degree-n zonal harmonic = n(n+1) x itself), reference
invariance, interpolation accuracy, and the adapter surface."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.csd import (csd, csd_transform,
                                     interpolate_channels,
                                     interpolation_matrix,
                                     spline_matrices, _legendre_series)


def _fib_sphere(c, seed=0):
    """Fibonacci-lattice unit sphere — near-uniform montage."""
    i = np.arange(c, dtype=np.float64) + 0.5
    phi = np.arccos(1 - 2 * i / c)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(phi)], axis=1)


class TestLegendre:
    def test_matches_scipy(self):
        from scipy.special import eval_legendre
        x = np.linspace(-1, 1, 41)
        for m in (3, 4):
            want = np.zeros_like(x)
            for n in range(1, 31):
                want += (2 * n + 1.0) / (n * (n + 1.0)) ** m * \
                    eval_legendre(n, x)
            want /= 4 * np.pi
            got = _legendre_series(x, m, 30)
            np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_kernel_symmetry(self):
        pos = _fib_sphere(16)
        g, h = spline_matrices(pos)
        np.testing.assert_allclose(g, g.T, rtol=1e-12)
        np.testing.assert_allclose(h, h.T, rtol=1e-12)


class TestCSD:
    def test_reference_free(self):
        """Adding any per-sample constant (a reference shift) changes
        the CSD by exactly nothing."""
        rng = np.random.default_rng(0)
        pos = _fib_sphere(32)
        x = rng.standard_normal((32, 200)).astype(np.float32)
        ref = rng.standard_normal(200).astype(np.float32)
        a = np.asarray(csd(x, pos))
        b = np.asarray(csd(x + ref[None, :], pos))
        np.testing.assert_allclose(a, b, atol=2e-5 * np.abs(a).max())

    def test_zonal_harmonic_eigenrelation(self):
        """Surface Laplacian eigenfunctions: CSD(P_n(cos th)) =
        n(n+1) P_n(cos th) on the unit sphere (CSD = -Laplacian)."""
        from scipy.special import eval_legendre
        pos = _fib_sphere(128)
        cz = pos[:, 2]                       # cos(polar angle)
        for n, scale in ((2, 6.0), (3, 12.0)):
            topo = eval_legendre(n, cz).astype(np.float32)
            out = np.asarray(csd(topo[:, None], pos, lam=1e-7))[:, 0]
            # correlation ~1 and the n(n+1) eigenvalue within a few %
            r = np.corrcoef(out, topo)[0, 1]
            assert r > 0.999, (n, r)
            gain = np.sum(out * topo) / np.sum(topo * topo)
            np.testing.assert_allclose(gain, scale, rtol=0.05)

    def test_transform_rows_sum_to_zero(self):
        # T @ const = 0 <-> rows sum to 0
        t = csd_transform(_fib_sphere(24))
        np.testing.assert_allclose(t.sum(axis=1), 0.0, atol=1e-10)

    def test_batched_shapes(self):
        pos = _fib_sphere(8)
        x = np.random.default_rng(1).standard_normal((3, 2, 8, 64))
        out = np.asarray(csd(x.astype(np.float32), pos))
        assert out.shape == (3, 2, 8, 64)
        one = np.asarray(csd(x[1, 0].astype(np.float32), pos))
        np.testing.assert_allclose(out[1, 0], one, rtol=1e-5, atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            csd(np.zeros((4, 10), np.float32), _fib_sphere(5))
        with pytest.raises(ValueError):
            csd(np.zeros((5, 10), np.float32), _fib_sphere(5),
                stiffness=1)
        with pytest.raises(ValueError):
            spline_matrices(np.zeros((4, 3)))


class TestInterpolation:
    def test_smooth_topography_recovered(self):
        from scipy.special import eval_legendre
        rng = np.random.default_rng(2)
        pos = _fib_sphere(64)
        # smooth (low-degree) time-varying field
        t = np.linspace(0, 1, 100)
        topo = (eval_legendre(2, pos[:, 2])[:, None] * np.sin(8 * t) +
                0.5 * eval_legendre(1, pos[:, 0])[:, None] *
                np.cos(5 * t)).astype(np.float32)
        bad = [7, 30, 51]
        corrupted = topo.copy()
        corrupted[bad] = rng.standard_normal((3, 100))
        fixed = np.asarray(interpolate_channels(corrupted, pos, bad))
        err = np.abs(fixed[bad] - topo[bad]).max()
        assert err < 0.05 * np.abs(topo).max()
        # good channels untouched
        good = np.setdiff1d(np.arange(64), bad)
        np.testing.assert_array_equal(fixed[good], corrupted[good])

    def test_matrix_rows_are_affine_weights(self):
        # interpolating a constant field returns that constant:
        # rows sum to 1
        m = interpolation_matrix(_fib_sphere(32), [3, 10])
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-8)

    def test_validation(self):
        pos = _fib_sphere(8)
        with pytest.raises(ValueError):
            interpolation_matrix(pos, [])
        with pytest.raises(ValueError):
            interpolation_matrix(pos, [0, 0])
        with pytest.raises(ValueError):
            interpolation_matrix(pos, [9])
        with pytest.raises(ValueError):
            interpolation_matrix(_fib_sphere(4), [0, 1])


class TestAdapter:
    def test_csd_and_interp_compose(self):
        from scipy.special import eval_legendre
        from tests.test_epochs import FakeEpochs
        rng = np.random.default_rng(3)
        pos = _fib_sphere(16)
        data = (eval_legendre(2, pos[:, 2])[None, :, None] *
                np.sin(2 * np.pi * 10 * np.arange(256) / 1000.0)
                [None, None, :] +
                0.05 * rng.standard_normal((4, 16, 256))
                ).astype(np.float32)
        ew = nw.EpochsWavelet(FakeEpochs(data, 1000.0), nw.Morse(1000.0))
        fixed = ew.interpolate_bads(pos, ["EEG 002"])
        assert len(fixed.epochs) == 4
        lap = fixed.csd(pos)
        p = np.asarray(lap.power_all([10.0]))
        assert p.shape == (16, 1, 256)
        with pytest.raises(ValueError, match="positions"):
            ew.csd(pos[:5])
        with pytest.raises(ValueError, match="ch_names"):
            ew.interpolate_bads(pos, ["nope"])
