"""MODWPT packet transform + best basis (``ops/wpt.py``) —
beyond-reference extension completing the discrete subsystem."""
import numpy as np
import pytest

from ninwavelets_tpu.ops.dwt import modwt
from ninwavelets_tpu.ops.wpt import (best_basis, best_basis_reconstruct,
                                     imodwpt, modwpt, modwpt_bank,
                                     node_band)

SFREQ = 1000.0


class TestPackets:
    def test_level1_equals_modwt(self):
        """One split is the MODWT's: packet 0 = smooth, packet 1 =
        detail (sequency order puts lowpass first)."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 512)).astype(np.float32)
        w = np.asarray(modwpt(x, "db4", 1))
        m = np.asarray(modwt(x, "db4", 1))
        np.testing.assert_array_equal(w[:, 0], m[:, 1])
        np.testing.assert_array_equal(w[:, 1], m[:, 0])

    def test_tight_frame_and_reconstruction(self):
        br, bi = modwpt_bank("db4", 3, 512)
        mag2 = br.astype(np.float64) ** 2 + bi.astype(np.float64) ** 2
        np.testing.assert_allclose(mag2.sum(0), 1.0, atol=1e-6)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((3, 512)).astype(np.float32)
        w = modwpt(x, "db4", 3)
        assert np.asarray(w).shape == (3, 8, 512)
        np.testing.assert_allclose(np.asarray(imodwpt(w, "db4")), x,
                                   atol=2e-6)
        np.testing.assert_allclose(float((np.asarray(w) ** 2).sum()),
                                   float((x ** 2).sum()), rtol=1e-5)

    @pytest.mark.parametrize("b", [0, 1, 3, 6, 7])
    def test_frequency_ordering(self, b):
        """A tone at the center of band b lands in packet b — the P&W
        sequency rule really does frequency-order the tree."""
        n = 2048
        t = np.arange(n) / SFREQ
        lo, hi = node_band(3, b)
        tone = np.sin(2 * np.pi * (lo + hi) / 2 * SFREQ * t).astype(
            np.float32)
        e = (np.asarray(modwpt(tone, "db8", 3)) ** 2).sum(-1)
        assert int(np.argmax(e)) == b
        assert e[b] > 0.7 * e.sum()

    def test_validation(self):
        with pytest.raises(ValueError):
            modwpt_bank("db4", 0, 64)
        with pytest.raises(ValueError):
            modwpt_bank("db4", 8, 64)
        with pytest.raises(ValueError):
            imodwpt(np.zeros((3, 64), np.float32))   # 3 != 2^level


class TestBestBasis:
    def _tone(self, f, n=2048, noise=0.0, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / SFREQ
        return (np.sin(2 * np.pi * f * t)
                + noise * rng.standard_normal(n)).astype(np.float32)

    def test_cover_tiles_and_reconstructs(self):
        x = self._tone(166.0, noise=0.5, seed=1)
        nodes, coeffs = best_basis(x, "db8", 4)
        bands = sorted(node_band(*nd) for nd in nodes)
        assert abs(bands[0][0]) < 1e-12
        assert abs(bands[-1][1] - 0.5) < 1e-12
        for (a, b_), (c, _) in zip(bands, bands[1:]):
            assert abs(b_ - c) < 1e-12          # disjoint, gap-free
        xr = np.asarray(best_basis_reconstruct(nodes, coeffs, "db8"))
        np.testing.assert_allclose(xr, x, atol=1e-5)

    def test_pure_tone_splits_deep(self):
        """Concentrating a narrowband signal always pays under the CW
        functional: a pure tone drives the prune to max_level."""
        nodes, _ = best_basis(self._tone(166.0), "db8", 4)
        assert all(j == 4 for j, _ in nodes)

    def test_band_selective_denoise(self):
        """Keeping only the node(s) covering the tone's band strips
        out-of-band noise."""
        tone = self._tone(166.0)
        noisy = self._tone(166.0, noise=0.5, seed=2)
        nodes, coeffs = best_basis(noisy, "db8", 4)
        keep = [nd for nd in nodes
                if node_band(*nd)[0] <= 166.0 / SFREQ < node_band(*nd)[1]]
        xr = np.asarray(best_basis_reconstruct(nodes, coeffs, "db8",
                                               keep=keep))
        assert ((xr - tone) ** 2).mean() < 0.15 * ((noisy - tone) ** 2).mean()
        with pytest.raises(ValueError):
            best_basis_reconstruct(nodes, coeffs, "db8", keep=[])

    def test_cost_variants_and_validation(self):
        x = self._tone(100.0, n=512)
        for cost in ("energy_log", "threshold"):
            nodes, coeffs = best_basis(x, "db4", 3, cost=cost)
            xr = np.asarray(best_basis_reconstruct(nodes, coeffs, "db4"))
            np.testing.assert_allclose(xr, x, atol=1e-5)
        with pytest.raises(ValueError):
            best_basis(x, "db4", 3, cost="nope")
