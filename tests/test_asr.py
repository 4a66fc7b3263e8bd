"""Artifact subspace reconstruction (`ops/asr.py`): planted-artifact
removal with a known clean subspace, identity on clean data, and the
RawWavelet.asr_clean automatic-calibration workflow."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.asr import asr_calibrate, asr_process

SFREQ = 250.0


def _recording(n_s=60, c=8, n_art=6, seed=0):
    """Low-rank oscillatory brain signal + noise; `n_art` half-second
    windows get a huge artifact along a random direction.  Returns
    (corrupted, clean, artifact sample mask)."""
    rng = np.random.default_rng(seed)
    n = int(n_s * SFREQ)
    t = np.arange(n) / SFREQ
    mix = rng.standard_normal((c, 3))
    src = np.stack([np.sin(2 * np.pi * 10 * t),
                    np.sin(2 * np.pi * 19 * t + 1.0),
                    np.sin(2 * np.pi * 6 * t + 2.0)])
    clean = (mix @ src + 0.3 * rng.standard_normal((c, n))).astype(
        np.float32)
    corrupted = clean.copy()
    mask = np.zeros(n, bool)
    width = int(0.5 * SFREQ)
    starts = rng.choice(np.arange(4 * width, n - 5 * width, 2 * width),
                        n_art, replace=False)
    for s in starts:
        direction = rng.standard_normal(c)
        direction /= np.linalg.norm(direction)
        burst = 20.0 * np.hanning(width).astype(np.float32)
        corrupted[:, s:s + width] += direction[:, None] * burst
        mask[s:s + width] = True
    return corrupted, clean, mask


class TestASR:
    def test_artifacts_removed_clean_preserved(self):
        corrupted, clean, mask = _recording()
        model = asr_calibrate(clean[:, :int(20 * SFREQ)], SFREQ)
        out, keep = asr_process(corrupted, SFREQ, model)
        out = np.asarray(out)
        # artifact windows: error vs truth collapses
        err_before = np.abs(corrupted[:, mask] - clean[:, mask]).mean()
        err_after = np.abs(out[:, mask] - clean[:, mask]).mean()
        assert err_after < 0.25 * err_before, (err_before, err_after)
        # clean stretches barely touched
        q = ~mask
        dist = np.abs(out[:, q] - corrupted[:, q]).mean()
        assert dist < 0.1 * np.abs(corrupted[:, q]).mean()
        # some components were actually rejected somewhere
        assert not np.asarray(keep).all()

    def test_identity_on_clean_input(self):
        _, clean, _ = _recording(seed=1)
        model = asr_calibrate(clean[:, :int(20 * SFREQ)], SFREQ,
                              cutoff=8.0)
        out, keep = asr_process(clean, SFREQ, model)
        # all-kept windows pass through; overall distortion tiny
        frac_kept = float(np.asarray(keep).all(-1).mean())
        assert frac_kept > 0.9
        rel = np.abs(np.asarray(out) - clean).mean() / np.abs(
            clean).mean()
        assert rel < 0.05

    def test_cutoff_monotone(self):
        corrupted, clean, _ = _recording(seed=2)
        cal = clean[:, :int(20 * SFREQ)]
        rej = []
        for cutoff in (3.0, 10.0, 40.0):
            model = asr_calibrate(cal, SFREQ, cutoff=cutoff)
            _, keep = asr_process(corrupted, SFREQ, model)
            rej.append(float(~np.asarray(keep).all(-1).all()) +
                       float((~np.asarray(keep)).mean()))
        assert rej[0] >= rej[1] >= rej[2]

    def test_validation(self):
        with pytest.raises(ValueError):
            asr_calibrate(np.zeros((4, 10, 3), np.float32), SFREQ)
        with pytest.raises(ValueError):
            asr_calibrate(np.zeros((4, 100), np.float32), SFREQ)
        model = asr_calibrate(
            np.random.default_rng(0).standard_normal((4, 4000)).astype(
                np.float32), SFREQ)
        with pytest.raises(ValueError, match="channel count"):
            asr_process(np.zeros((6, 1000), np.float32), SFREQ, model)


class TestRawAdapter:
    class FakeRaw:
        def __init__(self, data, sfreq=SFREQ):
            self._data = data
            self.info = {"sfreq": sfreq}
            self.ch_names = [f"EEG {i:03d}" for i in range(data.shape[0])]

        def get_data(self):
            return self._data

    def test_auto_calibration_workflow(self):
        corrupted, clean, mask = _recording(seed=3)
        rw = nw.RawWavelet(self.FakeRaw(corrupted), nw.Morse(SFREQ))
        out, keep = rw.asr_clean(return_keep=True)
        out = np.asarray(out)
        err_before = np.abs(corrupted[:, mask] - clean[:, mask]).mean()
        err_after = np.abs(out[:, mask] - clean[:, mask]).mean()
        assert err_after < 0.35 * err_before
        assert out.shape == corrupted.shape


class TestDCOffset:
    def test_constant_offsets_pass_through(self):
        """Un-highpassed data with big per-channel DC offsets: the
        offsets must neither trip the keep test (calibration is
        centered) nor be stripped from the output."""
        corrupted, clean, mask = _recording(seed=4)
        offs = np.linspace(-50, 50, corrupted.shape[0])[:, None]
        model = asr_calibrate(clean[:, :int(20 * SFREQ)] + offs, SFREQ)
        out, keep = asr_process(corrupted + offs, SFREQ, model)
        out = np.asarray(out)
        # clean windows keep their offsets and are barely touched
        q = ~mask
        np.testing.assert_allclose(
            out[:, q].mean(-1), (corrupted + offs)[:, q].mean(-1),
            atol=1.0)
        assert float(np.asarray(keep).all(-1).mean()) > 0.8
        # artifacts still removed
        err_b = np.abs((corrupted + offs)[:, mask]
                       - (clean + offs)[:, mask]).mean()
        err_a = np.abs(out[:, mask] - (clean + offs)[:, mask]).mean()
        assert err_a < 0.3 * err_b
