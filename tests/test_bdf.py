"""BDF 24-bit IO (`io/bdf.py`): write/read round trip, 24-bit decode
oracle, gather parity, Status-channel events, and the RawWavelet
streaming path."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.io.bdf import (BDFRaw, BDFReader, _decode24,
                                    status_events, write_bdf)


def _data(c=4, n=5000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 1000.0
    return np.stack([100.0 * np.sin(2 * np.pi * (7 + 3 * i) * t)
                     + 5.0 * rng.standard_normal(n)
                     for i in range(c)]).astype(np.float32)


class TestDecode:
    def test_24bit_two_complement(self):
        vals = np.array([0, 1, -1, 8388607, -8388608, 12345, -54321],
                        np.int64)
        u = np.where(vals < 0, vals + (1 << 24), vals)
        raw = np.empty(3 * vals.size, np.uint8)
        raw[0::3] = u & 0xFF
        raw[1::3] = (u >> 8) & 0xFF
        raw[2::3] = (u >> 16) & 0xFF
        np.testing.assert_array_equal(_decode24(raw), vals)


class TestRoundTrip:
    def test_write_read(self, tmp_path):
        x = _data()
        p = str(tmp_path / "rec.bdf")
        write_bdf(p, x, 1000.0, ch_names=["A1", "A2", "A3", "Status"])
        r = BDFReader(p)
        assert r.ch_names == ["A1", "A2", "A3", "Status"]
        assert r.sfreq == pytest.approx(1000.0)
        got = r.get_data()
        # 24-bit quantization: span/2^24 per channel
        err = np.abs(got - x).max()
        assert err < (x.max() - x.min()) / 2 ** 20
        sub = r.get_data(["A3", "A1"])
        np.testing.assert_allclose(sub, got[[2, 0]], rtol=1e-6)

    def test_rejects_edf(self, tmp_path):
        from ninwavelets_tpu.io.edf import write_edf
        p = str(tmp_path / "rec.edf")
        write_edf(p, np.zeros((2, 500), np.float32), 250.0)
        with pytest.raises(ValueError, match="not a BDF"):
            BDFReader(p)


class TestGather:
    def test_matches_get_data_with_halo(self, tmp_path):
        x = _data(seed=2)
        p = str(tmp_path / "rec.bdf")
        write_bdf(p, x, 1000.0)
        r = BDFReader(p)
        win, halo = 512, 64
        got = r.gather([0, 777, 4488], win, halo)
        full = r.get_data()
        for w, s in enumerate([0, 777, 4488]):
            lo, hi = s - halo, s + win + halo
            want = np.zeros((4, win + 2 * halo), np.float32)
            clo, chi = max(lo, 0), min(hi, 5000)
            want[:, clo - lo:chi - lo] = full[:, clo:chi]
            np.testing.assert_allclose(got[w], want, rtol=1e-5,
                                       atol=1e-5)


class TestStatusEvents:
    def test_rising_edges(self):
        status = np.zeros(1000)
        status[100:150] = 3
        status[400:420] = 7
        status[800:810] = 3
        ev = status_events(status)
        assert ev == [(100, "Status", "3"), (400, "Status", "7"),
                      (800, "Status", "3")]


class TestRawWavelet:
    def test_streaming_matches_memory(self, tmp_path):
        x = _data(c=2, n=8000, seed=3)
        p = str(tmp_path / "rec.bdf")
        write_bdf(p, x, 1000.0, ch_names=["c0", "c1"])
        rw = nw.RawWavelet.from_bdf(p, nw.Morse(1000.0), window=2048)
        got = np.asarray(rw.power([20.0, 40.0]))
        mem = nw.RawWavelet(
            type("R", (), {"_d": x, "info": {"sfreq": 1000.0},
                           "ch_names": ["c0", "c1"],
                           "get_data": lambda s: s._d})(),
            nw.Morse(1000.0), window=2048)
        want = np.asarray(mem.power([20.0, 40.0]))
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestReviewRegressions:
    def test_record_duration_guard(self, tmp_path):
        with pytest.raises(ValueError, match="8-char"):
            write_bdf(str(tmp_path / "x.bdf"),
                      np.zeros((1, 200), np.float32), 300.0,
                      record_duration=2.0 / 3.0)

    def test_status_initial_and_consecutive(self):
        status = np.zeros(500)
        status[:50] = 5                       # active at sample 0
        status[100:200] = 7
        status[200:260] = 3                   # 7 -> 3 without a gap
        ev = status_events(status)
        assert ev == [(0, "Status", "5"), (100, "Status", "7"),
                      (200, "Status", "3")]

    def test_integer_picks(self, tmp_path):
        x = _data()
        p = str(tmp_path / "rec.bdf")
        write_bdf(p, x, 1000.0)
        r = BDFReader(p)
        np.testing.assert_allclose(r.get_data([2, 0]),
                                   r.get_data()[[2, 0]], rtol=1e-6)
