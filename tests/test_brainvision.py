"""BrainVision IO (`io/brainvision.py`): write/read round trips over
both layouts and binary formats, gather-vs-get_data parity with halo
padding, markers, and the RawWavelet entry point."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.io.brainvision import (BVRaw, BVReader, BVSource,
                                            read_markers,
                                            write_brainvision)


def _data(c=4, n=5000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 1000.0
    return np.stack([np.sin(2 * np.pi * (10 + 5 * i) * t)
                     + 0.1 * rng.standard_normal(n)
                     for i in range(c)]).astype(np.float32)


class TestRoundTrip:
    @pytest.mark.parametrize("orientation", ["MULTIPLEXED",
                                             "VECTORIZED"])
    def test_float32(self, tmp_path, orientation):
        x = _data()
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0,
                          ch_names=["Fz", "Cz", "Pz", "Oz"],
                          orientation=orientation)
        r = BVReader(p)
        assert r.ch_names == ["Fz", "Cz", "Pz", "Oz"]
        assert r.sfreq == pytest.approx(1000.0)
        assert r.n_samples == 5000
        np.testing.assert_allclose(r.get_data(), x, rtol=1e-6,
                                   atol=1e-6)

    def test_int16_resolution(self, tmp_path):
        x = _data(seed=1)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 500.0, binary_format="INT_16",
                          resolution=0.001)
        r = BVReader(p)
        # quantization error bounded by half a resolution step
        np.testing.assert_allclose(r.get_data(), x, atol=0.0006)

    def test_picks_and_validation(self, tmp_path):
        x = _data()
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0,
                          ch_names=["Fz", "Cz", "Pz", "Oz"])
        r = BVReader(p)
        np.testing.assert_allclose(r.get_data(["Pz", "Fz"]),
                                   x[[2, 0]], rtol=1e-6)
        with pytest.raises(ValueError, match="not in file"):
            r.get_data(["nope"])
        with pytest.raises(ValueError):
            write_brainvision(str(tmp_path / "b.vhdr"), x, 1000.0,
                              orientation="DIAGONAL")


class TestGather:
    @pytest.mark.parametrize("orientation", ["MULTIPLEXED",
                                             "VECTORIZED"])
    def test_matches_get_data_with_halo(self, tmp_path, orientation):
        x = _data(seed=2)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0, orientation=orientation)
        r = BVReader(p)
        win, halo = 512, 64
        starts = [0, 100, 4488]            # edge, interior, tail
        got = r.gather(starts, win, halo)
        assert got.shape == (3, 4, win + 2 * halo)
        full = r.get_data()
        for w, s in enumerate(starts):
            lo, hi = s - halo, s + win + halo
            want = np.zeros((4, win + 2 * halo), np.float32)
            clo, chi = max(lo, 0), min(hi, 5000)
            want[:, clo - lo:chi - lo] = full[:, clo:chi]
            np.testing.assert_allclose(got[w], want, rtol=1e-6,
                                       atol=1e-6)

    def test_source_contract(self, tmp_path):
        x = _data(seed=3)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0,
                          ch_names=["a", "b", "c", "d"])
        src = BVSource(p, picks=["c", "a"])
        assert src.lead == (2,) and src.n_samples == 5000
        got = src.gather([100], 256, 0)
        np.testing.assert_allclose(got[0], x[[2, 0], 100:356],
                                   rtol=1e-6)


class TestMarkers:
    def test_roundtrip(self, tmp_path):
        x = _data()
        p = str(tmp_path / "rec.vhdr")
        mks = [(100, "Stimulus", "S  1"), (900, "Stimulus", "S  2"),
               (2500, "Response", "R  1")]
        write_brainvision(p, x, 1000.0, markers=mks)
        r = BVReader(p)
        assert r.markers == mks
        # direct parse too
        assert read_markers(str(tmp_path / "rec.vmrk")) == mks


class TestRawWavelet:
    def test_streaming_power_matches_memory(self, tmp_path):
        x = _data(c=2, n=8000, seed=4)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0, ch_names=["c0", "c1"],
                          markers=[(1000, "Stimulus", "S  1")])
        rw = nw.RawWavelet.from_brainvision(p, nw.Morse(1000.0),
                                            window=2048)
        freqs = [20.0, 40.0]
        got = np.asarray(rw.power(freqs))
        mem = nw.RawWavelet(
            type("R", (), {"_d": x, "info": {"sfreq": 1000.0},
                           "ch_names": ["c0", "c1"],
                           "get_data": lambda s: s._d})(),
            nw.Morse(1000.0), window=2048)
        want = np.asarray(mem.power(freqs))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert rw.raw.reader.markers[0][0] == 1000


class TestPickedStreaming:
    def test_from_brainvision_with_picks(self, tmp_path):
        x = _data(c=3, n=8000, seed=5)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0, ch_names=["a", "b", "c"])
        rw = nw.RawWavelet.from_brainvision(p, nw.Morse(1000.0),
                                            picks=["c", "a"],
                                            window=2048)
        got = np.asarray(rw.power([30.0]))
        assert got.shape == (2, 1, 8000)
        mem = nw.RawWavelet(
            type("R", (), {"_d": x[[2, 0]], "info": {"sfreq": 1000.0},
                           "ch_names": ["c", "a"],
                           "get_data": lambda s: s._d})(),
            nw.Morse(1000.0), window=2048)
        want = np.asarray(mem.power([30.0]))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestMarkerEpochs:
    def test_epochs_from_markers(self, tmp_path):
        rng = np.random.default_rng(6)
        n = 10000
        t = np.arange(n) / 1000.0
        x = (0.2 * rng.standard_normal((2, n))).astype(np.float32)
        # evoked bump after each "S  1" marker
        events = [1000, 3000, 5000, 7000]
        bump = np.exp(-0.5 * ((np.arange(300) - 150) / 40.0) ** 2)
        for s in events:
            x[0, s:s + 300] += 3.0 * bump.astype(np.float32)
        mks = ([(s, "Stimulus", "S  1") for s in events]
               + [(2000, "Stimulus", "S  2"), (500, "Response", "R  1")])
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0, ch_names=["c0", "c1"],
                          markers=sorted(mks))
        rw = nw.RawWavelet.from_brainvision(p, nw.Morse(1000.0))
        ew = rw.epochs_from_markers(-0.1, 0.4, description="S  1")
        assert len(ew.epochs) == 4
        data = np.asarray(ew._all_data())
        assert data.shape == (4, 2, 501)
        # evoked bump sits at ~150 ms post-marker in every epoch
        ev = data.mean(0)[0]
        assert abs(int(np.argmax(ev)) - (100 + 150)) < 20
        # kind filter
        ew2 = rw.epochs_from_markers(-0.1, 0.4, kind="Stimulus")
        assert len(ew2.epochs) == 5
        with pytest.raises(ValueError, match="no markers match"):
            rw.epochs_from_markers(-0.1, 0.4, description="nope")
        # raws without markers refuse
        class R:
            _d = x; info = {"sfreq": 1000.0}; ch_names = ["c0", "c1"]
            def get_data(self): return self._d
        with pytest.raises(ValueError, match="no markers"):
            nw.RawWavelet(R(), nw.Morse(1000.0)).epochs_from_markers(
                -0.1, 0.4)


class TestRobustness:
    def test_vendor_style_header_with_comment_section(self, tmp_path):
        """Real BrainVision Recorder headers carry a free-form
        [Comment] section (and '%' in values) that must not break the
        parser."""
        x = _data(c=2)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0, ch_names=["Fz", "Cz"])
        with open(p, "a", encoding="utf-8") as f:
            f.write("\n[Comment]\n"
                    "A m p l i f i e r  S e t u p\n"
                    "=============================\n"
                    "Chn Name Res % of full scale\n"
                    "1 Fz 0.1 100%\n")
        r = BVReader(p)
        assert r.ch_names == ["Fz", "Cz"]
        np.testing.assert_allclose(r.get_data(), x, rtol=1e-6,
                                   atol=1e-6)

    def test_marker_commas_and_bad_positions(self, tmp_path):
        x = _data(c=2)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 1000.0,
                          markers=[(500, "Comment", "bad, electrode"),
                                   (900, "Stimulus", "S  1")])
        r = BVReader(p)
        assert r.markers == [(500, "Comment", "bad, electrode"),
                             (900, "Stimulus", "S  1")]
        # a corrupt position is skipped, never mapped to sample 0
        vmrk = str(tmp_path / "rec.vmrk")
        with open(vmrk, "a", encoding="utf-8") as f:
            f.write("Mk3=Stimulus,oops,notanint,1,0\n")
        assert read_markers(vmrk) == r.markers


class TestAnnotationSpans:
    """Duration-carrying markers -> EDF-convention annotations ->
    reject-by-annotation epoching."""

    def test_spans_and_reject(self, tmp_path):
        import ninwavelets_tpu as nw
        from ninwavelets_tpu.io.brainvision import (BVReader,
                                                    read_marker_spans,
                                                    write_brainvision)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 5000)).astype(np.float32)
        p = str(tmp_path / "rec.vhdr")
        write_brainvision(p, x, 250.0, markers=[
            (100, "Stimulus", "S  1"),
            (1450, "Bad Interval", "", 300),      # 5.8 s .. 7.0 s
            (2000, "Comment", "note, with comma", 5)])
        spans = read_marker_spans(str(tmp_path / "rec.vmrk"))
        assert (1450, 300, "Bad Interval", "") in spans
        assert (100, 1, "Stimulus", "S  1") in spans
        r = BVReader(p)
        ann = r.read_annotations()
        assert (5.8, 1.2, "Bad Interval") in ann
        assert any(t == "Comment: note, with comma" for _, _, t in ann)
        # reject_annotations drops only the overlapping event window
        rw = nw.RawWavelet.from_brainvision(p, nw.Morse(250.0),
                                            window=1024)
        ev = np.array([500, 1500, 2500, 3500])
        ew = rw.epochs(ev, -0.1, 0.1, reject_annotations="bad")
        assert ew._host_data().shape[0] == 3
