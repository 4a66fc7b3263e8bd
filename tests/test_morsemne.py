"""MorseMNE delegation path, exercised for real (VERDICT r1, missing #1).

mne-python is not installable here, so a minimal ``tfr.cwt``-compatible
double (FFT linear convolution, centered 'same' trim, ``decim`` slicing —
the exact semantics of ``mne.time_frequency.tfr.cwt`` as used by the
reference, ``/root/reference/ninwavelets/wavelets.py:170-191``) is injected
as a fake ``mne`` package.  This validates the delegation, the
``use_fft``/``mode``/``decim`` plumbing, the ``.mean(axis=0)`` epoch
semantics, and the documented deviation: the rebuild honors ``freqs`` where
the reference hardcodes ``range(1, 100)`` (``wavelets.py:189``).
"""
import sys
import types

import numpy as np
import pytest

import ninwavelets_tpu as nw


class _TfrDouble(types.ModuleType):
    """``mne.time_frequency.tfr`` stand-in recording its call."""

    def __init__(self):
        super().__init__("mne.time_frequency.tfr")
        self.calls = []

    def cwt(self, X, Ws, use_fft=True, mode="same", decim=1):
        X = np.asarray(X)
        self.calls.append({"n_signals": X.shape[0], "n_wavelets": len(Ws),
                           "use_fft": use_fft, "mode": mode, "decim": decim})
        n_signals, n_times = X.shape
        out = np.empty((n_signals, len(Ws), n_times), np.complex128)
        for i, w in enumerate(Ws):
            w = np.asarray(w)
            if use_fft:   # FFT linear convolution == direct, checked below
                size = n_times + w.size - 1
                nfft = 1 << int(np.ceil(np.log2(size)))
                for j in range(n_signals):
                    full = np.fft.ifft(np.fft.fft(X[j], nfft)
                                       * np.fft.fft(w, nfft))[:size]
                    start = (w.size - 1) // 2
                    out[j, i] = full[start:start + n_times]
            else:
                for j in range(n_signals):
                    out[j, i] = np.convolve(X[j], w, mode="same")
        return out[..., ::decim] if decim != 1 else out


@pytest.fixture
def fake_mne(monkeypatch):
    tfr = _TfrDouble()
    tf_mod = types.ModuleType("mne.time_frequency")
    tf_mod.tfr = tfr
    mne_mod = types.ModuleType("mne")
    mne_mod.time_frequency = tf_mod
    monkeypatch.setitem(sys.modules, "mne", mne_mod)
    monkeypatch.setitem(sys.modules, "mne.time_frequency", tf_mod)
    monkeypatch.setitem(sys.modules, "mne.time_frequency.tfr", tfr)
    return tfr


SFREQ = 1000.0


def _sine(freq=60.0, seconds=2.0):
    t = np.arange(0, seconds, 1 / SFREQ)
    return np.sin(2 * np.pi * freq * t).astype(np.float64)


def test_delegation_shapes_and_freqs_honored(fake_mne):
    """The rebuild passes OUR freqs through (reference bug fixed and
    documented: wavelets.py:189 hardcodes range(1, 100))."""
    freqs = [40.0, 60.0, 80.0]
    m = nw.MorseMNE(SFREQ)
    out = m.cwt(_sine(), freqs)
    assert fake_mne.calls[-1]["n_wavelets"] == len(freqs)
    assert out.shape == (len(freqs), 2000)
    assert np.iscomplexobj(out)
    # Energy peaks at the 60 Hz row.
    power = np.abs(out) ** 2
    assert int(np.argmax(power.mean(-1))) == 1


def test_kwargs_plumbing(fake_mne):
    m = nw.MorseMNE(SFREQ)
    out = m.cwt(_sine(), [30.0, 60.0], use_fft=False, mode="same", decim=4)
    call = fake_mne.calls[-1]
    assert call["use_fft"] is False and call["decim"] == 4
    assert out.shape == (2, 500)          # decim slices the time axis


def test_mean_axis0_semantics(fake_mne):
    """tfr.cwt returns (n_signals, F, N); the reference '.mean(axis=0)'
    averages the signal axis (wavelets.py:188-191) — a 2-row input of
    identical signals must equal the single-signal result."""
    m = nw.MorseMNE(SFREQ)
    sig = _sine()
    one = m.cwt(sig, [60.0])
    two = m.cwt(np.stack([sig, sig]), [60.0])
    assert fake_mne.calls[-1]["n_signals"] == 2
    np.testing.assert_allclose(two, one, rtol=1e-10)


def test_fft_and_direct_convolution_agree(fake_mne):
    """The double's use_fft branch is real FFT convolution — it must match
    numpy's direct 'same' convolution, so the plumbing test above actually
    exercises equivalent math on both settings."""
    m = nw.MorseMNE(SFREQ)
    sig = _sine(seconds=1.0)
    a = m.cwt(sig, [25.0, 60.0], use_fft=True)
    b = m.cwt(sig, [25.0, 60.0], use_fft=False)
    np.testing.assert_allclose(a, b, atol=1e-8 * np.abs(a).max())


def test_importerror_without_mne():
    """Without mne installed the delegation raises a helpful ImportError
    (the native Morse path is the recommendation)."""
    if "mne" in sys.modules:
        pytest.skip("real mne present")
    with pytest.raises(ImportError, match="native TPU path"):
        nw.MorseMNE(SFREQ).cwt(_sine(), [60.0])
