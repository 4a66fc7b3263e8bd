"""Geometry fuzz over the session's new subsystems: odd lengths, tiny
and lopsided shapes — the classes of bugs that power-of-two test
geometries hide (reshape mistakes, off-by-one Nyquist handling,
padding)."""

import numpy as np
import pytest

from ninwavelets_tpu.ops import cluster as cl

from ninwavelets_tpu.ops import ewt as ew_mod
from ninwavelets_tpu.ops import vmd as vm_mod

RNG = np.random.default_rng(123)


@pytest.mark.parametrize("e,f,n", [(5, 2, 7), (9, 1, 33), (2, 13, 3)])
def test_cluster_odd_geometries(e, f, n):
    x = RNG.standard_normal((e, f, n)).astype(np.float32)
    res = cl.cluster_test_one_sample(x, n_perm=19, threshold=1.5)
    assert res.p_map.shape == (f, n)
    assert np.isfinite(res.t_obs).all()
    t, p = cl.max_stat_test_one_sample(x, n_perm=19)
    assert np.isfinite(p).all() and p.min() >= 1 / 20


@pytest.mark.parametrize("n", [101, 255, 256, 501])
def test_ewt_vmd_stockwell_odd_lengths(n):
    sfreq = 100.0
    t = np.arange(n) / sfreq
    sig = (np.sin(2 * np.pi * 11 * t)
           + np.sin(2 * np.pi * 29 * t)).astype(np.float32)
    modes, b = ew_mod.ewt(sig, sfreq, n_modes=2)
    rec = np.asarray(ew_mod.ewt_reconstruct(modes))
    np.testing.assert_allclose(rec, sig, atol=5e-5)

    vmodes, w = vm_mod.vmd(sig, sfreq, n_modes=2, n_iter=100)
    assert np.asarray(vmodes).shape == (2, n)
    assert np.isfinite(np.asarray(w)).all()

    from ninwavelets_tpu.ops import stockwell
    st = stockwell(sig, [11.0, 29.0], sfreq)
    assert st.shape == (2, n) and np.isfinite(st).all()

    if_hz, amp = vm_mod.instantaneous(np.asarray(vmodes), sfreq)
    assert np.isfinite(np.asarray(if_hz)).all()


@pytest.mark.parametrize("ea,eb,c,f,n", [(6, 7, 2, 3, 5), (5, 5, 1, 2, 9)])
def test_decode_odd_geometries(ea, eb, c, f, n):
    from ninwavelets_tpu.ops import tf_decode
    xa = RNG.standard_normal((ea, c, f, n)).astype(np.float32)
    xb = RNG.standard_normal((eb, c, f, n)).astype(np.float32)
    auc = np.asarray(tf_decode(xa, xb, n_folds=3))
    assert auc.shape == (f, n)
    assert np.all((auc >= 0) & (auc <= 1))


def test_granger_tiny_bins():
    from ninwavelets_tpu.ops import granger as gr
    sigs = RNG.standard_normal((5, 2, 160)).astype(np.float32)
    gc = np.asarray(gr.wavelet_granger(sigs, 100.0, n_bins=5,
                                       time_decim=80, n_iter=30))
    assert gc.shape == (2, 5, 2, 2)
    assert np.isfinite(gc).all() and gc.min() >= 0.0


def test_specparam_short_grid():
    from ninwavelets_tpu.ops import specparam
    freqs = np.arange(2.0, 12.0, 1.0)
    power = 10.0 ** (1.0 - 1.2 * np.log10(freqs))
    fit = specparam(power, freqs, max_peaks=1, n_steps=500)
    assert float(fit.exponent) == pytest.approx(1.2, abs=0.1)


def test_bursts_single_frequency_row():
    from ninwavelets_tpu.ops.bursts import burst_summary
    x = np.ones((3, 1, 50), np.float32)
    x[0, 0, 10:20] = 9.0
    s = burst_summary(x, threshold=np.array([5.0]), sfreq=50.0)
    assert np.asarray(s.count).tolist() == [1.0, 0.0, 0.0]
