"""Baseline-correction parity: all six methods vs direct float64 numpy
(reference semantics: ``/root/reference/ninwavelets/base.py:23-68``)."""
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.baseline import baseline_correct, baseline_of, baseline_tf


def _npy_expected(wave, sfreq, start, stop):
    base = wave[int(start * sfreq): int(stop * sfreq)]
    m, s = base.mean(), base.std()
    return {
        "mean": wave - m,
        "ratio": wave / m,
        "percent": (wave - m) / m,
        "log": np.log10(wave / m),
        "zscore": (wave - m) / s,
        # reference quirk: zlog = log10(ratio) / std (base.py:67-68)
        "zlog": np.log10(wave / m) / s,
    }


@pytest.fixture
def wave():
    rng = np.random.default_rng(0)
    return (rng.normal(2.0, 0.3, 3000)) ** 2 + 1.0  # positive, log-safe


@pytest.mark.parametrize("method", ["mean", "ratio", "percent", "log",
                                    "zscore", "zlog"])
def test_baseline_methods(wave, method):
    want = _npy_expected(wave, 1000.0, 0.0, 0.2)[method]
    b = nw.Baseline(wave, 1000.0, 0.0, 0.2)
    got = np.asarray(getattr(b, method)())
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)
    got_fn = np.asarray(baseline_correct(wave, 1000.0, 0.0, 0.2, method))
    np.testing.assert_allclose(got_fn, want, rtol=3e-5, atol=1e-6)


def test_baseline_of(wave):
    got = np.asarray(baseline_of(wave, 1000.0, 0.1, 0.5))
    np.testing.assert_allclose(got, wave[100:500], rtol=1e-6)


def test_baseline_tf_rowwise():
    """TFR baseline: statistics are per frequency row over the time axis."""
    rng = np.random.default_rng(1)
    tf = rng.uniform(1.0, 3.0, (5, 4, 2000))
    got = np.asarray(baseline_tf(tf, 1000.0, 0.0, 0.5, "zscore"))
    base = tf[..., :500]
    want = (tf - base.mean(-1, keepdims=True)) / base.std(-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_unknown_method_raises(wave):
    with pytest.raises(ValueError):
        baseline_correct(wave, 1000.0, 0.0, 0.2, "nope")


def test_baseline_tf_degenerate_modes():
    """Constant baseline rows: 'unit' degrades zscore to mean-correction;
    'strict' keeps the reference's divide-by-zero semantics (ADVICE r1)."""
    tf = np.ones((2, 100))
    tf[1, 50:] = 3.0
    unit = np.asarray(baseline_tf(tf, 100.0, 0.0, 0.2, "zscore"))
    np.testing.assert_allclose(unit[0], 0.0)         # (1-1)/1
    strict = np.asarray(baseline_tf(tf, 100.0, 0.0, 0.2, "zscore",
                                    degenerate="strict"))
    assert np.all(np.isnan(strict[0]))               # 0/0, like Baseline
    assert np.all(np.isinf(strict[1, 50:]))          # (3-1)/0
    with pytest.raises(ValueError):
        baseline_tf(tf, 100.0, 0.0, 0.2, "zscore", degenerate="nope")
