"""Randomized parity sweep: random hyper-parameters, lengths, and frequency
grids against the float64 oracle.  Deterministic seeds, a handful of draws
per family — broad evidence that parity is not tuned to the golden signal.
"""
import numpy as np
import pytest

import reference_oracle as oracle

import ninwavelets_tpu as nw

SFREQ = 1000.0
N_DRAWS = 4


def _random_case(rng):
    n = int(rng.integers(300, 2200))
    lo = float(rng.uniform(1.0, 20.0))
    hi = float(rng.uniform(50.0, 400.0))
    step = float(rng.uniform(3.0, 20.0))
    freqs = np.arange(lo, hi, step)
    t = np.arange(n) / SFREQ
    sig = sum(float(rng.uniform(0.2, 2.0))
              * np.sin(2 * np.pi * float(rng.uniform(3.0, 400.0)) * t
                       + float(rng.uniform(0, 2 * np.pi)))
              for _ in range(4)) + 0.2 * rng.standard_normal(n)
    return sig, freqs


@pytest.mark.parametrize("seed", range(N_DRAWS))
def test_morse_random_params(seed):
    rng = np.random.default_rng(100 + seed)
    sig, freqs = _random_case(rng)
    b = float(rng.uniform(5.0, 30.0))
    r = float(rng.uniform(1.5, 5.0))
    interp = bool(rng.integers(0, 2))
    w = nw.Morse(SFREQ, b=b, r=r, interpolate=interp)
    got = np.asarray(w.cwt(sig, freqs))
    want = oracle.cwt(sig, "morse", freqs, SFREQ, interp,
                      params={"b": b, "r": r})
    snr = oracle.snr_db(want, got)
    assert snr > 85.0, (seed, b, r, interp, snr)


@pytest.mark.parametrize("seed", range(N_DRAWS))
def test_morlet_random_params(seed):
    rng = np.random.default_rng(200 + seed)
    sig, freqs = _random_case(rng)
    sigma = float(rng.uniform(4.0, 12.0))
    gabor = bool(rng.integers(0, 2))
    interp = bool(rng.integers(0, 2))
    w = nw.Morlet(SFREQ, sigma=sigma, gabor=gabor, interpolate=interp)
    got = np.asarray(w.cwt(sig, freqs))
    want = oracle.cwt(sig, "morlet", freqs, SFREQ, interp,
                      params={"sigma": sigma, "gabor": gabor})
    snr = oracle.snr_db(want, got)
    assert snr > 85.0, (seed, sigma, gabor, interp, snr)


@pytest.mark.parametrize("idx,family",
                         list(enumerate(["shannon", "mexican_hat", "haar"])))
def test_other_families_random_signal(idx, family):
    rng = np.random.default_rng(300 + idx)
    sig, freqs = _random_case(rng)
    cls = {"shannon": nw.Shannon, "mexican_hat": nw.MexicanHat,
           "haar": nw.Haar}[family]
    w = cls(SFREQ)
    got = np.asarray(w.cwt(sig, freqs))
    want = oracle.cwt(sig, family, freqs, SFREQ, False)
    snr = oracle.snr_db(want, got)
    assert snr > 85.0, (family, snr)
