"""Kernel benchmark sweeps — reproduces the numbers in README/PARITY.

Runs on the default (TPU) backend:

    python benchmarks/kernel_sweep.py             # precision sweep
    python benchmarks/kernel_sweep.py geometry    # segment-size sweep
    python benchmarks/kernel_sweep.py epochs      # epoch-batch sweep

Each line reports ms/call and EEG-seconds/s for the 64-channel x 100-freq
x 1 kHz BASELINE workload, plus max relative error vs the XLA FFT path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import fused
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.cwt import mean_power_from_bank

SFREQ = 1000.0


def workload(n=2048, nf=100, e=8, c=64, seed=0):
    morse = nw.Morse(SFREQ)
    bank = jnp.asarray(np.asarray(
        make_fft_bank(morse._wdef(), jnp.arange(1.0, nf + 1.0), n, SFREQ,
                      True), np.float32))
    sig = jnp.asarray(np.random.default_rng(seed)
                      .standard_normal((e, c, n)).astype(np.float32))
    return sig, bank


def timeit(fn, sig, bank, iters=10):
    jax.block_until_ready(fn(sig, bank))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(sig, bank)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


_XLA_REF = jax.jit(lambda s, b: mean_power_from_bank(s, b, True))


def rel_err(fn, sig, bank):
    want = np.asarray(_XLA_REF(sig, bank))
    got = np.asarray(fn(sig, bank))
    return np.abs(got - want).max() / np.abs(want).max()


def report(label, fn, sig, bank):
    e, _, n = sig.shape
    dt = timeit(fn, sig, bank)
    eegs = e * (n / SFREQ)
    print(f"{label:28s} {dt*1e3:7.2f} ms/call  {eegs/dt:7.0f} EEG-s/s  "
          f"rel={rel_err(fn, sig, bank):.2e}", flush=True)


def sweep_precision():
    sig, bank = workload()
    report("xla fft path",
           jax.jit(lambda s, b: mean_power_from_bank(s, b, True)), sig, bank)
    for prec in fused.PRECISIONS:
        report(f"fused {prec}",
               lambda s, b, p=prec: fused.fused_mean_power(
                   s, b, interpolate=True, precision=p), sig, bank)


def sweep_geometry():
    for n in (1024, 2048, 4096):
        sig, bank = workload(n=n)
        report(f"fused fast3 N={n}",
               lambda s, b: fused.fused_mean_power(s, b, interpolate=True),
               sig, bank)


def sweep_epochs():
    for e in (8, 16, 32, 64):
        sig, bank = workload(e=e)
        report(f"fused fast3 E={e}",
               lambda s, b: fused.fused_mean_power(s, b, interpolate=True),
               sig, bank)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "precision"
    {"precision": sweep_precision, "geometry": sweep_geometry,
     "epochs": sweep_epochs}[mode]()
