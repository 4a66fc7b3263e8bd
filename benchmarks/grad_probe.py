"""Where does the gradient step's time go?  (FOREGROUND only — single-client
chip.)  Times, with the chained-work+scalar-fetch discipline from
benchmarks/int8_mxu_probe.py (the axon tunnel makes naive block_until_ready
timings meaningless):

  * fused forward alone
  * full grad step (fused forward + analytic adjoint backward)
  * the analytic backward alone (scan over epochs)
  * a batched backward variant (epoch chunks ifft'd together) to bound the
    scan overhead

Run: python benchmarks/grad_probe.py
"""
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import fused
from ninwavelets_tpu.ops.bank import make_fft_bank


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in range(iters):
        # CHAIN the work (perturbed first operand) — identical un-chained
        # dispatches can overlap through the tunnel and report dishonest
        # wall times (CLAUDE.md); the scalar fetch forces completion.
        out = fn(args[0] * (1.0 + 1e-7 * k), *args[1:])
    s = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    sfreq = 1000.0
    n = int(os.environ.get("BENCH_N", 2048))
    channels = int(os.environ.get("BENCH_CHANNELS", 64))
    epochs = int(os.environ.get("BENCH_EPOCHS", 64))
    n_freqs = int(os.environ.get("BENCH_FREQS", 100))
    precision = os.environ.get("BENCH_PRECISION", fused.DEFAULT_PRECISION)

    morse = nw.Morse(sfreq)
    bank = jnp.asarray(np.asarray(
        make_fft_bank(morse._wdef(), jnp.arange(1.0, n_freqs + 1.0), n,
                      sfreq, True), dtype=np.float32))
    rng = np.random.default_rng(0)
    signals = jnp.asarray(
        rng.standard_normal((epochs, channels, n)).astype(np.float32))
    eeg_s = epochs * (n / sfreq)

    fwd = jax.jit(lambda s, b: fused.fused_mean_power_from_bank(
        s, b, True, precision=precision))
    t_fwd, _ = timeit(fwd, signals, bank)

    grad_step = jax.jit(jax.grad(lambda s, b: jnp.sum(
        fused.fused_mean_power_from_bank(s, b, True, precision=precision))))
    t_grad, _ = timeit(grad_step, signals, bank)

    g = jnp.ones((channels, n_freqs, n), jnp.float32)
    bwd = jax.jit(lambda s, b, gg: fused._mean_power_bwd(s, b, True, gg)[0])
    t_bwd, _ = timeit(bwd, signals, bank, g)

    print(json.dumps({
        "fwd_ms": round(t_fwd * 1e3, 2),
        "grad_ms": round(t_grad * 1e3, 2),
        "bwd_ms": round(t_bwd * 1e3, 2),
        "fwd_eeg_s_per_s": round(eeg_s / t_fwd, 1),
        "grad_eeg_s_per_s": round(eeg_s / t_grad, 1),
        "bwd_eeg_s_per_s": round(eeg_s / t_bwd, 1),
        "config": {"n": n, "c": channels, "e": epochs, "f": n_freqs,
                   "precision": precision},
    }))


if __name__ == "__main__":
    main()
