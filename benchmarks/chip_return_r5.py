"""Queued chip validations for the next tunnel window (r5 outage list;
run FOREGROUND on the real chip, nothing else on the host):

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/chip_return_r5.py

1. pac_significance planted-coupling verify (the /verify drive the
   outage interrupted) + the short-window warning path.
2. cwt2d cached-factor path: single-call latency + fft-oracle parity
   (the r5 review moved the separable factors device-resident).
3. multitaper pipelined fresh-input re-measure (ROOFLINE's named
   residual: how much of 17 ms was dispatch overhead?) — prints the
   number to fold back into ROOFLINE.md / the artifact.

After this, regenerate artifacts wholesale if time allows:
    python benchmarks/extensions_bench.py      (~12 min, 80 rows)
    python benchmarks/onchip_parity.py         (FOREGROUND only)
    timeout 590 python bench.py                (BENCH main sanity)
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import ninwavelets_tpu as nw
    from ninwavelets_tpu.ops.bank import make_fft_bank

    print(jax.devices(), flush=True)
    sfreq = 250.0
    morse = nw.Morse(sfreq)
    rng = np.random.default_rng(0)

    # --- 1. PAC significance ------------------------------------------
    from ninwavelets_tpu.ops.connectivity import pac_significance
    n = 1024
    t = np.arange(n) / sfreq
    sig = (np.sin(2 * np.pi * 8.0 * t)
           + (1 + 0.8 * np.sin(2 * np.pi * 8.0 * t)) * 0.5
           * np.sin(2 * np.pi * 50.0 * t)
           + 0.1 * rng.standard_normal((12, n))).astype(np.float32)
    bph = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.array([8.0], np.float32)), n,
        sfreq, True), np.float32))
    bam = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.array([50.0], np.float32)), n,
        sfreq, True), np.float32))
    _, p = pac_significance(sig, bph, bam, interpolate=True,
                            n_surrogates=99)
    print("pac planted p: %.4f (expect ~0.01)"
          % float(np.asarray(p).min()), flush=True)
    short = rng.standard_normal((8, 256)).astype(np.float32)
    bps = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.array([6.0], np.float32)), 256,
        sfreq, True), np.float32))
    bas = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.array([50.0], np.float32)), 256,
        sfreq, True), np.float32))
    pac_significance(short, bps, bas, interpolate=True, n_surrogates=19)
    print("pac short-window path ran (warning should have logged)",
          flush=True)

    # --- 2. cwt2d cached-factor path ----------------------------------
    from ninwavelets_tpu.ops.cwt2d import power2d
    f2 = (0.03, 0.06, 0.12, 0.24)
    imgs = [jnp.asarray(rng.standard_normal((8, 256, 256))
                        .astype(np.float32)) for _ in range(20)]
    a = np.asarray(power2d(imgs[0][:2], f2))
    b = np.asarray(power2d(imgs[0][:2], f2, use_fft=True))
    print("cwt2d parity vs fft: %.2e" % (np.abs(a - b).max() / b.max()),
          flush=True)
    # Warm at the MEASURED batch shape — the parity check above compiled
    # only the (2, H, W) program; without this the loop below averages a
    # full (8, H, W) compile into every call (measured 606 ms/call cold
    # vs 0.20 ms warm on 2026-08-21).
    jax.block_until_ready(power2d(imgs[0], f2))
    t0 = time.perf_counter()
    outs = [power2d(im, f2) for im in imgs]
    jax.block_until_ready(outs)
    d = (time.perf_counter() - t0) / len(imgs)
    print("cwt2d fresh-batch: %.2f ms -> %.0f MP/s"
          % (d * 1e3, 8 * 256 * 256 / d / 1e6), flush=True)

    # --- 3. multitaper pipelined re-measure ---------------------------
    from ninwavelets_tpu.ops.multitaper import multitaper_mean_power
    sf2, n2 = 1000.0, 2048
    freqs = np.arange(1.0, 101.0, dtype=np.float32)
    sigs = [jnp.asarray(rng.standard_normal((16, 8, n2))
                        .astype(np.float32)) for _ in range(10)]
    jax.block_until_ready(multitaper_mean_power(
        sigs[0], freqs, sf2, n_tapers=3, interpolate=True))
    t0 = time.perf_counter()
    outs = [multitaper_mean_power(s, freqs, sf2, n_tapers=3,
                                  interpolate=True) for s in sigs]
    jax.block_until_ready(outs)
    d = (time.perf_counter() - t0) / len(sigs)
    print("multitaper pipelined: %.2f ms -> %.0f EEG-s/s "
          "(chained row said 17.1 ms / 1920)"
          % (d * 1e3, 16 * n2 / sf2 / d), flush=True)


if __name__ == "__main__":
    main()
