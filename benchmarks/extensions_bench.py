"""Throughput record for the beyond-reference extension family.

One JSON per op (written to ``benchmarks/extensions_results.json``):
synchrosqueezing, scattering, epoch coherence (fused vs XLA), PLV (fused
vs XLA), connectivity matrices, denoising, and the fused training loop.
Timing follows the repo's tunnel-honest rules (CLAUDE.md): output chained
into the next input, scalar fetch, and the measurement loop run twice
with the SECOND pass reported (the first loop in a process is inflated).

Run on the TPU host: python benchmarks/extensions_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "extensions_results.json")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import ninwavelets_tpu as nw
    from ninwavelets_tpu.ops import fused
    from ninwavelets_tpu.ops.bank import make_fft_bank

    sfreq = 1000.0
    rng = np.random.default_rng(0)
    morse = nw.Morse(sfreq)
    rows = []

    def record(**row):
        rows.append(row)
        with open(OUT, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                      indent=1)
        print(json.dumps(row), flush=True)

    def t(fn, x0, iters=10):
        """Chained steady-state timing: two passes, second reported."""
        out = fn(x0)
        jax.block_until_ready(out)
        best = None
        for _ in range(2):
            x = x0
            t0 = time.perf_counter()
            for k in range(iters):
                out = fn(x)
                lead = jax.tree.leaves(out)[0]
                x = x0 * (1.0 + 1e-12 * lead.ravel()[0])
            float(jax.tree.leaves(out)[0].ravel()[0])
            best = (time.perf_counter() - t0) / iters
        return best

    # --- epoch-mean synchrosqueezing -------------------------------------
    from ninwavelets_tpu.ops.sst import ssq_mean_power
    n, e, c, f = 2048, 16, 64, 100
    freqs = np.arange(1.0, f + 1.0, dtype=np.float32)
    bank = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(freqs), n, sfreq, True), np.float32))
    sig = jnp.asarray(rng.standard_normal((e, c, n)).astype(np.float32))
    d = t(lambda s: ssq_mean_power(s, bank, freqs, sfreq,
                                   interpolate=True), sig, iters=5)
    record(op="ssq_mean_power", eeg_s_per_s=round(e * n / sfreq / d, 1),
           config=dict(e=e, c=c, f=f, n=n))

    # --- scattering -------------------------------------------------------
    from ninwavelets_tpu.ops.scattering import scattering
    n2, b = 4096, 16
    b1 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.geomspace(8.0, 400.0, 24),
                                   jnp.float32), n2, sfreq, True),
        np.float32))
    b2 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.geomspace(1.0, 64.0, 12),
                                   jnp.float32), n2, sfreq, False),
        np.float32))
    sig2 = jnp.asarray(rng.standard_normal((b, n2)).astype(np.float32))
    d = t(lambda s: scattering(s, b1, b2, sfreq, stride=32), sig2)
    record(op="scattering_order2",
           signal_s_per_s=round(b * n2 / sfreq / d, 1),
           config=dict(batch=b, n=n2, f1=24, f2=12, stride=32))

    # --- cross-signal: coherence and plv, fused vs XLA --------------------
    from ninwavelets_tpu.ops.connectivity import _plv_jit
    from ninwavelets_tpu.ops.extensions import _epoch_coherence_jit
    e3, c3 = 32, 32
    sa = jnp.asarray(rng.standard_normal((e3, c3, n)).astype(np.float32))
    sb = jnp.asarray((0.6 * np.asarray(sa)
                      + 0.8 * rng.standard_normal((e3, c3, n))
                      ).astype(np.float32))
    pairs_s = 2 * e3 * c3 * n / sfreq
    d = t(lambda a: fused.fused_coherence(a, sb, bank, interpolate=True),
          sa)
    record(op="epoch_coherence_fused",
           eeg_s_per_s=round(pairs_s / d, 1),
           config=dict(e=e3, c=c3, f=f, n=n))
    d = t(jax.jit(lambda a: _epoch_coherence_jit(
        a, sb, bank, None, interpolate=True, eps=1e-12)), sa)
    record(op="epoch_coherence_xla", eeg_s_per_s=round(pairs_s / d, 1),
           config=dict(e=e3, c=c3, f=f, n=n))
    d = t(lambda a: fused.fused_plv(a, sb, bank, interpolate=True), sa)
    record(op="plv_fused", eeg_s_per_s=round(pairs_s / d, 1),
           config=dict(e=e3, c=c3, f=f, n=n))
    d = t(jax.jit(lambda a: _plv_jit(a, sb, bank, interpolate=True,
                                     eps=0.0)), sa)
    record(op="plv_xla", eeg_s_per_s=round(pairs_s / d, 1),
           config=dict(e=e3, c=c3, f=f, n=n))

    # --- all-pairs matrices ------------------------------------------------
    from ninwavelets_tpu.ops.connectivity import plv_matrix
    e4 = 16
    sig4 = jnp.asarray(rng.standard_normal((e4, 64, n)).astype(np.float32))
    d = t(lambda s: plv_matrix(s, bank, interpolate=True), sig4, iters=5)
    record(op="plv_matrix_64ch", ms=round(d * 1e3, 1),
           config=dict(e=e4, c=64, f=f, n=n))

    # --- denoise -----------------------------------------------------------
    dn_freqs = np.arange(20.0, 148.0, 2.0, dtype=np.float32)
    bank_dn = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(dn_freqs), n, sfreq, True), np.float32))
    from ninwavelets_tpu.ops.denoise import denoise
    sig5 = jnp.asarray(rng.standard_normal((64, n)).astype(np.float32))
    d = t(lambda s: denoise(s, bank_dn, None, interpolate=True), sig5)
    record(op="denoise_64sig", signal_s_per_s=round(64 * n / sfreq / d, 1),
           config=dict(b=64, f=len(dn_freqs), n=n))

    # --- fused training loop (learn_bank) -----------------------------------
    from ninwavelets_tpu.ops.cwt import mean_power
    from ninwavelets_tpu.ops.fit import learn_bank
    sig6 = jnp.asarray(rng.standard_normal((16, 8, n)).astype(np.float32))
    bank6 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(30.0, 94.0), n, sfreq, True), np.float32))
    target = mean_power(sig6, bank6, interpolate=True)
    steps = 50
    learn = lambda b0: learn_bank(sig6, b0, target, steps=steps, lr=5e-3,
                                  use_fused=True)[0]
    out = learn(bank6 * 1.3)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = learn(bank6 * 1.29)
    jax.block_until_ready(out)
    record(op="learn_bank_fused_50steps",
           ms=round((time.perf_counter() - t0) * 1e3, 1),
           config=dict(e=16, c=8, f=64, n=n, steps=steps))

    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
