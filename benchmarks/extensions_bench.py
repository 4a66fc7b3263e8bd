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
        """Steady-state timing: two passes, second reported.

        Honesty on the tunneled runtime (ROOFLINE.md "Measurement
        integrity"): the device executes dispatched programs IN ORDER,
        and a trailing *value* fetch of the last output is a real
        barrier for everything queued before it (probe 2026-08-21:
        last-fetch 3.0-3.5 ms/call == sum-of-all-outputs-fetch 3.6-4.6
        on the cwt2d call, vs 0.11 ms for the dishonest
        block_until_ready-terminated queue).  Each iteration perturbs
        the input VALUES with a representable, never-repeating factor
        (float32 cannot represent 1+1e-12 — the original chain term
        was value-identical and cache-servable), with the pass index
        folded in so the second pass never replays the first pass's
        values.  The ~1e-5 relative perturbation is timing-neutral
        (every op here is data-independent in cost).
        """
        out = fn(x0)
        jax.block_until_ready(out)
        best = None
        for p in range(2):
            t0 = time.perf_counter()
            for k in range(iters):
                out = fn(x0 * (1.0 + 1e-5 * (p * iters + k + 1)))
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

    # --- phase-lag family: wPLI fused vs XLA, PPC fused --------------------
    from ninwavelets_tpu.ops.connectivity import _phase_lag_jit
    d = t(lambda a: fused.fused_phase_lag(a, sb, bank, method="wpli",
                                          interpolate=True), sa)
    record(op="wpli_fused", eeg_s_per_s=round(pairs_s / d, 1),
           config=dict(e=e3, c=c3, f=f, n=n))
    d = t(jax.jit(lambda a: _phase_lag_jit(a, sb, bank, method="wpli",
                                           interpolate=True, eps=0.0)), sa)
    record(op="wpli_xla", eeg_s_per_s=round(pairs_s / d, 1),
           config=dict(e=e3, c=c3, f=f, n=n))
    d = t(lambda a: fused.fused_ppc(a, sb, bank, interpolate=True), sa)
    record(op="ppc_fused", eeg_s_per_s=round(pairs_s / d, 1),
           config=dict(e=e3, c=c3, f=f, n=n))

    # --- discrete subsystem: MODWT / shrinkage / packets -------------------
    from ninwavelets_tpu.ops.dwt import modwt_denoise, wavedec
    from ninwavelets_tpu.ops.dwt import modwt as _modwt
    from ninwavelets_tpu.ops.wpt import modwpt as _modwpt
    nb, nd = 64, 65536
    sig_d = jnp.asarray(rng.standard_normal((nb, nd)).astype(np.float32))
    d = t(lambda s: _modwt(s, "db8", 8), sig_d, iters=5)
    record(op="modwt_db8_J8", signal_s_per_s=round(nb * nd / sfreq / d, 1),
           config=dict(batch=nb, n=nd))
    d = t(lambda s: modwt_denoise(s, "db8", 8), sig_d, iters=5)
    record(op="modwt_denoise_db8_J8",
           signal_s_per_s=round(nb * nd / sfreq / d, 1),
           config=dict(batch=nb, n=nd))
    d = t(lambda s: wavedec(s, "db8", 8), sig_d, iters=5)
    record(op="wavedec_db8_J8",
           signal_s_per_s=round(nb * nd / sfreq / d, 1),
           config=dict(batch=nb, n=nd))
    d = t(lambda s: _modwpt(s, "db8", 5), sig_d, iters=3)
    record(op="modwpt_db8_L5",
           signal_s_per_s=round(nb * nd / sfreq / d, 1),
           config=dict(batch=nb, n=nd))

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

    # --- superlets ----------------------------------------------------------
    from ninwavelets_tpu.ops.superlets import (superlet_banks,
                                               superlet_weights,
                                               _slt_mean_jit)
    sl_freqs = np.geomspace(5.0, 200.0, 50).astype(np.float32)
    sl_banks = superlet_banks(sl_freqs, n, sfreq, order_max=8,
                              interpolate=True)
    sl_w = jnp.asarray(superlet_weights(sl_freqs, order_max=8))
    sig7 = jnp.asarray(rng.standard_normal((16, 16, n)).astype(np.float32))
    d = t(lambda s: _slt_mean_jit(s, sl_banks, sl_w, interpolate=True,
                                  eps=1e-30), sig7, iters=5)
    record(op="superlet_mean_power",
           eeg_s_per_s=round(16 * 16 * n / sfreq / d, 1),
           config=dict(e=16, c=16, f=50, o=8, n=n))

    # --- single-trial smoothed wavelet coherence -----------------------------
    from ninwavelets_tpu.ops.extensions import _wavelet_coherence_jit
    sig8a = jnp.asarray(rng.standard_normal((64, n)).astype(np.float32))
    sig8b = jnp.asarray((0.6 * np.asarray(sig8a)
                         + 0.8 * rng.standard_normal((64, n))
                         ).astype(np.float32))
    fg = jnp.asarray(freqs)
    d = t(lambda a: _wavelet_coherence_jit(
        a, sig8b, bank, None, fg, sfreq=sfreq, interpolate=True,
        cycles=1.0, scale_width=0.6, eps=1e-12, return_phase=False), sig8a)
    record(op="wavelet_coherence_64pair",
           signal_s_per_s=round(2 * 64 * n / sfreq / d, 1),
           config=dict(pairs=64, f=f, n=n))

    # --- bicoherence ----------------------------------------------------------
    from ninwavelets_tpu.ops.extensions import _bicoherence_jit
    f1 = np.arange(4.0, 36.0, 2.0, dtype=np.float32)       # 16 rows
    f2 = np.arange(20.0, 84.0, 4.0, dtype=np.float32)      # 16 rows
    sums = (f1[:, None] + f2[None, :]).ravel()
    bb1 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(f1), n, sfreq, True), np.float32))
    bb2 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(f2), n, sfreq, True), np.float32))
    bb12 = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(sums), n, sfreq, True), np.float32))
    sig9 = jnp.asarray(rng.standard_normal((16, 1, n)).astype(np.float32))
    d = t(lambda s: _bicoherence_jit(s, bb1, bb2, bb12, interpolate=True,
                                     eps=1e-12), sig9, iters=5)
    record(op="bicoherence_16x16",
           eeg_s_per_s=round(16 * n / sfreq / d, 1),
           config=dict(e=16, f1=16, f2=16, n=n))

    # --- n:m phase locking -----------------------------------------------------
    from ninwavelets_tpu.ops.connectivity import _nm_plv_jit
    nm_freqs = np.arange(4.0, 36.0, 0.5, dtype=np.float32)  # 64 rows
    ba = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(nm_freqs), n, sfreq, True), np.float32))
    bb = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(2.0 * nm_freqs), n, sfreq, True),
        np.float32))
    sig10a = jnp.asarray(rng.standard_normal((32, 8, n)).astype(np.float32))
    sig10b = jnp.asarray(rng.standard_normal((32, 8, n)).astype(np.float32))
    d = t(lambda a: _nm_plv_jit(a, sig10b, ba, bb, n=2, m=1,
                                interpolate=True, eps=0.0), sig10a)
    record(op="nm_plv_2to1", eeg_s_per_s=round(2 * 32 * 8 * n / sfreq / d, 1),
           config=dict(e=32, c=8, f=64, n=n))

    # --- mode extraction ---------------------------------------------------------
    from ninwavelets_tpu.ops.ridge import extract_modes_ri
    md_freqs = np.arange(25.0, 111.0, 2.5, dtype=np.float32)
    bank_md = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(md_freqs), n, sfreq, True), np.float32))
    tt = np.arange(n) / sfreq
    # chained t() harness: t() fetches ONE scalar after the whole loop,
    # so the ~30 ms per-fetch tunnel RTT that broke the old per-call
    # style is amortized over iters — and unlike an unchained pipelined
    # loop, the chain defeats the runtime's queued-dispatch early ack
    # (ROOFLINE.md "Measurement integrity" item 4).
    sig_md = jnp.asarray((np.sin(2 * np.pi * 40 * tt)
                          + 0.6 * np.sin(2 * np.pi * 90 * tt)
                          + 0.01 * rng.standard_normal(n)
                          ).astype(np.float32))
    fmd = lambda s: extract_modes_ri(s, bank_md, n_modes=2,
                                     interpolate=True)[0]
    dmd = t(fmd, sig_md, iters=20)
    record(op="extract_modes_2",
           signal_s_per_s=round(n / sfreq / dmd, 1),
           config=dict(f=len(md_freqs), n=n, modes=2))

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

    # --- cluster permutation null (matmul t-maps + batched labeling) --------
    from ninwavelets_tpu.ops.cluster import _sign_flip_null
    trials = jnp.asarray(rng.standard_normal((40, 100, 1024))
                         .astype(np.float32))
    key = jax.random.PRNGKey(0)
    d = t(lambda x: _sign_flip_null(x, key, n_perm=256, threshold=2.0),
          trials, iters=3)
    record(op="cluster_null_256perm", perms_per_s=round(256 / d, 1),
           config=dict(e=40, f=100, n=1024, n_perm=256))

    # --- multitaper epoch mean (K*F-row fused bank) --------------------------
    from ninwavelets_tpu.ops.multitaper import (multitaper_banks,
                                                multitaper_mean_power)
    sig_mt = jnp.asarray(rng.standard_normal((16, 8, n)).astype(np.float32))
    mt_freqs = np.arange(1.0, 101.0, dtype=np.float32)
    multitaper_banks(mt_freqs, n, sfreq, n_tapers=3, interpolate=True)
    d = t(lambda s: multitaper_mean_power(s, mt_freqs, sfreq, n_tapers=3,
                                          interpolate=True), sig_mt,
          iters=5)
    record(op="multitaper_k3_mean_power",
           eeg_s_per_s=round(16 * n / sfreq / d, 1),
           config=dict(e=16, c=8, f=100, k=3, n=n))

    # --- orthogonalized envelope correlation (seed-channel scan) ------------
    from ninwavelets_tpu.ops.envelope import env_corr_matrix
    sig_env = jnp.asarray(rng.standard_normal((16, 16, n))
                          .astype(np.float32))
    bank_env = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(10.0, 42.0, 2.0), n, sfreq, True),
        np.float32))
    d = t(lambda s: env_corr_matrix(s, bank_env, orthogonalize=True,
                                    interpolate=True), sig_env, iters=3)
    record(op="env_corr_orth_16ch", ms=round(d * 1e3, 1),
           config=dict(e=16, c=16, f=16, n=n))

    # --- time-resolved pairwise Granger --------------------------------------
    from ninwavelets_tpu.ops.granger import wavelet_granger
    sig_gc = jnp.asarray(rng.standard_normal((16, 4, n)).astype(np.float32))
    d = t(lambda s: wavelet_granger(s, sfreq, n_bins=65, time_decim=32),
          sig_gc, iters=3)
    t_slices = -(-n // 32)
    record(op="wavelet_granger_4ch",
           gc_cells_per_s=round(t_slices * 65 * 12 / d, 1),
           config=dict(e=16, c=4, bins=65, n=n, time_decim=32))

    # --- burst statistics -----------------------------------------------------
    from ninwavelets_tpu.ops.bursts import burst_summary
    trials_b = jnp.asarray(
        rng.standard_normal((40, 60, 1024)).astype(np.float32) ** 2)
    d = t(lambda x: burst_summary(x, sfreq=sfreq).count, trials_b,
          iters=5)
    record(op="burst_summary", epochs_per_s=round(40 / d, 1),
           config=dict(e=40, f=60, n=1024))

    # --- 2-D time-frequency reassignment --------------------------------------
    from ninwavelets_tpu.ops.reassign import reassigned_mean_power
    bank_ra = jnp.asarray(np.asarray(
        make_fft_bank(morse._wdef(), jnp.arange(2.0, 102.0), n, sfreq,
                      True), np.float32))
    f_ra = jnp.arange(2.0, 102.0, dtype=jnp.float32)
    sig_ra = jnp.asarray(
        rng.standard_normal((8, 4, n)).astype(np.float32))
    d = t(lambda s: reassigned_mean_power(s, bank_ra, f_ra, sfreq,
                                          interpolate=True, t_decim=16),
          sig_ra, iters=5)
    record(op="reassigned_mean_power",
           eeg_s_per_s=round(8 * 4 * (n / sfreq) / d, 1),
           config=dict(e=8, c=4, f=100, n=n, t_decim=16))

    # --- matching pursuit ------------------------------------------------------
    from ninwavelets_tpu.ops.mp import matching_pursuit
    sig_mp = jnp.asarray(
        rng.standard_normal((8, 4, 1024)).astype(np.float32))
    d = t(lambda s: matching_pursuit(s, 20, 250.0).residual, sig_mp,
          iters=5)
    record(op="matching_pursuit_20atoms",
           eeg_s_per_s=round(8 * 4 * (1024 / 250.0) / d, 1),
           config=dict(b=32, n=1024, atoms=20))

    # --- IRASA fractal/oscillatory split ----------------------------------
    from ninwavelets_tpu.ops.irasa import irasa
    sig_ir = jnp.asarray(
        rng.standard_normal((16, 60_000)).astype(np.float32))
    d = t(lambda s: irasa(s, sfreq)[1], sig_ir, iters=5)
    record(op="irasa_16x60k",
           signal_s_per_s=round(16 * 60_000 / sfreq / d, 1),
           config=dict(b=16, n=60_000))

    # --- EMD / EEMD ---------------------------------------------------------
    from ninwavelets_tpu.ops.emd import eemd, emd
    sig_emd = jnp.asarray(
        rng.standard_normal((64, 2048)).astype(np.float32))
    d = t(lambda s: emd(s, n_imfs=6)[1], sig_emd, iters=3)
    record(op="emd_64x2048_6imf",
           signal_s_per_s=round(64 * 2048 / sfreq / d, 1),
           config=dict(b=64, n=2048, imfs=6, spline="natural"))
    sig_e1 = jnp.asarray(rng.standard_normal((2048,)).astype(np.float32))
    d = t(lambda s: eemd(s, n_imfs=6, n_ensembles=64)[1], sig_e1,
          iters=3)
    record(op="eemd_64ens_2048",
           signal_s_per_s=round(2048 / sfreq / d, 1),
           config=dict(n=2048, imfs=6, ensembles=64))

    # --- CP/PARAFAC ---------------------------------------------------------
    from ninwavelets_tpu.ops.cpd import cp_decompose
    xcp = jnp.asarray(np.abs(
        rng.standard_normal((64, 100, 512))).astype(np.float32))
    d = t(lambda x: cp_decompose(x, 3, n_iter=100)[2], xcp, iters=3)
    record(op="cp_rank3_100sweeps_64x100x512", seconds=round(d, 4),
           config=dict(shape=[64, 100, 512], rank=3, n_iter=100))

    # --- cycle-by-cycle -------------------------------------------------------
    from ninwavelets_tpu.ops.cycles import cycle_features
    tcy = np.arange(4096) / sfreq
    sig_cy = jnp.asarray((np.sin(2 * np.pi * 10.0 * tcy)
                          + 0.1 * rng.standard_normal((64, 4096))
                          ).astype(np.float32))
    d = t(lambda s: cycle_features(s, sfreq, (6.0, 15.0)).rdsym, sig_cy)
    record(op="cycles_64x4096",
           signal_s_per_s=round(64 * 4096 / sfreq / d, 1),
           config=dict(b=64, n=4096, band=[6.0, 15.0]))

    # --- HMM spectral states ---------------------------------------------------
    from ninwavelets_tpu.ops.hmm import hmm_fit
    xhmm = jnp.asarray(
        rng.standard_normal((8, 6000, 12)).astype(np.float32))
    d = t(lambda x: hmm_fit(x, 4, n_iter=50).loglik, xhmm, iters=3)
    record(op="hmm_8x6000x12_k4_50em", seconds=round(d, 4),
           config=dict(b=8, t=6000, d=12, k=4, n_iter=50))

    # --- FastICA ---------------------------------------------------------------
    from ninwavelets_tpu.ops.ica import fastica
    xica = jnp.asarray(
        rng.laplace(size=(64, 250_000)).astype(np.float32))
    d = t(lambda x: fastica(x, n_iter=100).sources, xica, iters=3)
    record(op="fastica_64x250k_100it", seconds=round(d, 3),
           config=dict(c=64, n=250_000, n_iter=100))

    # --- filtering / resampling --------------------------------------------------
    from ninwavelets_tpu.ops.filtering import bandpass as _bp
    from ninwavelets_tpu.ops.filtering import resample as _rs
    xf = jnp.asarray(
        rng.standard_normal((64, 600_000)).astype(np.float32))
    d = t(lambda x: _bp(x, sfreq, 1.0, 40.0), xf, iters=5)
    record(op="bandpass_64x600k",
           signal_s_per_s=round(64 * 600_000 / sfreq / d, 1),
           config=dict(c=64, n=600_000))
    d = t(lambda x: _rs(x, sfreq, 250.0)[0], xf, iters=5)
    record(op="resample_4x_64x600k",
           signal_s_per_s=round(64 * 600_000 / sfreq / d, 1),
           config=dict(c=64, n=600_000, new_sfreq=250.0))

    # --- native IO: EDF file -> streamed TFR ---------------------------------
    # Whole pipeline: mmap'd int16 gather (C++ kernel, prefetch thread)
    # -> H2D -> fused window kernel -> on-device plane.  Best-of-3 like
    # BENCH_MODE=streaming (transfer-heavy; tunnel load swings ~2x).
    import tempfile

    from ninwavelets_tpu.io import EDFSource, write_edf
    from ninwavelets_tpu.parallel.streaming import StreamingCWT
    from ninwavelets_tpu.parallel.chunked import halo_samples

    n_edf, c_edf = 120_000, 4           # 2 min x 4 ch at 1 kHz
    sig_edf = rng.standard_normal((c_edf, n_edf)).astype(np.float32)
    edf_path = tempfile.mktemp(suffix=".edf")
    write_edf(edf_path, sig_edf, sfreq)
    h = halo_samples(morse._wdef(), 2.0, sfreq)
    win = 16384 - 2 * h
    win -= win % 2
    s_edf = StreamingCWT(morse._wdef(), np.linspace(2.0, 100.0, 100),
                         sfreq, window=win, halo=h, interpolate=True)
    src = EDFSource(edf_path)
    jax.block_until_ready(s_edf.power_device_source(src))
    d = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = s_edf.power_device_source(src)
        jax.block_until_ready(out)
        d = min(d, time.perf_counter() - t0)
    os.unlink(edf_path)
    record(op="edf_stream_power",
           eeg_s_per_s=round(c_edf * (n_edf / sfreq) / d, 1),
           config=dict(c=c_edf, n=n_edf, f=100, window=win, halo=h,
                       fused=bool(s_edf._fused)))

    # --- spatial filtering + CSP decoding ------------------------------------
    from ninwavelets_tpu.ops import spatial as _sp
    from ninwavelets_tpu.ops.decoding import csp_decode
    e_sp, c_sp, n_sp = 64, 64, 2048
    t_sp = np.arange(n_sp) / sfreq
    osc_sp = np.sin(2 * np.pi * 11.0 * t_sp[None, :]
                    + rng.uniform(0, 2 * np.pi, (e_sp, 1)))
    topo_a = np.eye(c_sp)[0]
    topo_b = np.eye(c_sp)[c_sp - 1]
    xa_sp = (2.0 * topo_a[None, :, None] * osc_sp[:, None, :]
             + rng.standard_normal((e_sp, c_sp, n_sp))).astype(np.float32)
    xb_sp = (2.0 * topo_b[None, :, None] * osc_sp[:, None, :]
             + rng.standard_normal((e_sp, c_sp, n_sp))).astype(np.float32)
    d = t(lambda x: _sp.ssd(x, sfreq, 9.0, 13.0,
                            n_components=8).eigvals, jnp.asarray(xa_sp),
          iters=5)
    record(op="ssd_fit", eeg_s_per_s=round(e_sp * n_sp / sfreq / d, 1),
           config=dict(e=e_sp, c=c_sp, n=n_sp))
    d = t(lambda x: csp_decode(x, jnp.asarray(xb_sp), n_folds=5,
                               n_components=4, f_lo=9.0, f_hi=13.0,
                               sfreq=sfreq), jnp.asarray(xa_sp), iters=3)
    record(op="csp_decode_5fold", ms=round(d * 1e3, 1),
           config=dict(e=2 * e_sp, c=c_sp, n=n_sp))

    # --- one-way F cluster test (999-permutation null) ------------------------
    from ninwavelets_tpu.ops import cluster as _cl
    groups = [jnp.asarray(
        rng.standard_normal((20, 100, 256)).astype(np.float32))
        for _ in range(3)]
    xcat = jnp.concatenate(groups, 0)
    thr = _cl.f_threshold(0.05, 2, 57)
    import jax as _jax
    key_f = _jax.random.PRNGKey(0)
    d = t(lambda x: _cl._anova_null(x, key_f, n_perm=999, threshold=thr,
                                    sizes=(20, 20, 20)), xcat, iters=3)
    record(op="cluster_f_null_999", ms=round(d * 1e3, 1),
           config=dict(groups=3, e=60, plane=(100, 256)))

    # --- lagged coherence ------------------------------------------------------
    from ninwavelets_tpu.ops.connectivity import lagged_coherence_morse
    freqs_lc = np.arange(2.0, 60.0, 1.0)
    sig_lc = jnp.asarray(
        rng.standard_normal((16, 65536)).astype(np.float32))
    d = t(lambda s: lagged_coherence_morse(s, freqs_lc, sfreq), sig_lc,
          iters=5)
    record(op="lagged_coherence",
           eeg_s_per_s=round(16 * 65536 / sfreq / d, 1),
           config=dict(rows=16, n=65536, f=len(freqs_lc)))

    # --- 2-D wavelets (r4: the reference roadmap's "2D wavelet") ----------
    from ninwavelets_tpu.ops.cwt2d import power2d
    from ninwavelets_tpu.ops.dwt2d import wavedec2, waverec2
    f2 = (0.03, 0.06, 0.12, 0.24)
    # CHAINED harness only (2026-08-21): an unchained pipelined loop
    # over distinct fresh images + block_until_ready measured 0.11-0.14
    # ms/call (> 250 TF/s, above the chip's bf16 peak — physically
    # impossible; the runtime acks before execution completes, the same
    # effect the int8 study hit in r2).  Chaining each call's output
    # into the next call's input + one trailing scalar fetch measures
    # 2.8-3.0 ms/call steady-state.  The retracted r5 "667 MP/s" row
    # used the unchained harness; ROOFLINE.md has the corrected model.
    imgs = jnp.asarray(rng.standard_normal((8, 256, 256))
                       .astype(np.float32))
    d2d = t(lambda x: power2d(x, f2), imgs, iters=10)
    record(op="cwt2d_power_8x256x256_4f6o",
           megapixel_per_s=round(8 * 256 * 256 / d2d / 1e6, 1),
           config=dict(batch=8, hw=256, f=4, orientations=6))
    # Sustained big-batch rate (marginal cost per extra 160-image call
    # in a K-chained run; fetch + dispatch amortized): what a bulk user
    # sees.  K=1 vs K=5 difference isolates the fixed ~25 ms fetch RTT.
    big = jnp.asarray(rng.standard_normal((160, 256, 256))
                      .astype(np.float32))
    float(power2d(big, f2).mean())        # warm the (160,...) program
    walls = {}
    # Two passes over the (1, 5) pair — the FIRST timing loop in a
    # fresh region is inflated (integrity item 3); the second pass's
    # K=1/K=5 difference isolates the marginal per-call cost with the
    # fixed fetch RTT cancelled.  seq index keeps values never-repeating.
    seq = 0
    for p in range(2):
        for K in (1, 5):
            s = jnp.float32(0.0)
            xs = []
            for _ in range(K):
                seq += 1
                xs.append(big * (1.0 + 1e-5 * seq))
            jax.block_until_ready(xs)
            t0 = time.perf_counter()
            for x in xs:
                s = s + power2d(x, f2).mean()
            float(s)
            walls[K] = time.perf_counter() - t0
    d_marg = (walls[5] - walls[1]) / 4.0
    record(op="cwt2d_power_sustained_160imgs",
           megapixel_per_s=round(160 * 256 * 256 / d_marg / 1e6, 1),
           config=dict(batch=160, hw=256, f=4, orientations=6,
                       note="marginal per-call rate, K-chained"))
    d = t(lambda x: waverec2(wavedec2(x, "db4", level=4), "db4"), imgs,
          iters=5)
    record(op="dwt2d_roundtrip_8x256x256_l4",
           megapixel_per_s=round(8 * 256 * 256 / d / 1e6, 1),
           config=dict(batch=8, hw=256, level=4, wavelet="db4"))

    # --- phase-slope index matrix (r4: directed connectivity) -------------
    from ninwavelets_tpu.ops.connectivity import psi_matrix
    xpsi = jnp.asarray(
        rng.standard_normal((32, 32, 2048)).astype(np.float32))
    fpsi = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(10.0, 90.0, 2.0, dtype=jnp.float32),
        2048, sfreq, True), np.float32))
    d = t(lambda x: psi_matrix(x, fpsi, interpolate=True), xpsi, iters=5)
    record(op="psi_matrix_32ch",
           eeg_s_per_s=round(32 * 32 * 2048 / sfreq / d, 1),
           config=dict(e=32, c=32, n=2048, f=40))

    # --- microstates (r4: broadband states family) ------------------------
    from ninwavelets_tpu.ops.microstates import microstate_fit
    xms = jnp.asarray(
        rng.standard_normal((64, 120000)).astype(np.float32))
    d = t(lambda x: microstate_fit(x, 4, n_init=8, n_iter=40).gev, xms,
          iters=3)
    record(op="microstates_k4_64x120k",
           signal_s_per_s=round(120000 / sfreq / d, 1),
           config=dict(c=64, n=120000, k=4, n_init=8, n_iter=40))

    # --- channel QC + analytic shrinkage (r4 wrap) -------------------------
    from ninwavelets_tpu.ops.reject import _chan_stats_jit
    xqc = jnp.asarray(
        rng.standard_normal((64, 120000)).astype(np.float32))
    d = t(lambda x: _chan_stats_jit(x, sfreq=sfreq, hf_hz=40.0)[2],
          xqc, iters=5)
    record(op="channel_qc_stats_64x120k",
           signal_s_per_s=round(120000 / sfreq / d, 1),
           config=dict(c=64, n=120000))

    from ninwavelets_tpu.ops.spatial import _lw_jit
    xlw = jnp.asarray(
        rng.standard_normal((64, 120000)).astype(np.float32))
    d = t(lambda x: _lw_jit(x)[0], xlw, iters=10)
    record(op="ledoit_wolf_64x120k", ms=round(d * 1e3, 2),
           config=dict(c=64, n=120000))

    from ninwavelets_tpu.ops.leadfield import (_series_jit,
                                               fibonacci_electrodes,
                                               source_grid)
    elec_lf = jnp.asarray(fibonacci_electrodes(64, 0.09) / 0.09,
                          jnp.float32)
    grid_lf = source_grid(0.09, spacing=0.006, max_eccentricity=0.8)
    b_lf = np.linalg.norm(grid_lf, axis=1)
    r0 = np.where(b_lf[:, None] > 0, grid_lf / np.maximum(
        b_lf[:, None], 1e-30), [0.0, 0.0, 1.0])
    d = t(lambda e: _series_jit(e, jnp.asarray(r0, jnp.float32),
                                jnp.asarray(b_lf / 0.09, jnp.float32),
                                n_terms=200), elec_lf, iters=5)
    record(op="sphere_leadfield_64x%d" % grid_lf.shape[0],
           ms=round(d * 1e3, 2),
           config=dict(e=64, s=int(grid_lf.shape[0]), n_terms=200))

    # --- ASR (r4: preprocessing) -----------------------------------------
    from ninwavelets_tpu.ops.asr import asr_calibrate, asr_process
    xasr = jnp.asarray(
        rng.standard_normal((64, 150000)).astype(np.float32))
    m_asr = asr_calibrate(np.asarray(xasr)[:, :30000], 250.0)
    d = t(lambda x: asr_process(x, 250.0, m_asr)[0], xasr, iters=3)
    record(op="asr_64ch_10min", signal_s_per_s=round(150000 / 250.0 / d,
                                                     1),
           config=dict(c=64, n=150000, sfreq=250))

    # --- Riemannian decoding (r4) ----------------------------------------
    from ninwavelets_tpu.ops.riemann import tangent_decode
    xra = np.asarray(rng.standard_normal((40, 32, 512)), np.float32)
    xrb = np.asarray(rng.standard_normal((40, 32, 512)), np.float32)
    xra[:, 0] *= 2.5
    xrb[:, 1] *= 2.5
    auc = tangent_decode(xra, xrb, n_folds=5)       # compile + warm
    reps_r = []
    for _ in range(3):
        t0r = time.perf_counter()
        auc = tangent_decode(xra, xrb, n_folds=5)
        reps_r.append(time.perf_counter() - t0r)
    record(op="riemann_tangent_decode_5fold",
           ms=round(sorted(reps_r)[1] * 1e3, 1),
           config=dict(e=80, c=32, n=512, auc=round(float(auc), 3)))

    # --- complexity (r4: entropy family) ---------------------------------
    from ninwavelets_tpu.ops.complexity import (permutation_entropy,
                                                sample_entropy)
    xcx = jnp.asarray(
        rng.standard_normal((16, 8, 2048)).astype(np.float32))
    d = t(lambda x: sample_entropy(x), xcx, iters=3)
    record(op="sampen_m2_128x2048",
           signal_s_per_s=round(16 * 8 * 2048 / sfreq / d, 1),
           config=dict(e=16, c=8, n=2048, m=2))
    d = t(lambda x: permutation_entropy(x), xcx, iters=5)
    record(op="perm_entropy_m3_128x2048",
           signal_s_per_s=round(16 * 8 * 2048 / sfreq / d, 1),
           config=dict(e=16, c=8, n=2048, m=3))

    # --- partial coherence (r4: conditional connectivity) ----------------
    from ninwavelets_tpu.ops.connectivity import partial_coherence
    d = t(lambda x: partial_coherence(x, fpsi, interpolate=True), xpsi,
          iters=5)
    record(op="partial_coherence_32ch",
           eeg_s_per_s=round(32 * 32 * 2048 / sfreq / d, 1),
           config=dict(e=32, c=32, n=2048, f=40))

    # --- autoreject-global (r4: preprocessing) ---------------------------
    from ninwavelets_tpu.ops.reject import autoreject_global
    xar = np.asarray(rng.standard_normal((128, 64, 1024)), np.float32)
    xar[::16, 3, 100:160] += 12.0                     # planted artifacts
    xar_dev = jnp.asarray(xar)
    d = t(lambda x: autoreject_global(x).cv_error, xar_dev, iters=3)
    record(op="autoreject_global_128x64x1024",
           epochs_per_s=round(128 / d, 1),
           config=dict(e=128, c=64, n=1024, t_grid=30, folds=5))

    # --- sleep events + ERP (r4) -----------------------------------------
    from ninwavelets_tpu.ops.sleep import detect_spindles
    xsl = jnp.asarray(
        rng.standard_normal((8, 921600)).astype(np.float32))  # 8ch x 1h
    d = t(lambda x: detect_spindles(x, 256.0, kmax=1024).valid.sum(),
          xsl, iters=3)
    record(op="spindles_8ch_1h_256hz", hours_per_s=round(8 / d, 1),
           config=dict(c=8, n=921600, sfreq=256))
    from ninwavelets_tpu.ops.erp import jackknife_onsets
    xerp = jnp.asarray(
        rng.standard_normal((64, 64, 1024)).astype(np.float32))
    d = t(lambda x: jackknife_onsets(x, (100, 900))[2], xerp, iters=5)
    record(op="erp_jackknife_onsets_64x64", ms=round(d * 1e3, 2),
           config=dict(e=64, c=64, n=1024))

    # --- DFA (r4) --------------------------------------------------------
    from ninwavelets_tpu.ops.complexity import dfa
    xdfa = jnp.asarray(
        rng.standard_normal((64, 65536)).astype(np.float32))
    d = t(lambda x: dfa(x)[0], xdfa, iters=5)
    record(op="dfa_64x65536", signal_s_per_s=round(64 * 65536 / sfreq / d,
                                                   1),
           config=dict(b=64, n=65536, scales=12))

    # --- TRF + LCMV (r4) -------------------------------------------------
    from ninwavelets_tpu.ops.trf import trf_fit
    stim_t = jnp.asarray(rng.standard_normal(250000).astype(np.float32))
    resp_t = jnp.asarray(
        rng.standard_normal((64, 250000)).astype(np.float32))
    d = t(lambda r_: trf_fit(stim_t, r_, range(0, 64)).weights, resp_t,
          iters=3)
    record(op="trf_fit_64ch_250k_64lags",
           signal_s_per_s=round(250000 / sfreq / d, 1),
           config=dict(c=64, n=250000, lags=64))
    from ninwavelets_tpu.ops.beamformer import lcmv
    lf_b = jnp.asarray(rng.standard_normal((5000, 64)).astype(np.float32))
    cov_b = jnp.asarray((np.eye(64) + 0.1).astype(np.float32))
    d = t(lambda cv: lcmv(cv, lf_b).nai, cov_b, iters=5)
    record(op="lcmv_5000src_64ch", ms=round(d * 1e3, 2),
           config=dict(s=5000, c=64))

    # --- SSVEP CCA (r4) --------------------------------------------------
    from ninwavelets_tpu.ops.decoding import ssvep_cca
    xsv = jnp.asarray(
        rng.standard_normal((200, 8, 1000)).astype(np.float32))
    d = t(lambda x: ssvep_cca(x, [8.0, 10.0, 12.0, 15.0], 250.0)[1],
          xsv, iters=5)
    record(op="ssvep_cca_200trials", trials_per_s=round(200 / d, 1),
           config=dict(e=200, c=8, n=1000, f=4, harmonics=3))

    # --- r5 coverage sweep (VERDICT #7): every ops family gets a row -----
    # Stockwell transform
    from ninwavelets_tpu.ops.stockwell import stockwell_ri
    xst = jnp.asarray(rng.standard_normal((8, 4096)).astype(np.float32))
    st_freqs = np.linspace(2.0, 80.0, 40)
    d = t(lambda x: stockwell_ri(x, st_freqs, 250.0)[0], xst, iters=5)
    record(op="stockwell_8x4096_40f",
           eeg_s_per_s=round(8 * 4096 / 250.0 / d, 1),
           config=dict(rows=8, n=4096, f=40))

    # specparam (FOOOF) on a batch of spectra
    from ninwavelets_tpu.ops.specparam import specparam
    sp_freqs = np.linspace(2.0, 60.0, 117)
    sp_pow = jnp.asarray(
        (10.0 / sp_freqs[None, :] ** 1.2
         + 2.0 * np.exp(-0.5 * ((sp_freqs[None, :] - 10.0) / 1.5) ** 2)
         + 0.05 * rng.random((64, sp_freqs.size))).astype(np.float32))
    t0sp = time.perf_counter()
    fitsp = specparam(sp_pow, sp_freqs, n_steps=500)
    _ = np.asarray(fitsp.exponent)
    dsp = time.perf_counter() - t0sp
    t0sp = time.perf_counter()
    fitsp = specparam(sp_pow * 1.001, sp_freqs, n_steps=500)
    _ = np.asarray(fitsp.exponent)
    dsp = min(dsp, time.perf_counter() - t0sp)
    record(op="specparam_64spectra",
           spectra_per_s=round(64 / dsp, 1),
           config=dict(b=64, f=sp_freqs.size, steps=500))

    # event-related PAC (trial-resolved circular-linear correlation)
    from ninwavelets_tpu.ops.connectivity import erpac
    bank_ph = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(4.0, 12.0), 1024, sfreq, True),
        np.float32))
    bank_am = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(40.0, 80.0, 5.0), 1024, sfreq, True),
        np.float32))
    xerp = jnp.asarray(rng.standard_normal((64, 1024)).astype(np.float32))
    d = t(lambda x: erpac(x, bank_ph, bank_am, interpolate=True), xerp,
          iters=5)
    record(op="erpac_64trials",
           eeg_s_per_s=round(64 * 1024 / sfreq / d, 1),
           config=dict(e=64, n=1024, fp=8, fa=8))

    # VMD + EWT decompositions
    from ninwavelets_tpu.ops.vmd import vmd
    xvmd = jnp.asarray((np.sin(2 * np.pi * 5 * np.arange(4096) / 250.0)
                        + np.sin(2 * np.pi * 25 * np.arange(4096) / 250.0)
                        + 0.1 * rng.standard_normal(4096)
                        ).astype(np.float32))
    d = t(lambda x: vmd(x, 250.0, n_modes=3)[0], xvmd, iters=3)
    record(op="vmd_4096_3modes",
           signal_s_per_s=round(4096 / 250.0 / d, 1),
           config=dict(n=4096, modes=3))
    from ninwavelets_tpu.ops.ewt import ewt as _ewt
    d = t(lambda x: _ewt(x, 250.0, n_modes=3)[0], xvmd, iters=3)
    record(op="ewt_4096_3modes",
           signal_s_per_s=round(4096 / 250.0 / d, 1),
           config=dict(n=4096, modes=3))

    # dipole fits (EEG sphere series + MEG Sarvas), warm wall
    from ninwavelets_tpu.ops.leadfield import (fibonacci_electrodes,
                                               fit_dipole, fit_dipole_meg,
                                               sphere_leadfield,
                                               sphere_leadfield_meg)
    elec = fibonacci_electrodes(64)
    src = np.array([[0.03, 0.02, 0.05]])
    lf = np.asarray(sphere_leadfield(elec, src))
    v_eeg = lf.reshape(64, 3) @ np.array([1.0, 0.5, 0.2])
    fit_dipole(v_eeg, elec)                   # compile
    t0dp = time.perf_counter()
    fe = fit_dipole(v_eeg, elec)
    d = time.perf_counter() - t0dp
    record(op="fit_dipole_eeg_64ch", ms=round(d * 1e3, 1),
           config=dict(e=64, gof=round(float(fe["gof"]), 4)))
    sens = fibonacci_electrodes(64) * 1.2
    sori = sens / np.linalg.norm(sens, axis=1, keepdims=True)
    lfm = np.asarray(sphere_leadfield_meg(sens, sori, src))
    v_meg = lfm.reshape(64, 3) @ np.array([1.0, 0.5, 0.0])
    fit_dipole_meg(v_meg, sens, sori)         # compile
    t0dp = time.perf_counter()
    fm = fit_dipole_meg(v_meg, sens, sori)
    d = time.perf_counter() - t0dp
    record(op="fit_dipole_meg_64ch", ms=round(d * 1e3, 1),
           config=dict(e=64, gof=round(float(fm["gof"]), 4)))

    # slow oscillations (the spindles row's sibling)
    from ninwavelets_tpu.ops.sleep import detect_slow_oscillations
    xso = jnp.asarray((20.0 * np.sin(2 * np.pi * 0.8 * np.arange(
        128 * 1800) / 128.0) * (rng.random(128 * 1800) < 0.3)
        + 10.0 * rng.standard_normal(128 * 1800)
        ).astype(np.float32))[None, :].repeat(8, 0)
    d = t(lambda x: detect_slow_oscillations(x, 128.0).valid, xso,
          iters=3)
    record(op="slow_osc_8ch_30min_128hz",
           signal_s_per_s=round(8 * 1800 / d, 1),
           config=dict(c=8, dur_s=1800, sfreq=128))

    # microstate syntax (directional transition asymmetry) test
    from ninwavelets_tpu.ops.microstates import microstate_syntax_test
    lab_syn = jnp.asarray(np.repeat(
        rng.integers(0, 4, 3000), rng.integers(10, 40, 3000)
    )[:60000].astype(np.int32))
    t0ms = time.perf_counter()
    syn = microstate_syntax_test(lab_syn, 4, n_shuffles=500)
    _ = float(syn[1])
    d = time.perf_counter() - t0ms
    record(op="microstate_syntax_500perm", ms=round(d * 1e3, 1),
           config=dict(t=60000, k=4, shuffles=500))

    # pairwise phase-slope index (the matrix row's sibling)
    from ninwavelets_tpu.ops.extensions import psi as psi_pair
    xpa = jnp.asarray(rng.standard_normal((64, 2048)).astype(np.float32))
    xpb = jnp.roll(xpa, 3, -1)
    bank_psi = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(5.0, 45.0), 2048, sfreq, True),
        np.float32))
    d = t(lambda a: psi_pair(a, xpb, bank_psi, interpolate=True), xpa,
          iters=5)
    record(op="psi_pairwise_64ep",
           eeg_s_per_s=round(64 * 2048 / sfreq / d, 1),
           config=dict(e=64, n=2048, f=40))

    # inverse CWT round trip
    from ninwavelets_tpu.ops.cwt import cwt_from_bank
    from ninwavelets_tpu.ops.icwt import icwt_ri
    bank_ic = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(5.0, 105.0), 4096, sfreq, True),
        np.float32))
    xic = jnp.asarray(rng.standard_normal((8, 4096)).astype(np.float32))

    @jax.jit
    def _ic_round(x):
        w = cwt_from_bank(x, bank_ic, True)
        return icwt_ri(w.real, w.imag, bank_ic)[0]

    d = t(_ic_round, xic, iters=5)
    record(op="icwt_roundtrip_8x4096",
           eeg_s_per_s=round(8 * 4096 / sfreq / d, 1),
           config=dict(rows=8, n=4096, f=100))

    # graph metrics over a connectivity matrix
    from ninwavelets_tpu.ops.graph import small_worldness
    wg = np.abs(rng.standard_normal((64, 64))).astype(np.float32)
    wg = (wg + wg.T) / 2
    d = t(lambda w: small_worldness(w, n_nulls=20), jnp.asarray(wg),
          iters=3)
    record(op="graph_small_world_64n_20null", ms=round(d * 1e3, 1),
           config=dict(nodes=64, nulls=20))

    # bootstrap CI over trial planes
    from ninwavelets_tpu.ops.bootstrap import bootstrap_ci
    xboot = jnp.asarray(
        rng.standard_normal((100, 50, 256)).astype(np.float32))
    d = t(lambda x: bootstrap_ci(x, n_boot=1000)[0], xboot, iters=3)
    record(op="bootstrap_ci_1000_100trials", ms=round(d * 1e3, 1),
           config=dict(e=100, plane=[50, 256], n_boot=1000))

    # spherical-spline CSD applied to a recording
    from ninwavelets_tpu.ops.csd import csd, csd_transform
    th = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    pos_csd = np.stack([np.cos(th) * 0.9, np.sin(th) * 0.9,
                        np.full(64, 0.436)], 1)
    xcsd = jnp.asarray(
        rng.standard_normal((64, 120000)).astype(np.float32))
    csd_transform(pos_csd)                    # host solve, cached
    d = t(lambda x: csd(x, pos_csd), xcsd, iters=3)
    record(op="csd_spline_64x120k",
           signal_s_per_s=round(120000 / 250.0 / d, 1),
           config=dict(c=64, n=120000))

    # IAAFT surrogates
    from ninwavelets_tpu.ops.sim import iaaft_surrogates
    xia = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    d = t(lambda x: iaaft_surrogates(0, x, n_surrogates=19, n_iter=100),
          xia, iters=3)
    record(op="iaaft_19surr_4096", ms=round(d * 1e3, 1),
           config=dict(n=4096, s=19, iters=100))

    # Torrence-Compo AR(1) significance mask on the epoch-mean TFR
    from ninwavelets_tpu.ops.tc_stats import (ar1_coefficient,
                                              significant_mask)
    xtc_np = np.asarray(rng.standard_normal(2048), np.float32)
    bank_tc = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(5.0, 105.0), 2048, sfreq, True),
        np.float32))
    ptc = jnp.square(jnp.abs(cwt_from_bank(jnp.asarray(xtc_np), bank_tc,
                                           True)))
    a1 = ar1_coefficient(xtc_np)
    var = float(xtc_np.var())
    d = t(lambda p: significant_mask(p, bank_tc, sfreq, a1, var),
          ptc, iters=5)
    record(op="tc_significance_mask_100f", ms=round(d * 1e3, 2),
           config=dict(f=100, n=2048, alpha=round(a1, 3)))

    # per-pixel TF decoding (diagonal LDA AUC)
    from ninwavelets_tpu.ops.decoding import tf_decode
    xda = jnp.asarray(
        rng.standard_normal((24, 8, 30, 256)).astype(np.float32))
    xdb = jnp.asarray(
        rng.standard_normal((24, 8, 30, 256)).astype(np.float32)) + 0.3
    d = t(lambda a: tf_decode(a, xdb), xda, iters=3)
    record(op="tf_decode_5fold_24trials", ms=round(d * 1e3, 1),
           config=dict(e=48, c=8, plane=[30, 256]))

    # xDAWN evoked enhancement
    from ninwavelets_tpu.ops.spatial import xdawn
    xxd = jnp.asarray(
        rng.standard_normal((32, 100000)).astype(np.float32))
    ev_xd = np.sort(rng.choice(np.arange(200, 99000), 200,
                               replace=False))
    t0xd = time.perf_counter()
    fx = xdawn(xxd, ev_xd, window=128)
    _ = np.asarray(fx[0])
    dxd = time.perf_counter() - t0xd
    t0xd = time.perf_counter()
    fx = xdawn(xxd * 1.001, ev_xd, window=128)
    _ = np.asarray(fx[0])
    dxd = min(dxd, time.perf_counter() - t0xd)
    record(op="xdawn_32ch_200ev", ms=round(dxd * 1e3, 1),
           config=dict(c=32, n=100000, events=200, window=128))

    # --- real-format end-to-end workflow (r5, VERDICT #6) ----------------
    # writes a miniature EDF+ (TAL markers + a bad-interval span) and
    # drives from_edf -> QC -> interpolate -> ICA -> marker epochs with
    # span rejection -> condition split -> power/ITC -> cluster test ->
    # Report; warm wall (2nd pass, programs cached) is the row.
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tempfile as _tempfile

    from workflow_e2e import run_workflow, synth_recording

    from ninwavelets_tpu.io.edf import write_edf
    wf_sfreq, wf_dur = 250.0, 240.0
    wf_dir = _tempfile.mkdtemp(prefix="ninw_e2e_")
    wf_data, wf_names, wf_ann, _ = synth_recording(wf_sfreq, wf_dur)
    wf_path = os.path.join(wf_dir, "rec.edf")
    write_edf(wf_path, wf_data, wf_sfreq, wf_names, annotations=wf_ann)
    # warm pass runs a DIFFERENT recording (seed 1): same shapes reuse
    # the compiled programs, different values defeat any result cache
    wf_data2, _, wf_ann2, _ = synth_recording(wf_sfreq, wf_dur, seed=1)
    wf_path2 = os.path.join(wf_dir, "rec2.edf")
    write_edf(wf_path2, wf_data2, wf_sfreq, wf_names,
              annotations=wf_ann2)
    wf_cold = run_workflow(wf_path)
    wf = run_workflow(wf_path2)
    record(op="workflow_edf_e2e",
           recording_s_per_s=round(wf_dur / wf["wall_s"], 1),
           config=dict(c=len(wf_names), dur_s=wf_dur,
                       n_kept=wf["n_kept"], n_events=wf["n_events"],
                       cold_wall_s=round(wf_cold["wall_s"], 2),
                       cluster_p=round(wf["cluster_p"], 4)))

    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
