"""On-chip compiled-kernel parity sweep (VERDICT r1 item 4).

The Pallas interpreter cannot see Mosaic's compiled numerics (DEFAULT
matmuls run in full f32 there), so the compiled kernel's accuracy is
recorded HERE, on the real chip, and committed as an artifact the CPU test
suite gates on (``tests/artifacts/onchip_parity_r04.json``,
``tests/test_onchip_parity.py``).

Run on the TPU host:  python benchmarks/onchip_parity.py
(Each (N, precision) pair is a fresh Mosaic compile; the full sweep takes
tens of minutes cold, minutes warm via the persistent compile cache.)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "artifacts",
                   "onchip_parity_r04.json")


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
    from ninwavelets_tpu.ops.cwt import itc as xla_itc
    from ninwavelets_tpu.ops.cwt import mean_power as xla_mean_power

    assert jax.default_backend() == "tpu", "run this on the TPU host"
    sfreq = 1000.0
    rng = np.random.default_rng(0)
    morse = nw.Morse(sfreq)
    rows = []

    def bank_for(n):
        return jnp.asarray(np.asarray(
            make_fft_bank(morse._wdef(), jnp.arange(1.0, 101.0), n, sfreq,
                          True), np.float32))

    def record(**row):
        rows.append(row)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                      indent=1)
        print(json.dumps(row), flush=True)

    def compare(want, got):
        err = np.abs(got - want)
        scale = np.abs(want).max()
        snr = 20.0 * np.log10(
            np.linalg.norm(want) / max(np.linalg.norm(err), 1e-30))
        return float(err.max() / scale), float(snr)

    # --- power: N geometries x precisions x {aligned, ragged} epochs -----
    for n in (1024, 2048, 4096, 8192, 16384):
        bank = bank_for(n)
        c = 4
        for e in (16, 40):            # 40: ragged tail -> zero-pad + scan
            sig = jnp.asarray(rng.standard_normal((e, c, n))
                              .astype(np.float32))
            want = np.asarray(xla_mean_power(sig, bank, interpolate=True))
            for prec in fused.PRECISIONS:
                t0 = time.time()
                got = np.asarray(fused.fused_mean_power(
                    sig, bank, interpolate=True, precision=prec))
                rel, snr = compare(want, got)
                record(epilogue="power", n=n, e=e, c=c, precision=prec,
                       rel_err=rel, snr_db=round(snr, 1),
                       wall_s=round(time.time() - t0, 1))

    # --- itc: the unit-phase epilogue at the bench geometry --------------
    n, c, e = 2048, 4, 16
    bank = bank_for(n)
    sig = jnp.asarray(rng.standard_normal((e, c, n)).astype(np.float32))
    want = np.asarray(xla_itc(sig, bank, interpolate=True))
    finite = np.isfinite(want)
    for prec in fused.PRECISIONS:
        got = np.asarray(fused.fused_itc(sig, bank, interpolate=True,
                                         precision=prec))
        err = np.abs(got - want)[finite]
        rel = float(err.max())          # itc is already in [0, 1]
        snr = 20.0 * np.log10(np.linalg.norm(want[finite])
                              / max(np.linalg.norm(err), 1e-30))
        record(epilogue="itc", n=n, e=e, c=c, precision=prec,
               rel_err=rel, snr_db=round(float(snr), 1), wall_s=0.0)

    # --- complex (Twice-mode) bank: MexicanHat through the kernel --------
    n, c, e = 2048, 4, 16
    mh = nw.MexicanHat(sfreq)
    # jitted float-boundary builder — eager complex arrays are rejected by
    # this TPU runtime (CLAUDE.md).
    from ninwavelets_tpu.ops.bank import make_fft_bank_ri
    br, bi = make_fft_bank_ri(mh._wdef(), jnp.arange(1.0, 101.0), n, sfreq,
                              True)
    assert bi is not None
    sig = jnp.asarray(rng.standard_normal((e, c, n)).astype(np.float32))
    want = np.asarray(jax.jit(
        lambda s, r, i: xla_mean_power(s, r, i, interpolate=True))(
            sig, br, bi))
    for prec in ("fast3", "exact"):
        got = np.asarray(fused.fused_mean_power(sig, br, bi,
                                                interpolate=True,
                                                precision=prec))
        rel, snr = compare(want, got)
        record(epilogue="power", n=n, e=e, c=c, precision=prec,
               bank="complex", rel_err=rel, snr_db=round(snr, 1),
               wall_s=0.0)

    # --- power_each: the long-recording epilogue -------------------------
    n = 16384
    bank = bank_for(n)
    from ninwavelets_tpu.ops.cwt import power as xla_power
    sig = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32))
    want = np.asarray(xla_power(sig, bank, interpolate=True))
    for prec in ("fast3", "exact"):
        got = np.asarray(jax.jit(
            lambda s, b, p=prec: fused.fused_power_from_bank(
                s, b, True, precision=p))(sig, bank))
        rel, snr = compare(want, got)
        record(epilogue="power_each", n=n, e=8, c=1, precision=prec,
               rel_err=rel, snr_db=round(snr, 1), wall_s=0.0)

    # --- cross-signal epilogues: coherence + plv -------------------------
    n, c, e = 2048, 4, 16
    bank = bank_for(n)
    sa = jnp.asarray(rng.standard_normal((e, c, n)).astype(np.float32))
    sb = jnp.asarray((0.6 * np.asarray(sa)
                      + 0.8 * rng.standard_normal((e, c, n))
                      ).astype(np.float32))
    from ninwavelets_tpu.ops.connectivity import _plv_jit
    from ninwavelets_tpu.ops.extensions import _epoch_coherence_jit
    want_c = np.asarray(_epoch_coherence_jit(sa, sb, bank, None,
                                             interpolate=True, eps=1e-12))
    want_p = np.asarray(_plv_jit(sa, sb, bank, interpolate=True, eps=0.0))
    fin = np.isfinite(want_p)
    for prec in ("fast3", "exact", "bf16"):
        got = np.asarray(jax.jit(
            lambda a, b, bk, p=prec: fused.fused_epoch_coherence(
                a, b, bk, True, False, p))(sa, sb, bank))
        rel, snr = compare(want_c, got)
        record(epilogue="coherence", n=n, e=e, c=c, precision=prec,
               rel_err=rel, snr_db=round(snr, 1), wall_s=0.0)
        got = np.asarray(jax.jit(
            lambda a, b, bk, p=prec: fused._plv_from_sums(
                a, b, bk, True, False, p))(sa, sb, bank))
        err = np.abs(got - want_p)[fin]
        snr = 20.0 * np.log10(np.linalg.norm(want_p[fin])
                              / max(np.linalg.norm(err), 1e-30))
        record(epilogue="plv", n=n, e=e, c=c, precision=prec,
               rel_err=float(err.max()), snr_db=round(float(snr), 1),
               wall_s=0.0)

    # --- imcoh off the coherence epilogue sums ---------------------------
    from ninwavelets_tpu.ops.extensions import _imcoh_jit
    want_i = np.asarray(_imcoh_jit(sa, sb, bank, None, interpolate=True,
                                   eps=1e-12))
    for prec in ("fast3", "exact", "bf16"):
        got = np.asarray(fused.fused_imcoh(sa, sb, bank, interpolate=True,
                                           precision=prec))
        rel, snr = compare(want_i, got)
        record(epilogue="imcoh", n=n, e=e, c=c, precision=prec,
               rel_err=rel, snr_db=round(snr, 1), wall_s=0.0)

    # --- phaselag epilogue: wPLI (the sum-ratio member; pli's sign count
    # is documented as kernel-roundoff-sensitive and not gated) ----------
    from ninwavelets_tpu.ops.connectivity import _phase_lag_jit
    want_w = np.asarray(_phase_lag_jit(sa, sb, bank, method="wpli",
                                       interpolate=True, eps=0.0))
    finw = np.isfinite(want_w)
    for prec in ("fast3", "exact", "bf16"):
        got = np.asarray(fused.fused_phase_lag(
            sa, sb, bank, method="wpli", interpolate=True, precision=prec))
        err = np.abs(got - want_w)[finw]
        snr = 20.0 * np.log10(np.linalg.norm(want_w[finw])
                              / max(np.linalg.norm(err), 1e-30))
        record(epilogue="phaselag", n=n, e=e, c=c, precision=prec,
               rel_err=float(err.max()), snr_db=round(float(snr), 1),
               wall_s=0.0)

    # --- backward: the fused adjoint kernel vs the XLA adjoint -----------
    for n in (1024, 2048, 8192):
        bank = bank_for(n)
        c, e = 4, 16
        sig = jnp.asarray(rng.standard_normal((e, c, n)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((c, 100, n)).astype(np.float32))
        ds_w, db_w = jax.tree.map(np.asarray, jax.jit(
            lambda s, b, gg: fused._mean_power_bwd(s, b, True, gg))(
            sig, bank, g))
        for prec in ("fast3", "exact", "bf16"):
            t0 = time.time()
            ds_g, db_g = jax.tree.map(np.asarray, jax.jit(
                lambda s, b, gg, p=prec: fused._fused_power_bwd(
                    s, b, gg, True, False, p))(sig, bank, g))
            rel_s, snr_s = compare(ds_w, ds_g)
            rel_b, snr_b = compare(db_w, db_g)
            record(epilogue="backward", n=n, e=e, c=c, precision=prec,
                   rel_err=max(rel_s, rel_b),
                   snr_db=round(min(snr_s, snr_b), 1),
                   wall_s=round(time.time() - t0, 1))

    # --- ssq: the r4 fused synchrosqueezing kernel -----------------------
    # Tone + noise; the plane SNR and the column-sum (energy
    # conservation) error are recorded separately — individual cells ON
    # a bisect edge may legitimately round to the neighboring row, which
    # caps the raw plane SNR on noise-heavy inputs without any energy
    # being lost.
    from ninwavelets_tpu.ops.sst import uniform_grid_hint
    from ninwavelets_tpu.ops.sst import _ssq_mean_jit
    n, c, e = 2048, 4, 16
    freqs_np = np.arange(1.0, 101.0, dtype=np.float32)
    bank = bank_for(n)
    tt = np.arange(n, dtype=np.float64) / sfreq
    sig = (np.sin(2 * np.pi * 40.0 * tt)[None, None, :]
           + 0.1 * rng.standard_normal((e, c, n))).astype(np.float32)
    sig = jnp.asarray(sig)
    hint = uniform_grid_hint(freqs_np)
    want = np.asarray(_ssq_mean_jit(
        sig, bank, jnp.asarray(freqs_np), sfreq=sfreq, interpolate=True,
        rel_threshold=1e-6, uniform_grid=hint))
    for prec in ("exact", "fast3"):
        t0 = time.time()
        got = np.asarray(fused.fused_ssq_mean_power(
            sig, bank, uniform_grid=hint, sfreq=sfreq, precision=prec))
        rel, snr = compare(want, got)
        cs = float(np.abs(got.sum(1) - want.sum(1)).max()
                   / want.sum(1).max())
        record(epilogue="ssq", n=n, e=e, c=c, precision=prec,
               rel_err=rel, snr_db=round(snr, 1), colsum_rel=cs,
               wall_s=round(time.time() - t0, 1))

    print(f"wrote {len(rows)} rows -> {OUT}")


if __name__ == "__main__":
    main()
