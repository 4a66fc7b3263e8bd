"""Source imaging + encoding-model walkthrough (round-4 families):

    LCMV localization -> beamformed source TFR -> DICS source
    coherence -> sLORETA cross-check -> dipole fit -> mTRF envelope
    tracking

    python examples/source_demo.py

Everything is planted: a PHYSICAL spherical-head leadfield
(`ops.sphere_leadfield` — Fibonacci cap over a source grid), three
oscillatory sources (two coherent at 20 Hz, one independent), and a
stimulus-driven channel — each stage prints what it recovered.
"""
import numpy as np

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.beamformer import (dics, lcmv, lcmv_apply,
                                            minimum_norm,
                                            minimum_norm_apply,
                                            source_coherence,
                                            wavelet_csd)
from ninwavelets_tpu.ops.trf import trf_cv

SFREQ = 1000.0


def main() -> None:
    import jax.numpy as jnp

    from ninwavelets_tpu.ops.leadfield import (fibonacci_electrodes,
                                               sphere_leadfield)
    rng = np.random.default_rng(0)
    c, s, n, e = 24, 30, 2048, 12
    # physical forward model: 24-electrode cap, 30 random deep sources
    # with random orientations in a 9 cm sphere
    elec = fibonacci_electrodes(c, 0.09)
    src_pos = rng.uniform(-0.05, 0.05, (s, 3))
    src_ori = rng.standard_normal((s, 3))
    lf = np.array(sphere_leadfield(elec, src_pos, radius=0.09,
                                   orientation=src_ori)).T    # (S, C)
    lf = lf / np.linalg.norm(lf, axis=1, keepdims=True)
    lf = lf.astype(np.float32)
    t = np.arange(n) / SFREQ

    # --- three 20 Hz sources: two partially coherent, one independent
    x = 0.4 * rng.standard_normal((e, c, n))
    for i in range(e):
        drive = np.sin(2 * np.pi * 20 * t + rng.uniform(0, 2 * np.pi))
        own = np.sin(2 * np.pi * 20 * t + rng.uniform(0, 2 * np.pi))
        indep = np.sin(2 * np.pi * 20 * t + rng.uniform(0, 2 * np.pi))
        x[i] += 2.0 * lf[4][:, None] * drive[None, :]
        x[i] += 2.0 * lf[11][:, None] * (0.71 * drive
                                         + 0.71 * own)[None, :]
        x[i] += 2.0 * lf[22][:, None] * indep[None, :]
    x = x.astype(np.float32)

    # 1. LCMV localization on the broadband covariance
    flat = x.transpose(1, 0, 2).reshape(c, -1)
    cov = (flat @ flat.T / flat.shape[1]).astype(np.float32)
    res = lcmv(cov, lf)
    top3 = sorted(np.argsort(np.asarray(res.nai))[-3:].tolist())
    print(f"lcmv: top-3 NAI sources {top3} (planted [4, 11, 22])")

    # 2. beamformed source TFR through the ordinary engine
    tc = np.asarray(lcmv_apply(res, x[0]))          # (S, N)
    morse = nw.Morse(SFREQ)
    p = np.asarray(morse.power(tc[4], np.arange(5.0, 40.0, 1.0)))
    print(f"source-4 TFR peak: {5 + int(np.argmax(p.mean(-1)))} Hz "
          f"(planted 20)")

    # 3. DICS at 20 Hz + source coherence
    bank = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.asarray(np.array([20.0], np.float32)), n,
        SFREQ, True), np.float32))
    cr, ci = wavelet_csd(x, bank, interpolate=True)
    dres = dics(cr[0], ci[0], lf)
    coh = np.asarray(source_coherence(dres, cr[0], ci[0]))
    print(f"dics source coherence: coupled pair {coh[4, 11]:.2f}, "
          f"independent {coh[4, 22]:.2f}")

    # 4. sLORETA cross-check (non-adaptive — robust to coherent pairs)
    mn = minimum_norm(lf, method="sloreta")
    est = np.asarray(minimum_norm_apply(mn, flat))
    mn_top = sorted(np.argsort((est ** 2).mean(-1))[-3:].tolist())
    print(f"sloreta: top-3 sources {mn_top}")

    # 5. equivalent-current-dipole fit of the strongest source's
    #    topography (inverse of the same sphere model)
    from ninwavelets_tpu.ops.leadfield import fit_dipole
    v_topo = np.array(lf[4]) * 3e-9    # source 4's pattern, ~3 nAm
    dres2 = fit_dipole(v_topo + 0.03 * np.abs(v_topo).max()
                       * rng.standard_normal(c), elec, radius=0.09)
    err_mm = 1000 * np.linalg.norm(dres2["pos"] - src_pos[4])
    print(f"dipole fit: {err_mm:.1f} mm from the planted source, "
          f"gof {dres2['gof']:.3f}")

    # 6. mTRF: a stimulus envelope drives one channel
    n2 = 25000
    env = np.convolve(rng.standard_normal(n2), np.hanning(25),
                      "same").astype(np.float32)
    kern = (np.exp(-np.arange(30) / 8.0)
            * np.sin(np.arange(30) / 4.0)).astype(np.float32)
    resp = np.stack([np.convolve(env, kern)[:n2]
                     + 0.5 * rng.standard_normal(n2),
                     rng.standard_normal(n2)]).astype(np.float32)
    _, r, lam = trf_cv(env, resp, range(0, 50), n_folds=4)
    print(f"mtrf: held-out tracking r = {r[0]:.2f} (driven) / "
          f"{r[1]:.2f} (noise), ridge {lam:g}")


if __name__ == "__main__":
    main()
