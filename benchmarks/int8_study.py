"""int8 hi/lo feasibility study for the fused kernel (ROOFLINE.md item 1).

Question: can the two DFT matmul stages run as 3 int8 MXU passes (~1.5x
bf16-pass cost, i.e. ~2x fewer pass-FLOPs than fast3's 3 bf16 passes) while
keeping the end-to-end mean-power error inside the 1e-4 float32 parity gate?

int8 is *fixed-point*: within one quantization group every element shares a
scale, so elements far below the group max lose all their bits.  The bank
rows are near-deltas at low analysis frequencies (Morse bandwidth ~ f/sqrt
(b)), so the scale-group geometry is the whole question.  This script
simulates the exact kernel arithmetic (stage-0 bank*spec, block-diagonal
stage-1 matmul, f32 twiddle, stage-2 matmul, |.|^2, epoch mean) in numpy
with int8 hi/lo quantized matmuls under several scale-group schemes, against
a float64 reference, on the real BENCH workload geometry.

Schemes:
  exact_group  scale[fb, lane] = max |M| over the 2*K1 rows of block fb
               (the tightest group the block-diagonal W1 allows; needs an
               in-kernel grouped sublane reduction)
  bound        scale[fb, lane] = bankmax[fb] * specmax[lane] (analytic
               upper bound; bankmax precomputed in XLA, specmax one
               K1-row reduction in kernel — cheapest to implement)
  per_lane     scale[lane] only (what a naive per-column quant would do;
               expected to FAIL: one lane mixes all FB frequency rows)
Stage 2 always uses per-row scales on the twiddled operand (rows are
(e, fb, n1) — one frequency row each, magnitudes uniform).

Run: python benchmarks/int8_study.py   (pure numpy, no TPU needed)
"""
import numpy as np

LANES = 128


def q_hilo(x, scale):
    """int8 hi/lo quantization: x ~= scale/127 * (qh + ql/256).

    Residual after lo is <= scale * 2^-16-ish; together with the dropped
    lo@lo matmul term this is the int8 analog of fast3's bf16 hi/lo split.
    """
    s = np.where(scale > 0, scale, 1.0)
    y = x / s
    qh = np.clip(np.round(y * 127.0), -127, 127)
    r = y * 127.0 - qh
    ql = np.clip(np.round(r * 256.0), -128, 127)
    return qh, ql


def qmm(a, b, sa_row, sb_col):
    """3-pass int8 matmul: Ah@Bh + Ah@Bl/256 + Al@Bh/256, dequantized with
    per-row scales on A and per-column scales on B."""
    ah, al = q_hilo(a, sa_row)
    bh, bl = q_hilo(b, sb_col)
    acc = ah @ bh + (ah @ bl + al @ bh) / 256.0
    return (sa_row / 127.0) * acc * (sb_col / 127.0)


def _bf16(x):
    """Round f64 -> bf16 (round-to-nearest-even on the f32 bit pattern)."""
    f = np.asarray(x, np.float32)
    u = f.view(np.uint32)
    rounded = ((u + 0x8000 + ((u >> 16) & 1)) & 0xFFFF0000).view(np.float32)
    return rounded.astype(np.float64)


def bf16_mm3(a, b):
    """fast3 reference: 3-term bf16 hi/lo matmul in f32 accumulate."""
    ah = _bf16(a)
    al = _bf16(a - ah)
    bh = _bf16(b)
    bl = _bf16(b - bh)
    return ah @ bh + ah @ bl + al @ bh


def simulate(n=2048, n_freqs=100, e=16, c=2, seed=0, scheme="bound",
             mm="int8"):
    import sys
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from tests.reference_oracle import make_bank

    n1_dim = n // LANES
    k1_dim = n1_dim // 2                      # analytic path
    fb = LANES // n1_dim
    sfreq = 1000.0
    freqs = np.arange(1.0, n_freqs + 1.0)

    # Bank: float64 Morse oracle, analytic (upper half zero).
    bank = np.real(make_bank("morse", freqs, n, sfreq, True)).astype(
        np.float64)
    pad_f = (-n_freqs) % fb
    if pad_f:
        bank = np.concatenate([bank, np.zeros((pad_f, n))])
    n_blocks = bank.shape[0] // fb

    rng = np.random.default_rng(seed)
    sig = rng.standard_normal((e, c, n))
    spec = np.fft.fft(sig)
    spec[..., n // 2:] = 0.0                  # analytic mask
    spec = spec[..., :k1_dim * LANES]

    # f64 reference mean power.
    full_bank = bank[:, :]
    coeffs = np.fft.ifft(
        np.pad(spec, [(0, 0)] * 2 + [(0, n - k1_dim * LANES)])[:, :, None, :]
        * full_bank[None, None], axis=-1)
    ref = (np.abs(coeffs) ** 2).mean(axis=0)  # (C, F, N)
    ref = ref[:, :n_freqs]

    # DFT constants (same as ops.fused._dft_constants).
    k1 = np.arange(k1_dim)
    n1 = np.arange(n1_dim)
    w1_small = np.exp(2j * np.pi * np.outer(n1, k1) / n1_dim)
    w1 = np.zeros((fb * n1_dim, fb * k1_dim), np.complex128)
    for f in range(fb):
        w1[f * n1_dim:(f + 1) * n1_dim,
           f * k1_dim:(f + 1) * k1_dim] = w1_small
    w1c = np.block([[w1.real, -w1.imag], [w1.imag, w1.real]])  # (256, 128)
    k2 = np.arange(LANES)
    tw = np.tile(np.exp(2j * np.pi * np.outer(n1, k2) / n), (fb, 1))
    w2 = np.exp(2j * np.pi * np.outer(k2, k2) / LANES)

    out = np.zeros((c, n_blocks * fb, n))
    for ci in range(c):
        for blk in range(n_blocks):
            bblk = bank[blk * fb:(blk + 1) * fb, :k1_dim * LANES]
            bblk = bblk.reshape(fb * k1_dim, LANES) / n   # rows (fb, k1)
            acc = np.zeros((LANES, LANES))
            for ei in range(e):
                z = spec[ei, ci].reshape(k1_dim, LANES)
                zt = np.tile(z, (fb, 1))                  # rows (fb, k1)
                mr = bblk * zt.real                       # (FB*K1, 128)
                mi = bblk * zt.imag
                m = np.concatenate([mr, mi], 0)           # (128, 128)

                if mm == "f64":
                    a = w1c @ m
                elif mm == "bf16":
                    a = bf16_mm3(w1c, m)
                else:
                    # scale groups for the stage-1 RHS
                    if scheme == "exact_group":
                        g = np.abs(m).reshape(2, fb, k1_dim, LANES)
                        sc = g.max(axis=(0, 2))           # (FB, 128)
                    elif scheme == "bound":
                        bmax = np.abs(bblk).reshape(
                            fb, k1_dim, LANES).max(axis=(1, 2))  # (FB,)
                        smax = np.maximum(
                            np.abs(zt.real), np.abs(zt.imag)).reshape(
                            fb, k1_dim, LANES).max(axis=1)      # (FB, 128)
                        sc = bmax[:, None] * smax
                    elif scheme == "per_lane":
                        sc = np.broadcast_to(
                            np.abs(m).max(axis=0), (fb, LANES)).copy()
                    else:
                        raise ValueError(scheme)
                    # quantize each block-row-group with its own scale, do
                    # ONE int8 matmul (block-diagonal W1 keeps groups
                    # separate), dequantize rows of the output by group.
                    m_scaled = np.zeros_like(m)
                    sc_safe = np.where(sc > 0, sc, 1.0)
                    for f in range(fb):
                        rows = slice(f * k1_dim, (f + 1) * k1_dim)
                        m_scaled[rows] = m[rows] / sc_safe[f]
                        rows2 = slice((fb + f) * k1_dim,
                                      (fb + f + 1) * k1_dim)
                        m_scaled[rows2] = m[rows2] / sc_safe[f]
                    qh = np.clip(np.round(m_scaled * 127.0), -127, 127)
                    r = m_scaled * 127.0 - qh
                    ql = np.clip(np.round(r * 256.0), -128, 127)
                    w1h = np.clip(np.round(w1c * 127.0), -127, 127)
                    w1r = w1c * 127.0 - w1h
                    w1l = np.clip(np.round(w1r * 256.0), -128, 127)
                    acc_i = w1h @ qh + (w1h @ ql + w1l @ qh) / 256.0
                    # dequant: output rows (ri, fb, n1) pick group fb's col
                    # scale per lane
                    a = np.zeros((2 * LANES, LANES))
                    for f in range(fb):
                        srow = sc_safe[f] / (127.0 * 127.0)
                        orows = slice(f * n1_dim, (f + 1) * n1_dim)
                        a[orows] = acc_i[orows] * srow
                        orows2 = slice(LANES + f * n1_dim,
                                       LANES + (f + 1) * n1_dim)
                        a[orows2] = acc_i[orows2] * srow

                ar, ai = a[:LANES], a[LANES:]
                br = ar * tw.real - ai * tw.imag          # (128, 128) f32
                bi = ar * tw.imag + ai * tw.real

                if mm == "f64":
                    xr = br @ w2.real - bi @ w2.imag
                    xi = br @ w2.imag + bi @ w2.real
                elif mm == "bf16":
                    xr = bf16_mm3(br, w2.real) - bf16_mm3(bi, w2.imag)
                    xi = bf16_mm3(br, w2.imag) + bf16_mm3(bi, w2.real)
                else:
                    sr = np.abs(np.concatenate([br, bi], 1)).max(
                        axis=1, keepdims=True)            # per-row scale
                    xr = (qmm(br, w2.real, sr, np.ones(LANES))
                          - qmm(bi, w2.imag, sr, np.ones(LANES)))
                    xi = (qmm(br, w2.imag, sr, np.ones(LANES))
                          + qmm(bi, w2.real, sr, np.ones(LANES)))
                acc += xr * xr + xi * xi
            out[ci, blk * fb:(blk + 1) * fb] = (
                (acc / e).reshape(fb, n1_dim, LANES)
                .transpose(0, 2, 1).reshape(fb, n))
    out = out[:, :n_freqs]
    err = out - ref
    peak = np.abs(ref).max()
    rel = np.abs(err).max() / peak
    snr = 10 * np.log10((ref ** 2).sum() / (err ** 2).sum())
    # Per-frequency-row relative error: a fixed-point scheme can be fine
    # vs the global peak yet garbage relative to a quiet row's own scale.
    row_peak = np.abs(ref).max(axis=-1)                    # (C, F)
    row_err = np.abs(err).max(axis=-1)
    row_rel = (row_err / row_peak).max()
    return rel, snr, row_rel


if __name__ == "__main__":
    for mm, scheme in [("f64", "-"), ("bf16", "-"),
                       ("int8", "exact_group"), ("int8", "bound"),
                       ("int8", "per_lane")]:
        rel, snr, row_rel = simulate(mm=mm, scheme=scheme)
        print(f"{mm:5s} {scheme:12s}  max_rel_vs_peak={rel:9.3e}  "
              f"SNR={snr:7.2f} dB  max_row_rel={row_rel:9.3e}")
