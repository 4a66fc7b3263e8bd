"""Pallas mega-kernel: bank-multiply x matmul-iFFT x |.|^2 x epoch-sum, fused.

Why: the XLA hot path (``ops.cwt.mean_power``) is HBM-bandwidth-bound — per
epoch it writes the (C, F, N) complex bank*spectrum product, reads it into
the batched iFFT, writes the complex coefficients, then reads them again for
the power reduction: ~4 full passes over a tensor that is only ever needed
once.  This kernel keeps the whole per-row pipeline in VMEM: it reads the
signal *spectra* (tiny) and the bank row, runs the inverse DFT as two MXU
matrix multiplies (four-step Cooley-Tukey), squares, and accumulates over
epochs — HBM sees only spectra in and one f32 power plane out.

Math: length-N inverse DFT decomposed as N = N1 * 128 (N1 = N/128), index
split k = 128*k1 + k2, n = n1 + N1*n2 (k1, n1 in [0, N1); k2, n2 in
[0, 128)):

    x[n1 + N1 n2] = sum_k2 w_128^{n2 k2} * [ w_N^{n1 k2}
                    * sum_k1 z[128 k1 + k2] * w_N1^{n1 k1} ]

Stage 1 contracts k1 (a skinny matmul over Z = z.reshape(N1, 128)), the
twiddle is elementwise, and stage 2 contracts k2 — a DENSE (K=128) matmul
with full MXU utilization (the N2-minor decomposition would need a
block-diagonal stage 2 that wastes 128/N2 of the MXU).  Epochs are packed
along lanes in stage 1 (weight-stationary, one dispatch) and along sublanes
in stage 2 (128/N1 epochs per dispatch); real/imag are folded into stacked
operands, so each program runs 1 + E/(128/N1) dense matmuls per bank row.

With the analytic/interpolate path (the reference's ``interpolate=True``,
``base.py:400-401``) the upper half of the spectrum is zero, the signal FFT
becomes an rFFT, and stage 1 halves.  Matmul precision is selectable (see
``PRECISIONS``); the default "fast3" runs a manual 3-pass bf16 split at
~1e-5 relative error, ~1.5x faster end-to-end than true-f32 "exact".

The reference computes this pipeline as per-frequency numpy loops + host-
side abs (``/root/reference/ninwavelets/base.py:378-443``); parity is
against ``ops.cwt.mean_power`` (same math via XLA FFT), tested to float32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

LANES = 128
#: Epochs packed into one kernel dispatch.  VMEM budget: stage tensors are
#: O(E * 128 * 128); 16 is the measured sweet spot on v5e (32 fits but
#: gains nothing — stage-2 M = 2048 already saturates the MXU).  Env
#: override for experiments only.
MAX_EPOCHS_PER_CALL = int(os.environ.get("NINW_MAX_EPOCHS_PER_CALL", 16))
#: Experimental stage-2 layout toggle (see _kernel); default "batched".
_PER_EPOCH_STAGE2 = os.environ.get("NINW_STAGE2", "") == "per_epoch"

#: Matmul precision for the DFT stages.  The MXU is the kernel bottleneck:
#: measured on v5e at the BASELINE workload, "exact" (Precision.HIGHEST,
#: true f32, ~4e-7 relative error) runs ~3x slower than "bf16" (single-pass,
#: ~5e-3 — fails float32 parity).  "fast3" is the missing middle Mosaic
#: doesn't expose: a manual 3-pass bf16 split (a_hi@b_hi + a_hi@b_lo +
#: a_lo@b_hi, the classic precision-doubling trick), ~1e-5 relative error at
#: ~3x the bf16 cost — still ~1.7x faster than "exact" end to end.
#: "mixed" (bf16 stage 1 + fast3 stage 2) exists to document why stage-wise
#: error budgeting does NOT work here: one bf16 stage quantizes the live
#: data to ~2^-9 and the end-to-end error lands at ~1e-3 — outside the
#: float32 parity gate (see ROOFLINE.md and benchmarks/kernel_sweep.py).
PRECISIONS = ("fast3", "exact", "bf16", "mixed")
DEFAULT_PRECISION = "fast3"


def _split_hi_lo(x):
    """bf16 hi/lo decomposition: x ~= hi + lo with exactly representable
    parts; a@b ~= hi(a)@hi(b) + hi(a)@lo(b) + lo(a)@hi(b) drops only the
    O(2^-16) lo*lo term."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _supported(n: int) -> bool:
    """Kernel geometry: N = N1 * 128 with N1 in {8, 16, 32, 64, 128}."""
    n1 = n // LANES
    return n % LANES == 0 and 8 <= n1 <= LANES and (n1 & (n1 - 1)) == 0


def _f_block(n: int) -> int:
    """Bank rows per program, chosen so F_BLOCK * N1 = 128 — the twiddled
    block then fills exactly 128 sublanes, and ALL epochs stack into ONE
    dense stage-2 dispatch of M = E*128."""
    return LANES // (n // LANES)


def kernel_flops(c: int, n_blocks: int, e: int, n: int,
                 analytic: bool) -> int:
    """Single-pass real-matmul FLOPs actually dispatched to the MXU by one
    pallas_call over grid (n_blocks, c) with E epochs packed in.

    Per program: stage 1 is (2*128, 2*FB*K1) @ (2*FB*K1, E*128) — the
    block-diagonal W1 embedding; its zero blocks are genuinely multiplied
    (that IS the MXU-efficient form for K1 < 128), so they count.  Stage 2
    is 3 x (E*128, 128) @ (128, 128) (the 3-mult complex product).
    Multiply by 3 for "fast3" (three bf16 passes per matmul) or ~6 for
    "exact" when converting to hardware-pass FLOPs.  (The round-1 estimate
    dropped the epoch factor in stage 2 — the corrected model is what
    ``bench.py`` reports MFU from.)
    """
    fb = _f_block(n)
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if analytic else n1_dim
    stage1 = 2 * (2 * LANES) * (2 * fb * k1_dim) * (e * LANES)
    stage2 = 3 * 2 * (e * LANES) * LANES * LANES
    return (stage1 + stage2) * c * n_blocks


@functools.lru_cache(maxsize=16)
def _dft_constants(n: int, analytic: bool):
    """Host-precomputed f32 DFT factors (cached as numpy — device arrays
    created inside a jit trace must not leak into a cross-trace cache).

    Returns (w1c, twr, twi, w2r, w2i, w2s) for N1 = n/128, K1 = N1/2 if
    analytic, FB = 128/N1 bank rows per program:
      w1c (2*128, 2*FB*K1): [[W1r, -W1i], [W1i, W1r]] with W1 =
          blockdiag(FB copies of w_N1^{n1 k1}) — rows (fb, n1)
      twr/twi (128, 128): twiddle w_N^{n1 k2} tiled FB times down sublanes
      w2r/w2i/w2s (128, 128): real / imag / real+imag of
          W2[k2,n2]=w_128^{k2 n2} — stage 2 runs the 3-multiplication
          (Karatsuba) complex product, 25% fewer MXU passes than the
          [[r, i], [-i, r]] embedded form.
    """
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if analytic else n1_dim
    fb = _f_block(n)

    k1 = np.arange(k1_dim)
    n1 = np.arange(n1_dim)
    w1_small = np.exp(2j * np.pi * np.outer(n1, k1) / n1_dim)   # (N1, K1)
    w1 = np.zeros((fb * n1_dim, fb * k1_dim), np.complex128)
    for f in range(fb):
        w1[f * n1_dim:(f + 1) * n1_dim,
           f * k1_dim:(f + 1) * k1_dim] = w1_small               # blockdiag
    w1c = np.block([[w1.real, -w1.imag], [w1.imag, w1.real]])

    k2 = np.arange(LANES)
    tw = np.tile(np.exp(2j * np.pi * np.outer(n1, k2) / n), (fb, 1))

    w2 = np.exp(2j * np.pi * np.outer(k2, k2) / LANES)          # (128, 128)

    as_f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return (as_f32(w1c), as_f32(tw.real), as_f32(tw.imag),
            as_f32(w2.real), as_f32(w2.imag), as_f32(w2.real + w2.imag))


def _make_muls(precision: str, w1c, w2r, w2i, w2s):
    """The precision-dispatched stage-1/stage-2 matmul closures, shared by
    every kernel variant (power/itc/... and the ssq kernel)."""
    mxu_prec = (lax.Precision.HIGHEST if precision == "exact"
                else lax.Precision.DEFAULT)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=mxu_prec)
    if precision in ("fast3", "mixed"):
        w1c_h, w1c_l = _split_hi_lo(w1c)
        w2_hl = [_split_hi_lo(w) for w in (w2r, w2i, w2s)]

        if precision == "mixed":                 # single-pass bf16 stage 1
            mul1 = lambda m: dot(w1c, m)
        else:
            def mul1(m):
                mh, ml = _split_hi_lo(m)
                return dot(w1c_h, mh) + dot(w1c_h, ml) + dot(w1c_l, mh)

        def mul2(b, wi):
            bh, bl = _split_hi_lo(b)
            wh, wl = w2_hl[wi]
            return dot(bh, wh) + dot(bl, wh) + dot(bh, wl)
    else:
        w2 = (w2r, w2i, w2s)
        mul1 = lambda m: dot(w1c, m)
        mul2 = lambda b, wi: dot(b, w2[wi])
    return mul1, mul2


def _stages12(m, mul1, mul2, twr, twi, e_total: int):
    """Stage 1 + twiddle + 3-mult stage 2 on the stacked [real; imag]
    product rows ``m``: returns the complex coefficient tile (xr, xi),
    rows ordered (e, fb, n1), lanes n2."""
    a = mul1(m)                                       # (256, E*128)
    ar, ai = a[:LANES], a[LANES:]                     # rows (fb, n1)
    brs, bis = [], []
    for e in range(e_total):
        s = slice(e * LANES, (e + 1) * LANES)
        are, aie = ar[:, s], ai[:, s]
        brs.append(are * twr - aie * twi)
        bis.append(are * twi + aie * twr)
    br = jnp.concatenate(brs, 0)                      # (E*128, 128)
    bi = jnp.concatenate(bis, 0)
    t1 = mul2(br, 0)
    t2 = mul2(bi, 1)
    t3 = mul2(br + bi, 2)
    return t1 - t2, t3 - t1 - t2


def _kernel(spec_r_ref, spec_i_ref, bank_ref, w1c_ref, twr_ref, twi_ref,
            w2r_ref, w2i_ref, w2s_ref, *out_refs, n_epochs: int,
            n1_dim: int, precision: str, epilogue: str = "power",
            complex_bank: bool = False):
    """One (frequency-block, channel) program, FB = 128/N1 bank rows.

    Layouts (K1 = N1/2 on the analytic path; rows ordered (fb, k1) or
    (fb, n1) — FB*N1 = 128 fills the sublanes exactly; lanes ordered
    (e, k2) or (e, n2) — epochs packed along lanes end to end):
      spec_*: (1, K1, E*128)     — UNTILED spectrum rows k1, one channel
      bank:   (1, FB*K1, E*128)  — FB bank rows stacked, pre-scaled, tiled
                                   E times along lanes in XLA (loop-
                                   invariant: hoisted out of the epoch scan)
      out:    (1, 1, 128, 128)   — [(fb, n1), n2] split layout; one buffer
                                   for power, two (real, imag) for itc

    Matmul structure per program (each x3 bf16 passes at "fast3"):
      stage 1:  A = W1blk (256 x 2*FB*K1) @ M (2*FB*K1 x E*128)
      twiddle:  per-epoch elementwise on (128, 128) blocks
      stage 2:  3-multiplication complex product — t1 = Br@W2r,
                t2 = Bi@W2i, t3 = (Br+Bi)@(W2r+W2i); Xr = t1-t2,
                Xi = t3-t1-t2.  Three K=128 dispatches with M = E*128
                replace the embedded (E*128 x 256)@(256 x 256) form:
                48 vs 64 MXU tile-passes per program.
    """
    bank = bank_ref[0]                                # (FB*K1, E*128)
    twr, twi = twr_ref[...], twi_ref[...]
    mul1, mul2 = _make_muls(precision, w1c_ref[...], w2r_ref[...],
                            w2i_ref[...], w2s_ref[...])

    e_total = n_epochs
    fb = LANES // n1_dim
    # Stage 0 (VPU): tile the spectrum FB times down sublanes to line up
    # with the (fb, k1)-ordered bank rows, then bank * spectrum.  A complex
    # (Normal/Twice-mode) bank arrives as stacked [real; imag] sublane
    # halves in the same buffer; the multiply is then the full complex
    # product — stages 1/2 are bank-agnostic.
    spec_r, spec_i = spec_r_ref[0], spec_i_ref[0]     # (K1, E*128)
    if fb > 1:
        spec_r = jnp.concatenate([spec_r] * fb, 0)    # (FB*K1, E*128)
        spec_i = jnp.concatenate([spec_i] * fb, 0)
    if complex_bank:
        half = bank.shape[0] // 2
        br, bi = bank[:half], bank[half:]
        m = jnp.concatenate([br * spec_r - bi * spec_i,
                             br * spec_i + bi * spec_r], 0)
    else:
        m = jnp.concatenate([bank * spec_r, bank * spec_i], 0)

    # Stage 1 (MXU): A = W1blk @ M — all epochs, one dispatch.
    a = mul1(m)                                       # (256, E*128)
    ar, ai = a[:LANES], a[LANES:]                     # rows (fb, n1)

    if _PER_EPOCH_STAGE2 and epilogue == "power":
        # Experimental layout (NINW_STAGE2=per_epoch): twiddle + 3-mult
        # stage 2 + power accumulate PER EPOCH on (128, 128) tiles — no
        # sublane restack concats, no final reshape-sum; same MXU tile
        # count.  Measured ~equal to the batched layout on v5e (see
        # CLAUDE.md round-2 notes); kept for geometry experiments.
        acc = jnp.zeros((LANES, LANES), jnp.float32)
        for e in range(e_total):
            s = slice(e * LANES, (e + 1) * LANES)
            are, aie = ar[:, s], ai[:, s]
            br_e = are * twr - aie * twi
            bi_e = are * twi + aie * twr
            t1 = mul2(br_e, 0)
            t2 = mul2(bi_e, 1)
            t3 = mul2(br_e + bi_e, 2)
            xr = t1 - t2
            xi = t3 - t1 - t2
            acc = acc + xr * xr + xi * xi
        out_refs[0][0, 0] = acc
        return

    # Twiddle (VPU) per epoch, stacking epochs down the sublanes.
    brs, bis = [], []
    for e in range(e_total):
        s = slice(e * LANES, (e + 1) * LANES)
        are, aie = ar[:, s], ai[:, s]
        brs.append(are * twr - aie * twi)
        bis.append(are * twi + aie * twr)
    br = jnp.concatenate(brs, 0)                      # (E*128, 128)
    bi = jnp.concatenate(bis, 0)

    # Stage 2 (MXU): 3-mult complex product, M = E*128 dense dispatches.
    t1 = mul2(br, 0)
    t2 = mul2(bi, 1)
    t3 = mul2(br + bi, 2)
    xr = t1 - t2                                      # rows (e, fb, n1)
    xi = t3 - t1 - t2
    p = xr * xr + xi * xi

    if epilogue == "power":
        out_refs[0][0, 0] = p.reshape(e_total, LANES, LANES).sum(0)
    elif epilogue == "power_each":   # per-epoch power, no reduction
        out_refs[0][0, 0] = p
    elif epilogue == "power_itc":
        # Both epoch reductions off ONE pass of the shared stages — what
        # run_pipeline wants (it always computes power AND itc; two
        # separate calls would redo every matmul).  Bank scale is 1/N
        # here (no E folding — chunks may be ragged); callers divide.
        out_refs[0][0, 0] = p.reshape(e_total, LANES, LANES).sum(0)
        inv = lax.rsqrt(p)
        ur, ui = xr * inv, xi * inv
        out_refs[1][0, 0] = ur.reshape(e_total, LANES, LANES).sum(0)
        out_refs[2][0, 0] = ui.reshape(e_total, LANES, LANES).sum(0)
    elif epilogue == "coherence":
        # Cross-spectral sums: the program's epochs hold the PAIR —
        # [a_0..a_{Eh-1}, b_0..b_{Eh-1}] packed along lanes — so the
        # cross product a*conj(b) and both power sums come off one pass
        # of the shared stages (ops.extensions.coherence_sums semantics;
        # bank scale 1/N, callers divide by the true epoch count).
        eh = e_total // 2
        xr3 = xr.reshape(e_total, LANES, LANES)
        xi3 = xi.reshape(e_total, LANES, LANES)
        ar_, ai_ = xr3[:eh], xi3[:eh]
        br_, bi_ = xr3[eh:], xi3[eh:]
        out_refs[0][0, 0] = (ar_ * br_ + ai_ * bi_).sum(0)   # Re a conj b
        out_refs[1][0, 0] = (ai_ * br_ - ar_ * bi_).sum(0)   # Im a conj b
        out_refs[2][0, 0] = (ar_ * ar_ + ai_ * ai_).sum(0)   # |a|^2
        out_refs[3][0, 0] = (br_ * br_ + bi_ * bi_).sum(0)   # |b|^2
    elif epilogue == "phaselag":
        # Imag-cross-spectrum sums (ops.connectivity.phase_lag_sums):
        # same pair packing as "coherence" — sum Im, sum |Im|,
        # sum sign(Im), sum Im^2 off one pass.  Zero-padded epochs
        # contribute zero to all four (sign(0) = 0), so ragged counts
        # chunk power-style.  Bank scale is 1/N (no E folding); the
        # pli/wpli/dwpli finishers are scale-invariant but callers get
        # XLA-matching raw sums.
        eh = e_total // 2
        xr3 = xr.reshape(e_total, LANES, LANES)
        xi3 = xi.reshape(e_total, LANES, LANES)
        ar_, ai_ = xr3[:eh], xi3[:eh]
        br_, bi_ = xr3[eh:], xi3[eh:]
        im = ai_ * br_ - ar_ * bi_                           # Im a conj b
        out_refs[0][0, 0] = im.sum(0)
        out_refs[1][0, 0] = jnp.abs(im).sum(0)
        out_refs[2][0, 0] = jnp.sign(im).sum(0)
        out_refs[3][0, 0] = (im * im).sum(0)
    elif epilogue == "plv":
        # Unit CROSS-phase sums (ops.connectivity.plv_sums): same pair
        # packing as "coherence", normalized per cell — zero-magnitude
        # cells go NaN like itc, so ragged counts chunk itc-style.
        eh = e_total // 2
        xr3 = xr.reshape(e_total, LANES, LANES)
        xi3 = xi.reshape(e_total, LANES, LANES)
        ar_, ai_ = xr3[:eh], xi3[:eh]
        br_, bi_ = xr3[eh:], xi3[eh:]
        cr = ar_ * br_ + ai_ * bi_
        ci = ai_ * br_ - ar_ * bi_
        inv = lax.rsqrt(cr * cr + ci * ci)
        out_refs[0][0, 0] = (cr * inv).sum(0)
        out_refs[1][0, 0] = (ci * inv).sum(0)
    elif epilogue == "amax":
        # Per-epoch plane max over this program's FB rows (the ssq noise
        # gate needs each epoch's GLOBAL power peak; XLA finishes with a
        # max over the f-block axis).  Out tile (E_pad, 128): row e holds
        # max_e broadcast along lanes, pad rows are zero.
        pm = p.reshape(e_total, LANES, LANES).max(axis=2).max(axis=1)
        e_pad = out_refs[0].shape[-2]
        tile = jnp.broadcast_to(pm[:, None], (e_total, LANES))
        if e_pad > e_total:
            tile = jnp.concatenate(
                [tile, jnp.zeros((e_pad - e_total, LANES), jnp.float32)], 0)
        out_refs[0][0, 0] = tile
    else:  # itc: accumulate the unit-phase coefficients c/|c|
        inv = lax.rsqrt(p)        # |c|=0 -> inf -> NaN, matching the
        ur, ui = xr * inv, xi * inv   # reference's 0/0 behavior
        out_refs[0][0, 0] = ur.reshape(e_total, LANES, LANES).sum(0)
        out_refs[1][0, 0] = ui.reshape(e_total, LANES, LANES).sum(0)


def _prepare_bank(bank: jnp.ndarray, n: int, analytic: bool,
                  n_epochs: int) -> jnp.ndarray:
    """(F, N) bank -> (F/FB, FB*K1, 128) pre-scaled by 1/(N*sqrt(E)):
    the iDFT 1/N and the epoch-mean 1/E (power is quadratic in the bank)
    both fold into the bank, saving a full output pass.  Rows are ordered
    (fb, k1) — row f becomes bank[f].reshape(N1, 128)[:K1], a pure
    reshape.  A complex (Normal/Twice-mode) bank returns the stacked
    [real; imag] layout (F/FB, 2*FB*K1, 128) the kernel's complex stage-0
    expects."""
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if analytic else n1_dim
    fb = _f_block(n)
    f_total = bank.shape[0]
    scale = 1.0 / (float(n) * float(n_epochs) ** 0.5)
    if jnp.iscomplexobj(bank):
        def part(x):
            return (x[:, :k1_dim * LANES]
                    .reshape(f_total // fb, fb * k1_dim, LANES)
                    * scale).astype(jnp.float32)
        return jnp.concatenate([part(bank.real), part(bank.imag)], axis=1)
    b = bank[:, :k1_dim * LANES].reshape(f_total // fb, fb * k1_dim, LANES)
    return (b * scale).astype(jnp.float32)


def _fused_call(signals: jnp.ndarray, bank: jnp.ndarray, interpolate: bool,
                interpret: bool, precision: str, epilogue: str):
    """Run the kernel over (E<=MAX_EPOCHS_PER_CALL, C, N) x (F, N).

    epilogue="power": returns the (C, F, N) epoch-MEAN power (the 1/E is
    folded into the bank scale in ``_prepare_bank``).
    epilogue="power_each": returns the (E, C, F, N) PER-EPOCH power — no
    reduction; the long-recording paths ride window batches on the epoch
    axis so each program carries E*128-row stage-2 matmuls instead of 128.
    epilogue="itc":   returns ((C, F, N), (C, F, N)) — the epoch-SUMMED
    unit-phase coefficient real/imag planes (scale-invariant, so the bank
    folding is harmless).
    """
    e, c, n = signals.shape
    if bank.shape[-1] != n:
        raise ValueError(f"bank length {bank.shape[-1]} != signal length "
                         f"{n}; rebuild the bank for this signal")
    f_total = bank.shape[0]
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if interpolate else n1_dim
    fb = _f_block(n)

    pad_f = (-f_total) % fb
    if pad_f:
        bank = jnp.pad(bank, ((0, pad_f), (0, 0)))
    n_blocks = (f_total + pad_f) // fb

    if interpolate:
        # Real input + analytic path: rfft gives exactly the bins the kernel
        # needs (0..N/2) at roughly half the cost of the complex FFT.
        spec = jnp.fft.rfft(signals)[..., :k1_dim * LANES]
    else:
        spec = jnp.fft.fft(signals.astype(jnp.complex64))
        spec = spec[..., :k1_dim * LANES]
    # UNTILED spectra, epochs packed along lanes: (E, C, K1*128) ->
    # (C, K1, E*128) with lane index e*128 + k2.  (The FB-times sublane
    # tiling happens on the tiny block inside the kernel — tiling here in
    # XLA would write an FB-times-redundant tensor to HBM.)
    def to_lanes(x):
        x = x.reshape(e, c, k1_dim, LANES)
        return jnp.transpose(x, (1, 2, 0, 3)).reshape(c, k1_dim, e * LANES)
    spec_r, spec_i = to_lanes(spec.real), to_lanes(spec.imag)
    # The bank is epoch-invariant: tile it E times along lanes ONCE in XLA
    # (a few MB, hoisted out of the epoch-chunk scan) so stage 0 is a plain
    # elementwise multiply against the lane-packed spectra.
    # power folds the 1/E epoch mean into the bank; power_each and itc do
    # not reduce (itc's unit-phase is scale-invariant anyway).
    cx = bool(jnp.iscomplexobj(bank))
    bank_rows = (2 if cx else 1) * fb * k1_dim
    bank_t = _prepare_bank(bank, n, interpolate,
                           e if epilogue == "power" else 1)  # (Fb, rows, 128)
    bank_t = jnp.broadcast_to(bank_t[:, :, None, :],
                              (n_blocks, bank_rows, e, LANES)
                              ).reshape(n_blocks, bank_rows, e * LANES)
    consts = _dft_constants(n, interpolate)

    rep = lambda shape: pl.BlockSpec(shape, lambda fi, ci: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    if epilogue == "power_each":
        out_rows = e * LANES
    elif epilogue == "amax":
        out_rows = e + (-e) % 8          # f32 sublane tile
    else:
        out_rows = LANES
    plane = jax.ShapeDtypeStruct((c, n_blocks, out_rows, LANES), jnp.float32)
    out_spec = pl.BlockSpec((1, 1, out_rows, LANES),
                            lambda fi, ci: (ci, fi, 0, 0),
                            memory_space=pltpu.VMEM)
    n_outs = {"itc": 2, "power_itc": 3, "coherence": 4,
              "phaselag": 4, "plv": 2}.get(epilogue, 1)
    # Grid order (freq-block MAJOR, channel minor): the large tiled-bank
    # block is re-fetched only when fi changes — once per n_blocks, not per
    # program; the small per-channel spectra stream underneath.
    out = pl.pallas_call(
        functools.partial(_kernel, n_epochs=e, n1_dim=n1_dim,
                          precision=precision, epilogue=epilogue,
                          complex_bank=cx),
        grid=(n_blocks, c),
        in_specs=[
            pl.BlockSpec((1, k1_dim, e * LANES),
                         lambda fi, ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k1_dim, e * LANES),
                         lambda fi, ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bank_rows, e * LANES),
                         lambda fi, ci: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((2 * LANES, 2 * fb * k1_dim)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
        ],
        out_specs=out_spec if n_outs == 1 else (out_spec,) * n_outs,
        out_shape=plane if n_outs == 1 else (plane,) * n_outs,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=kernel_flops(c, n_blocks, e, n, interpolate),
            bytes_accessed=c * n_blocks * (2 * k1_dim * e * LANES * 4
                                           + LANES * LANES * 4 * n_outs)
                           + n_blocks * fb * k1_dim * e * LANES * 4,
            transcendentals=0),
    )(spec_r, spec_i, bank_t, *consts)

    def to_natural(plane_out):
        # [(fb, n1), n2] split layout -> natural n = n1 + N1*n2: transpose
        # the two minor axes (one XLA pass over the f32 output).
        tf = plane_out.reshape(c, n_blocks, fb, n1_dim, LANES)
        tf = jnp.transpose(tf, (0, 1, 2, 4, 3)).reshape(c, n_blocks * fb, n)
        return tf[:, :f_total] if pad_f else tf

    if epilogue == "power_each":
        # rows (e, fb, n1) -> (E, C, F, N) natural layout.
        tf = out.reshape(c, n_blocks, e, fb, n1_dim, LANES)
        tf = jnp.transpose(tf, (2, 0, 1, 3, 5, 4)).reshape(
            e, c, n_blocks * fb, n)
        return tf[:, :, :f_total] if pad_f else tf
    if epilogue == "amax":
        # raw (C, n_blocks, E_pad, 128); callers max over blocks/lanes.
        return out
    if n_outs == 1:
        return to_natural(out)
    return tuple(to_natural(o) for o in out)


def _ssq_kernel(spec_r_ref, spec_i_ref, bank_ref, floor_ref, w1c_ref,
                twr_ref, twi_ref, w2r_ref, w2i_ref, w2s_ref, out_ref, *,
                n_epochs: int, n1_dim: int, precision: str,
                nu_scale: float, e0: float, estep: float, log_grid: bool,
                n_edges: int, f_out: int):
    """Fused synchrosqueezing program: one (channel, frequency-block)
    step computes BOTH coefficient planes (w and its time-derivative dw)
    through the shared matmul-iDFT stages, maps every cell to its target
    row with the closed-form uniform-grid bisect (``ops/sst.py``
    semantics), and select-reduces the reassigned power into a
    full-height (F_out, N1, 128) accumulator that successive f-blocks
    revisit (grid (c, fi), fi innermost -> consecutive revisits, the
    CLAUDE.md pallas accumulation rule).

    The derivative plane costs ONE extra pipeline pass, not a second
    dispatch from XLA: dW rows are the iDFT of (i 2 pi nu) * S * bank,
    so stage 0's bank*spec products are reused with the per-bin factor
    nu = (128*k1 + k2) * sfreq / N built from iotas (bin mapping
    k = 128*k1 + k2 — see ``_dft_constants``).

    Scale convention: bank pre-scale 1/N (no E folding), identical to
    the XLA path's ifft — power, the 1e-30 omega clamp, and the floors
    from the ``amax`` epilogue all agree without rescaling.
    """
    bank = bank_ref[0]                                # (FB*K1, E*128)
    twr, twi = twr_ref[...], twi_ref[...]
    mul1, mul2 = _make_muls(precision, w1c_ref[...], w2r_ref[...],
                            w2i_ref[...], w2s_ref[...])
    e_total = n_epochs
    fb = LANES // n1_dim
    k1_dim = spec_r_ref.shape[1]
    spec_r, spec_i = spec_r_ref[0], spec_i_ref[0]     # (K1, E*128)
    if fb > 1:
        spec_r = jnp.concatenate([spec_r] * fb, 0)
        spec_i = jnp.concatenate([spec_i] * fb, 0)
    pr = bank * spec_r                                # stage 0 products
    pi = bank * spec_i
    xr, xi = _stages12(jnp.concatenate([pr, pi], 0),
                       mul1, mul2, twr, twi, e_total)

    # derivative spectra: S~ = S * i*2pi*nu -> (re, im) = (-nu*Si, nu*Sr)
    rows, lanes = pr.shape
    row_i = lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    lane_i = lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    k1 = (row_i % k1_dim).astype(jnp.float32)         # rows (fb, k1)
    k2 = (lane_i % LANES).astype(jnp.float32)         # lanes (e, k2)
    nu2pi = nu_scale * (float(LANES) * k1 + k2)
    dxr, dxi = _stages12(jnp.concatenate([-(nu2pi * pi), nu2pi * pr], 0),
                         mul1, mul2, twr, twi, e_total)

    p = xr * xr + xi * xi
    num = dxi * xr - dxr * xi                         # Im(dW conj W)
    omega = num / (2.0 * np.pi * jnp.maximum(p, 1e-30))
    if log_grid:
        safe = jnp.log(jnp.maximum(omega, 1e-30))
        cnt = jnp.where(omega > 0.0, jnp.ceil((safe - e0) / estep), 0.0)
    else:
        cnt = jnp.ceil((omega - e0) / estep)
    idx = jnp.clip(cnt, 0.0, float(n_edges)).astype(jnp.int32)

    p3 = p.reshape(e_total, LANES, LANES)
    idx3 = idx.reshape(e_total, LANES, LANES)
    keep3 = p3 >= floor_ref[0, :e_total][:, None, :]  # floor per epoch row
    sub_i = lax.broadcasted_iota(jnp.int32, (e_total, LANES, LANES), 1)
    src = pl.program_id(1) * fb + sub_i // n1_dim     # own global row
    idx3 = jnp.where(keep3, idx3, src)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(o, _):
        contrib = jnp.sum(jnp.where(idx3 == o, p3, 0.0), axis=0)
        contrib = contrib.reshape(fb, n1_dim, LANES).sum(0)
        out_ref[0, o] = out_ref[0, o] + contrib
        return 0

    lax.fori_loop(0, f_out, body, 0)


def supports_ssq(signals_shape, bank, uniform_grid,
                 interpolate: bool) -> bool:
    """True when the fused ssq kernel can run this workload: conforming
    (E, C, N) geometry, a REAL bank, the analytic (interpolate) path,
    and a single lin/log closed-form row map (piecewise grids fall back
    to the XLA edge-count scan)."""
    if uniform_grid is None or uniform_grid[0] not in ("lin", "log"):
        return False
    if not interpolate or bank is None or len(signals_shape) != 3:
        return False
    if bank.ndim != 2 or bank.shape[-1] != signals_shape[-1]:
        return False
    return _supported(signals_shape[-1]) and not jnp.iscomplexobj(bank)


def _fused_ssq_call(signals, bank, floors, *, uniform_grid, sfreq: float,
                    interpolate: bool, interpret: bool, precision: str):
    """One pallas dispatch: (E, C, N) x (F, N) -> (C, F, N) epoch-SUMMED
    reassigned power at scale 1/N^2 (the XLA path's per-epoch power);
    ``floors`` is the (C, E) per-epoch gate threshold."""
    e, c, n = signals.shape
    f_total = bank.shape[0]
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if interpolate else n1_dim
    fb = _f_block(n)
    pad_f = (-f_total) % fb
    if pad_f:
        bank = jnp.pad(bank, ((0, pad_f), (0, 0)))
    n_blocks = (f_total + pad_f) // fb

    spec = jnp.fft.rfft(signals)[..., :k1_dim * LANES]

    def to_lanes(x):
        x = x.reshape(e, c, k1_dim, LANES)
        return jnp.transpose(x, (1, 2, 0, 3)).reshape(c, k1_dim, e * LANES)

    spec_r, spec_i = to_lanes(spec.real), to_lanes(spec.imag)
    bank_t = _prepare_bank(bank, n, interpolate, 1)   # scale 1/N
    bank_rows = fb * k1_dim
    bank_t = jnp.broadcast_to(bank_t[:, :, None, :],
                              (n_blocks, bank_rows, e, LANES)
                              ).reshape(n_blocks, bank_rows, e * LANES)
    e_pad = e + (-e) % 8
    floor_t = floors.astype(jnp.float32)              # (C, E)
    if e_pad > e:
        floor_t = jnp.pad(floor_t, ((0, 0), (0, e_pad - e)))
    floor_t = jnp.broadcast_to(floor_t[:, :, None], (c, e_pad, LANES))
    consts = _dft_constants(n, interpolate)

    kind, e0, estep = uniform_grid
    rep = lambda shape: pl.BlockSpec(shape, lambda ci, fi: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ssq_kernel, n_epochs=e, n1_dim=n1_dim,
                          precision=precision,
                          nu_scale=2.0 * np.pi * sfreq / n,
                          e0=float(e0), estep=float(estep),
                          log_grid=(kind == "log"),
                          n_edges=f_total - 1, f_out=f_total),
        grid=(c, n_blocks),
        in_specs=[
            pl.BlockSpec((1, k1_dim, e * LANES),
                         lambda ci, fi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k1_dim, e * LANES),
                         lambda ci, fi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bank_rows, e * LANES),
                         lambda ci, fi: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_pad, LANES),
                         lambda ci, fi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((2 * LANES, 2 * fb * k1_dim)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
        ],
        out_specs=pl.BlockSpec((1, f_total, n1_dim, LANES),
                               lambda ci, fi: (ci, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, f_total, n1_dim, LANES),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * kernel_flops(c, n_blocks, e, n, interpolate)
                  + 2 * c * n_blocks * f_total * e * LANES * LANES,
            bytes_accessed=c * n_blocks * (2 * k1_dim * e * LANES * 4
                                           + bank_rows * e * LANES * 4)
                           + c * f_total * n1_dim * LANES * 4,
            transcendentals=0),
    )(spec_r, spec_i, bank_t, floor_t, *consts)
    # [o, n1, n2] -> natural n = n1 + N1*n2
    return jnp.transpose(out, (0, 1, 3, 2)).reshape(c, f_total, n)


@functools.lru_cache(maxsize=None)
def _ssq_jitted(uniform_grid, sfreq: float, rel_threshold: float,
                interpolate: bool, interpret: bool, precision: str):
    """Cached jitted fused-ssq callable (never wrap a fresh jit per call
    — the cache keys on function identity)."""
    def call(signals, bank):
        e = signals.shape[0]
        chunk = max(1, MAX_EPOCHS_PER_CALL // 2)  # ~2x live VMEM vs power
        total = None
        for lo in range(0, e, chunk):
            part = signals[lo:lo + chunk]
            amax = _fused_call(part, bank, interpolate, interpret,
                               precision, "amax")
            floors = rel_threshold * amax.max(axis=(1, 3))[:, :part.shape[0]]
            plane = _fused_ssq_call(
                part, bank, floors,
                uniform_grid=uniform_grid, sfreq=sfreq,
                interpolate=interpolate, interpret=interpret,
                precision=precision)
            total = plane if total is None else total + plane
        return total / e

    return jax.jit(call)


def fused_ssq_mean_power(signals_r, bank_r, *, uniform_grid, sfreq: float,
                         rel_threshold: float = 1e-6,
                         interpolate: bool = True, interpret: bool = False,
                         precision: str = DEFAULT_PRECISION):
    """Epoch-mean synchrosqueezed power through the fused kernel:
    (E, C, N) real signals x (F, N) real bank -> (C, F, N).  Matches
    ``ops.sst.ssq_mean_power`` (same gate and closed-form row map; rel
    err ~1e-5 at "fast3" away from row edges — cells whose instantaneous
    frequency sits ON a bisect edge may round to the neighboring row).
    Epoch chunks are python-loop unrolled inside one cached jit, so any
    E compiles at most two program shapes (body + ragged tail)."""
    signals = jnp.asarray(signals_r, jnp.float32)
    bank = jnp.asarray(bank_r, jnp.float32)
    return _ssq_jitted(tuple(uniform_grid), float(sfreq),
                       float(rel_threshold), bool(interpolate),
                       bool(interpret), precision)(signals, bank)


def _mean_power_bwd(signals, bank, interpolate: bool, g):
    """Analytic adjoint of ``mean_power_from_bank`` for a REAL bank.

    Forward per epoch: S = mask*fft(s); x_f = ifft(bank_f * S);
    P += |x|^2 / E.  With cotangent g = dL/dP (real, (C, F, N)):

      omega = (2/E) * g * x                  (adjoint of |.|^2 / E)
      zeta  = fft(omega) / N                 (adjoint of ifft)
      dS    = sum_f bank_f * zeta_f          (bank is real)
      ds    = N * Re(ifft(mask * dS))        (adjoint of masked fft, s real)
      dbank_f = sum_{e,c} Re(zeta_f * conj(S))

    Recomputes x per epoch under a scan — O(C*F*N) memory independent of E,
    where differentiating the XLA forward (the round-1 backward) stored
    per-epoch scan residuals, O(E*C*F*N).  FLOPs ~ 2x one XLA forward (the
    recompute plus the adjoint FFT pipeline), vs the round-1 cost of a full
    extra forward PLUS the AD backward.  Reference has no gradients at all;
    this is TPU-build surface (PARITY.md).
    """
    from .cwt import analytic_spectrum
    from .grids import analytic_mask

    e = signals.shape[0]
    n = signals.shape[-1]
    scale = 2.0 / e
    mask = analytic_mask(n, jnp.float32) if interpolate else None

    def per_epoch(dbank_acc, sig):
        spec = analytic_spectrum(sig, interpolate)           # (C, N)
        x = jnp.fft.ifft(spec[..., None, :] * bank)          # (C, F, N)
        u = jnp.fft.fft(scale * g * x)                       # fft(omega)
        t = jnp.sum(bank * u, axis=-2)                       # (C, N)
        if mask is not None:
            t = t * mask
        ds = jnp.real(jnp.fft.ifft(t)).astype(signals.dtype)
        dbank = jnp.sum(jnp.real(u * jnp.conj(spec[..., None, :])),
                        axis=0) / n                          # sum over C
        return dbank_acc + dbank, ds

    dbank, ds = lax.scan(per_epoch, jnp.zeros_like(bank), signals)
    return ds, dbank


def _mean_power_bwd_complex(signals, bank, interpolate: bool, g):
    """Analytic adjoint of ``mean_power_from_bank`` for a COMPLEX
    (Normal/Twice-mode) bank — the real-bank pipeline above with the two
    conjugations the complex case adds:

      dS    = sum_f conj(bank_f) * zeta_f     (adjoint of bank * S)
      dbank_f = sum_{e,c} conj(zeta_f) * S    (JAX complex-cotangent
                convention: the conjugate of the naive Wirtinger product —
                validated term-for-term against jax.vjp in
                tests/test_fused.py)

    Same O(C*F*N) memory / ~2x-forward FLOPs profile as the real-bank
    adjoint; replaces the round-2 XLA-autodiff backward (a full forward
    PLUS per-epoch AD residuals).
    """
    from .cwt import analytic_spectrum
    from .grids import analytic_mask

    e = signals.shape[0]
    n = signals.shape[-1]
    scale = 2.0 / e
    mask = analytic_mask(n, jnp.float32) if interpolate else None

    def per_epoch(dbank_acc, sig):
        spec = analytic_spectrum(sig, interpolate)           # (C, N)
        x = jnp.fft.ifft(spec[..., None, :] * bank)          # (C, F, N)
        u = jnp.fft.fft(scale * g * x)                       # fft(omega)
        t = jnp.sum(jnp.conj(bank) * u, axis=-2)             # (C, N)
        if mask is not None:
            t = t * mask
        ds = jnp.real(jnp.fft.ifft(t)).astype(signals.dtype)
        dbank = jnp.sum(jnp.conj(u) * spec[..., None, :], axis=0) / n
        return dbank_acc + dbank, ds

    dbank, ds = lax.scan(per_epoch, jnp.zeros_like(bank), signals)
    return ds, dbank


#: Fused backward kernel toggle (NINW_FUSED_BWD=0 falls back to the XLA
#: adjoint pipeline `_mean_power_bwd` — kept for A/B measurement).
_FUSED_BWD = os.environ.get("NINW_FUSED_BWD", "1") != "0"


@functools.lru_cache(maxsize=16)
def _dft_constants_bwd(n: int, analytic: bool):
    """Host-precomputed f32 constants for the ADJOINT (forward-DFT) stages
    of the fused backward kernel (cached as numpy — see
    ``_dft_constants``).

    The backward runs the four-step in REVERSE direction: after the
    recomputed coefficients are multiplied by the cotangent, stage A
    contracts n2 against conj(W2) (reusing the forward's w2r/w2i plus the
    ``w2d = w2r - w2i`` 3-mult constant returned here), the conjugate
    twiddle is elementwise (forward twr/twi with a sign flip), and stage B
    contracts n1 by a LEFT multiply with

      w1bc (2*FB*K1, 2*FB*N1): [[Wr, -Wi], [Wi, Wr]] with W =
          blockdiag(FB copies of w_N1^{-n1 k1}) — rows (fb, k1), the
          complex product on the [zr; zi]-stacked operand.

    Only bins k = 128*k1 + k2 with k1 < K1 are produced: on the analytic
    path the spectrum and the post-mask signal cotangent live entirely in
    the lower K1*128 bins, so the upper-half adjoint bins are exactly zero
    (non-analytic runs K1 = N1 — all bins).
    """
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if analytic else n1_dim
    fb = _f_block(n)

    k1 = np.arange(k1_dim)
    n1 = np.arange(n1_dim)
    w_small = np.exp(-2j * np.pi * np.outer(k1, n1) / n1_dim)   # (K1, N1)
    wb = np.zeros((fb * k1_dim, fb * n1_dim), np.complex128)
    for f in range(fb):
        wb[f * k1_dim:(f + 1) * k1_dim,
           f * n1_dim:(f + 1) * n1_dim] = w_small                # blockdiag
    w1bc = np.block([[wb.real, -wb.imag], [wb.imag, wb.real]])

    k2 = np.arange(LANES)
    w2 = np.exp(2j * np.pi * np.outer(k2, k2) / LANES)
    as_f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return as_f32(w1bc), as_f32(w2.real - w2.imag)


def _bwd_kernel(spec_r_ref, spec_i_ref, bank_ref, bank_lin_ref, g_ref,
                w1c_ref, twr_ref, twi_ref, w2r_ref, w2i_ref, w2s_ref,
                w1bc_ref, w2d_ref, dbank_ref, t_ref, *, n_epochs: int,
                n1_dim: int, analytic: bool, precision: str,
                complex_bank: bool = False):
    """One (channel, frequency-block) program of the fused BACKWARD.

    Recomputes the coefficients with the forward stages (stage 0 bank
    multiply, stage 1, twiddle, stage 2 — identical structure to
    ``_kernel``; the 2/(E*N) VJP scale is folded into the stage-0 bank),
    multiplies by the cotangent tile g (rows (fb, n1), lanes n2), and runs
    the adjoint DFT back per epoch: stage A contracts n2 against conj(W2)
    (3-mult), conjugate twiddle, stage B contracts n1 via ``w1bc`` — giving
    u = fft((2/E) g * x) on the lower K1*128 bins, layout ((fb, k1), k2).

    Epilogues per program:
      * dbank_ref (1, 1, FB*K1, 128): sum_e Re(u * conj(S_e)) — the
        per-channel partial of the bank cotangent (summed over channels in
        XLA; the extra 1/N of the ``_mean_power_bwd`` formula is applied
        there too).
      * t_ref (1, 2*E*FB*K1, 128): sum over THIS program's bank rows of
        bank * u, per epoch ([real rows; imag rows]); accumulated across
        the fi sweep IN the output block (grid order (ci, fi), fi minor —
        the block stays resident), completed to ds in XLA by the final
        masked iFFT.
    """
    fi = pl.program_id(1)
    fb = LANES // n1_dim
    k1_dim = n1_dim // 2 if analytic else n1_dim
    fbk1 = fb * k1_dim
    e_total = n_epochs

    bank = bank_ref[0]                                # (FB*K1, E*128)
    bank_lin = bank_lin_ref[0]                        # (FB*K1, 128)
    g = g_ref[0, 0]                                   # (128, 128)
    w1c = w1c_ref[...]
    twr, twi = twr_ref[...], twi_ref[...]
    w1bc = w1bc_ref[...]
    mxu_prec = (lax.Precision.HIGHEST if precision == "exact"
                else lax.Precision.DEFAULT)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=mxu_prec)
    fast3 = precision == "fast3"

    def left_mul(w):
        """m -> w @ m at the configured precision (weight split cached)."""
        if fast3:
            wh, wl = _split_hi_lo(w)
            def f(m):
                mh, ml = _split_hi_lo(m)
                return dot(wh, mh) + dot(wh, ml) + dot(wl, mh)
            return f
        return lambda m: dot(w, m)

    def right_mul(w):
        if fast3:
            wh, wl = _split_hi_lo(w)
            def f(b):
                bh, bl = _split_hi_lo(b)
                return dot(bh, wh) + dot(bl, wh) + dot(bh, wl)
            return f
        return lambda b: dot(b, w)

    mul1 = left_mul(w1c)
    mul_w2r = right_mul(w2r_ref[...])
    mul_w2i = right_mul(w2i_ref[...])
    mul_w2s = right_mul(w2s_ref[...])
    mul_w2d = right_mul(w2d_ref[...])
    mul_b = left_mul(w1bc)

    # ---- forward recompute (see _kernel for the layout walkthrough) ----
    spec_r, spec_i = spec_r_ref[0], spec_i_ref[0]     # (K1, E*128)
    if fb > 1:
        spec_r = jnp.concatenate([spec_r] * fb, 0)    # (FB*K1, E*128)
        spec_i = jnp.concatenate([spec_i] * fb, 0)
    if complex_bank:
        half = bank.shape[0] // 2
        bkr, bki = bank[:half], bank[half:]
        m = jnp.concatenate([bkr * spec_r - bki * spec_i,
                             bkr * spec_i + bki * spec_r], 0)
    else:
        m = jnp.concatenate([bank * spec_r, bank * spec_i], 0)
    a = mul1(m)                                       # (256, E*128)
    ar, ai = a[:LANES], a[LANES:]
    brs, bis = [], []
    for e in range(e_total):
        s = slice(e * LANES, (e + 1) * LANES)
        are, aie = ar[:, s], ai[:, s]
        brs.append(are * twr - aie * twi)
        bis.append(are * twi + aie * twr)
    br = jnp.concatenate(brs, 0)                      # (E*128, 128)
    bi = jnp.concatenate(bis, 0)
    t1 = mul_w2r(br)
    t2 = mul_w2i(bi)
    t3 = mul_w2s(br + bi)
    xr = t1 - t2                                      # rows (e, fb, n1),
    xi = t3 - t1 - t2                                 # lanes n2

    # ---- adjoint per epoch ---------------------------------------------
    # Complex banks double the dbank accumulator: conj(u)*S has a live
    # imaginary part ([real rows; imag rows]); real banks keep Re only.
    dbank_acc = jnp.zeros(((2 if complex_bank else 1) * fbk1, LANES),
                          jnp.float32)
    t_rs, t_is = [], []
    for e in range(e_total):
        s = slice(e * LANES, (e + 1) * LANES)
        yr = g * xr[s]
        yi = g * xi[s]
        # Stage A: contract n2 against conj(W2) = w2r - i*w2i (3-mult:
        # real = t1a - (-t2a'), with t2a' = yi @ w2i).
        t1a = mul_w2r(yr)
        t2a = mul_w2i(yi)
        t3a = mul_w2d(yr + yi)
        bra = t1a + t2a                               # rows (fb, n1), k2
        bia = t3a - t1a + t2a
        # Conjugate twiddle.
        zr = bra * twr + bia * twi
        zi = bia * twr - bra * twi
        # Stage B: contract n1 (complex left-multiply on stacked [zr; zi]).
        u = mul_b(jnp.concatenate([zr, zi], 0))       # (2*FB*K1, 128)
        ur, ui = u[:fbk1], u[fbk1:]                   # rows (fb, k1), k2
        sre, sie = spec_r[:, s], spec_i[:, s]
        if complex_bank:
            # dbank partial: conj(u) * S, both parts.
            dbank_acc = dbank_acc + jnp.concatenate(
                [ur * sre + ui * sie, ur * sie - ui * sre], 0)
            # t partial: conj(B) * u (summed over fb in XLA).
            blr, bli = bank_lin[:fbk1], bank_lin[fbk1:]
            t_rs.append(blr * ur + bli * ui)
            t_is.append(blr * ui - bli * ur)
        else:
            # dbank partial: Re(u * conj(S)) = ur*Sr + ui*Si.
            dbank_acc = dbank_acc + ur * sre + ui * sie
            # t partial: this block's bank rows * u (summed over fb in XLA).
            t_rs.append(bank_lin * ur)
            t_is.append(bank_lin * ui)

    dbank_ref[0, 0] = dbank_acc
    t_contrib = jnp.concatenate(t_rs + t_is, 0)       # (2*E*FB*K1, 128)

    @pl.when(fi == 0)
    def _():
        t_ref[0] = t_contrib

    @pl.when(fi > 0)
    def _():
        t_ref[0] = t_ref[0] + t_contrib


def bwd_kernel_flops(c: int, n_blocks: int, e: int, n: int,
                     analytic: bool) -> int:
    """Single-pass real-matmul FLOPs of one fused-backward pallas_call:
    the forward recompute (``kernel_flops``) plus stage A (the per-epoch
    3-mult, same tile count as stage 2) and stage B (the per-epoch
    (2*FB*K1, 2*128) @ (2*128, 128) left multiply)."""
    fb = _f_block(n)
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if analytic else n1_dim
    stage_a = 3 * 2 * (e * LANES) * LANES * LANES
    stage_b = e * 2 * (2 * fb * k1_dim) * (2 * LANES) * LANES
    return kernel_flops(c, n_blocks, e, n, analytic) \
        + (stage_a + stage_b) * c * n_blocks


def _fused_power_bwd(signals, bank, g, interpolate: bool, interpret: bool,
                     precision: str):
    """Fused-kernel backward of the epoch-mean power: (E, C, N) signals,
    (F, N) real OR complex bank, (C, F, N) cotangent g -> (ds, dbank).

    Mathematically identical to ``_mean_power_bwd`` /
    ``_mean_power_bwd_complex`` (the gated XLA adjoint pipelines); the
    iDFT recompute and the adjoint DFT run as MXU matmuls in VMEM instead
    of HBM-bound XLA FFTs — the backward was ~8x the fused forward's wall
    time on v5e, dominated by per-epoch (C, F, N) complex FFT traffic.
    Only the final ifft of the (E, C, K1*128)-binned ``t`` (one pass)
    stays in XLA.  A complex (Normal/Twice-mode) bank doubles the bank
    planes ([real; imag] stacked rows) and the dbank output (conj(u)*S has
    a live imaginary part — returned complex, matching jax.vjp).

    E here is one VJP chunk (the fused_mean_power_from_bank wrapper scans
    chunks of MAX_EPOCHS_PER_CALL): the in-kernel working set and the t
    output scale with E, and E >> 16 overflows scoped VMEM at large C*F.
    """
    e, c, n = signals.shape
    cx = bool(jnp.iscomplexobj(bank))
    f_total = bank.shape[0]
    n1_dim = n // LANES
    k1_dim = n1_dim // 2 if interpolate else n1_dim
    fb = _f_block(n)
    fbk1 = fb * k1_dim
    bank_rows = (2 if cx else 1) * fbk1
    pad_f = (-f_total) % fb
    if pad_f:
        bank = jnp.pad(bank, ((0, pad_f), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad_f), (0, 0)))
    n_blocks = (f_total + pad_f) // fb

    if interpolate:
        spec = jnp.fft.rfft(signals)[..., :k1_dim * LANES]
    else:
        spec = jnp.fft.fft(signals.astype(jnp.complex64))
        spec = spec[..., :k1_dim * LANES]

    def to_lanes(x):
        x = x.reshape(e, c, k1_dim, LANES)
        return jnp.transpose(x, (1, 2, 0, 3)).reshape(c, k1_dim, e * LANES)
    spec_r, spec_i = to_lanes(spec.real), to_lanes(spec.imag)

    # Stage-0 bank with the VJP scale 2/(E*N) folded in (x carries the
    # iFFT 1/N and the |.|^2/E adjoint 2/E; everything downstream is
    # linear in x so one fold covers u, t and dbank alike) — and the
    # unscaled epilogue bank in the kernel's ((fb, k1), k2) row layout.
    # Complex banks stack [real; imag] rows in both.
    def rows_of(x):
        return x[:, :k1_dim * LANES].reshape(n_blocks, fbk1, LANES)
    if cx:
        bank_lin = jnp.concatenate([rows_of(bank.real), rows_of(bank.imag)],
                                   axis=1)
    else:
        bank_lin = rows_of(bank)
    bank_t = bank_lin * (2.0 / (float(e) * float(n)))
    bank_t = jnp.broadcast_to(bank_t[:, :, None, :],
                              (n_blocks, bank_rows, e, LANES)
                              ).reshape(n_blocks, bank_rows, e * LANES)

    # Cotangent tiles: (C, F, N) -> (C, n_blocks, (fb, n1), n2) — the
    # stage-2 output layout (n = n1 + N1*n2).
    gt = g.reshape(c, n_blocks, fb, LANES, n1_dim)
    gt = jnp.transpose(gt, (0, 1, 2, 4, 3)).reshape(c, n_blocks,
                                                    LANES, LANES)

    consts = _dft_constants(n, interpolate)
    w1bc, w2d = _dft_constants_bwd(n, interpolate)

    rep = lambda shape: pl.BlockSpec(shape, lambda ci, fi: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    dbank_part, t_planes = pl.pallas_call(
        functools.partial(_bwd_kernel, n_epochs=e, n1_dim=n1_dim,
                          analytic=interpolate, precision=precision,
                          complex_bank=cx),
        grid=(c, n_blocks),
        in_specs=[
            pl.BlockSpec((1, k1_dim, e * LANES), lambda ci, fi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k1_dim, e * LANES), lambda ci, fi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bank_rows, e * LANES), lambda ci, fi: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bank_rows, LANES), lambda ci, fi: (fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES, LANES), lambda ci, fi: (ci, fi, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((2 * LANES, 2 * fbk1)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((LANES, LANES)),
            rep((2 * fbk1, 2 * LANES)),
            rep((LANES, LANES)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bank_rows, LANES),
                         lambda ci, fi: (ci, fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * e * fbk1, LANES), lambda ci, fi: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, n_blocks, bank_rows, LANES),
                                 jnp.float32),
            jax.ShapeDtypeStruct((c, 2 * e * fbk1, LANES), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=bwd_kernel_flops(c, n_blocks, e, n, interpolate),
            bytes_accessed=c * n_blocks * (2 * k1_dim * e * LANES * 4
                                           + LANES * LANES * 4)
                           + c * 2 * e * fbk1 * LANES * 4,
            transcendentals=0),
    )(spec_r, spec_i, bank_t, bank_lin, gt, *consts, w1bc, w2d)

    # dbank: sum channel partials; rows ((fb, k1), k2) -> bank row
    # fi*fb + fbi at bins 128*k1 + k2; the _mean_power_bwd 1/N lands here.
    # Complex banks carry [real; imag] halves per block.
    dsum = dbank_part.sum(0)                # (nb, bank_rows, 128)
    if cx:
        dsum = dsum.reshape(n_blocks, 2, fbk1, LANES)
        parts = [dsum[:, k].reshape(n_blocks * fb, k1_dim * LANES) / n
                 for k in (0, 1)]
        dbank = lax.complex(parts[0], parts[1])
    else:
        dbank = dsum.reshape(n_blocks * fb, k1_dim * LANES) / n
    dbank = jnp.pad(dbank, ((0, 0), (0, n - k1_dim * LANES)))
    if pad_f:
        dbank = dbank[:f_total]

    # ds: assemble t (rows [real; imag] x (e, fb, k1)), sum fb, lay out the
    # bins, zero-pad the (masked) upper half, one batched iFFT.
    t = t_planes.reshape(c, 2, e, fb, k1_dim, LANES).sum(3)
    t = t.reshape(c, 2, e, k1_dim * LANES)
    tc = lax.complex(t[:, 0], t[:, 1])                # (C, E, K1*128)
    tc = jnp.pad(tc, ((0, 0), (0, 0), (0, n - k1_dim * LANES)))
    ds = jnp.real(jnp.fft.ifft(tc)).astype(signals.dtype)   # (C, E, N)
    return jnp.transpose(ds, (1, 0, 2)), dbank


@functools.lru_cache(maxsize=32)
def _fused_power_mean_vjp(interpolate: bool, interpret: bool,
                          precision: str):
    """``_fused_call`` with a custom VJP: pallas_call has no derivative
    rule, so the forward runs the fused kernel and the backward is the
    ANALYTIC adjoint pipeline (``_mean_power_bwd``) — no second forward, no
    per-epoch AD residuals.  On the TPU runtime wrap the grad in
    ``jax.jit`` — the backward's complex FFT adjoints must stay inside a
    compiled program (eager complex ops are unsupported at this backend's
    boundaries)."""

    # One primal, shared by f and fwd.  fwd must NOT self-call the
    # custom_vjp-wrapped f: that trips a KeyError('closed_call') when the
    # grad runs inside lax.scan (optimizer loops, ops.fit).
    def call(signals, bank):
        return _fused_call(signals, bank, interpolate, interpret, precision,
                           "power")

    f = jax.custom_vjp(call)

    def fwd(signals, bank):
        return call(signals, bank), (signals, bank)

    def bwd(res, g):
        signals, bank = res
        # Fused backward where the kernel geometry allows (same conditions
        # as the forward; "mixed" is a forward-only documentation mode);
        # the XLA adjoint pipeline otherwise, or under NINW_FUSED_BWD=0.
        if (_FUSED_BWD and precision in ("fast3", "exact", "bf16")
                and _supported(signals.shape[-1])):
            return _fused_power_bwd(signals, bank, g, interpolate,
                                    interpret, precision)
        return _mean_power_bwd(signals, bank, interpolate, g)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=32)
def _fused_power_mean_vjp_complex(interpolate: bool, interpret: bool,
                                  precision: str):
    """Complex-bank variant: fused forward, analytic adjoint backward
    (``_mean_power_bwd_complex`` — the complex-cotangent conventions are
    pinned against jax.vjp in tests; the round-2 version differentiated
    the XLA program instead, paying a full forward plus per-epoch AD
    residuals)."""

    # One primal, shared by f and fwd.  fwd must NOT self-call the
    # custom_vjp-wrapped f: that trips a KeyError('closed_call') when the
    # grad runs inside lax.scan (optimizer loops, ops.fit).
    def call(signals, bank):
        return _fused_call(signals, bank, interpolate, interpret, precision,
                           "power")

    f = jax.custom_vjp(call)

    def fwd(signals, bank):
        return call(signals, bank), (signals, bank)

    def bwd(res, g):
        signals, bank = res
        if (_FUSED_BWD and precision in ("fast3", "exact", "bf16")
                and _supported(signals.shape[-1])):
            return _fused_power_bwd(signals, bank, g, interpolate,
                                    interpret, precision)
        return _mean_power_bwd_complex(signals, bank, interpolate, g)

    f.defvjp(fwd, bwd)
    return f


def _fused_power_mean(signals, bank, interpolate, interpret, precision):
    if jnp.iscomplexobj(bank):
        return _fused_power_mean_vjp_complex(interpolate, interpret,
                                             precision)(signals, bank)
    return _fused_power_mean_vjp(interpolate, interpret,
                                 precision)(signals, bank)


def fused_mean_power_from_bank(signals: jnp.ndarray, bank: jnp.ndarray,
                               interpolate: bool = True,
                               interpret: bool = False,
                               precision: str = DEFAULT_PRECISION,
                               vma_axes=()) -> jnp.ndarray:
    """Epoch-mean power TFR via the fused Pallas kernel.

    Args:
      signals: (E, C, N) float32, any E (epochs are processed in VMEM-sized
        chunks of ``MAX_EPOCHS_PER_CALL``; a ragged tail is zero-padded —
        zero epochs contribute zero power, and the mean is rescaled to the
        true count).
      bank: (F, N) frequency-domain bank — real float32 (Morse / Morlet /
        Shannon) or complex64 (Normal/Twice-mode families: MexicanHat /
        Haar; the complex product runs in stage 0, everything downstream
        is identical).
      interpolate: the analytic trick (upper spectrum half zeroed).  True
        halves stage 1; False keeps the full K1 = N1.
      interpret: run the kernel in the Pallas interpreter (CPU tests).

    Returns:
      (C, F, N) float32, matching ``ops.cwt.mean_power_from_bank`` at
      float32 tolerance.
    """
    if precision not in PRECISIONS:
        raise ValueError(f"precision must be one of {PRECISIONS}")
    e = signals.shape[0]
    if e <= MAX_EPOCHS_PER_CALL:
        return _fused_power_mean(signals, bank, interpolate, interpret,
                                 precision)
    pad_e = (-e) % MAX_EPOCHS_PER_CALL
    if pad_e:
        signals = jnp.pad(signals, ((0, pad_e), (0, 0), (0, 0)))
    e_padded = e + pad_e
    # Equal-size chunks: the mean of chunk means is the global epoch mean
    # (over e_padded; rescaled to the true count below).
    chunks = signals.reshape(
        (e_padded // MAX_EPOCHS_PER_CALL, MAX_EPOCHS_PER_CALL)
        + signals.shape[1:])
    zero = jnp.zeros((signals.shape[1], bank.shape[0], signals.shape[2]),
                     jnp.float32)
    if vma_axes:
        # Inside shard_map the scan body output varies over the mesh axes;
        # the zero init must carry the same varying-manual-axes type.
        zero = lax.pcast(zero, tuple(vma_axes), to="varying")
    total = lax.scan(
        lambda acc, s: (acc + _fused_power_mean(s, bank, interpolate,
                                                interpret, precision), None),
        zero, chunks)[0]
    # total/n_chunks is the mean over e_padded; rescale to the true E.
    return total * (float(e_padded) / float(e)
                    / (e_padded // MAX_EPOCHS_PER_CALL))


def fused_power_from_bank(signals: jnp.ndarray, bank: jnp.ndarray,
                          interpolate: bool = True,
                          interpret: bool = False,
                          precision: str = DEFAULT_PRECISION) -> jnp.ndarray:
    """Per-signal ``|cwt|**2`` via the fused kernel: (..., N) -> (..., F, N).

    The batch rides the kernel's EPOCH axis with the ``power_each``
    epilogue (no reduction): each program then carries dense B*128-row
    stage-2 matmuls — for the long-window geometries (N up to 16384, where
    FB = 1) a batch-on-the-channel-axis layout would leave each program a
    single 128-row matmul and go per-program-overhead-bound.  This is what
    the chunked / streaming long-recording paths dispatch per window batch
    (``parallel.chunked``, ``parallel.streaming``), where the extended
    window length satisfies ``_supported`` by construction (``pow2_halo``).
    """
    lead = signals.shape[:-1]
    n = signals.shape[-1]
    b = 1
    for d in lead:
        b *= int(d)
    b = max(b, 1)
    flat = signals.reshape(b, 1, n)
    if b <= MAX_EPOCHS_PER_CALL:
        out = _fused_call(flat, bank, interpolate, interpret, precision,
                          "power_each")
    else:
        pad_b = (-b) % MAX_EPOCHS_PER_CALL
        if pad_b:
            flat = jnp.pad(flat, ((0, pad_b), (0, 0), (0, 0)))
        chunks = flat.reshape((b + pad_b) // MAX_EPOCHS_PER_CALL,
                              MAX_EPOCHS_PER_CALL, 1, n)
        _, ys = lax.scan(
            lambda _, s: (None, _fused_call(s, bank, interpolate, interpret,
                                            precision, "power_each")),
            None, chunks)
        out = ys.reshape(b + pad_b, 1, bank.shape[0], n)[:b]
    return out.reshape(*lead, bank.shape[0], n)


def _itc_sums(signals, bank, interpolate, interpret, precision,
              vma_axes=()):
    """Epoch-SUMMED unit-phase planes (sum_r, sum_i) over ANY epoch count.

    Zero epochs cannot be padded in (a zero coefficient's phase is 0/0 ->
    NaN), so a ragged count runs as a scan over full
    ``MAX_EPOCHS_PER_CALL`` chunks plus ONE remainder-sized call (a second
    compiled kernel body for the tail geometry).  Shared by the
    single-program path and the sharded per-shard path
    (``parallel.sharded``)."""
    e = signals.shape[0]
    if e <= MAX_EPOCHS_PER_CALL:
        return _fused_call(signals, bank, interpolate, interpret, precision,
                           "itc")
    rem = e % MAX_EPOCHS_PER_CALL
    full = e - rem
    chunks = signals[:full].reshape(
        (full // MAX_EPOCHS_PER_CALL, MAX_EPOCHS_PER_CALL)
        + signals.shape[1:])
    zero = jnp.zeros((signals.shape[1], bank.shape[0], signals.shape[2]),
                     jnp.float32)
    if vma_axes:
        zero = lax.pcast(zero, tuple(vma_axes), to="varying")

    def step(acc, s):
        r, i = _fused_call(s, bank, interpolate, interpret, precision, "itc")
        return (acc[0] + r, acc[1] + i), None

    (sr, si), _ = lax.scan(step, (zero, zero), chunks)
    if rem:
        tr, ti = _fused_call(signals[full:], bank, interpolate, interpret,
                             precision, "itc")
        sr, si = sr + tr, si + ti
    return sr, si


def fused_itc_from_bank(signals: jnp.ndarray, bank: jnp.ndarray,
                        interpolate: bool = True, interpret: bool = False,
                        precision: str = DEFAULT_PRECISION,
                        vma_axes=()) -> jnp.ndarray:
    """Inter-trial coherence ``| mean_E cwt/|cwt| |`` via the fused kernel
    (reference semantics: ``mneutils.py:57-71``).  Same shape/constraint
    rules as ``fused_mean_power_from_bank``; returns (C, F, N) float32.

    Accuracy note: the unit-phase division amplifies coefficient round-off
    where |c| is near zero (the phase of a vanishing coefficient is
    noise), so ITC differs from the XLA path by up to ~2e-3 at "fast3" and
    ~1e-4 at "exact" — concentrated in negligible-power bins and far below
    the ~1/sqrt(E) sampling error of the coherence statistic itself.
    """
    if precision not in PRECISIONS:
        raise ValueError(f"precision must be one of {PRECISIONS}")
    if not vma_axes:
        # Differentiable wrapper (pallas_call has no AD rule): fused
        # forward, XLA-autodiff backward.  Inside shard_map (vma_axes set)
        # stay on the raw path — gradients there go through
        # parallel.sharded_mean_power_grad instead.
        return _fused_itc_vjp(interpolate, interpret, precision)(signals,
                                                                 bank)
    sr, si = _itc_sums(signals, bank, interpolate, interpret, precision,
                       vma_axes)
    return jnp.sqrt(sr * sr + si * si) / signals.shape[0]


def fused_power_itc_from_bank(signals: jnp.ndarray, bank: jnp.ndarray,
                              interpolate: bool = True,
                              interpret: bool = False,
                              precision: str = DEFAULT_PRECISION):
    """Epoch-mean power AND inter-trial coherence in ONE kernel pass:
    (E, C, N) -> ((C, F, N), (C, F, N)).

    The two reductions share every matmul stage (spectra x bank x iDFT);
    computing them together costs one extra VPU rsqrt + two extra output
    planes — run_pipeline always wants both, and two separate calls redo
    all the MXU work.  Ragged epoch counts chunk itc-style (full chunks +
    one remainder-sized call — zero epochs cannot be padded into the
    unit-phase sum); the power plane divides by the true count at the
    end (the kernel's bank scale is 1/N here, no E folding).
    """
    if precision not in PRECISIONS:
        raise ValueError(f"precision must be one of {PRECISIONS}")
    e = signals.shape[0]
    ps, sr, si = _power_itc_sums(signals, bank, interpolate, interpret,
                                 precision)
    return ps / e, jnp.sqrt(sr * sr + si * si) / e


def _power_itc_sums(signals, bank, interpolate, interpret, precision,
                    vma_axes=()):
    """Epoch-SUMMED (power, unit-phase real, unit-phase imag) planes over
    ANY epoch count via the ``power_itc`` epilogue — itc-style chunking
    (full chunks + one remainder call; zero epochs cannot be padded into
    the unit-phase sum).  Shared by the single-program wrapper and the
    sharded per-shard path (``parallel.sharded``), like ``_itc_sums``."""
    e = signals.shape[0]
    if e <= MAX_EPOCHS_PER_CALL:
        return _fused_call(signals, bank, interpolate, interpret,
                           precision, "power_itc")
    rem = e % MAX_EPOCHS_PER_CALL
    full = e - rem
    chunks = signals[:full].reshape(
        (full // MAX_EPOCHS_PER_CALL, MAX_EPOCHS_PER_CALL)
        + signals.shape[1:])
    zero = jnp.zeros((signals.shape[1], bank.shape[0], signals.shape[2]),
                     jnp.float32)
    if vma_axes:
        zero = lax.pcast(zero, tuple(vma_axes), to="varying")

    def step(acc, s):
        p, r, i = _fused_call(s, bank, interpolate, interpret, precision,
                              "power_itc")
        return (acc[0] + p, acc[1] + r, acc[2] + i), None

    (ps, sr, si), _ = lax.scan(step, (zero, zero, zero), chunks)
    if rem:
        p, r, i = _fused_call(signals[full:], bank, interpolate, interpret,
                              precision, "power_itc")
        ps, sr, si = ps + p, sr + r, si + i
    return ps, sr, si


def fused_coherence_sums(sigs_a: jnp.ndarray, sigs_b: jnp.ndarray,
                         bank: jnp.ndarray, interpolate: bool = True,
                         interpret: bool = False,
                         precision: str = DEFAULT_PRECISION,
                         vma_axes=()):
    """Epoch-SUMMED coherence accumulators via ONE kernel pass per pair
    chunk: ``(sum cross_r, sum cross_i, sum |Wa|^2, sum |Wb|^2)`` — the
    fused counterpart of ``ops.extensions.coherence_sums``.

    Each kernel call carries the pair stacked on the epoch axis
    ([a-chunk; b-chunk], so both coefficient sets live in the same
    program); zero-padded epochs contribute zero to all four sums, so a
    ragged count chunks power-style (equal chunks, zero-pad).
    """
    e, c, n = sigs_a.shape
    eh_cap = MAX_EPOCHS_PER_CALL // 2
    if e <= eh_cap:
        return _fused_call(jnp.concatenate([sigs_a, sigs_b]), bank,
                           interpolate, interpret, precision, "coherence")
    pad_e = (-e) % eh_cap
    if pad_e:
        pad = ((0, pad_e), (0, 0), (0, 0))
        sigs_a = jnp.pad(sigs_a, pad)
        sigs_b = jnp.pad(sigs_b, pad)
    n_chunks = (e + pad_e) // eh_cap
    chunks_a = sigs_a.reshape((n_chunks, eh_cap) + sigs_a.shape[1:])
    chunks_b = sigs_b.reshape((n_chunks, eh_cap) + sigs_b.shape[1:])
    zero = jnp.zeros((c, bank.shape[0], n), jnp.float32)
    if vma_axes:
        zero = lax.pcast(zero, tuple(vma_axes), to="varying")

    def step(acc, ab):
        outs = _fused_call(jnp.concatenate([ab[0], ab[1]]), bank,
                           interpolate, interpret, precision, "coherence")
        return tuple(a + o for a, o in zip(acc, outs)), None

    sums, _ = lax.scan(step, (zero,) * 4, (chunks_a, chunks_b))
    return sums


def fused_phase_lag_sums(sigs_a: jnp.ndarray, sigs_b: jnp.ndarray,
                         bank: jnp.ndarray, interpolate: bool = True,
                         interpret: bool = False,
                         precision: str = DEFAULT_PRECISION,
                         vma_axes=()):
    """Epoch-SUMMED phase-lag accumulators via ONE kernel pass per pair
    chunk: ``(sum Im, sum |Im|, sum sign(Im), sum Im^2)`` of the per-epoch
    cross spectrum — the fused counterpart of
    ``ops.connectivity.phase_lag_sums``.  Zero-padded epochs contribute
    zero to all four sums (sign(0) = 0), so a ragged count chunks
    power-style (equal chunks, zero-pad)."""
    e, c, n = sigs_a.shape
    eh_cap = MAX_EPOCHS_PER_CALL // 2
    if e <= eh_cap:
        return _fused_call(jnp.concatenate([sigs_a, sigs_b]), bank,
                           interpolate, interpret, precision, "phaselag")
    pad_e = (-e) % eh_cap
    if pad_e:
        pad = ((0, pad_e), (0, 0), (0, 0))
        sigs_a = jnp.pad(sigs_a, pad)
        sigs_b = jnp.pad(sigs_b, pad)
    n_chunks = (e + pad_e) // eh_cap
    chunks_a = sigs_a.reshape((n_chunks, eh_cap) + sigs_a.shape[1:])
    chunks_b = sigs_b.reshape((n_chunks, eh_cap) + sigs_b.shape[1:])
    zero = jnp.zeros((c, bank.shape[0], n), jnp.float32)
    if vma_axes:
        zero = lax.pcast(zero, tuple(vma_axes), to="varying")

    def step(acc, ab):
        outs = _fused_call(jnp.concatenate([ab[0], ab[1]]), bank,
                           interpolate, interpret, precision, "phaselag")
        return tuple(a + o for a, o in zip(acc, outs)), None

    sums, _ = lax.scan(step, (zero,) * 4, (chunks_a, chunks_b))
    return sums


@functools.lru_cache(maxsize=32)
def _phase_lag_jitted(method: str, interpolate: bool, interpret: bool,
                      precision: str, eps: float):
    from .connectivity import phase_lag_from_sums

    def call(sa, sb, br):
        sums = fused_phase_lag_sums(sa, sb, br, interpolate, interpret,
                                    precision)
        return phase_lag_from_sums(sums, sa.shape[0], method, eps)

    return jax.jit(call)


def fused_phase_lag(sigs_a_r, sigs_b_r, bank_r, *, method: str = "wpli",
                    interpolate: bool = True, interpret: bool = False,
                    precision: str = DEFAULT_PRECISION, eps: float = 0.0):
    """Jitted float-boundary wrapper: PLI / wPLI / debiased wPLI^2 via the
    fused kernel (``ops.connectivity.phase_lag_from_bank`` semantics).
    Caveats: "pli" counts the SIGN of Im S, so cells where the true lag
    sits near zero can flip under kernel round-off — prefer "wpli"/"dwpli"
    (weighted forms are robust to exactly this) or the XLA path for
    sign-critical work.  A channel against ITSELF is degenerate (Im S is
    all rounding noise); only the XLA path pins that case to exact
    0/0 -> NaN."""
    return _phase_lag_jitted(str(method), bool(interpolate), bool(interpret),
                             str(precision), float(eps))(
        sigs_a_r, sigs_b_r, bank_r)


def fused_plv_sums(sigs_a: jnp.ndarray, sigs_b: jnp.ndarray,
                   bank: jnp.ndarray, interpolate: bool = True,
                   interpret: bool = False,
                   precision: str = DEFAULT_PRECISION, vma_axes=()):
    """Epoch-SUMMED unit cross-phase planes via the kernel's ``plv``
    epilogue (semantics: ``ops.connectivity.plv_sums`` at eps=0).  Zero
    pairs cannot be padded in (0/0 phase -> NaN), so ragged counts run
    itc-style: full chunks plus ONE remainder-sized call."""
    e, c, n = sigs_a.shape
    eh_cap = MAX_EPOCHS_PER_CALL // 2

    def call(sa, sb):
        return _fused_call(jnp.concatenate([sa, sb]), bank, interpolate,
                           interpret, precision, "plv")

    if e <= eh_cap:
        return call(sigs_a, sigs_b)
    rem = e % eh_cap
    full = e - rem
    chunks_a = sigs_a[:full].reshape((full // eh_cap, eh_cap)
                                     + sigs_a.shape[1:])
    chunks_b = sigs_b[:full].reshape((full // eh_cap, eh_cap)
                                     + sigs_b.shape[1:])
    zero = jnp.zeros((c, bank.shape[0], n), jnp.float32)
    if vma_axes:
        zero = lax.pcast(zero, tuple(vma_axes), to="varying")

    def step(acc, ab):
        r, i = call(ab[0], ab[1])
        return (acc[0] + r, acc[1] + i), None

    (sr, si), _ = lax.scan(step, (zero, zero), (chunks_a, chunks_b))
    if rem:
        tr, ti = call(sigs_a[full:], sigs_b[full:])
        sr, si = sr + tr, si + ti
    return sr, si


@functools.lru_cache(maxsize=32)
def _plv_jitted(interpolate: bool, interpret: bool, precision: str):
    return jax.jit(lambda sa, sb, br: _plv_from_sums(
        sa, sb, br, interpolate, interpret, precision))


def _plv_from_sums(sa, sb, br, interpolate, interpret, precision):
    sr, si = fused_plv_sums(sa, sb, br, interpolate, interpret, precision)
    return jnp.sqrt(sr * sr + si * si) / sa.shape[0]


def fused_plv(sigs_a_r, sigs_b_r, bank_r, *, interpolate: bool = True,
              interpret: bool = False,
              precision: str = DEFAULT_PRECISION):
    """Jitted float-boundary wrapper: phase-locking value via the fused
    kernel (``ops.connectivity.plv_from_bank`` semantics at eps=0)."""
    return _plv_jitted(bool(interpolate), bool(interpret),
                       str(precision))(sigs_a_r, sigs_b_r, bank_r)


@functools.lru_cache(maxsize=32)
def _ppc_jitted(interpolate: bool, interpret: bool, precision: str):
    def call(sa, sb, br):
        sr, si = fused_plv_sums(sa, sb, br, interpolate, interpret,
                                precision)
        e = sa.shape[0]
        return (sr * sr + si * si - e) / (e * (e - 1.0))

    return jax.jit(call)


def fused_ppc(sigs_a_r, sigs_b_r, bank_r, *, interpolate: bool = True,
              interpret: bool = False, precision: str = DEFAULT_PRECISION):
    """Jitted float-boundary wrapper: pairwise phase consistency off the
    fused ``plv`` epilogue sums (``ops.connectivity.ppc_from_bank``
    semantics at eps=0)."""
    return _ppc_jitted(bool(interpolate), bool(interpret),
                       str(precision))(sigs_a_r, sigs_b_r, bank_r)


def fused_epoch_coherence(sigs_a: jnp.ndarray, sigs_b: jnp.ndarray,
                          bank: jnp.ndarray, interpolate: bool = True,
                          interpret: bool = False,
                          precision: str = DEFAULT_PRECISION,
                          eps: float = 1e-12) -> jnp.ndarray:
    """Epoch-wise magnitude-squared wavelet coherence via the fused kernel
    (semantics: ``ops.extensions.epoch_coherence_from_bank``)."""
    from .extensions import coherence_from_sums
    xr, xi, pa, pb = fused_coherence_sums(sigs_a, sigs_b, bank,
                                          interpolate, interpret, precision)
    return coherence_from_sums(xr, xi, pa, pb, sigs_a.shape[0], eps)


@functools.lru_cache(maxsize=32)
def _coherence_jitted(interpolate: bool, interpret: bool, precision: str,
                      eps: float):
    """Stable jitted fused-coherence callable per config (see _jitted)."""
    return jax.jit(lambda sa, sb, br: fused_epoch_coherence(
        sa, sb, br, interpolate, interpret, precision, eps))


def fused_coherence(sigs_a_r, sigs_b_r, bank_r, *, interpolate: bool = True,
                    interpret: bool = False,
                    precision: str = DEFAULT_PRECISION, eps: float = 1e-12):
    """Jitted float-boundary wrapper for ``fused_epoch_coherence`` (real
    banks; complex pairs go through the XLA path in
    ``ops.extensions.epoch_coherence``)."""
    return _coherence_jitted(bool(interpolate), bool(interpret),
                             str(precision), float(eps))(
        sigs_a_r, sigs_b_r, bank_r)


@functools.lru_cache(maxsize=32)
def _imcoh_jitted(interpolate: bool, interpret: bool, precision: str,
                  eps: float):
    from .extensions import imcoh_from_sums

    def call(sa, sb, br):
        xr, xi, pa, pb = fused_coherence_sums(sa, sb, br, interpolate,
                                              interpret, precision)
        return imcoh_from_sums(xr, xi, pa, pb, eps)

    return jax.jit(call)


def fused_imcoh(sigs_a_r, sigs_b_r, bank_r, *, interpolate: bool = True,
                interpret: bool = False,
                precision: str = DEFAULT_PRECISION, eps: float = 1e-12):
    """Jitted float-boundary wrapper: imaginary coherency off the fused
    ``coherence`` epilogue sums (``ops.extensions.imcoh_from_bank``
    semantics; the epoch count cancels in the ratio)."""
    return _imcoh_jitted(bool(interpolate), bool(interpret),
                         str(precision), float(eps))(
        sigs_a_r, sigs_b_r, bank_r)


def _power_itc_entry(signal_r, bank_r, bank_i=None, *, interpolate,
                     interpret, precision):
    return fused_power_itc_from_bank(signal_r, _as_bank(bank_r, bank_i),
                                     interpolate, interpret, precision)


def fused_power_itc(signal_r, bank_r, bank_i=None, *,
                    interpolate: bool = True, interpret: bool = False,
                    precision: str = DEFAULT_PRECISION):
    """Jitted float-boundary wrapper for ``fused_power_itc_from_bank``."""
    return _jitted(_power_itc_entry, interpolate, interpret,
                   precision)(signal_r, bank_r, bank_i)


def power_itc_auto(signal_r, bank_r, bank_i=None, *,
                   interpolate: bool = False,
                   precision: str = DEFAULT_PRECISION):
    """(power, itc) with automatic kernel dispatch (one fused pass on TPU
    where the geometry conforms; the two XLA reductions otherwise)."""
    from .cwt import itc as _xla_itc
    from .cwt import mean_power as _xla_mean_power
    if (jax.default_backend() == "tpu"
            and supports(signal_r.shape, bank_r, epilogue="itc")):
        return fused_power_itc(signal_r, bank_r, bank_i,
                               interpolate=interpolate,
                               precision=precision)
    return (_xla_mean_power(signal_r, bank_r, bank_i,
                            interpolate=interpolate),
            _xla_itc(signal_r, bank_r, bank_i, interpolate=interpolate))


@functools.lru_cache(maxsize=32)
def _fused_itc_vjp(interpolate: bool, interpret: bool, precision: str):
    """ITC with a custom VJP: the unit-phase epoch mean has no analytic
    adjoint shortcut worth hand-deriving (gradients through ITC are a rare
    path — the statistic is usually a read-only analysis output), so the
    backward differentiates the mathematically identical XLA program."""
    from .cwt import itc_from_bank

    def call(signals, bank):
        sr, si = _itc_sums(signals, bank, interpolate, interpret, precision)
        return jnp.sqrt(sr * sr + si * si) / signals.shape[0]

    f = jax.custom_vjp(call)

    def fwd(signals, bank):
        return call(signals, bank), (signals, bank)

    def bwd(res, g):
        signals, bank = res
        _, vjp = jax.vjp(
            lambda s, b: itc_from_bank(s, b, interpolate), signals, bank)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=32)
def _jitted(fn, interpolate: bool, interpret: bool, precision: str):
    """One stable jitted callable per (fn, config) — a fresh ``jax.jit``
    wrapper per call would defeat the compilation cache (recompile every
    call)."""
    return jax.jit(functools.partial(fn, interpolate=interpolate,
                                     interpret=interpret,
                                     precision=precision))


def _as_bank(bank_r, bank_i):
    return bank_r if bank_i is None else lax.complex(bank_r, bank_i)


def _mean_power_entry(signal_r, bank_r, bank_i=None, *, interpolate,
                      interpret, precision):
    return fused_mean_power_from_bank(signal_r, _as_bank(bank_r, bank_i),
                                      interpolate, interpret, precision)


def _itc_entry(signal_r, bank_r, bank_i=None, *, interpolate, interpret,
               precision):
    return fused_itc_from_bank(signal_r, _as_bank(bank_r, bank_i),
                               interpolate, interpret, precision)


def fused_mean_power(signal_r, bank_r, bank_i=None, *,
                     interpolate: bool = True,
                     interpret: bool = False,
                     precision: str = DEFAULT_PRECISION):
    """Jitted float-boundary wrapper (complex never crosses the boundary;
    a complex Normal/Twice-mode bank is passed as the (real, imag) pair
    and assembled inside the program)."""
    return _jitted(_mean_power_entry, interpolate, interpret,
                   precision)(signal_r, bank_r, bank_i)


def fused_itc(signal_r, bank_r, bank_i=None, *, interpolate: bool = True,
              interpret: bool = False,
              precision: str = DEFAULT_PRECISION):
    """Jitted float-boundary ITC wrapper."""
    return _jitted(_itc_entry, interpolate, interpret,
                   precision)(signal_r, bank_r, bank_i)


def mean_power_auto(signal_r, bank_r, bank_i=None, *,
                    interpolate: bool = False,
                    precision: str = DEFAULT_PRECISION):
    """Epoch-mean power with automatic kernel dispatch: the fused Pallas
    kernel on TPU when the workload conforms ((E, C, N) batch, N = N1*128
    with N1 a power of two in [8, 128]; real OR complex bank), otherwise
    the XLA FFT path — same result either way."""
    from .cwt import mean_power as _xla_mean_power
    if (jax.default_backend() == "tpu"
            and supports(signal_r.shape, bank_r)):
        return fused_mean_power(signal_r, bank_r, bank_i,
                                interpolate=interpolate,
                                precision=precision)
    return _xla_mean_power(signal_r, bank_r, bank_i,
                           interpolate=interpolate)


def itc_auto(signal_r, bank_r, bank_i=None, *, interpolate: bool = False,
             precision: str = DEFAULT_PRECISION):
    """Inter-trial coherence with automatic kernel dispatch (see
    ``mean_power_auto``)."""
    from .cwt import itc as _xla_itc
    if (jax.default_backend() == "tpu"
            and supports(signal_r.shape, bank_r, epilogue="itc")):
        return fused_itc(signal_r, bank_r, bank_i, interpolate=interpolate,
                         precision=precision)
    return _xla_itc(signal_r, bank_r, bank_i, interpolate=interpolate)


def supports(signals_shape, bank, epilogue: str = "power") -> bool:
    """True when the fused kernel can run this workload (real bank, conform
    geometry) — callers fall back to the XLA path otherwise.  Any epoch
    count works for both epilogues (power zero-pads ragged tails; itc runs
    one remainder-sized tail call instead, since zero epochs have no
    phase)."""
    if bank is None or len(signals_shape) != 3:
        return False
    if bank.ndim != 2 or bank.shape[-1] != signals_shape[-1]:
        # A bank built for a different signal length would be silently
        # resampled at the wrong frequency resolution — hard requirement.
        return False
    return _supported(signals_shape[-1]) and not jnp.iscomplexobj(bank)
