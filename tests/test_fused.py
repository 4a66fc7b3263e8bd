"""Fused Pallas kernel parity (interpreter mode on CPU).

The kernel's math — matmul four-step iDFT x bank x |.|^2 x epoch mean — must
match the XLA FFT path (``ops.cwt.mean_power_from_bank``) to float32.  On
real TPU hardware the compiled kernel is exercised by ``bench.py`` and the
verify flow; here the Pallas interpreter checks the same program.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ninwavelets_tpu as nw
from ninwavelets_tpu.ops import fused
from ninwavelets_tpu.ops.bank import make_fft_bank
from ninwavelets_tpu.ops.cwt import mean_power_from_bank


def _workload(n=2048, nf=100, e=4, c=3, interpolate=True, seed=0):
    sfreq = 1000.0
    morse = nw.Morse(sfreq)
    bank = np.asarray(make_fft_bank(morse._wdef(),
                                    jnp.arange(1.0, nf + 1.0), n, sfreq,
                                    interpolate), np.float32)
    sig = np.random.default_rng(seed).standard_normal((e, c, n)).astype(
        np.float32)
    return sig, bank


@pytest.mark.parametrize("interpolate", [True, False])
def test_parity_vs_xla(interpolate):
    sig, bank = _workload(interpolate=interpolate)
    want = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, interpolate))(sig, bank))
    got = np.asarray(fused.fused_mean_power_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), interpolate, interpret=True,
        precision="exact"))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_parity_n1024_small_bank():
    sig, bank = _workload(n=1024, nf=37, e=8, c=2)
    want = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, True))(sig, bank))
    got = np.asarray(fused.fused_mean_power_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="exact"))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_epoch_chunking():
    """E > 8 runs in chunks of 8; the mean of chunk means must equal the
    global epoch mean."""
    sig, bank = _workload(e=16, c=2, nf=24)
    want = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, True))(sig, bank))
    got = np.asarray(fused.fused_mean_power_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="exact"))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_fast3_precision_within_gate():
    """The 3-pass bf16 mode must stay within ~1e-4 of the XLA reference
    (measured ~1e-5; the gate leaves headroom for unlucky seeds)."""
    sig, bank = _workload(e=8, c=4)
    want = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, True))(sig, bank))
    got = np.asarray(fused.fused_mean_power_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="fast3"))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_supports_geometry():
    chunk = fused.MAX_EPOCHS_PER_CALL
    bank = jnp.ones((100, 2048), jnp.float32)
    assert fused.supports((chunk, 64, 2048), bank)
    assert fused.supports((2 * chunk, 64, 1024), bank[:, :1024])
    ragged = chunk + 1
    assert fused.supports((ragged, 64, 2048), bank)       # ragged: padded
    assert fused.supports((ragged, 64, 2048), bank, epilogue="itc")
    assert not fused.supports((chunk, 2048), bank)        # missing channel
    assert not fused.supports((chunk, 64, 2000), bank)    # N not N1*128
    assert not fused.supports((chunk, 64, 2048), None)
    cbank = jnp.ones((4, 2048), jnp.complex64)
    assert not fused.supports((chunk, 64, 2048), cbank)


def test_bad_precision_raises():
    sig, bank = _workload(e=2, c=1, nf=8)
    with pytest.raises(ValueError):
        fused.fused_mean_power_from_bank(jnp.asarray(sig), jnp.asarray(bank),
                                         precision="nope")


def test_ragged_epoch_count_pads_correctly():
    """A ragged epoch count is zero-padded to the chunk size; the rescaled
    mean must equal the true mean."""
    sig, bank = _workload(e=fused.MAX_EPOCHS_PER_CALL + 4, c=2, nf=16)
    want = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, True))(sig, bank))
    got = np.asarray(fused.fused_mean_power_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="exact"))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_itc_ragged_epoch_count():
    """A ragged epoch count runs as full chunks + one remainder-sized tail
    call (zero-padding is impossible for itc — no phase at |c| = 0)."""
    from ninwavelets_tpu.ops.cwt import itc as xla_itc
    sig, bank = _workload(e=fused.MAX_EPOCHS_PER_CALL + 4, c=1, nf=8)
    want = np.asarray(jax.jit(
        lambda s, b: xla_itc(s, b, interpolate=True))(
            jnp.asarray(sig), jnp.asarray(bank)))
    got = np.asarray(fused.fused_itc_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="exact"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_auto_dispatch_falls_back_on_cpu():
    """On the CPU test mesh the auto path must use XLA (and agree with it)."""
    sig, bank = _workload(e=4, c=2, nf=16)
    want = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, True))(sig, bank))
    got = np.asarray(fused.mean_power_auto(jnp.asarray(sig),
                                           jnp.asarray(bank),
                                           interpolate=True))
    # Separate executables of the same program can differ by ~1e-5 on the
    # CPU backend (FFT thread-scheduling nondeterminism); the gate checks
    # "same math", not bit-identity.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("e", [4, 16])
def test_itc_parity_vs_xla(e):
    from ninwavelets_tpu.ops.cwt import itc as xla_itc
    sig, bank = _workload(e=e, c=2, nf=24)
    want = np.asarray(jax.jit(
        lambda s, b: xla_itc(s, b, interpolate=True))(
            jnp.asarray(sig), jnp.asarray(bank)))
    got = np.asarray(fused.fused_itc_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="exact"))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-4, rel


def test_itc_identical_epochs_is_one():
    """Identical epochs -> unit phase coherence everywhere |c| > 0."""
    sig, bank = _workload(e=1, c=1, nf=16)
    sig = np.repeat(sig, 4, axis=0)
    got = np.asarray(fused.fused_itc_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="exact"))
    finite = np.isfinite(got)
    np.testing.assert_allclose(got[finite], 1.0, atol=1e-4)


def test_itc_auto_falls_back_on_cpu():
    from ninwavelets_tpu.ops.cwt import itc as xla_itc
    sig, bank = _workload(e=4, c=2, nf=16)
    want = np.asarray(xla_itc(jnp.asarray(sig), jnp.asarray(bank),
                              interpolate=True))
    got = np.asarray(fused.itc_auto(jnp.asarray(sig), jnp.asarray(bank),
                                    interpolate=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_grad_flows_through_fused_kernel():
    """pallas_call has no derivative rule; the custom VJP runs the fused
    forward and the analytic adjoint backward, so jax.grad works on the
    fused path and matches the XLA gradient."""
    from ninwavelets_tpu.ops.cwt import mean_power_from_bank
    sig, bank = _workload(e=4, c=2, nf=16)
    sig_j, bank_j = jnp.asarray(sig), jnp.asarray(bank)

    g_fused = jax.grad(lambda s: fused.fused_mean_power_from_bank(
        s, bank_j, True, interpret=True, precision="exact").sum())(sig_j)
    g_xla = jax.grad(lambda s: mean_power_from_bank(s, bank_j,
                                                    True).sum())(sig_j)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-6)


def test_mixed_mode_runs_and_matches_in_interpreter():
    """'mixed' (bf16 stage 1 + fast3 stage 2) documents that stage-wise
    precision budgeting does NOT meet the float32 gate ON CHIP (4.6e-3
    measured, see ROOFLINE.md).  The Pallas INTERPRETER runs DEFAULT-
    precision matmuls in full f32, so the bf16 rounding is invisible here —
    this test only pins the mode's plumbing (math identical to fast3 up to
    rounding); the numeric rejection lives in the on-chip parity artifact
    (tests/test_onchip_parity.py)."""
    sig, bank = _workload(e=4, c=2, nf=16)
    want = np.asarray(mean_power_from_bank(jnp.asarray(sig),
                                           jnp.asarray(bank), True))
    got = np.asarray(fused.fused_mean_power_from_bank(
        jnp.asarray(sig), jnp.asarray(bank), True, interpret=True,
        precision="mixed"))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-4 * np.abs(want).max())


def test_kernel_flops_model():
    """The corrected cost model: stage 2 scales with the epoch count (the
    round-1 estimate dropped it — VERDICT r1 item 1)."""
    f1 = fused.kernel_flops(1, 1, 1, 2048, True)
    f16 = fused.kernel_flops(1, 1, 16, 2048, True)
    assert f16 == 16 * f1                 # everything is per-epoch-linear
    # Known value at the BENCH geometry: stage1 + 3-mult stage2.
    stage1 = 2 * 256 * 128 * (16 * 128)
    stage2 = 6 * (16 * 128) * 128 * 128
    assert fused.kernel_flops(64, 13, 16, 2048, True) == \
        (stage1 + stage2) * 64 * 13


def test_analytic_backward_matches_xla_both_args():
    """The analytic adjoint (no second forward, no AD residuals) must match
    XLA autodiff for BOTH gradients — signals and bank — including the
    chunked E > MAX_EPOCHS_PER_CALL path and a weighted (non-uniform)
    cotangent."""
    from ninwavelets_tpu.ops.cwt import mean_power_from_bank
    rng = np.random.default_rng(7)
    sig, bank = _workload(e=fused.MAX_EPOCHS_PER_CALL + 3, c=2, nf=16)
    w = jnp.asarray(rng.standard_normal((2, 16, 2048)).astype(np.float32))
    sig_j, bank_j = jnp.asarray(sig), jnp.asarray(bank)

    def loss_fused(s, b):
        return jnp.sum(w * fused.fused_mean_power_from_bank(
            s, b, True, interpret=True, precision="exact"))

    def loss_xla(s, b):
        return jnp.sum(w * mean_power_from_bank(s, b, True))

    gs_f, gb_f = jax.grad(loss_fused, argnums=(0, 1))(sig_j, bank_j)
    gs_x, gb_x = jax.grad(loss_xla, argnums=(0, 1))(sig_j, bank_j)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_x),
                               rtol=1e-4, atol=1e-6)


def test_complex_bank_parity_vs_xla():
    """Normal/Twice-mode families (complex banks) through the fused
    kernel: the complex stage-0 product must match the XLA path for both
    power and itc (these families previously always fell back)."""
    from ninwavelets_tpu.ops.cwt import itc as xla_itc
    sfreq, n = 1000.0, 2048
    mh = nw.MexicanHat(sfreq)
    bank = make_fft_bank(mh._wdef(), jnp.arange(5.0, 45.0), n, sfreq, True)
    assert jnp.iscomplexobj(bank)
    sig = jnp.asarray(np.random.default_rng(4)
                      .standard_normal((6, 2, n)).astype(np.float32))
    want_p = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, True))(sig, bank))
    got_p = np.asarray(fused.fused_mean_power_from_bank(
        sig, bank, True, interpret=True, precision="exact"))
    np.testing.assert_allclose(got_p, want_p, rtol=1e-4,
                               atol=1e-5 * np.abs(want_p).max())
    want_i = np.asarray(jax.jit(
        lambda s, b: xla_itc(s, b, interpolate=True))(sig, bank))
    got_i = np.asarray(fused.fused_itc_from_bank(
        sig, bank, True, interpret=True, precision="exact"))
    np.testing.assert_allclose(got_i, want_i, rtol=1e-4, atol=1e-5)


def test_complex_bank_float_pair_wrapper():
    """The public wrapper takes the (real, imag) float pair and assembles
    the complex bank inside the program (TPU boundary rule)."""
    sfreq, n = 1000.0, 1024
    mh = nw.MexicanHat(sfreq)
    bank = make_fft_bank(mh._wdef(), jnp.arange(10.0, 26.0), n, sfreq, True)
    sig = jnp.asarray(np.random.default_rng(5)
                      .standard_normal((3, 2, n)).astype(np.float32))
    want = np.asarray(jax.jit(
        lambda s, b: mean_power_from_bank(s, b, True))(sig, bank))
    got = np.asarray(fused.fused_mean_power(
        sig, jnp.asarray(bank.real), jnp.asarray(bank.imag),
        interpolate=True, interpret=True, precision="exact"))
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_grad_through_complex_bank_fused():
    """jax.grad must work on the complex-bank fused path (custom VJP with
    an XLA-autodiff backward) — a review found the first complex-bank
    version silently dropped differentiability."""
    sfreq, n = 1000.0, 1024
    mh = nw.MexicanHat(sfreq)
    bank = make_fft_bank(mh._wdef(), jnp.arange(10.0, 26.0), n, sfreq, True)
    assert jnp.iscomplexobj(bank)
    sig = jnp.asarray(np.random.default_rng(6)
                      .standard_normal((3, 2, n)).astype(np.float32))
    g_fused = jax.grad(lambda s: fused.fused_mean_power_from_bank(
        s, bank, True, interpret=True, precision="exact").sum())(sig)
    g_xla = jax.grad(lambda s: mean_power_from_bank(s, bank,
                                                    True).sum())(sig)
    # Scale-relative atol: separate executables of the same FFT program
    # can differ by ~1e-5 on the CPU backend (thread scheduling).
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(g_xla)).max())


@pytest.mark.parametrize("interpolate", [True, False])
def test_fused_backward_matches_adjoint_pipeline(interpolate):
    """The fused backward kernel (_fused_power_bwd) must reproduce the
    gated XLA adjoint (_mean_power_bwd) bit-for-float32 on both cotangents,
    on both spectrum conventions, including a bank count that does not
    divide the frequency-block size (pad_f path: F=13, FB=8 at N=2048)."""
    rng = np.random.default_rng(11)
    sig, bank = _workload(e=5, c=2, nf=13, interpolate=interpolate)
    g = jnp.asarray(rng.standard_normal((2, 13, 2048)).astype(np.float32))
    sig_j, bank_j = jnp.asarray(sig), jnp.asarray(bank)

    ds_w, db_w = jax.jit(
        lambda s, b, gg: fused._mean_power_bwd(s, b, interpolate, gg))(
        sig_j, bank_j, g)
    ds_g, db_g = jax.jit(
        lambda s, b, gg: fused._fused_power_bwd(s, b, gg, interpolate,
                                                True, "exact"))(
        sig_j, bank_j, g)
    np.testing.assert_allclose(np.asarray(ds_g), np.asarray(ds_w),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(ds_w)).max())
    np.testing.assert_allclose(np.asarray(db_g), np.asarray(db_w),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(db_w)).max())


def test_fused_backward_flops_model():
    """bwd = forward recompute + stage A (per-epoch 3-mult, same tile count
    as stage 2) + stage B (per-epoch left multiply) — all per-epoch-linear."""
    f1 = fused.bwd_kernel_flops(1, 1, 1, 2048, True)
    f8 = fused.bwd_kernel_flops(1, 1, 8, 2048, True)
    assert f8 == 8 * f1
    assert fused.bwd_kernel_flops(2, 3, 4, 2048, True) > \
        fused.kernel_flops(2, 3, 4, 2048, True)


def test_grad_flows_through_fused_itc():
    """ITC previously had no derivative rule (pallas_call is opaque to AD);
    the custom VJP runs the fused forward with an XLA-autodiff backward."""
    from ninwavelets_tpu.ops.cwt import itc_from_bank
    sig, bank = _workload(e=4, c=2, nf=16)
    sig_j, bank_j = jnp.asarray(sig), jnp.asarray(bank)
    g_fused = jax.grad(lambda s: fused.fused_itc_from_bank(
        s, bank_j, True, interpret=True, precision="exact").sum())(sig_j)
    g_xla = jax.grad(lambda s: itc_from_bank(s, bank_j, True).sum())(sig_j)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(g_xla)).max())


@pytest.mark.parametrize("interpolate", [True, False])
def test_complex_bank_analytic_backward_matches_xla(interpolate):
    """The complex-bank adjoint's conjugation conventions (conj(bank) in
    dS, conj(u)*S in dbank) must reproduce jax.vjp of the XLA forward for
    BOTH cotangents."""
    from ninwavelets_tpu.ops.cwt import mean_power_from_bank
    rng = np.random.default_rng(3)
    e, c, f, n = 4, 2, 6, 1024
    sig = jnp.asarray(rng.standard_normal((e, c, n)).astype(np.float32))
    bank = jnp.asarray((rng.standard_normal((f, n))
                        + 1j * rng.standard_normal((f, n))
                        ).astype(np.complex64))
    g = jnp.asarray(rng.standard_normal((c, f, n)).astype(np.float32))

    _, vjp = jax.vjp(lambda s, b: mean_power_from_bank(s, b, interpolate),
                     sig, bank)
    ds_w, db_w = vjp(g)
    ds_g, db_g = fused._mean_power_bwd_complex(sig, bank, interpolate, g)
    np.testing.assert_allclose(np.asarray(ds_g), np.asarray(ds_w),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(ds_w)).max())
    np.testing.assert_allclose(np.asarray(db_g), np.asarray(db_w),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(db_w)).max())


@pytest.mark.parametrize("e", [4, fused.MAX_EPOCHS_PER_CALL + 3])
def test_power_itc_combined_epilogue(e):
    """One kernel pass must reproduce BOTH epoch reductions — including
    the ragged chunking (full chunks + remainder call)."""
    from ninwavelets_tpu.ops.cwt import itc as xla_itc
    from ninwavelets_tpu.ops.cwt import mean_power as xla_mean_power
    sig, bank = _workload(e=e, c=2, nf=16)
    sig_j, bank_j = jnp.asarray(sig), jnp.asarray(bank)
    p_w = np.asarray(xla_mean_power(sig_j, bank_j, interpolate=True))
    i_w = np.asarray(xla_itc(sig_j, bank_j, interpolate=True))
    p_g, i_g = fused.fused_power_itc(sig_j, bank_j, interpolate=True,
                                     interpret=True, precision="exact")
    np.testing.assert_allclose(np.asarray(p_g), p_w, rtol=1e-4,
                               atol=1e-5 * np.abs(p_w).max())
    finite = np.isfinite(i_w)
    np.testing.assert_allclose(np.asarray(i_g)[finite], i_w[finite],
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("interpolate", [True, False])
def test_fused_backward_complex_bank(interpolate):
    """The complex-bank fused backward (stacked [real; imag] bank planes,
    complex dbank output) must match the XLA complex adjoint."""
    rng = np.random.default_rng(13)
    e, c, f, n = 4, 2, 13, 2048
    sig = jnp.asarray(rng.standard_normal((e, c, n)).astype(np.float32))
    bank = jnp.asarray((rng.standard_normal((f, n))
                        + 1j * rng.standard_normal((f, n))
                        ).astype(np.complex64))
    g = jnp.asarray(rng.standard_normal((c, f, n)).astype(np.float32))

    ds_w, db_w = jax.jit(
        lambda s, b, gg: fused._mean_power_bwd_complex(s, b, interpolate,
                                                       gg))(sig, bank, g)
    ds_g, db_g = jax.jit(
        lambda s, b, gg: fused._fused_power_bwd(s, b, gg, interpolate,
                                                True, "exact"))(sig, bank, g)
    np.testing.assert_allclose(np.asarray(ds_g), np.asarray(ds_w),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(ds_w)).max())
    np.testing.assert_allclose(np.asarray(db_g), np.asarray(db_w),
                               rtol=1e-4,
                               atol=1e-5 * np.abs(np.asarray(db_w)).max())


@pytest.mark.parametrize("e,n", [(4, 2048), (4, 1024),
                                 (fused.MAX_EPOCHS_PER_CALL // 2 + 3,
                                  2048)])
@pytest.mark.parametrize("interpolate", [True, False])
def test_coherence_epilogue_matches_xla(e, n, interpolate):
    """The coherence epilogue (pair stacked on the epoch axis, four sums
    off one pass) must match the XLA epoch coherence — aligned and ragged
    pair counts (zero-padded epochs add zero to every sum)."""
    from ninwavelets_tpu.ops.extensions import epoch_coherence_from_bank
    rng = np.random.default_rng(17)
    sa, bank = _workload(e=e, c=2, nf=13, n=n, interpolate=interpolate)
    sb = rng.standard_normal(sa.shape).astype(np.float32)
    # a correlated component so coherence is non-trivial
    sb = (0.6 * sa + 0.8 * sb).astype(np.float32)
    sa_j, sb_j = jnp.asarray(sa), jnp.asarray(sb)
    bank_j = jnp.asarray(bank)
    want = np.asarray(epoch_coherence_from_bank(sa_j, sb_j, bank_j,
                                                interpolate))
    got = np.asarray(fused.fused_epoch_coherence(
        sa_j, sb_j, bank_j, interpolate, interpret=True,
        precision="exact"))
    np.testing.assert_allclose(got, want, rtol=1e-3,
                               atol=1e-4)


@pytest.mark.parametrize("e", [4, fused.MAX_EPOCHS_PER_CALL // 2 + 3])
def test_plv_epilogue_matches_xla(e):
    """The plv epilogue (unit cross-phase sums, pair on the epoch axis)
    must match the XLA plv — including the ragged itc-style chunking
    (zero pairs cannot be padded: 0/0 phase is NaN)."""
    from ninwavelets_tpu.ops.connectivity import plv_from_bank
    rng = np.random.default_rng(19)
    sa, bank = _workload(e=e, c=2, nf=13, interpolate=True)
    sb = (0.6 * sa + 0.8 * rng.standard_normal(sa.shape)).astype(np.float32)
    sa_j, sb_j, bank_j = jnp.asarray(sa), jnp.asarray(sb), jnp.asarray(bank)
    want = np.asarray(plv_from_bank(sa_j, sb_j, bank_j, True))
    got = np.asarray(fused._plv_from_sums(sa_j, sb_j, bank_j, True,
                                          True, "exact"))
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], rtol=1e-3,
                               atol=1e-4)


class TestFusedSSQ:
    """The r4 fused synchrosqueezing kernel (w + dW through one in-VMEM
    matmul-iDFT pass, closed-form row map, select-reduce accumulation
    over f-block revisits) vs the XLA path in ``ops/sst.py``."""

    def _drive(self, freqs, e=4, c=2, n=2048, seed=3, tone=None):
        from ninwavelets_tpu.ops.sst import ssq_mean_power, \
            uniform_grid_hint
        sfreq = 1000.0
        morse = nw.Morse(sfreq)
        bank = np.asarray(make_fft_bank(morse._wdef(),
                                        jnp.asarray(freqs), n, sfreq,
                                        True), np.float32)
        rng = np.random.default_rng(seed)
        sig = 0.1 * rng.standard_normal((e, c, n)).astype(np.float32)
        if tone is not None:
            t = np.arange(n) / sfreq
            sig += np.sin(2 * np.pi * tone * t).astype(np.float32)
        sig_j, bank_j = jnp.asarray(sig), jnp.asarray(bank)
        want = np.asarray(ssq_mean_power(sig_j, bank_j,
                                         jnp.asarray(freqs), sfreq))
        hint = uniform_grid_hint(freqs)
        assert fused.supports_ssq(sig.shape, bank_j, hint, True)
        got = np.asarray(fused.fused_ssq_mean_power(
            sig_j, bank_j, uniform_grid=hint, sfreq=sfreq,
            interpret=True, precision="exact"))
        return want, got

    def test_linear_grid_parity(self):
        freqs = np.arange(1.0, 101.0, dtype=np.float32)
        want, got = self._drive(freqs, tone=40.0)
        snr = 10 * np.log10((want ** 2).sum()
                            / max(float(((got - want) ** 2).sum()), 1e-30))
        assert snr > 80.0, snr
        # reassignment conserves power per time column exactly (every
        # source cell lands in exactly one output row)
        np.testing.assert_allclose(got.sum(1), want.sum(1), rtol=1e-5)

    def test_log_grid_parity(self):
        freqs = (4.0 * 2.0 ** (np.arange(48) / 8.0)).astype(np.float32)
        want, got = self._drive(freqs, tone=60.0)
        snr = 10 * np.log10((want ** 2).sum()
                            / max(float(((got - want) ** 2).sum()), 1e-30))
        assert snr > 80.0, snr

    def test_epoch_chunking(self):
        """E beyond one chunk (> MAX_EPOCHS_PER_CALL // 2) must take the
        multi-chunk path and still match."""
        freqs = np.arange(1.0, 51.0, dtype=np.float32)
        want, got = self._drive(freqs, e=fused.MAX_EPOCHS_PER_CALL // 2
                                + 3, tone=25.0)
        snr = 10 * np.log10((want ** 2).sum()
                            / max(float(((got - want) ** 2).sum()), 1e-30))
        assert snr > 80.0, snr

    def test_supports_gates(self):
        from ninwavelets_tpu.ops.sst import uniform_grid_hint
        bank = jnp.zeros((10, 2048), jnp.float32)
        lin = uniform_grid_hint(np.arange(1.0, 11.0))
        assert fused.supports_ssq((4, 2, 2048), bank, lin, True)
        # piecewise / irregular grids fall back
        assert not fused.supports_ssq((4, 2, 2048), bank, None, True)
        # non-analytic path, wrong rank, complex bank, bad N
        assert not fused.supports_ssq((4, 2, 2048), bank, lin, False)
        assert not fused.supports_ssq((2, 2048), bank, lin, True)
        assert not fused.supports_ssq(
            (4, 2, 2048), jnp.zeros((10, 2048), jnp.complex64), lin, True)
        assert not fused.supports_ssq(
            (4, 2, 2000), jnp.zeros((10, 2000), jnp.float32), lin, True)
