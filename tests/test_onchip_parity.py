"""Gates on the COMPILED kernel's numerics (VERDICT r1 item 4).

The interpret-mode tests in ``test_fused.py`` run DEFAULT matmuls in full
f32 and cannot see Mosaic's bf16 rounding; the compiled kernel's accuracy
is recorded on the real chip by ``benchmarks/onchip_parity.py`` into
``tests/artifacts/onchip_parity_r04.json`` and gated HERE, so a kernel
change that silently degrades on-chip accuracy fails CI the next time the
sweep is refreshed.  A live TPU-marked test re-checks one cell when the
suite ever runs with a TPU backend (the default conftest forces CPU).
"""
import json
import os

import jax
import numpy as np
import pytest

ARTIFACT = os.path.join(os.path.dirname(__file__), "artifacts",
                        "onchip_parity_r04.json")

#: (epilogue, precision) -> max allowed rel_err across all geometries.
#: fast3/exact are the accuracy modes (float32-gate); bf16 is the
#: documented ~5e-3 throughput mode; "mixed" documents the stage-wise
#: failure (ROOFLINE.md) — gated only as "no worse than bf16-class".
GATES = {
    ("power", "fast3"): 1e-4,
    ("power", "exact"): 5e-6,
    ("power", "bf16"): 2e-2,
    ("power", "mixed"): 2e-2,
    ("power_each", "fast3"): 1e-4,
    ("power_each", "exact"): 5e-6,
    ("itc", "fast3"): 3e-3,     # unit-phase division amplifies round-off
    ("itc", "exact"): 1e-4,
    ("itc", "bf16"): 0.5,
    ("itc", "mixed"): 0.5,
    ("backward", "fast3"): 1e-4,   # fused adjoint vs XLA adjoint, max of
    ("backward", "exact"): 5e-6,   # the signal / bank cotangent errors
    ("backward", "bf16"): 2e-2,
    ("coherence", "fast3"): 1e-3,  # ratio of quartics amplifies round-off
    ("coherence", "exact"): 1e-4,
    ("coherence", "bf16"): 2e-2,
    ("plv", "fast3"): 3e-3,        # unit-phase class, like itc
    ("plv", "exact"): 1e-4,
    ("plv", "bf16"): 0.5,
    ("phaselag", "fast3"): 3e-3,   # wPLI: |sum Im| / sum |Im| ratio class
    ("phaselag", "exact"): 1e-4,
    ("phaselag", "bf16"): 0.5,
    ("imcoh", "fast3"): 1e-3,      # coherence-ratio class
    ("imcoh", "exact"): 1e-4,
    ("imcoh", "bf16"): 2e-2,
}


def _rows():
    with open(ARTIFACT) as f:
        return json.load(f)["rows"]


def test_artifact_covers_the_sweep():
    rows = _rows()
    ns = {r["n"] for r in rows if r["epilogue"] == "power"}
    assert ns == {1024, 2048, 4096, 8192, 16384}
    es = {r["e"] for r in rows if r["epilogue"] == "power"}
    assert es == {16, 40}                      # aligned + ragged/chunked
    precs = {r["precision"] for r in rows if r["epilogue"] == "power"}
    assert precs == {"fast3", "exact", "bf16", "mixed"}
    assert any(r["epilogue"] == "itc" for r in rows)
    assert any(r["epilogue"] == "power_each" for r in rows)
    assert any(r.get("bank") == "complex" for r in rows)   # Twice-mode
    bwd_ns = {r["n"] for r in rows if r["epilogue"] == "backward"}
    assert bwd_ns == {1024, 2048, 8192}        # fused adjoint kernel


def test_compiled_kernel_within_gates():
    for r in _rows():
        if r["epilogue"] == "ssq":
            continue                   # gated by its own invariants below
        gate = GATES[(r["epilogue"], r["precision"])]
        assert r["rel_err"] < gate, r


def test_ssq_kernel_conserves_energy():
    """The fused ssq kernel (r4): cells ON a bisect edge may round to the
    neighboring row (capping raw plane SNR on noisy inputs), but the
    reassignment must conserve power per time column to float32 — and
    the plane SNR still has to clear a sanity bar (measured 63 dB fast3
    on chip)."""
    rows = [r for r in _rows() if r["epilogue"] == "ssq"]
    assert {r["precision"] for r in rows} >= {"exact", "fast3"}
    for r in rows:
        assert r["colsum_rel"] < 1e-4, r
        assert r["snr_db"] >= 40.0, r


def test_accuracy_modes_hit_float32_snr():
    """fast3 must hold >=100 dB SNR on power (measured ~112); exact >=125
    (measured ~136) — the BASELINE 'SNR vs float64 ref' accuracy bar."""
    for r in _rows():
        if r["epilogue"] in ("power", "power_each"):
            if r["precision"] == "fast3":
                assert r["snr_db"] >= 100.0, r
            elif r["precision"] == "exact":
                assert r["snr_db"] >= 125.0, r


def test_mixed_mode_fails_the_float32_gate_on_chip():
    """The documented negative result (ROOFLINE.md): stage-wise precision
    ('mixed') does NOT meet 1e-4 on the compiled kernel."""
    rows = [r for r in _rows()
            if r["precision"] == "mixed" and r["epilogue"] == "power"]
    assert rows and all(r["rel_err"] > 1e-4 for r in rows)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="live check needs a TPU backend")
def test_live_compiled_kernel_one_cell():
    """One live (N=2048, fast3) cell when a TPU is actually the backend."""
    import jax.numpy as jnp
    import ninwavelets_tpu as nw
    from ninwavelets_tpu.ops import fused
    from ninwavelets_tpu.ops.bank import make_fft_bank
    from ninwavelets_tpu.ops.cwt import mean_power

    morse = nw.Morse(1000.0)
    bank = jnp.asarray(np.asarray(make_fft_bank(
        morse._wdef(), jnp.arange(1.0, 101.0), 2048, 1000.0, True),
        np.float32))
    sig = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((16, 4, 2048)).astype(np.float32))
    want = np.asarray(mean_power(sig, bank, interpolate=True))
    got = np.asarray(fused.fused_mean_power(sig, bank, interpolate=True))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4
