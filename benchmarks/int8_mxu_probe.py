"""Probe: int8 vs bf16 MXU matmul rate on the local chip (ROOFLINE item 1).

Measures R data-dependent-chained (M,M)@(M,M) dot_generals inside ONE
compiled program and fetches a scalar checksum.  Two axon-tunnel pitfalls
this layout avoids (both produced impossible >10 PFLOP/s readings):

* ``block_until_ready`` on this experimental PJRT plugin does not reliably
  wait for device completion of a plain matmul — fetch a host scalar
  instead.
* back-to-back independent calls / fori_loop bodies with loop-invariant
  operands get collapsed; the scan carries the previous product into the
  next multiply so every pass must execute.

Measured 2026-08-17 (TPU v5 lite, axon):
    bfloat16   97.8 TFLOP/s
    int8      144.3 TOP/s        -> int8/bf16 = 1.48x (NOT the 2x of the
    float32    94.0 TFLOP/s         394-TOPS spec-sheet ratio)

Run FOREGROUND on the real chip: python benchmarks/int8_mxu_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

R = 8
M = 8192


def run(dtype, acc):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (M, M), dtype=np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (M, M), dtype=np.int8))
    else:
        a = jnp.asarray(rng.standard_normal((M, M)), dtype=dtype)
        b = jnp.asarray(rng.standard_normal((M, M)) * 1e-2, dtype=dtype)

    def prog(a, b):
        def body(c, _):
            d = lax.dot_general(c, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=acc)
            return d.astype(dtype), jnp.float32(d[0, 0])
        _, outs = lax.scan(body, a, None, length=R)
        return outs.sum()

    f = jax.jit(prog)
    float(f(a, b))                                  # warm / compile
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(f(a, b))
    dt = (time.perf_counter() - t0) / iters
    fl = 2.0 * M * M * M * R
    print(f"{jnp.dtype(dtype).name:9s} {dt * 1e3:9.2f} ms  "
          f"{fl / dt / 1e12:6.1f} T(FL)OP/s  (checksum {s:.3g})")
    return fl / dt


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    bf = run(jnp.bfloat16, jnp.float32)
    i8 = run(jnp.int8, jnp.int32)
    print(f"int8 / bf16 rate: {i8 / bf:.2f}x")
    run(jnp.float32, jnp.float32)
