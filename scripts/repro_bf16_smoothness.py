"""Minimal repro for the bf16-smoothness Pallas lowering crash (VERDICT r3
item 6 / PARITY "Known gaps": WENO_SMOOTHNESS_DTYPE=bfloat16 makes the
fused-advection megakernel kill the remote compile helper —
tpu_compile_helper exit 1 behind an HTTP 500 — so the 12-tracer bf16 lever
was unmeasurable in round 3).

This strips the failure down to one pallas_call: a WENO-5 smoothness body
(factored-square betas + WENO-Z weights) computed in bfloat16 over an f32
slab, with the f32<->bf16 casts in the same positions as
advection/reconstruction.py's ``compute_dtype`` path. Run on the TPU:

    python scripts/repro_bf16_smoothness.py            # bf16 body
    WENO_REPRO_DTYPE=float32 python scripts/repro_bf16_smoothness.py  # control

Prints OK + a checksum, or the compiler exception. If the bf16 variant
crashes while the f32 control compiles, the lowering bug is reproduced
outside this repo's kernels.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

CDT = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
    os.environ.get("WENO_REPRO_DTYPE", "bfloat16")]


def kernel(x_ref, o_ref):
    x = x_ref[:]
    # five "stencil values" via sublane shifts (static slices, like the
    # megakernel's shifted reads)
    def sh(s):
        if s == 0:
            return x
        pad = [(0, 0)] * x.ndim
        if s > 0:
            sl = x[s:]
            pad[0] = (0, s)
        else:
            sl = x[:s]
            pad[0] = (-s, 0)
        return jnp.pad(sl, pad)

    c0, c1, c2, c3, c4 = (sh(-2), sh(-1), x, sh(1), sh(2))
    # smoothness in the compute dtype (reconstruction.py compute_dtype=)
    b = [v.astype(CDT) for v in (c0, c1, c2, c3, c4)]
    eps = jnp.asarray(1e-8, CDT)
    b0 = (13.0 / 12.0) * (b[0] - 2 * b[1] + b[2]) ** 2 \
        + 0.25 * (b[0] - 4 * b[1] + 3 * b[2]) ** 2
    b1 = (13.0 / 12.0) * (b[1] - 2 * b[2] + b[3]) ** 2 \
        + 0.25 * (b[1] - b[3]) ** 2
    b2 = (13.0 / 12.0) * (b[2] - 2 * b[3] + b[4]) ** 2 \
        + 0.25 * (3 * b[2] - 4 * b[3] + b[4]) ** 2
    tau = jnp.abs(b0 - b2)
    # weights back in f32 (the Mosaic approx-reciprocal path is f32-only)
    a0 = 0.1 * (1.0 + (tau / (b0 + eps)).astype(jnp.float32))
    a1 = 0.6 * (1.0 + (tau / (b1 + eps)).astype(jnp.float32))
    a2 = 0.3 * (1.0 + (tau / (b2 + eps)).astype(jnp.float32))
    inv = 1.0 / (a0 + a1 + a2)
    p0 = (2 * c0 - 7 * c1 + 11 * c2) * (1.0 / 6.0)
    p1 = (-c1 + 5 * c2 + 2 * c3) * (1.0 / 6.0)
    p2 = (2 * c2 + 5 * c3 - c4) * (1.0 / 6.0)
    o_ref[:] = (a0 * p0 + a1 * p1 + a2 * p2) * inv


def main():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 256)),
                    jnp.float32)
    run = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    r = run(x)
    print(f"OK dtype={CDT.__name__}: checksum {float(jnp.sum(r)):.6f}")


if __name__ == "__main__":
    main()
