"""Measure the VPU's achievable flop rate on the exact WENO-5 weight/select
body (VERDICT r3 item 3: the roofline's "practical ceiling = 50% of FMA peak"
divisor was asserted, not measured — this pins it).

A Pallas kernel holds one (256, 256) f32 slab in VMEM and runs R iterations
of the WENO-5 reconstruction arithmetic on values derived from the slab —
the same op mix the step's advection kernels execute (factored-square
smoothness indicators, WENO-Z tau, 3 divisions for the alpha weights + 1
normalization, candidate stencils, upwind select), with NO memory traffic
inside the loop (shifted reads replaced by cheap in-register variants: the
flop mix, not the shuffle, is under test). The loop carries the result back
into the next iteration so nothing hoists.

Flop accounting uses the SAME model as roofline.py (f(3) = 87 flops per
reconstruction: 15 stencil mul/adds + 54 smoothness + 18 weights/divisions)
so the measured Tflop/s drops directly into docs/roofline.md's ceiling
column.

Usage (TPU):  python scripts/weno_vpu_microbench.py
Prints one JSON line: measured Tflop/s, the all-FMA peak, and the implied
practical-ceiling fraction.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

SUB, LANE = 256, 256          # VMEM-resident slab (0.25 MB)
R = int(os.environ.get("WENO_UB_REPS", "2000"))
FLOPS_PER_RECON = 87          # roofline.py frecon(3)


def weno5_body(c0, c1, c2, c3, c4, eps):
    """One WENO-5 reconstruction from five cell values (the biased stencil
    (c0..c4), upwinded select elided into the weight math): exactly the
    arithmetic of advection/reconstruction.py's k=3 path — factored-square
    betas, WENO-Z tau, alpha divisions, normalization, candidate stencils."""
    # smoothness indicators (Jiang-Shu, factored form): 3 x (2 squares + axb)
    b0 = (13.0 / 12.0) * (c0 - 2.0 * c1 + c2) ** 2 \
        + 0.25 * (c0 - 4.0 * c1 + 3.0 * c2) ** 2
    b1 = (13.0 / 12.0) * (c1 - 2.0 * c2 + c3) ** 2 \
        + 0.25 * (c1 - c3) ** 2
    b2 = (13.0 / 12.0) * (c2 - 2.0 * c3 + c4) ** 2 \
        + 0.25 * (3.0 * c2 - 4.0 * c3 + c4) ** 2
    # WENO-Z weights: tau + 3 divisions + normalization division
    tau = jnp.abs(b0 - b2)
    a0 = 0.1 * (1.0 + tau / (b0 + eps))
    a1 = 0.6 * (1.0 + tau / (b1 + eps))
    a2 = 0.3 * (1.0 + tau / (b2 + eps))
    inv = 1.0 / (a0 + a1 + a2)
    # candidate stencils
    p0 = (2.0 * c0 - 7.0 * c1 + 11.0 * c2) * (1.0 / 6.0)
    p1 = (-c1 + 5.0 * c2 + 2.0 * c3) * (1.0 / 6.0)
    p2 = (2.0 * c2 + 5.0 * c3 - c4) * (1.0 / 6.0)
    return (a0 * p0 + a1 * p1 + a2 * p2) * inv


def kernel(x_ref, o_ref):
    eps = jnp.float32(1e-8)

    def body(i, x):
        # derive 5 "stencil values" from the carried slab with cheap
        # in-register variants (multiplies stand in for shifted reads; the
        # arithmetic under test is the reconstruction body)
        fi = x * (1.0 + 1e-7 * i.astype(jnp.float32))
        c0 = fi
        c1 = fi * 1.0001
        c2 = fi * 0.9999
        c3 = fi * 1.0002
        c4 = fi * 0.9998
        r = weno5_body(c0, c1, c2, c3, c4, eps)
        # fold the result back so no iteration can be hoisted or elided
        return x + 1e-20 * r

    o_ref[:] = jax.lax.fori_loop(0, R, body, x_ref[:])


def main():
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(SUB, LANE)), jnp.float32)
    run = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    r = run(x)
    float(jnp.sum(r))                     # compile + settle
    t0 = time.perf_counter()
    NCALL = 5
    for _ in range(NCALL):
        r = run(x)
    float(jnp.sum(r))
    el = (time.perf_counter() - t0) / NCALL
    elems = SUB * LANE * R
    # per iteration: the 87-flop reconstruction body + ~7 derive/carry ops
    flops = elems * (FLOPS_PER_RECON + 7)
    tf = flops / el / 1e12
    fma_peak = 7.7
    print(json.dumps({
        "metric": "weno5_body_vpu_tflops",
        "value": tf,
        "unit": "Tflop/s",
        "reps": R,
        "slab": [SUB, LANE],
        "fma_peak_tflops": fma_peak,
        "fraction_of_fma_peak": tf / fma_peak,
    }), flush=True)


if __name__ == "__main__":
    main()
