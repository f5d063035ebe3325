"""Measure the VPU's achievable flop rate on the exact WENO-5 weight/select
body (VERDICT r3 item 3: the roofline's "practical ceiling = 50% of FMA peak"
divisor was asserted, not measured — this pins it).

Protocol (why the marginal slope, not a single-body loop): a Pallas kernel
holds one (256, 256) f32 slab in VMEM and runs R fori_loop iterations, each
evaluating K INDEPENDENT WENO-5 reconstruction bodies on values derived from
the carried slab.  A K=1 loop is latency-bound, not throughput-bound — the
~30-op dependency chain over only 64 vregs leaves the VPU pipeline idle, and
a fixed per-iteration overhead (carry handling, loop bookkeeping) of ~16 µs
dominates (measured: K=2 runs in the SAME wall time as K=1; an all-FMA chain
measured 0.34 Tf/s, i.e. the K=1 number is meaningless as a ceiling).  The
throughput the step's megakernels can actually reach is the MARGINAL rate:
fit time(K) over K ∈ {8, 16, 32} and convert the slope (seconds per extra
body) to Tflop/s.  See scripts/vpu_mix_probe.py for the op-class
decomposition that motivated this.

Flop accounting uses the SAME model as roofline.py (f(3) = 87 flops per
reconstruction: 15 stencil mul/adds + 54 smoothness + 18 weights/divisions,
+ 3 derive ops per body here) so the measured Tflop/s drops directly into
docs/roofline.md's ceiling column.

Measured on the tunnel v5e (round 4): marginal WENO-5 mix rate
**2.3 Tflop/s ≈ 30% of the 7.7 Tf/s all-FMA peak** — the assumed 50%
practical ceiling was an overestimate; the flagship step's 1.86 Tf/s is
~80% of the MEASURED mix ceiling (docs/roofline.md).

Usage (TPU):  python scripts/weno_vpu_microbench.py
Prints one JSON line: marginal Tflop/s, the all-FMA peak, and the implied
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
R = int(os.environ.get("WENO_UB_REPS", "200"))
FLOPS_PER_RECON = 87          # roofline.py frecon(3)
DERIVE_FLOPS = 3              # per-body stream-decorrelation ops


def weno5_body(c0, c1, c2, c3, c4, eps):
    """One WENO-5 reconstruction from five cell values (the biased stencil
    (c0..c4), upwinded select elided into the weight math): exactly the
    arithmetic of advection/reconstruction.py's k=3 path — factored-square
    betas, WENO-Z tau, alpha divisions, normalization, candidate stencils."""
    b0 = (13.0 / 12.0) * (c0 - 2.0 * c1 + c2) ** 2 \
        + 0.25 * (c0 - 4.0 * c1 + 3.0 * c2) ** 2
    b1 = (13.0 / 12.0) * (c1 - 2.0 * c2 + c3) ** 2 \
        + 0.25 * (c1 - c3) ** 2
    b2 = (13.0 / 12.0) * (c2 - 2.0 * c3 + c4) ** 2 \
        + 0.25 * (3.0 * c2 - 4.0 * c3 + c4) ** 2
    tau = jnp.abs(b0 - b2)
    a0 = 0.1 * (1.0 + tau / (b0 + eps))
    a1 = 0.6 * (1.0 + tau / (b1 + eps))
    a2 = 0.3 * (1.0 + tau / (b2 + eps))
    inv = 1.0 / (a0 + a1 + a2)
    p0 = (2.0 * c0 - 7.0 * c1 + 11.0 * c2) * (1.0 / 6.0)
    p1 = (-c1 + 5.0 * c2 + 2.0 * c3) * (1.0 / 6.0)
    p2 = (2.0 * c2 + 5.0 * c3 - c4) * (1.0 / 6.0)
    return (a0 * p0 + a1 * p1 + a2 * p2) * inv


def time_for_k(K):
    """Wall time of R loop iterations, each with K independent bodies."""
    def kernel(x_ref, o_ref):
        eps = jnp.float32(1e-8)

        def loop(i, x):
            fi = x + 1e-7 * i.astype(jnp.float32)
            acc = x
            for s in range(K):
                # per-stream decorrelation: cheap in-register variants stand
                # in for shifted reads (the flop mix, not the shuffle, is
                # under test); the fold-back keeps every body live
                f = fi * (1.0 + 1e-4 * s)
                r = weno5_body(f, f * 1.0001, f * 0.9999, f * 1.0002,
                               f * 0.9998, eps)
                acc = acc + 1e-20 * r
            return acc

        o_ref[:] = jax.lax.fori_loop(0, R, loop, x_ref[:])

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
    return (time.perf_counter() - t0) / NCALL


def main():
    ks = (8, 16, 32)
    ts = [time_for_k(k) for k in ks]
    slope = np.polyfit(ks, ts, 1)[0]      # seconds per extra body
    body_flops = SUB * LANE * R * (FLOPS_PER_RECON + DERIVE_FLOPS)
    tf = body_flops / slope / 1e12
    fma_peak = 7.7
    print(json.dumps({
        "metric": "weno5_body_vpu_marginal_tflops",
        "value": tf,
        "unit": "Tflop/s",
        "reps": R,
        "slab": [SUB, LANE],
        "k_points": list(ks),
        "ms_points": [round(t * 1e3, 2) for t in ts],
        "fma_peak_tflops": fma_peak,
        "fraction_of_fma_peak": tf / fma_peak,
    }), flush=True)


if __name__ == "__main__":
    main()
