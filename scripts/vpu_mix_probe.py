"""Decompose the WENO-body VPU rate (scripts/weno_vpu_microbench.py) into
its op-class components: an all-FMA chain (validates the 7.7 Tf/s peak), the
WENO body with divisions replaced by multiplies (the "divisionless mix"),
and the true body (with its 4 divides / reconstruction).  Each variant runs
the same VMEM-resident slab protocol; flop accounting matches roofline.py.

Usage (TPU): python scripts/vpu_mix_probe.py
Prints one JSON line per variant.
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

SUB, LANE = 256, 256
R = int(os.environ.get("WENO_UB_REPS", "2000"))


def fma_chain(c0, c1, c2, c3, c4, eps):
    """16 dependent FMAs per element per iteration (2 flops each)."""
    r = c0
    for _ in range(4):
        r = r * c1 + c2
        r = r * c3 + c4
        r = r * c1 + c0
        r = r * c2 + c3
    return r


FMA_CHAIN_FLOPS = 32


def weno_nodiv(c0, c1, c2, c3, c4, eps):
    """The WENO-5 body with every divide replaced by a multiply — same op
    count as the real body under roofline accounting (87 flops)."""
    b0 = (13.0 / 12.0) * (c0 - 2.0 * c1 + c2) ** 2 \
        + 0.25 * (c0 - 4.0 * c1 + 3.0 * c2) ** 2
    b1 = (13.0 / 12.0) * (c1 - 2.0 * c2 + c3) ** 2 \
        + 0.25 * (c1 - c3) ** 2
    b2 = (13.0 / 12.0) * (c2 - 2.0 * c3 + c4) ** 2 \
        + 0.25 * (3.0 * c2 - 4.0 * c3 + c4) ** 2
    tau = jnp.abs(b0 - b2)
    a0 = 0.1 * (1.0 + tau * (b0 + eps))
    a1 = 0.6 * (1.0 + tau * (b1 + eps))
    a2 = 0.3 * (1.0 + tau * (b2 + eps))
    inv = 1e-6 * (a0 + a1 + a2)
    p0 = (2.0 * c0 - 7.0 * c1 + 11.0 * c2) * (1.0 / 6.0)
    p1 = (-c1 + 5.0 * c2 + 2.0 * c3) * (1.0 / 6.0)
    p2 = (2.0 * c2 + 5.0 * c3 - c4) * (1.0 / 6.0)
    return (a0 * p0 + a1 * p1 + a2 * p2) * inv


def weno_true(c0, c1, c2, c3, c4, eps):
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


def weno_recip(c0, c1, c2, c3, c4, eps):
    """True body with x/y rewritten as x * approx-free full reciprocal via
    jax.lax.reciprocal (lets Mosaic pick its own lowering)."""
    b0 = (13.0 / 12.0) * (c0 - 2.0 * c1 + c2) ** 2 \
        + 0.25 * (c0 - 4.0 * c1 + 3.0 * c2) ** 2
    b1 = (13.0 / 12.0) * (c1 - 2.0 * c2 + c3) ** 2 \
        + 0.25 * (c1 - c3) ** 2
    b2 = (13.0 / 12.0) * (c2 - 2.0 * c3 + c4) ** 2 \
        + 0.25 * (3.0 * c2 - 4.0 * c3 + c4) ** 2
    tau = jnp.abs(b0 - b2)
    a0 = 0.1 * (1.0 + tau * jax.lax.reciprocal(b0 + eps))
    a1 = 0.6 * (1.0 + tau * jax.lax.reciprocal(b1 + eps))
    a2 = 0.3 * (1.0 + tau * jax.lax.reciprocal(b2 + eps))
    inv = jax.lax.reciprocal(a0 + a1 + a2)
    p0 = (2.0 * c0 - 7.0 * c1 + 11.0 * c2) * (1.0 / 6.0)
    p1 = (-c1 + 5.0 * c2 + 2.0 * c3) * (1.0 / 6.0)
    p2 = (2.0 * c2 + 5.0 * c3 - c4) * (1.0 / 6.0)
    return (a0 * p0 + a1 * p1 + a2 * p2) * inv


def measure(body, flops_per_iter, name):
    def kernel(x_ref, o_ref):
        eps = jnp.float32(1e-8)

        def loop(i, x):
            fi = x * (1.0 + 1e-7 * i.astype(jnp.float32))
            r = body(fi, fi * 1.0001, fi * 0.9999, fi * 1.0002,
                     fi * 0.9998, eps)
            return x + 1e-20 * r

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
    float(jnp.sum(r))
    t0 = time.perf_counter()
    NCALL = 5
    for _ in range(NCALL):
        r = run(x)
    float(jnp.sum(r))
    el = (time.perf_counter() - t0) / NCALL
    flops = SUB * LANE * R * (flops_per_iter + 7)
    tf = flops / el / 1e12
    print(json.dumps({"variant": name, "tflops": round(tf, 3),
                      "fraction_of_fma_peak": round(tf / 7.7, 3)}),
          flush=True)
    return tf


def main():
    measure(fma_chain, FMA_CHAIN_FLOPS, "fma_chain")
    measure(weno_nodiv, 87, "weno_nodiv")
    measure(weno_recip, 87, "weno_reciprocal")
    measure(weno_true, 87, "weno_true")


if __name__ == "__main__":
    main()
