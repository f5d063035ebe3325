"""Scratch: compare Poisson-transform strategies on the TPU at 256^3."""
import os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = 256
rng = np.random.default_rng(0)
b = jnp.asarray(rng.standard_normal((N, N, N)), jnp.float32)

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.advection import WENO

grid = RectilinearGrid(size=(N, N, N), extent=(1.0, 1.0, 1.0),
                       topology=("periodic", "periodic", "bounded"),
                       dtype=jnp.float32)
model = NonhydrostaticModel(grid=grid, advection=WENO(5))
solver = model.pressure_solver


def timeit(name, fn, *args, steps=20):
    def fetch(o):
        leaf = jax.tree.leaves(o)[0]
        return float(jnp.real(jnp.sum(leaf)).astype(jnp.float32))
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    fetch(out)
    el = (time.perf_counter() - t0) / steps
    print(f"{name:36s} {el*1e3:8.3f} ms")
    return el


timeit("current solver.solve", jax.jit(solver.solve), b)

# raw XLA ffts
def rfft0(x):
    return jnp.moveaxis(jnp.fft.rfft(jnp.moveaxis(x, 0, -1), axis=-1), -1, 0)
def irfft0(x):
    return jnp.moveaxis(jnp.fft.irfft(jnp.moveaxis(x, 0, -1), axis=-1, n=N), -1, 0)
def fft1(x):
    return jnp.swapaxes(jnp.fft.fft(jnp.swapaxes(x, 1, -1), axis=-1), 1, -1)
def ifft1(x):
    return jnp.swapaxes(jnp.fft.ifft(jnp.swapaxes(x, 1, -1), axis=-1), 1, -1)
timeit("jnp.fft.rfft axis0 (via transpose)", jax.jit(rfft0), b)
timeit("rfft0+fft1 fwd+inv", jax.jit(lambda x: irfft0(ifft1(fft1(rfft0(x))))), b)

# matmul DFT along axis 0: real input -> cos/sin halves
k = np.arange(N // 2 + 1)[:, None] * np.arange(N)[None, :]
C = np.cos(2 * np.pi * k / N).astype(np.float32)
S = np.sin(2 * np.pi * k / N).astype(np.float32)
Cj, Sj = jnp.asarray(C), jnp.asarray(S)

def rdft0_mm(x):
    re = jnp.einsum("kn,nij->kij", Cj, x)
    im = -jnp.einsum("kn,nij->kij", Sj, x)
    return re, im

timeit("matmul rDFT axis0 (cos+sin)", jax.jit(rdft0_mm), b)

# complex DFT along axis 1 applied to (half+1, N, N) complex pair via 4 real matmuls
kf = np.arange(N)[:, None] * np.arange(N)[None, :]
Cf = np.cos(2 * np.pi * kf / N).astype(np.float32)
Sf = np.sin(2 * np.pi * kf / N).astype(np.float32)
Cfj, Sfj = jnp.asarray(Cf), jnp.asarray(Sf)

def cdft1_mm(re, im):
    re2 = jnp.einsum("kn,inj->ikj", Cfj, re) + jnp.einsum("kn,inj->ikj", Sfj, im)
    im2 = jnp.einsum("kn,inj->ikj", Cfj, im) - jnp.einsum("kn,inj->ikj", Sfj, re)
    return re2, im2

re, im = rdft0_mm(b)
timeit("matmul cDFT axis1 (4 matmuls)", jax.jit(cdft1_mm), re, im)

# full matmul path: rdft0 + cdft1 + divide + inverse both (~ 3x fwd cost)
lam = jnp.asarray(rng.standard_normal((N // 2 + 1, N, 1)), jnp.float32) - 10.0

def full_mm(x):
    re, im = rdft0_mm(x)
    re, im = cdft1_mm(re, im)
    re, im = re / lam, im / lam
    # inverse y: conj trick with transposed matrices (einsum back)
    re2 = jnp.einsum("kn,ikj->inj", Cfj, re) - jnp.einsum("kn,ikj->inj", Sfj, im)
    im2 = jnp.einsum("kn,ikj->inj", Cfj, im) + jnp.einsum("kn,ikj->inj", Sfj, re)
    re2, im2 = re2 / N, im2 / N
    # inverse rdft axis0: x = C^T re - S^T im with half-spectrum weights
    w = np.full(N // 2 + 1, 2.0, np.float32); w[0] = 1.0; w[-1] = 1.0
    wj = jnp.asarray(w)[:, None, None]
    out = (jnp.einsum("kn,kij->nij", Cj, wj * re2)
           - jnp.einsum("kn,kij->nij", Sj, wj * im2)) / N
    return out

timeit("full matmul poisson (x,y) path", jax.jit(full_mm), b)

# Thomas solve along z via associative scan (for Fourier-tridiagonal)
lo = jnp.ones((N,), jnp.float32)
dg = -4.0 + jnp.asarray(rng.standard_normal((N,)), jnp.float32) * 0.1

def thomas_scan(rhs):
    # batched symmetric tridiagonal solve along axis 2, coefficients 1D
    # forward sweep via associative scan of 2x2 Mobius transforms
    a = jnp.broadcast_to(lo[None, None, :], rhs.shape)
    d = jnp.broadcast_to(dg[None, None, :], rhs.shape)

    def fwd(carry, x):
        cp, dp = carry
        ai, di, bi = x
        m = 1.0 / (di - ai * cp)
        return (m, (bi - ai * dp) * m)

    # simple lax.scan along z (moves axis to front)
    rt = jnp.moveaxis(rhs, 2, 0)
    at = jnp.ones_like(rt)
    dt_ = jnp.broadcast_to(dg[:, None, None], rt.shape)

    def step(carry, x):
        cp, dp = carry
        ai, di, bi = x
        m = 1.0 / (di - ai * cp)
        cpn = m  # c_i assumed 1
        dpn = (bi - ai * dp) * m
        return (cpn, dpn), (cpn, dpn)

    init = (jnp.zeros_like(rt[0]), jnp.zeros_like(rt[0]))
    _, (cs, ds) = jax.lax.scan(step, init, (at, dt_, rt))

    def back(carry, x):
        cn, dn = x
        xi = dn - cn * carry
        return xi, xi

    _, xs = jax.lax.scan(back, jnp.zeros_like(rt[0]), (cs, ds), reverse=True)
    return jnp.moveaxis(xs, 0, 2)

timeit("thomas lax.scan along z", jax.jit(thomas_scan), b)
