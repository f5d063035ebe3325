import sys, os; os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu'); jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.advection.schemes import WENO, TAU_COEFFS, WENO_EPSILON
from oceananigans_tpu.advection.reconstruction import (left_shifts, mirror,
    smoothness_value, stencil_value, _ShiftCache)
dU = jnp.asarray(np.load("/tmp/dU.npy"))
dV = jnp.asarray(np.load("/tmp/dV.npy"))
u = jnp.asarray(np.load("/tmp/u.npy"))
ds = WENO(5)
i, j, kk = 10, 11, 1
# replicate _biased side="right" with smooth=[dU+dV]
sc = _ShiftCache(dU, 0, None)
scm = _ShiftCache(dU + dV, 0, None)
k = 3
ps, betas = [], []
for s in range(k):
    shifts = mirror(left_shifts(k, s, 0), 0)
    ps.append(stencil_value(sc, shifts, ds._coeffs[s]))
    b = smoothness_value(scm, shifts, ds._sfactors[s], compute_dtype=jnp.float32)
    betas.append(b)
    print("s", s, "shifts", shifts, "p", float(np.asarray(ps[s])[i,j,kk]),
          "beta32", float(np.asarray(b)[i,j,kk]))
tau = None
for t, b in zip(TAU_COEFFS[k], betas):
    if t == 0: continue
    term = t * b
    tau = term if tau is None else tau + term
tau = jnp.abs(tau)
print("tau", float(np.asarray(tau)[i,j,kk]), "dtype", tau.dtype)
num = den = None
for s in range(k):
    eps = jnp.asarray(WENO_EPSILON, betas[s].dtype)
    r = tau / (betas[s] + eps)
    alpha = (ds._gammas[s] * (1.0 + r * r)).astype(jnp.float64)
    print("s", s, "r", float(np.asarray(r)[i,j,kk]), "alpha", float(np.asarray(alpha)[i,j,kk]))
    num = alpha * ps[s] if num is None else num + alpha * ps[s]
    den = alpha if den is None else den + alpha
print("num", float(np.asarray(num)[i,j,kk]), "den", float(np.asarray(den)[i,j,kk]))
