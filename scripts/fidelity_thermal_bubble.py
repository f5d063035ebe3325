"""Cross-implementation fidelity case: the reference's thermal-bubble
regression config (test/regression_tests/thermal_bubble_regression_test.jl:
1-50), run here in float64. See FIDELITY.md for the full protocol.

Usage:
    python scripts/fidelity_thermal_bubble.py              # run + save ours
    python scripts/fidelity_thermal_bubble.py compare F    # diff vs F (.npz
                                                           # or NetCDF with
                                                           # u,v,w,T,S)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "fidelity_thermal_bubble_ours.npz")


def run():
    from oceananigans_tpu import RectilinearGrid
    from oceananigans_tpu.buoyancy import SeawaterBuoyancy
    from oceananigans_tpu.closures import ScalarDiffusivity
    from oceananigans_tpu.coriolis import FPlane
    from oceananigans_tpu.models import NonhydrostaticModel

    N, L = 16, 100.0
    grid = RectilinearGrid(size=(N, N, N), extent=(L, L, L))
    model = NonhydrostaticModel(
        grid=grid, closure=ScalarDiffusivity(nu=4e-2, kappa=4e-2),
        timestepper="QuasiAdamsBashforth2", coriolis=FPlane(f=1e-4),
        buoyancy=SeawaterBuoyancy(), tracers=("T", "S"))

    T = np.full((N, N, N), 9.85)
    # cube anomaly over the middle 50% (reference: i1:i2 = N/4:3N/4, 1-based
    # inclusive -> 0-based slice [N/4-1 : 3N/4])
    i1, i2 = round(N / 4), round(3 * N / 4)
    T[i1 - 1:i2, i1 - 1:i2, i1 - 1:i2] += 0.01
    model.set(T=T, S=35.0)
    for _ in range(10):
        model.time_step(6.0)

    fields = {n: np.asarray(model.field(n).interior)
              for n in ("u", "v", "w", "T", "S")}
    np.savez(OUT, **fields)
    print("saved", OUT)
    for n, a in fields.items():
        print(f"  {n}: min {a.min():+.9e}  max {a.max():+.9e}")


def compare(path):
    ours = np.load(OUT)
    if path.endswith(".nc"):
        from scipy.io import netcdf_file
        f = netcdf_file(path, "r")
        ref = {n: np.asarray(f.variables[n][:]) for n in
               ("u", "v", "w", "T", "S")}
    else:
        ref = dict(np.load(path))
    for n in ("u", "v", "w", "T", "S"):
        a, b = np.asarray(ours[n]), np.asarray(ref[n]).reshape(ours[n].shape)
        scale = max(np.abs(b).max(), 1e-30)
        print(f"{n}: max abs diff {np.abs(a - b).max():.3e}  "
              f"relative {np.abs(a - b).max() / scale:.3e}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "compare":
        compare(sys.argv[2])
    else:
        run()
