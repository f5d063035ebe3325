"""Global hydrostatic dynamics on the conformal cubed sphere.

A Williamson-TC2-style balanced zonal jet with a mid-depth buoyancy anomaly
on the 6-panel conformal cubed sphere — the polar-singularity-free global
configuration (reference analogue: HydrostaticFreeSurfaceModel on a
MultiRegion ConformalCubedSphereGrid).

Run: python examples/global_cubed_sphere_ocean.py  [N] [hours]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
from oceananigans_tpu.models import CubedSphereHydrostaticModel

def main(N=24, nz=6, hours=24.0, out=None):
    R, OMEGA, G, H0, U = 6.371e6, 7.292e-5, 9.81, 2000.0, 25.0

    grid = ConformalCubedSphereGrid((N, N, nz), z=(-H0, 0.0), radius=R,
                                    dtype=jnp.float64
                                    if jax.default_backend() == "cpu"
                                    else jnp.float32)
    model = CubedSphereHydrostaticModel(grid, tracers=("b", "c"),
                                        rotation_rate=OMEGA, gravity=G)

    # balanced barotropic jet + geostrophic surface displacement
    model.set_geographic(u_east=lambda lam, phi: U * np.cos(phi),
                         v_north=lambda lam, phi: 0.0 * lam)
    model.set(eta=lambda lam, phi: -(R * OMEGA * U + 0.5 * U * U)
              * np.sin(phi) ** 2 / G,
              # stratification + a mid-depth warm anomaly straddling a panel edge
              b=lambda lam, phi, z: 1e-5 * z + 2e-4
              * np.exp(-((lam - np.pi / 4) ** 2 + phi ** 2) / 0.1)
              * np.exp(-((z + H0 / 2) / (H0 / 4)) ** 2),
              # passive tracer blob for transport visualization
              c=lambda lam, phi, z: np.exp(-((lam + np.pi / 2) ** 2
                                             + phi ** 2) / 0.15))

    # gravity-wave-limited explicit step
    dx_min = 2 * np.pi * R / (4 * N) * 0.6
    dt = 0.4 * dx_min / np.sqrt(G * H0)
    steps = max(2, int(hours * 3600 / dt))
    c0 = model.total_tracer("c")
    print(f"cubed-sphere ocean: 6x{N}x{N}x6 cells, dt = {dt:.0f} s, "
          f"{steps} steps")

    for k in range(steps):
        model.time_step(dt)
        if (k + 1) % max(1, steps // 10) == 0:
            u = np.asarray(model.state["u"])
            print(f"t = {model.time / 3600:6.1f} h  |u|max = {np.abs(u).max():.3f}"
                  f"  mass drift = {abs(model.total_tracer('c') - c0) / c0:.2e}")

    if out is None:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "global_cubed_sphere_ocean_out")
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, "c_final.npy"), np.asarray(model.state["c"]))
    np.save(os.path.join(out, "eta_final.npy"), np.asarray(model.state["eta"]))
    print("saved final tracer/eta panel arrays to", out)


if __name__ == "__main__":
    main(N=int(sys.argv[1]) if len(sys.argv) > 1 else 24,
         hours=float(sys.argv[2]) if len(sys.argv) > 2 else 24.0)
