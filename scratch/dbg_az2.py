import os; os.environ["JAX_PLATFORMS"]="cpu"
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
grid = ConformalCubedSphereGrid((12, 12, 3), z=(-1000.0, 0.0), radius=6.371e6, dtype=jnp.float64)
for p in range(6):
    az = np.asarray(grid.panel_grids[p].Az(("c","c","c")))[..., 0]
    bad = np.argwhere(az < 1e9)
    print("panel", p, "bad cells:", bad.T.tolist(), "H =", grid.H[0], "N =", grid.N[0])
