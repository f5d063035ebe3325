import os; os.environ["JAX_PLATFORMS"]="cpu"
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
grid = ConformalCubedSphereGrid((12, 12, 3), z=(-1000.0, 0.0), radius=6.371e6, dtype=jnp.float64)
g = grid.panel_grids[0]
for loc in (("c","c","c"), ("f","c","c"), ("c","f","c")):
    az = np.asarray(g.Az(loc))[..., 0]
    print(loc, "Az min/max", az.min(), az.max(), "neg:", (az<=0).sum())
    # corner square values
    H = grid.H[0]; N = grid.N[0]
    cs = az[:H, :H]
    print("  corner square min/max", cs.min(), cs.max())
dx = np.asarray(g.dx(("f","c","c")))[...,0]
print("dx min", dx.min(), "max", dx.max(), "corner", dx[:3,:3].min())
