import os, sys; os.environ["JAX_PLATFORMS"]="cpu"
sys.path.insert(0, "/root/repo")
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
grid = ConformalCubedSphereGrid((8, 8, 8), z=(-3000.0, 0.0), radius=6.371e6,
                                halo=4, dtype=jnp.float64)
g = grid.panel_grids[0]
for name, fn in (("dx", g.dx), ("dy", g.dy), ("Az", g.Az)):
    for lx in "cf":
        for ly in "cf":
            t = np.asarray(fn((lx, ly, "c")))[..., 0]
            r = t.min() / t.max()
            if r < 1e-3:
                bad = np.argwhere(t < 1e-3 * t.max())
                print(name, (lx, ly), "min/max ratio", f"{r:.2e}", "bad slots", bad.T.tolist())
            else:
                print(name, (lx, ly), "min/max ratio", f"{r:.2e}")
