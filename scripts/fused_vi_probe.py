"""Round-5 probe (VERDICT r4 item 1): the fused-VI 4-phase Pallas path vs
the XLA path at Nz=32/64/128, 512x256 lat-lon WENO-VI split-explicit f32.

Recorded result (v5e, round 5 — see docs/roofline.md "Round-5 re-probe"):
XLA 31.8/59.2/119.6 ms vs Pallas 50.1/67.5/120.2 ms at Nz=32/64/128 —
the two implementations CONVERGE at depth; ~140 M cu/s is the
formulation's intrinsic cost. The "packed" variant faults the TPU worker
(toolchain kernel fault); keep it off.

Usage: python scripts/fused_vi_probe.py [xla,fused,packed] [32,64,128]
"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from oceananigans_tpu import LatitudeLongitudeGrid
from oceananigans_tpu.advection import WENOVectorInvariant
from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
from oceananigans_tpu.models.free_surfaces import SplitExplicitFreeSurface
from oceananigans_tpu.models.hydrostatic import HydrostaticFreeSurfaceModel
from bench_extra import timed_blocks

rng = np.random.default_rng(0)
nh = 512
variants = sys.argv[1].split(",") if len(sys.argv) > 1 else ["xla", "fused", "packed"]
nzs = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [32, 64, 128]
for nz in nzs:
    for variant in variants:
        kw = {}
        if variant == "fused":
            kw["fused_tendencies"] = True
        elif variant == "packed":
            kw["fused_tendencies"] = "packed"
        try:
            grid = LatitudeLongitudeGrid(size=(nh, nh // 2, nz),
                                         longitude=(0, 60), latitude=(15, 75),
                                         z=(-1800.0, 0.0), dtype=jnp.float32)
            m = HydrostaticFreeSurfaceModel(
                grid=grid, momentum_advection=WENOVectorInvariant(),
                coriolis=HydrostaticSphericalCoriolis(),
                free_surface=SplitExplicitFreeSurface(substeps=30),
                tracers=("T",), **kw)
            m.set(u=0.05 * rng.standard_normal((nh, nh // 2, nz)).astype(np.float32),
                  T=lambda lam, phi, z: 12 + 8e-3 * z + 2e-2 * phi)
            dt = jnp.asarray(120.0, jnp.float32)
            fetch = lambda st: float(jnp.sum(st["fields"]["u"][8, :8]))
            t0 = time.time()
            med, spread, steps, _ = timed_blocks(m._step, m.state, dt, fetch,
                                                 20, blocks=3)
            print(json.dumps({"nz": nz, "variant": variant,
                              "step_ms": round(med * 1e3, 2),
                              "cu_per_s_M": round(nh * (nh // 2) * nz / med / 1e6, 1),
                              "spread_pct": round(spread * 100, 2),
                              "wall_incl_compile_s": round(time.time() - t0, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"nz": nz, "variant": variant,
                              "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
