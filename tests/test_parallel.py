"""Distributed/sharding tests on the 8-device virtual CPU mesh (the TPU
analogue of the reference's 4-rank MPI tests — SURVEY.md §4.5: halo views
equal neighbor interiors; sharded run matches serial run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from oceananigans_tpu import RectilinearGrid
from oceananigans_tpu.advection import WENO
from oceananigans_tpu.models import NonhydrostaticModel
from oceananigans_tpu.parallel import (Distributed, DistributedFFTPoissonSolver,
                                       Partition, make_halo_exchange)
from oceananigans_tpu.solvers.fft_poisson import FFTPoissonSolver

pytestmark = pytest.mark.slow  # full-tier study/equivalence battery (see README testing tiers)


def need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_shard_map_halo_exchange_matches_periodic_wrap():
    need_devices(4)
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    h = 2
    nlx, nly = 8, 8       # local interior per shard
    rng = np.random.default_rng(0)
    # global interior field (16, 16, 4), laid out as per-shard padded blocks
    glob = rng.normal(size=(16, 16, 4))
    blocks = np.zeros((2, 2, nlx + 2 * h, nly + 2 * h, 4))
    for i in range(2):
        for j in range(2):
            blocks[i, j, h:h + nlx, h:h + nly] = glob[
                i * nlx:(i + 1) * nlx, j * nly:(j + 1) * nly]
    # stack into the sharded global layout: (2*nlx+4h, 2*nly+4h, 4)
    stacked = np.concatenate(
        [np.concatenate([blocks[i, j] for j in range(2)], axis=1)
         for i in range(2)], axis=0)
    a = jnp.asarray(stacked)

    ex = make_halo_exchange(mesh, (h, h, 0), (nlx, nly, 4))
    out = np.asarray(ex(a))

    # each shard's halos must equal the periodic-neighbor interior
    for i in range(2):
        for j in range(2):
            blk = out[i * (nlx + 2 * h):(i + 1) * (nlx + 2 * h),
                      j * (nly + 2 * h):(j + 1) * (nly + 2 * h)]
            gi, gj = i * nlx, j * nly
            # left halo in x = neighbor interior (wrapped)
            expect = glob[(gi - h) % 16:(gi - h) % 16 + h,
                          gj:gj + nly]
            assert np.allclose(blk[0:h, h:h + nly], expect)
            # corner: left-bottom corner = diagonal neighbor
            expect_c = glob[(gi - h) % 16:(gi - h) % 16 + h,
                            (gj - h) % 16:(gj - h) % 16 + h]
            assert np.allclose(blk[0:h, 0:h], expect_c)


def test_sharded_step_matches_serial():
    need_devices(8)
    arch = Distributed(Partition(x=2, y=4))
    # padded shape (10+6)=16 divides (2, 4)
    grid = RectilinearGrid(size=(10, 10, 10), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "periodic"))
    arch.validate_grid(grid)

    def build():
        # fused_advection=False exercises the pure-GSPMD XLA advection path
        # (the shard_map-wrapped megakernel is covered by
        # test_sharded_fused_advection_matches_serial)
        m = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                fused_advection=False)
        rng = np.random.default_rng(1)
        m.set(u=0.1 * rng.standard_normal((10, 10, 10)),
              v=0.1 * rng.standard_normal((10, 10, 10)))
        return m

    m_serial = build()
    m_shard = build()
    m_shard.state = arch.shard(m_shard.state)

    for _ in range(2):
        m_serial.time_step(1e-3)
        m_shard.time_step(1e-3)

    u1 = np.asarray(m_serial.state["fields"]["u"])
    u2 = np.asarray(m_shard.state["fields"]["u"])
    assert np.allclose(u1, u2, atol=1e-11), np.abs(u1 - u2).max()


def test_distributed_pencil_fft_matches_serial():
    need_devices(4)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "periodic"))
    rng = np.random.default_rng(2)
    b = rng.normal(size=(16, 16, 8))
    b -= b.mean()
    b = jnp.asarray(b)
    serial = np.asarray(FFTPoissonSolver(grid).solve(b))
    dist = np.asarray(DistributedFFTPoissonSolver(grid, mesh).solve(b))
    assert np.allclose(serial, dist, atol=1e-10), np.abs(serial - dist).max()


def test_sharded_immersed_step_matches_serial():
    """Distributed immersed boundaries (reference: the distributed active
    map in src/DistributedComputations + ImmersedBoundaries): immersed masks
    are dense global arrays in this design, so the GSPMD-sharded step must
    match serial bitwise-close with no special casing."""
    need_devices(8)
    from oceananigans_tpu.immersed import GridFittedBottom, ImmersedBoundaryGrid

    arch = Distributed(Partition(x=2, y=4))
    base = RectilinearGrid(size=(10, 10, 10), extent=(1, 1, 1),
                           topology=("periodic", "periodic", "bounded"))
    grid = ImmersedBoundaryGrid(base, GridFittedBottom(
        lambda x, y: -0.8 + 0.3 * np.sin(2 * np.pi * x)))
    arch.validate_grid(base)

    def build():
        m = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                fused_advection=False)
        rng = np.random.default_rng(7)
        m.set(u=0.1 * rng.standard_normal((10, 10, 10)),
              v=0.1 * rng.standard_normal((10, 10, 10)))
        return m

    m_serial = build()
    m_shard = build()
    m_shard.state = arch.shard(m_shard.state)
    for _ in range(2):
        m_serial.time_step(1e-3)
        m_shard.time_step(1e-3)
    u1 = np.asarray(m_serial.state["fields"]["u"])
    u2 = np.asarray(m_shard.state["fields"]["u"])
    assert np.allclose(u1, u2, atol=1e-10), np.abs(u1 - u2).max()


def test_partition_validation():
    arch = Distributed(Partition(x=2, y=2), devices=jax.devices()[:4])
    bad = RectilinearGrid(size=(9, 9, 4), extent=(1, 1, 1))
    with pytest.raises(ValueError):
        arch.validate_grid(bad)


def test_distributed_pencil_bounded_and_stretched_z():
    """Pencil solver with bounded-z DCT and stretched-z tridiagonal paths
    (reference: distributed_fft_tridiagonal_solver.jl): the 8-device sharded
    solve matches the serial solver."""
    import jax
    from jax.sharding import Mesh
    from oceananigans_tpu.solvers.fft_poisson import FFTPoissonSolver
    from oceananigans_tpu.solvers.fourier_tridiagonal import (
        FourierTridiagonalPoissonSolver)

    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    rng = np.random.default_rng(9)

    # bounded regular z -> local DCT pencil path
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    b = rng.standard_normal(grid.N)
    b -= b.mean()
    serial = np.asarray(FFTPoissonSolver(grid).solve(jnp.asarray(b)))
    dist = np.asarray(DistributedFFTPoissonSolver(grid, mesh).solve(
        jnp.asarray(b)))
    assert np.abs(dist - serial).max() < 1e-8

    # stretched z -> local tridiagonal pencil path
    zf = -1.0 + np.linspace(0, 1, 9) ** 1.5
    sgrid = RectilinearGrid(size=(16, 16, 8), x=(0, 1), y=(0, 1), z=zf,
                            topology=("periodic", "periodic", "bounded"))
    b2 = rng.standard_normal(sgrid.N)
    b2 -= b2.mean()
    serial2 = np.asarray(FourierTridiagonalPoissonSolver(sgrid).solve(
        jnp.asarray(b2)))
    dist2 = np.asarray(DistributedFFTPoissonSolver(sgrid, mesh).solve(
        jnp.asarray(b2)))
    # solutions are defined up to a constant on the singular mode
    dist2 = dist2 - dist2.mean()
    serial2 = serial2 - serial2.mean()
    assert np.abs(dist2 - serial2).max() < 1e-8


def test_sharded_fused_advection_matches_serial():
    """The shard_map-wrapped Pallas megakernel (per-shard blocks + ppermute
    halo strips) matches the serial fused model."""
    need_devices(8)
    arch = Distributed(Partition(x=2, y=4))
    grid = RectilinearGrid(size=(16, 16, 128), extent=(1, 1, 1))
    rng = np.random.default_rng(3)
    u0 = 0.1 * rng.standard_normal((16, 16, 128))
    v0 = 0.1 * rng.standard_normal((16, 16, 128))

    m_serial = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                   fused_advection=True, z_compact=True)
    m_serial.set(u=u0, v=v0)
    m_shard = NonhydrostaticModel(grid=grid, advection=WENO(5),
                                  fused_advection=True, z_compact=True,
                                  architecture=arch)
    assert m_shard._fused_advection is not None
    assert m_shard._fused_update is None      # sharded path uses plain RK3
    m_shard.set(u=u0, v=v0)
    m_shard.state = arch.shard(m_shard.state)
    for _ in range(2):
        m_serial.time_step(1e-3)
        m_shard.time_step(1e-3)
    for n in ("u", "v", "w"):
        a = np.asarray(m_serial.state["fields"][n])
        b = np.asarray(m_shard.state["fields"][n])
        sl = m_serial.grid.interior_slices
        assert np.abs(a[sl] - b[sl]).max() < 1e-9, n


def test_sharded_hydrostatic_matches_serial():
    """Distributed hydrostatic equivalence (VERDICT r1 weak item 9): a
    split-explicit WENO-VI step under GSPMD sharding matches the serial
    run."""
    need_devices(8)
    from jax.sharding import NamedSharding
    from oceananigans_tpu.advection.vector_invariant import (
        WENOVectorInvariant)
    from oceananigans_tpu.coriolis import FPlane
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
    # padded extents (16+8, 16+16) divide the (2, 4) mesh
    grid = RectilinearGrid(size=(16, 16, 4), x=(0, 1e5), y=(0, 1e5),
                           z=(-100.0, 0.0),
                           topology=("periodic", "periodic", "bounded"))

    def build():
        m = HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=WENOVectorInvariant(order=5),
            coriolis=FPlane(1e-4), tracers=("T",),
            free_surface=SplitExplicitFreeSurface(substeps=8))
        rng = np.random.default_rng(3)
        m.set(u=0.1 * rng.standard_normal((16, 16, 4)),
              v=0.1 * rng.standard_normal((16, 16, 4)),
              T=lambda x, y, z: 10 + 1e-3 * z,
              eta=lambda x, y, z: 0.01 * jnp.sin(2 * jnp.pi * x / 1e5))
        return m

    m_serial = build()
    m_shard = build()

    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 3:
            return jax.device_put(leaf, NamedSharding(mesh, P("x", "y",
                                                              None)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    m_shard.state = jax.tree.map(shard, m_shard.state)
    for _ in range(2):
        m_serial.time_step(50.0)
        m_shard.time_step(50.0)
    for name in ("u", "v", "T", "eta"):
        a = np.asarray(m_serial.state["fields"][name])
        b = np.asarray(m_shard.state["fields"][name])
        assert np.allclose(a, b, atol=1e-11), (name, np.abs(a - b).max())


def test_sharded_latlon_hydrostatic_matches_serial():
    """Distributed equivalence on a curvilinear (LatitudeLongitudeGrid)
    hydrostatic configuration: 1D spherical metric terms are trace-baked
    constants and must shard transparently under GSPMD."""
    need_devices(8)
    from jax.sharding import NamedSharding
    from oceananigans_tpu import LatitudeLongitudeGrid
    from oceananigans_tpu.advection.vector_invariant import (
        WENOVectorInvariant)
    from oceananigans_tpu.coriolis import HydrostaticSphericalCoriolis
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
    grid = LatitudeLongitudeGrid(size=(16, 16, 4), longitude=(0, 360),
                                 latitude=(20, 52), z=(-200.0, 0.0))

    def build():
        m = HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=WENOVectorInvariant(order=5),
            coriolis=HydrostaticSphericalCoriolis(), tracers=("T",),
            free_surface=SplitExplicitFreeSurface(substeps=8))
        rng = np.random.default_rng(7)
        m.set(u=0.1 * rng.standard_normal((16, 16, 4)),
              v=0.1 * rng.standard_normal((16, 16, 4)),
              T=lambda lam, phi, z: 10 + 1e-3 * z + 1e-2 * phi,
              eta=lambda lam, phi, z: 0.05 * jnp.sin(jnp.deg2rad(lam)))
        return m

    m_serial = build()
    m_shard = build()

    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 3:
            return jax.device_put(leaf, NamedSharding(mesh, P("x", "y",
                                                              None)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    m_shard.state = jax.tree.map(shard, m_shard.state)
    for _ in range(2):
        m_serial.time_step(50.0)
        m_shard.time_step(50.0)
    for name in ("u", "v", "T", "eta"):
        a = np.asarray(m_serial.field(name).interior)
        b = np.asarray(m_shard.field(name).interior)
        assert np.abs(a - b).max() < 1e-11, name


def test_sharded_cubed_sphere_panels_match_serial():
    """The MultiRegion analogue (PARITY §2.15): cubed-sphere panel fields
    shard over a device mesh along the PANEL axis; the inter-panel
    exchanges become XLA collectives under GSPMD and the sharded step must
    match the serial one."""
    need_devices(6)
    from jax.sharding import NamedSharding
    from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
    from oceananigans_tpu.models import CubedSphereHydrostaticModel

    mesh = Mesh(np.asarray(jax.devices()[:6]), ("panels",))
    grid = ConformalCubedSphereGrid((8, 8, 2), z=(-500.0, 0.0),
                                    radius=6.371e6, dtype=jnp.float64)

    def build():
        m = CubedSphereHydrostaticModel(grid, tracers=("b",),
                                        rotation_rate=7.292e-5)
        m.set(b=lambda lam, phi, z: 1e-5 * z + 1e-4
              * np.exp(-((lam - np.pi / 4) ** 2 + phi ** 2) / 0.05))
        m.set_geographic(u_east=lambda lam, phi: 5.0 * np.cos(phi))
        return m

    m_serial = build()
    m_shard = build()

    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 4:
            return jax.device_put(leaf, NamedSharding(mesh, P("panels")))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    m_shard.state = jax.tree.map(shard, m_shard.state)
    for _ in range(2):
        m_serial.time_step(300.0)
        m_shard.time_step(300.0)
    H, N = grid.H[0], grid.N[0]
    for name in ("u", "v", "b", "eta"):
        # interiors: stored halos are a stale cache refreshed at the next
        # step's opening fill, and serial (panel-batched) vs sharded
        # (per-panel) leave different garbage there
        a = np.asarray(m_serial.state[name])[:, H:H + N, H:H + N]
        b = np.asarray(m_shard.state[name])[:, H:H + N, H:H + N]
        assert np.abs(a - b).max() < 1e-11, name


def test_sharded_tripolar_hydrostatic_matches_serial():
    """VERDICT r2 item 3: shard a tripolar hydrostatic step across the mesh
    with the Zipper north fold CROSSING shard boundaries (the fold maps
    i -> Nx-1-i, so x-sharding makes every folded row cross devices), and
    assert equality with the serial run — the GSPMD analogue of the
    reference's distributed tripolar support
    (src/OrthogonalSphericalShellGrids/distributed_tripolar_grid.jl:1-50 +
    distributed_zipper.jl)."""
    need_devices(8)
    from jax.sharding import NamedSharding
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    from oceananigans_tpu.grids.tripolar import TripolarGrid
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
    grid = TripolarGrid(size=(32, 16, 4), z=(-1000.0, 0.0))

    def build():
        m = HydrostaticFreeSurfaceModel(
            grid=grid, free_surface=SplitExplicitFreeSurface(substeps=8),
            buoyancy=BuoyancyTracer(), tracers=("b",))
        rng = np.random.default_rng(7)
        m.set(b=lambda lam, phi, z: 1e-6 * z,
              u=0.05 * rng.standard_normal((32, 16, 4)),
              v=0.05 * rng.standard_normal((32, 16, 4)),
              eta=lambda lam, phi, z: 0.01 * jnp.sin(jnp.deg2rad(lam)))
        return m

    m_serial = build()
    m_shard = build()

    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 3:
            return jax.device_put(leaf, NamedSharding(mesh,
                                                      P("x", "y", None)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    m_shard.state = jax.tree.map(shard, m_shard.state)
    for _ in range(2):
        m_serial.time_step(120.0)
        m_shard.time_step(120.0)
    for name in ("u", "v", "b", "eta"):
        a = np.asarray(m_serial.state["fields"][name])
        b = np.asarray(m_shard.state["fields"][name])
        assert np.allclose(a, b, atol=1e-11), (name, np.abs(a - b).max())


def test_sharded_cubed_sphere_full_capability_matches_serial():
    """VERDICT r2 item 1 'done' criterion: the FULL-capability cubed-sphere
    configuration (WENO-VI momentum + WENO tracers + CATKE + GM triads +
    split-explicit + bathymetry) sharded over the panel axis matches the
    serial run."""
    need_devices(6)
    from jax.sharding import NamedSharding
    from oceananigans_tpu.advection import WENO
    from oceananigans_tpu.advection.vector_invariant import (
        WENOVectorInvariant)
    from oceananigans_tpu.buoyancy import BuoyancyTracer
    from oceananigans_tpu.closures import (CATKEVerticalDiffusivity,
                                           ClosureTuple,
                                           TriadIsopycnalSkewSymmetricDiffusivity)
    from oceananigans_tpu.grids.cubed_sphere import ConformalCubedSphereGrid
    from oceananigans_tpu.models import CubedSphereHydrostaticModel

    mesh = Mesh(np.asarray(jax.devices()[:6]), ("panels",))
    grid = ConformalCubedSphereGrid((8, 8, 6), z=(-2000.0, 0.0),
                                    radius=6.371e6, halo=4,
                                    dtype=jnp.float64)

    def build():
        m = CubedSphereHydrostaticModel(
            grid, tracers=("b",), rotation_rate=7.292e-5,
            momentum_advection=WENOVectorInvariant(order=5),
            tracer_advection=WENO(5),
            closure=ClosureTuple(
                CATKEVerticalDiffusivity(buoyancy=BuoyancyTracer()),
                TriadIsopycnalSkewSymmetricDiffusivity(
                    kappa_skew=500.0, kappa_symmetric=500.0,
                    buoyancy=BuoyancyTracer())),
            bottom_height=lambda lam, phi: -2000.0 + 900.0
            * np.exp(-((lam - 1.0) ** 2 + (phi - 0.4) ** 2) / 0.3),
            free_surface="split_explicit", substeps=8)
        m.set(b=lambda lam, phi, z: 2e-5 * z
              + 1e-4 * np.exp(-(lam ** 2 + phi ** 2) / 0.2))
        m.set_geographic(u_east=lambda lam, phi: 2.0 * np.cos(phi))
        return m

    m_serial = build()
    m_shard = build()

    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 4:
            return jax.device_put(leaf, NamedSharding(mesh, P("panels")))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    m_shard.state = jax.tree.map(shard, m_shard.state)
    for _ in range(2):
        m_serial.time_step(300.0)
        m_shard.time_step(300.0)
    H, N = grid.H[0], grid.N[0]
    for name in ("u", "v", "b", "e", "eta"):
        # interior comparison (halos: stale-by-design between fills); the
        # tolerance absorbs the serial path's panel-batched metric
        # constant-folding (batched == per-panel to ~1e-11 on this config,
        # tests/test_cubed_sphere_batched.py)
        a = np.asarray(m_serial.state[name])[:, H:H + N, H:H + N]
        b = np.asarray(m_shard.state[name])[:, H:H + N, H:H + N]
        assert np.abs(a - b).max() < 5e-10, (name, np.abs(a - b).max())


def test_sharded_zstar_hydrostatic_matches_serial():
    """Distributed equivalence of the round-5 z* machinery (grid-η stepped
    from the barotropic transport divergence, σ-scaled tendencies,
    moving-metric w): a sharded z-star split-explicit step matches serial,
    the sharded eta_grid/G_sigma/dt_sigma state stays consistent, and the
    uniform-tracer guarantee survives GSPMD partitioning."""
    need_devices(8)
    from jax.sharding import NamedSharding
    from oceananigans_tpu.advection.vector_invariant import (
        WENOVectorInvariant)
    from oceananigans_tpu.coriolis import FPlane
    from oceananigans_tpu.models import (HydrostaticFreeSurfaceModel,
                                         SplitExplicitFreeSurface)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("x", "y"))
    grid = RectilinearGrid(size=(16, 16, 4), x=(0, 1e5), y=(0, 1e5),
                           z=(-100.0, 0.0),
                           topology=("periodic", "periodic", "bounded"))

    def build():
        m = HydrostaticFreeSurfaceModel(
            grid=grid, momentum_advection=WENOVectorInvariant(order=5),
            coriolis=FPlane(1e-4), tracers=("T", "constant"),
            free_surface=SplitExplicitFreeSurface(substeps=8),
            vertical_coordinate="zstar")
        rng = np.random.default_rng(3)
        m.set(u=0.1 * rng.standard_normal((16, 16, 4)),
              v=0.1 * rng.standard_normal((16, 16, 4)),
              T=lambda x, y, z: 10 + 1e-3 * z, constant=1.0,
              eta=lambda x, y, z: 0.5 * jnp.sin(2 * jnp.pi * x / 1e5))
        return m

    m_serial = build()
    m_shard = build()

    def shard(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 3:
            return jax.device_put(leaf, NamedSharding(mesh, P("x", "y",
                                                              None)))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    m_shard.state = jax.tree.map(shard, m_shard.state)
    for _ in range(3):
        m_serial.time_step(50.0)
        m_shard.time_step(50.0)
    for name in ("u", "v", "T", "constant", "eta"):
        a = np.asarray(m_serial.state["fields"][name])
        b = np.asarray(m_shard.state["fields"][name])
        assert np.allclose(a, b, atol=1e-11), (name, np.abs(a - b).max())
    for key in ("eta_grid", "G_sigma", "dt_sigma"):
        a = np.asarray(m_serial.state[key])
        b = np.asarray(m_shard.state[key])
        assert np.allclose(a, b, atol=1e-12), (key, np.abs(a - b).max())
    c = np.asarray(m_shard.state["fields"]["constant"])[
        m_shard.grid.interior_slices]
    assert np.abs(c - 1.0).max() < 1e-12, "sharded constancy violated"


def test_partition_equal_and_uneven_kinds():
    """Partition split kinds (reference: distributed_architectures.jl —
    Equal / Fractional / Sizes): Equal() divides the remaining devices;
    uneven splits are an MPI load-balancing device with no GSPMD analogue
    and raise with an explanation."""
    from oceananigans_tpu import Partition, Equal, Fractional, Sizes
    p = Partition(x=Equal(), y=2).resolve(8)
    assert (p.x, p.y) == (4, 2)
    p2 = Partition(x=2, y=Equal()).resolve(8)
    assert (p2.x, p2.y) == (2, 4)
    with pytest.raises(ValueError):
        Partition(x=Equal(), y=3).resolve(8)
    with pytest.raises(ValueError):
        Partition(x=Equal(), y=Equal())
    with pytest.raises(NotImplementedError):
        Fractional(0.3, 0.7)
    with pytest.raises(NotImplementedError):
        Sizes(3, 5)


def test_distributed_accepts_equal_partition():
    from oceananigans_tpu import Distributed, Partition, Equal
    arch = Distributed(Partition(x=Equal(), y=2))
    assert arch.partition.x * arch.partition.y == len(
        __import__("jax").devices())


def test_sharded_auxiliary_field_forcing_dependency():
    """Auxiliary fields ride into the sharded step as plain inputs: a
    forcing depending on one runs under an 8-device mesh and host mutation
    is visible on the next step (late round-5 feature under GSPMD)."""
    need_devices(8)
    from oceananigans_tpu import CenterField, Distributed, Partition
    from oceananigans_tpu.forcings import ContinuousForcing
    from oceananigans_tpu.models import NonhydrostaticModel

    arch = Distributed(Partition(x=2, y=4))
    grid = RectilinearGrid(size=(16, 16, 8), extent=(1.0, 1.0, 1.0),
                           topology=("periodic", "periodic", "bounded"))
    A = CenterField(grid).set(2.0)
    model = NonhydrostaticModel(
        grid=grid, advection=None, tracers=("c",),
        forcing={"c": ContinuousForcing(lambda x, y, z, t, A: A,
                                        field_dependencies=("A",))},
        auxiliary_fields={"A": A}, architecture=arch)
    model.state = arch.shard(model.state)
    model.time_step(0.1)
    c1 = float(np.asarray(model.field("c").interior).mean())
    np.testing.assert_allclose(c1, 0.2, rtol=1e-5)
    A.set(4.0)
    model.time_step(0.1)
    c2 = float(np.asarray(model.field("c").interior).mean())
    np.testing.assert_allclose(c2 - c1, 0.4, rtol=1e-4)
