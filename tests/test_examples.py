"""Smoke-run every example script with tiny parameters (reference test
strategy tier 7 — test/test_validation.jl runs the validation scripts;
SURVEY.md §4.7)."""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # full-tier study/equivalence battery (see README testing tiers)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.parametrize("name,kwargs", [
    ("two_dimensional_turbulence", dict(n=32, stop_time=0.05)),
    ("langmuir_turbulence", dict(n=8, hours=0.02)),
    ("ocean_wind_mixing_and_convection", dict(n=8, hours=0.02)),
    ("tidal_flow_over_seamount", dict(nx=16, nz=8, periods=0.02)),
    ("baroclinic_adjustment", dict(nx=16, ny=16, nz=4, days=0.02)),
    ("shallow_water_bickley_jet", dict(nx=16, ny=32, stop_time=0.1)),
    ("internal_wave", dict(n=32, periods=0.05)),
    ("kelvin_helmholtz_instability", dict(nx=16, nz=16, stop_time=0.2)),
    ("horizontal_convection", dict(nx=16, nz=8, stop_time=0.05)),
    ("one_dimensional_diffusion", dict(n=32, stop_iteration=200)),
    ("tilted_bottom_boundary_layer", dict(nx=16, nz=16, stop_time=120.0)),
    ("convecting_plankton", dict(n=16, stop_time=900.0)),
    ("internal_tide", dict(nx=32, nz=8, days=0.02)),
    ("global_cubed_sphere_ocean", dict(N=8, nz=2, hours=0.5)),  # >=2 steps
])
def test_example_smokes(name, kwargs, tmp_path):
    import importlib

    mod = importlib.import_module(f"examples.{name}")
    if "out" in mod.main.__code__.co_varnames[:mod.main.__code__.co_argcount]:
        kwargs = dict(kwargs, out=str(tmp_path / "out"))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        mod.main(**kwargs)
    finally:
        os.chdir(cwd)
