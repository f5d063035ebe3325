"""Near-global wind-driven ocean (VERDICT r3 item 9): the
validation/near_global_lat_lon analogue — idealized continents with a
Drake-passage gap, zonal wind stress, buoyancy restoring, GM + CATKE,
split-explicit free surface. Asserts an ACC-like (eastward) transport
appears through the gap and stays bounded. examples/near_global_ocean.py
is the full-size study; this runs the same construction at reduced size."""

import numpy as np
import pytest

import examples.near_global_ocean as ng


@pytest.mark.slow
def test_near_global_spinup_acc_transport():
    model, ibg = ng.build_model(nx=64, ny=32, nz=8)
    dt = 3600.0
    transports = []
    for i in range(96):                      # 4 days
        model.time_step(dt)
        if (i + 1) % 24 == 0:
            u = np.asarray(model.field("u").interior)
            b = np.asarray(model.field("b").interior)
            assert np.isfinite(u).all() and np.isfinite(b).all(), i
            transports.append(ng.drake_transport_sv(model, ibg))
    # the westerlies drive an eastward circumpolar transport through the
    # gap; it must appear...
    assert transports[-1] > 1.0, transports
    # ...grow from spin-up...
    assert transports[-1] > transports[0] * 0.5, transports
    # ...and stay physically bounded (no runaway: real ACC is ~100-200 Sv;
    # a coarse viscous model stays well under 1000)
    assert transports[-1] < 1000.0, transports
    u = np.asarray(model.field("u").interior)
    assert np.abs(u).max() < 5.0, np.abs(u).max()
