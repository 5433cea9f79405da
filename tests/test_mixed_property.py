"""Property test: a randomized mixed-type network (angles, azimuths,
distances, zeniths, level/height differences, GNSS baselines) fabricated by
the simulator adjusts to ~zero residuals, and after perturbing the free
coordinates the three adjustment engines — simultaneous, sequential phased,
TPU blocked Schur — agree on the solution.

Parity model: the reference validates its assembler per measurement type
via SimulateMSR fixtures (dnaimport/dnainterop.cpp) and cross-checks
phased vs simultaneous on the same network (dnaadjust test suite); this
test does both on a synthetic grid covering most scalar types at once.
"""

import copy

import numpy as np
import pytest

from dynadjust_tpu.adjust import AdjustmentOptions, adjust_simultaneous
from dynadjust_tpu.adjust.phased import adjust_phased
from dynadjust_tpu.adjust.tpu_blocked import adjust_tpu_blocked
from dynadjust_tpu.io_formats.dna import (GpsCluster, GpsObs, Measurement,
                                          Station)
from dynadjust_tpu.network import build_network
from dynadjust_tpu.network.simulate import simulate_measurements
from dynadjust_tpu.segment import segment_network


@pytest.fixture(scope="module")
def mixed_net():
    rng = np.random.default_rng(11)
    n = 36
    stns = []
    for i in range(n):
        lat = -36.0 - 0.01 * (i // 6) + rng.normal() * 1e-3
        lon = 145.0 + 0.01 * (i % 6) + rng.normal() * 1e-3
        stns.append(Station(name=f"P{i:03d}", constraints="FFF",
                            coord_type="LLH-G", p1=lat, p2=lon,
                            p3=100.0 + rng.normal() * 5))
    stns[0].constraints = "CCC"
    stns[-1].constraints = "CCC"

    recs = []

    def msr(t, a, b="", c=""):
        recs.append(Measurement(mtype=t, ignore=False,
                                first=a, second=b, third=c))

    names = [s.name for s in stns]
    for i in range(n):
        j = (i + 1) % n
        k = (i + 6) % n
        msr("S", names[i], names[j])                 # slope distance
        msr("V", names[i], names[k])                 # zenith distance
        if i % 3 == 0:
            msr("A", names[i], names[j], names[k])   # angle
        if i % 4 == 0:
            msr("B", names[i], names[j])             # geodetic azimuth
            msr("L", names[i], names[k])             # level difference
        if i % 5 == 0:
            msr("C", names[i], names[j])             # chord distance
            msr("E", names[i], names[k])             # ellipsoid arc
        if i % 7 == 0:
            msr("H", names[i])                       # orthometric height
            msr("R", names[i])                       # ellipsoidal height
        # a baseline per station keeps every phased block well-determined
        ob = GpsObs(first=names[i], second=names[j],
                    vec=np.zeros(3), vcv=np.eye(3) * 1e-4)
        recs.append(GpsCluster(mtype="G", ignore=False,
                               coord_type="XYZ", vscale=1.0, pscale=1.0,
                               lscale=1.0, hscale=1.0,
                               epsg_frame="GDA2020",
                               epoch="01.01.2020", obs=[ob]))
    net = build_network(stns, recs, "GDA2020", "01.01.2020")
    nsim = simulate_measurements(net)
    assert nsim == len(recs)
    return net


def test_simulated_mixed_network_zero_residual(mixed_net):
    net = copy.deepcopy(mixed_net)
    res = adjust_simultaneous(net, AdjustmentOptions())
    assert res.status == "Converged"
    assert res.sigma_zero < 1e-6
    assert res.max_corr < 1e-6


def _perturbed(base):
    net = copy.deepcopy(base)
    rng = np.random.default_rng(7)
    free = np.array([c == "FFF" for c in net.constraints])
    net.lat = net.lat + rng.normal(size=net.nstations) * 2e-8 * free
    net.lon = net.lon + rng.normal(size=net.nstations) * 2e-8 * free
    net.height = net.height + rng.normal(size=net.nstations) * 0.05 * free
    return net


def test_three_engines_agree_on_mixed_network(mixed_net):
    res_sim = adjust_simultaneous(_perturbed(mixed_net),
                                  AdjustmentOptions())
    assert res_sim.status == "Converged"
    assert res_sim.sigma_zero < 1e-6       # perturbation fully recovered

    n2 = _perturbed(mixed_net)
    seg = segment_network(n2, min_inner_stns=8, max_block_stns=16)
    assert seg.block_count >= 2
    res_ph = adjust_phased(n2, AdjustmentOptions(), seg=seg)
    assert np.abs(res_ph.xyz - res_sim.xyz).max() < 1e-6

    n3 = _perturbed(mixed_net)
    seg3 = segment_network(n3, min_inner_stns=8, max_block_stns=16)
    res_tpu = adjust_tpu_blocked(n3, AdjustmentOptions(), seg=seg3)
    assert np.abs(res_tpu.xyz - res_sim.xyz).max() < 1e-6
    assert abs(res_tpu.sigma_zero - res_sim.sigma_zero) < 1e-4
