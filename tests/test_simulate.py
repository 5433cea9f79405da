"""Measurement simulation tests: a simulated network is zero-residual, so
adjusting it reproduces the input coordinates with ~zero corrections.

Parity target: dna_import::SimulateMSR (dnaimport/dnainterop.cpp) and
CDna*::SimulateMsr methods.
"""

import numpy as np
import pytest

from dynadjust_tpu.adjust import AdjustmentOptions
from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
from dynadjust_tpu.io_formats import read_dna_stn, read_dna_msr
from dynadjust_tpu.io_formats.dna import Measurement
from dynadjust_tpu.network import build_network
from dynadjust_tpu.network.simulate import simulate_measurements


@pytest.fixture(scope="module")
def sim_net(sample_dir):
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/urban-network.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/urban-network.msr")
    net = build_network(stns, recs, frame, epoch)
    n = simulate_measurements(net)
    assert n == len(net.measurements)
    return net


def test_simulated_sigmas(sim_net):
    sec = np.pi / 180.0 / 3600.0
    for rec in sim_net.measurements:
        if isinstance(rec, Measurement):
            if rec.mtype == "A":
                assert abs(rec.sd - 0.01 * sec) < 1e-12
            elif rec.mtype in ("C", "E", "M", "S"):
                want = 3.0 * np.sqrt(rec.value / 1000.0) / 100.0
                assert abs(rec.sd - want) < 1e-12
            elif rec.mtype in ("H", "R"):
                assert rec.sd == 0.024


def test_simulated_network_is_zero_residual(sim_net):
    res = adjust_simultaneous(sim_net, AdjustmentOptions())
    # all free-station corrections vanish: coordinates already satisfy
    # every simulated measurement
    assert res.iterations <= 2
    assert res.max_corr < 5e-4
    # residuals ~0 -> sigma zero far below 1
    assert res.sigma_zero < 0.01


def test_simulated_msr_round_trip(sim_net, tmp_path):
    from dynadjust_tpu.io_formats.dna_writer import write_dna_msr
    path = tmp_path / "sim.msr"
    write_dna_msr(str(path), sim_net)
    recs, _, _ = read_dna_msr(str(path))
    assert len(recs) == len(sim_net.measurements)


def test_simulation_driver_file(sample_dir, tmp_path):
    """The reference's pseudo driver fixture: measurement records without
    values (names only, misaligned scales) parse and simulate
    (imp-psu02-dna-data parity)."""
    from dynadjust_tpu.io_formats.dna import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    from dynadjust_tpu.network.simulate import simulate_measurements

    stns, frame, epoch = read_dna_stn(f"{sample_dir}/pseudo.stn")
    recs, _, _ = read_dna_msr(f"{sample_dir}/pseudo-driver-file.msr")
    assert len(recs) == 25
    net = build_network(stns, recs, frame, epoch)
    n = simulate_measurements(net)
    assert n == len(recs)
    # simulated values are consistent: zero-residual adjustment
    from dynadjust_tpu.adjust import adjust_simultaneous, AdjustmentOptions
    res = adjust_simultaneous(net, AdjustmentOptions())
    assert res.sigma_zero < 1e-6
