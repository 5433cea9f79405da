"""Reference-compatible .bst/.bms binary files.

Layout parity: struct sizes/offsets were verified against a compiled
probe of the reference's struct definitions (station_t 352 B,
measurement_t 208 B; dnatypes-structs.hpp:270-323,
dnameasurement.hpp:133-194).  These tests pin the dtype layout and prove
the full round trip: import → write .bst/.bms → re-import from binary →
identical adjustment results.
"""

import subprocess
import sys

import numpy as np
import pytest

from dynadjust_tpu.io_formats.binary import (
    STATION_DTYPE, MEAS_DTYPE, write_bst, write_bms, read_bst, read_bms,
    measurement_rows, records_from_rows, network_from_binary)


def test_struct_sizes_and_offsets():
    assert STATION_DTYPE.itemsize == 352
    assert MEAS_DTYPE.itemsize == 208
    f = STATION_DTYPE.fields
    assert f["suppliedStationType"][1] == 80
    assert f["initialLatitude"][1] == 88
    assert f["geoidSep"][1] == 140
    assert f["description"][1] == 170
    assert f["fileOrder"][1] == 300
    assert f["plate"][1] == 345
    m = MEAS_DTYPE.fields
    assert m["epsgCode"][1] == 3
    assert m["coordType"][1] == 34
    assert m["station1"][1] == 40
    assert m["term1"][1] == 72
    assert m["preAdjMeas"][1] == 200


@pytest.fixture(scope="module")
def gnss_net(sample_dir, tmp_path_factory):
    from dynadjust_tpu.io_formats.dna import read_dna_stn, read_dna_msr
    from dynadjust_tpu.network import build_network
    stns, frame, epoch = read_dna_stn(f"{sample_dir}/gnss-network.stn")
    msrs, _, _ = read_dna_msr(f"{sample_dir}/gnss-network.msr")
    stns.sort(key=lambda s: s.name)
    return build_network(stns, msrs, frame, epoch)


def test_bst_roundtrip(gnss_net, tmp_path):
    p = str(tmp_path / "g.bst")
    write_bst(p, gnss_net)
    rec, meta = read_bst(p)
    assert meta["bin_count"] == gnss_net.nstations
    assert meta["epoch"] == gnss_net.epoch
    names = [r["stationName"].split(b"\0")[0].decode() for r in rec]
    assert names == gnss_net.names
    np.testing.assert_allclose(rec["currentLatitude"], gnss_net.lat,
                               rtol=0, atol=0)
    np.testing.assert_allclose(rec["currentHeight"], gnss_net.height,
                               rtol=0, atol=0)


def test_bms_roundtrip_records(gnss_net, tmp_path):
    p = str(tmp_path / "g.bms")
    write_bms(p, gnss_net)
    rows, meta = read_bms(p)
    assert meta["bin_count"] == len(rows)
    recs = records_from_rows(rows, gnss_net.names)
    assert len(recs) == len(gnss_net.measurements)
    for a, b in zip(recs, gnss_net.measurements):
        assert type(a) is type(b)
        if hasattr(a, "obs"):
            assert len(a.obs) == len(b.obs)
            for oa, ob_ in zip(a.obs, b.obs):
                np.testing.assert_array_equal(oa.vec, ob_.vec)
                np.testing.assert_allclose(oa.vcv, ob_.vcv, atol=0)
                assert len(oa.covs) == len(ob_.covs)
                for ca, cb in zip(oa.covs, ob_.covs):
                    np.testing.assert_array_equal(ca, cb)
        elif hasattr(a, "directions"):
            assert len(a.directions) == len(b.directions)
        else:
            assert a.value == b.value
            np.testing.assert_allclose(a.sd, b.sd, rtol=1e-15)


def test_network_from_binary_adjusts_identically(gnss_net, tmp_path):
    from dynadjust_tpu.adjust.simultaneous import adjust_simultaneous
    from dynadjust_tpu.adjust.options import AdjustmentOptions
    bst, bms = str(tmp_path / "g.bst"), str(tmp_path / "g.bms")
    write_bst(bst, gnss_net)
    write_bms(bms, gnss_net)
    net2 = network_from_binary(bst, bms)
    assert net2.names == gnss_net.names
    opts = AdjustmentOptions(scale_normals_to_unity=True)
    r1 = adjust_simultaneous(gnss_net, opts)
    r2 = adjust_simultaneous(net2, opts)
    assert r1.iterations == r2.iterations
    np.testing.assert_allclose(r2.xyz, r1.xyz, atol=5e-9)
    assert abs(r1.sigma_zero - r2.sigma_zero) < 1e-9


def test_cli_binary_import_and_metadata(sample_dir, tmp_path):
    import os
    env_cwd = str(tmp_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*a, rc=0):
        env = dict(os.environ)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run([sys.executable, "-m", "dynadjust_tpu", *a],
                           cwd=env_cwd, env=env, capture_output=True,
                           text=True, timeout=600)
        assert r.returncode == rc, r.stdout + r.stderr
        return r.stdout

    run("import", "-n", "gb", f"{sample_dir}/gnss-network.stn",
        f"{sample_dir}/gnss-network.msr", "--export-bst-bms")
    out = run("metadata", "gb.bst")
    assert "bin_count" in out and "epsg" in out
    # re-import from the binary pair and adjust
    run("import", "-n", "gb2", "gb.bst", "gb.bms")
    out = run("adjust", "gb2", "--scale-normals-to-unity")
    assert "Converged" in out


def test_asl_aml_map_roundtrip(gnss_net, tmp_path):
    from dynadjust_tpu.io_formats.binary import (
        write_asl_aml, write_map, read_asl, read_aml, read_map,
        record_row_starts)
    asl_p, aml_p = str(tmp_path / "g.asl"), str(tmp_path / "g.aml")
    write_asl_aml(asl_p, aml_p, gnss_net)
    asl = read_asl(asl_p)
    aml = read_aml(aml_p)
    assert len(asl) == gnss_net.nstations
    # AML segment boundaries must be consistent with per-station counts
    assert asl["amlStnIndex"][0] == 0
    np.testing.assert_array_equal(
        asl["amlStnIndex"][1:],
        np.cumsum(asl["assocMsrCount"])[:-1])
    assert len(aml) == int(asl["assocMsrCount"].sum())
    # every AML entry is a valid first row of a measurement record
    starts = set(record_row_starts(gnss_net))
    assert all(int(x) in starts for x in aml)

    map_p = str(tmp_path / "g.map")
    write_map(map_p, gnss_net)
    pairs = read_map(map_p)
    assert len(pairs) == gnss_net.nstations
    for nm, i in pairs:
        assert gnss_net.names[i] == nm
    assert [nm for nm, _ in pairs] == sorted(gnss_net.names)
