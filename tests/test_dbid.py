"""Measurement database-id (.dbid) interop: binary round-trip against
the reference's serialisation layout (dnainterop.cpp:5117/3976), DNA
column parsing, and the --output-database-ids .adj column."""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from dynadjust_tpu.io_formats.dna import (Measurement, GpsCluster, GpsObs,
                                          DirectionSet)
from dynadjust_tpu.io_formats.dbid import (write_dbid, read_dbid,
                                           apply_dbid, dbid_entries)


class _Net:
    def __init__(self, measurements):
        self.measurements = measurements


def _sample_records():
    g = GpsCluster(mtype="G", ignore=False, coord_type="XYZ", vscale=1,
                   pscale=1, lscale=1, hscale=1, epsg_frame="GDA2020",
                   epoch="01.01.2020")
    g.db_cluster_id = 77
    o1 = GpsObs(first="A", second="B", vec=np.zeros(3), vcv=np.eye(3),
                msr_id=501)
    o1.covs.append(np.zeros((3, 3)))       # one covariance block
    o2 = GpsObs(first="B", second="C", vec=np.zeros(3), vcv=np.eye(3),
                msr_id=502)
    g.obs = [o1, o2]
    d = DirectionSet(ignore=False, first="A", ro="B", ro_value=0.0,
                     ro_sd=1e-5, msr_id=601, db_cluster_id=88,
                     directions=[("C", 0.1, 1e-5, False),
                                 ("B", 0.2, 1e-5, False)],
                     direction_ids=[602, None])
    s = Measurement(mtype="S", ignore=False, first="A", second="B",
                    value=100.0, sd=0.01, msr_id=9001)
    s2 = Measurement(mtype="R", ignore=False, first="C", value=10.0,
                     sd=0.01)                      # no id set
    return [g, d, s, s2]


def test_dbid_binary_layout_matches_reference():
    """The written bytes must be exactly the reference's layout:
    UINT32 count; then per binary row UINT32 msr_id, UINT32 cluster_id,
    UINT16 is_msr_set, UINT16 is_cls_set."""
    net = _Net(_sample_records())
    path = "/tmp/test_dbid_layout.dbid"
    write_dbid(path, net)
    raw = open(path, "rb").read()
    # binary rows: G obs1 = 3 + 3 (one cov block), obs2 = 3;
    # D = 1 RO + 2 directions; S = 1; R = 1  -> 14
    (count,) = struct.unpack_from("<I", raw, 0)
    assert count == 14
    assert len(raw) == 4 + 14 * 12
    recs = [struct.unpack_from("<IIHH", raw, 4 + 12 * i)
            for i in range(count)]
    # first 6 rows: baseline 1 (X Y Z + 3 covariance rows), id 501/77
    assert recs[:6] == [(501, 77, 1, 1)] * 6
    # rows 6-8: baseline 2
    assert recs[6:9] == [(502, 77, 1, 1)] * 3
    # D: RO row then directions (second direction id unset)
    assert recs[9] == (601, 88, 1, 1)
    assert recs[10] == (602, 88, 1, 1)
    assert recs[11] == (0, 88, 0, 1)
    # scalars
    assert recs[12] == (9001, 0, 1, 0)
    assert recs[13] == (0, 0, 0, 0)


def test_dbid_round_trip_reference_file():
    """A .dbid crafted byte-for-byte per the reference's writer loads
    and re-attaches ids to the records (LoadDatabaseId parity)."""
    recs = _sample_records()
    entries = dbid_entries(_Net(recs))
    path = "/tmp/test_dbid_ref.dbid"
    # craft the file independently with struct (the reference layout)
    with open(path, "wb") as f:
        f.write(struct.pack("<I", len(entries)))
        for m, c, ms, cs in entries:
            f.write(struct.pack("<IIHH", m, c, ms, cs))

    # strip all ids, then re-apply from the file
    bare = _sample_records()
    bare[0].db_cluster_id = None
    for ob in bare[0].obs:
        ob.msr_id = None
    bare[1].msr_id = bare[1].db_cluster_id = None
    bare[1].direction_ids = None
    bare[2].msr_id = None
    net = _Net(bare)
    apply_dbid(net, read_dbid(path))
    assert bare[0].db_cluster_id == 77
    assert [ob.msr_id for ob in bare[0].obs] == [501, 502]
    assert bare[1].msr_id == 601 and bare[1].db_cluster_id == 88
    assert bare[1].direction_ids == [602, None]
    assert bare[2].msr_id == 9001
    assert bare[3].msr_id is None


def _put(line, loc, text, right=False, width=None):
    if width and right:
        text = text.rjust(width)
    end = loc + len(text)
    return line[:loc] + text + line[end:]


def _dna_files(tmp_path):
    """Minimal 3-station / 3-distance DNA pair with database ids in the
    v3.01 id columns (142/152)."""
    from dynadjust_tpu.geodesy.conversions import (dms_to_rad, geo_to_cart)
    from dynadjust_tpu.params.ellipsoids import GRS80 as ell

    stns = [("STN_A", "CCC", -37.0, 145.0, 100.0),
            ("STN_B", "FFF", -37.003, 145.0, 110.0),
            ("STN_C", "FFF", -37.0, 145.004, 105.0)]
    xyz = {}
    for name, _, la, lo, h in stns:
        x, y, z = geo_to_cart(float(dms_to_rad(la)), float(dms_to_rad(lo)),
                              h, ell)
        xyz[name] = np.array([float(x), float(y), float(z)])

    L = ["!#=DNA 3.01 STN    12.12.2018       GDA2020    01.01.2020      3"]
    for name, cc, la, lo, h in stns:
        ln = " " * 95
        ln = _put(ln, 0, name)
        ln = _put(ln, 20, cc)
        ln = _put(ln, 24, "LLh")
        ln = _put(ln, 27, f"{la:.10f}")
        ln = _put(ln, 47, f"{lo:.10f}")
        ln = _put(ln, 67, f"{h:.4f}")
        L.append(ln.rstrip())
    (tmp_path / "mini.stn").write_text("\n".join(L) + "\n")

    pairs = [("STN_A", "STN_B", 71001), ("STN_B", "STN_C", 71002),
             ("STN_A", "STN_C", None)]
    M = ["!#=DNA 3.01 MSR    12.12.2018       GDA2020    01.01.2020      3"]
    for a, b, mid in pairs:
        dist = float(np.linalg.norm(xyz[a] - xyz[b]))
        ln = " " * 162
        ln = _put(ln, 0, "S")
        ln = _put(ln, 2, a)
        ln = _put(ln, 22, b)
        ln = _put(ln, 62, f"{dist:.4f}", right=True, width=14)
        ln = _put(ln, 90, "0.010", right=True, width=9)
        if mid is not None:
            ln = _put(ln, 142, str(mid), right=True, width=10)
        M.append(ln.rstrip())
    (tmp_path / "mini.msr").write_text("\n".join(M) + "\n")


def test_dna_id_columns_parse(tmp_path):
    from dynadjust_tpu.io_formats.dna import read_dna_msr
    _dna_files(tmp_path)
    recs, _, _ = read_dna_msr(str(tmp_path / "mini.msr"))
    assert [r.msr_id for r in recs] == [71001, 71002, None]


def test_cli_dbid_export_and_adj_column(tmp_path):
    """import --export-bst-bms writes a .dbid; adjust
    --output-database-ids prints the ids in the .adj measurement table."""
    _dna_files(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"

    def run(args):
        r = subprocess.run([sys.executable, "-m", "dynadjust_tpu"] + args,
                           cwd=str(tmp_path), env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, (args, r.stdout[-500:], r.stderr[-500:])
        return r.stdout

    run(["import", "-n", "mini", "mini.stn", "mini.msr",
         "--export-bst-bms"])
    raw = open(tmp_path / "mini.dbid", "rb").read()
    (count,) = struct.unpack_from("<I", raw, 0)
    assert count == 3
    assert struct.unpack_from("<IIHH", raw, 4) == (71001, 0, 1, 0)
    assert struct.unpack_from("<IIHH", raw, 4 + 24) == (0, 0, 0, 0)

    run(["adjust", "mini", "--output-adj-msr", "--output-database-ids"])
    adj = (tmp_path / "mini.simult.adj").read_text()
    assert "Meas. ID" in adj
    line = next(l for l in adj.splitlines()
                if l.startswith("S ") and "STN_A" in l and "STN_B" in l)
    assert line.rstrip().endswith("71001")
