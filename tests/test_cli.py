"""End-to-end CLI drives (subprocess): the same pipelines the verify
recipe runs by hand, kept green by CI."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-m", "dynadjust_tpu"] + args,
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, (args, r.stdout[-800:], r.stderr[-800:])
    return r.stdout


def test_cli_gnss_pipeline_byte_parity(sample_dir, tmp_path):
    for f in ("gnss-network.stn", "gnss-network.msr",
              "gnss-network-geoid.gsb"):
        (tmp_path / f).write_bytes(
            open(f"{sample_dir}/{f}", "rb").read())
    cwd = str(tmp_path)
    _run(["import", "-n", "gnss", "gnss-network.stn", "gnss-network.msr"],
         cwd)
    _run(["geoid", "gnss", "-g", "gnss-network-geoid.gsb",
          "--convert-stn-hts"], cwd)
    _run(["reftran", "gnss"], cwd)
    out = _run(["adjust", "gnss", "--output-adj-msr",
                "--scale-normals-to-unity"], cwd)
    assert "*** PASSED ***" in out

    ours = (tmp_path / "gnss.simult.adj").read_text().splitlines()
    exp = open(f"{sample_dir}/gnss.simult.adj.expected").read().splitlines()
    ia = next(i for i, l in enumerate(ours)
              if "Number of unknown parameters" in l)
    ib = next(i for i, l in enumerate(exp)
              if "Number of unknown parameters" in l)
    assert ours[ia:] == exp[ib:]


def test_cli_orchestrator_with_log(sample_dir, tmp_path):
    for f in ("urban-network.stn", "urban-network.msr",
              "urban-network-geoid.gsb"):
        (tmp_path / f).write_bytes(open(f"{sample_dir}/{f}", "rb").read())
    cwd = str(tmp_path)
    out = _run(["dynadjust", "-n", "urb", "urban-network.stn",
                "urban-network.msr", "-g", "urban-network-geoid.gsb",
                "--convert-stn-hts", "--phased", "--min-inner-stns", "50",
                "--max-block-stns", "250"], cwd)
    assert "Converged" in out
    log = (tmp_path / "dynadjust.log").read_text()
    for stage in ("import", "geoid", "segment", "adjust"):
        assert f"{stage:<10}done" in log, stage


def test_input_folder_and_block_view(tmp_path, sample_dir):
    """-i/--input-folder resolves interim files from a different folder
    (general option on every reference tool); --phased-block-view writes
    one map per block."""
    import subprocess
    import sys
    import glob
    import os
    env = dict(os.environ, PYTHONPATH="/root/repo")
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    outd.mkdir()

    def run(*a):
        r = subprocess.run([sys.executable, "-m", "dynadjust_tpu", *a],
                           capture_output=True, text=True, env=env,
                           cwd=str(tmp_path))
        assert r.returncode == 0, r.stdout + r.stderr
        return r.stdout

    run("import", "-n", "g",
        f"{sample_dir}/gnss-network.stn", f"{sample_dir}/gnss-network.msr",
        "--output-folder", str(ind))
    run("segment", "g", "--min-inner-stns", "5", "--max-block-stns", "30",
        "--output-folder", str(ind))
    # adjust reads the store from -i, writes results to --output-folder
    out = run("adjust", "g", "-i", str(ind), "--output-folder", str(outd),
              "--phased", "--scale-normals-to-unity")
    assert "Converged" in out
    assert (outd / "g.phased.adj").exists()
    # plot per-block maps, store and seg from -i, maps to --output-folder
    run("plot", "g", "-i", str(ind), "--output-folder", str(outd),
        "--phased-block-view", "--export-png")
    blocks = glob.glob(str(outd / "g.block*.png"))
    assert len(blocks) >= 2


def test_geoid_cli_reference_matrix(tmp_path, sample_dir):
    """The reference's geoid CI invocations (CMakeLists.txt:1160-1183)
    run verbatim against our CLI: numeric --interpolation-method,
    -t text/CSV point files, --direction, -c/-d grid creation,
    --export-ntv2-asc / --export-ntv2-gsb round trip."""
    import subprocess
    import sys
    import os
    import numpy as np
    env = dict(os.environ, PYTHONPATH="/root/repo")
    for f in ("gnss-network-geoid.gsb", "geoid-points-dat.txt",
              "geoid-points-csv.csv", "ausgeoid09_gda94_v1.01_clip_1x1.dat"):
        (tmp_path / f).write_bytes(open(f"{sample_dir}/{f}", "rb").read())

    def run(*a):
        r = subprocess.run([sys.executable, "-m", "dynadjust_tpu",
                            "geoid", *a], capture_output=True, text=True,
                           env=env, cwd=str(tmp_path))
        assert r.returncode == 0, (a, r.stdout + r.stderr)
        return r.stdout

    g = "gnss-network-geoid.gsb"
    run("-g", g, "--interactive", "--latitude", "-36.3348253617",
        "--longitude", "145.5741006771")
    run("-g", g, "--interactive", "--latitude", "-36.2704890597",
        "--longitude", "146.4809871537", "--interpolation-method", "0")
    run("-g", g, "-t", "geoid-points-dat.txt")
    run("-g", g, "-t", "geoid-points-csv.csv", "--decimal-degrees",
        "--direction", "0")
    run("-d", "ausgeoid09_gda94_v1.01_clip_1x1.dat", "-c", "-g",
        "clip.gsb")
    assert (tmp_path / "clip.gsb").exists()
    run("-g", g, "--export-ntv2-asc")
    run("-g", f"{g}.asc", "--export-ntv2-gsb")
    from dynadjust_tpu.io_formats.ntv2 import NTv2Grid
    a = NTv2Grid.read(str(tmp_path / g))
    b = NTv2Grid.read(str(tmp_path / f"{g}.asc.gsb"))
    d = max(np.abs(x.values - y.values).max()
            for x, y in zip(a.subgrids, b.subgrids))
    assert d == 0.0     # gsb -> asc -> gsb is bit-exact at 6dp values


def test_cli_reference_conventions(tmp_path, sample_dir):
    """Reference CLI conventions: --help-module exits 0; -p project file
    supplies the network name; text .seg block extraction; segment
    --seg-file output override; WILL_FAIL-style errors exit nonzero."""
    import subprocess
    import sys
    import os
    env = dict(os.environ, PYTHONPATH="/root/repo")

    def run(*a, rc=0):
        r = subprocess.run([sys.executable, "-m", "dynadjust_tpu", *a],
                           capture_output=True, text=True, env=env,
                           cwd=str(tmp_path))
        assert (r.returncode == 0) == (rc == 0), (a, r.stdout + r.stderr)
        return r.stdout

    run("import", "--help-module", "standard")
    run("adjust", "--help-module", "standard")
    run("adjust", "--help-module", "cplusplus", rc=1)   # unknown module
    run("adjust", rc=1)                      # no network name
    # no -n: network name defaults to the first free networkN
    out = run("import", f"{sample_dir}/dsg.stn", f"{sample_dir}/dsg.msr")
    assert "network1" in out

    run("import", "-n", "m", f"{sample_dir}/dsg.stn",
        f"{sample_dir}/dsg.msr")
    run("segment", "m", "--min-inner-stns", "2", "--max-block-stns", "3",
        "--seg-file", str(tmp_path / "custom.seg"))
    assert (tmp_path / "custom.seg").exists()
    out = run("import", "-n", "m", f"{sample_dir}/dsg.stn",
              f"{sample_dir}/dsg.msr", "--seg-file",
              str(tmp_path / "custom.seg"), "--import-block-stn-msr", "2")
    assert "block 2" in out


def test_cli_adjust_tpu_devices_mesh(sample_dir, tmp_path):
    """adjust --phased --tpu --devices 8: the production CLI path sharded
    over an 8-device mesh (virtual CPU devices here; chips on a pod) must
    reproduce the phased statistics on the urban sample network."""
    for f in ("urban-network.stn", "urban-network.msr",
              "urban-network-geoid.gsb"):
        (tmp_path / f).write_bytes(open(f"{sample_dir}/{f}", "rb").read())
    cwd = str(tmp_path)
    _run(["import", "-n", "urban", "urban-network.stn",
          "urban-network.msr", "--flag-unused-stations"], cwd)
    _run(["geoid", "urban", "-g", "urban-network-geoid.gsb"], cwd)
    _run(["segment", "urban", "--min-inner-stns", "50",
          "--max-block-stns", "150"], cwd)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["DTA_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run([sys.executable, "-m", "dynadjust_tpu", "adjust",
                        "urban", "--output-adj-msr", "--phased", "--tpu",
                        "--devices", "8"],
                       cwd=cwd, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
    assert "Sigma zero 0.857" in r.stdout
    assert "Chi squared 635.53" in r.stdout
