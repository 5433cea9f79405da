#!/usr/bin/env python3
"""Replay the reference's full CTest functional matrix against our CLI.

Parses every ``add_test`` entry in the reference's
``dynadjust/CMakeLists.txt`` (the ~300-entry functional section described in
SURVEY.md §4.2), translates each tool invocation to the equivalent
``dynadjust_tpu`` verb, and runs them **in declaration order** inside a
scratch copy of ``sampleData/`` — the same serial execution model the
reference's CI uses (RUN_SERIAL / DEPENDS properties,
``.github/workflows/build_and_test.yml``).

WILL_FAIL properties are honored: those tests must exit non-zero.
``unit-*`` entries target the reference's C++ unit-test binaries and are
skipped (our analogues live in ``tests/``).

Usage:
    python scripts/ci_matrix_replay.py [--filter SUBSTR] [--stop-on-fail]
                                       [--scratch DIR] [--list]

Exit status is non-zero if any replayed test deviates from its expected
outcome.  Results are written to scripts/ci_replay_results.json.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import shlex
import shutil
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path(os.environ.get("DYNADJUST_REF", "/root/reference"))
CMAKELISTS = REF / "dynadjust" / "CMakeLists.txt"
SAMPLE_DATA = REF / "sampleData"

# CMake target variable -> our CLI verb
TARGET_VERB = {
    "DNAIMPORT_TARGET": "import",
    "DNAREFTRAN_TARGET": "reftran",
    "DNAGEOID_TARGET": "geoid",
    "DNASEGMENT_TARGET": "segment",
    "DNAADJUST_TARGET": "adjust",
    "DNAPLOT_TARGET": "plot",
    "DNADIFF_TARGET": "diff",
    "DYNADJUST_TARGET": "dynadjust",
}

TARGET_RE = re.compile(r"\$<TARGET_FILE:\$\{(\w+)\}>")


def _balanced_calls(text: str, name: str):
    """Yield the argument string of every ``name(...)`` call, paren-balanced."""
    idx = 0
    pat = re.compile(re.escape(name) + r"\s*\(")
    while True:
        m = pat.search(text, idx)
        if not m:
            return
        depth = 1
        j = m.end()
        while depth and j < len(text):
            c = text[j]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == '"':
                j += 1
                while j < len(text) and text[j] != '"':
                    j += 1
            j += 1
        yield text[m.end(): j - 1]
        idx = j


def parse_matrix():
    """Return (tests, will_fail) from the reference CMakeLists.

    tests: list of (name, argv-or-None, raw_command) in declaration order;
    argv is None for commands we cannot translate (reported as skipped).
    """
    text = "\n".join(
        ln for ln in CMAKELISTS.read_text().splitlines()
        if not ln.lstrip().startswith("#"))
    tests = []
    for call in _balanced_calls(text, "add_test"):
        toks = call.split(None, 1)
        if not toks or toks[0] != "NAME":
            continue
        rest = toks[1]
        name, rest = rest.split(None, 1)
        cmd = rest.split("COMMAND", 1)[1].strip()
        tests.append((name, cmd))

    will_fail = set()
    for call in _balanced_calls(text, "set_tests_properties"):
        if "WILL_FAIL" in call and "TRUE" in call:
            names = call.split("PROPERTIES")[0].split()
            will_fail.update(names)
    return tests, will_fail


def translate(cmd: str):
    """CMake COMMAND string -> argv for our CLI (or bash), or None to skip."""
    m = TARGET_RE.match(cmd)
    if m:
        verb = TARGET_VERB.get(m.group(1))
        if verb is None:
            return None
        args = shlex.split(cmd[m.end():])
        return [verb] + args
    toks = shlex.split(cmd)
    if toks and toks[0] == "bash":
        return ["@bash"] + toks[1:]
    if toks and toks[0].startswith("$<TARGET_FILE:test_"):
        return None  # C++ unit-test binary
    return None


def run_one(argv, scratch: Path):
    """Run one translated test in-process; return (rc, output)."""
    if argv[0] == "@bash":
        p = subprocess.run(
            ["bash"] + argv[1:], cwd=scratch, capture_output=True, text=True,
            timeout=120,
        )
        return p.returncode, p.stdout + p.stderr

    from dynadjust_tpu.cli import main as cli_main

    buf = io.StringIO()
    cwd = os.getcwd()
    rc = 0
    try:
        os.chdir(scratch)
        with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
            rc = cli_main(argv)
            if rc is None:
                rc = 0
    except SystemExit as e:
        if e.code is None:
            rc = 0
        elif isinstance(e.code, int):
            rc = e.code
        else:  # sys.exit("message") means failure
            buf.write(str(e.code) + "\n")
            rc = 1
    except Exception as e:  # noqa: BLE001 - a crash is a test failure
        buf.write(f"\n[replay] unhandled {type(e).__name__}: {e}\n")
        rc = 1
    finally:
        os.chdir(cwd)
    return rc, buf.getvalue()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default="", help="only run tests whose name contains this")
    ap.add_argument("--stop-on-fail", action="store_true")
    ap.add_argument("--scratch", default="/tmp/ci_replay")
    ap.add_argument("--list", action="store_true", help="list tests and exit")
    ap.add_argument("--fresh", action="store_true", help="wipe the scratch dir first")
    args = ap.parse_args(argv)

    tests, will_fail = parse_matrix()
    if args.list:
        for name, cmd in tests:
            tr = translate(cmd)
            mark = "WILL_FAIL" if name in will_fail else ""
            kind = "skip" if tr is None else tr[0]
            print(f"{name:45s} {kind:10s} {mark}")
        print(f"{len(tests)} tests, {len(will_fail)} will-fail")
        return 0

    scratch = Path(args.scratch)
    if args.fresh and scratch.exists():
        shutil.rmtree(scratch)
    if not scratch.exists():
        scratch.mkdir(parents=True)
        for f in SAMPLE_DATA.iterdir():
            if f.is_file():
                shutil.copy2(f, scratch / f.name)

    results = []
    n_pass = n_fail = n_skip = 0
    for name, cmd in tests:
        if args.filter and args.filter not in name:
            continue
        tr = translate(cmd)
        if tr is None:
            n_skip += 1
            results.append({"name": name, "status": "skipped", "cmd": cmd})
            continue
        t0 = time.time()
        rc, out = run_one(tr, scratch)
        dt = time.time() - t0
        expect_fail = name in will_fail
        ok = (rc != 0) if expect_fail else (rc == 0)
        status = "pass" if ok else "FAIL"
        if ok:
            n_pass += 1
        else:
            n_fail += 1
        results.append({
            "name": name, "status": status, "rc": rc, "secs": round(dt, 2),
            "argv": tr, "will_fail": expect_fail,
            "tail": out[-2000:] if not ok else "",
        })
        print(f"{status:5s} {name:45s} rc={rc} {'(expected fail)' if expect_fail else ''} {dt:5.1f}s", flush=True)
        if not ok and args.stop_on_fail:
            print(out[-4000:])
            break

    out_path = Path(__file__).parent / "ci_replay_results.json"
    out_path.write_text(json.dumps(results, indent=1))
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} skipped (untranslatable) -> {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
