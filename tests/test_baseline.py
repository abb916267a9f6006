"""The measured-baseline C++ twin (baseline/ttcross_baseline.cpp) stays
buildable and correct: it is what bench.py's vs_baseline is measured
against (BASELINE.md 'Measured same-host baseline')."""

import json
import os
import shutil
import subprocess

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(HERE, "baseline", "ttcross_baseline.cpp")
BIN = os.path.join(HERE, "baseline", "ttcross_baseline")


def _build():
    if (os.path.exists(BIN)
            and os.path.getmtime(BIN) >= os.path.getmtime(SRC)):
        return
    subprocess.run(["g++", "-O2", "-fopenmp", "-std=c++17", "-o", BIN, SRC],
                   check=True, timeout=300)


def _run(*argv):
    proc = subprocess.run([BIN, *argv], capture_output=True, text=True,
                          timeout=300, check=True)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError("no JSON line")


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_baseline_twin_ising_c4():
    """The greedy twin reaches ~14 digits on C_4 at rank 12 (the same
    envelope the reference Fortran reports on this config)."""
    _build()
    out = _run("ising", "C", "4", "33", "12", "1")
    assert out["correct_digits"] >= 13.0
    assert out["n_evals"] < 20000


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_baseline_twin_stdnorm():
    """Rank-1 exact integrand: digits pinned at the 1-D quadrature error
    (3.43 at N=33 on [-10,10], the same figure the jax engine reports)."""
    _build()
    out = _run("stdnorm", "10", "33", "8", "1")
    assert abs(out["correct_digits"] - 3.43) < 0.1
    assert out["n_evals"] < 12000


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_measured_json_fresh():
    """baseline/measured.json exists and has the north-star entry bench.py
    reads for vs_baseline."""
    path = os.path.join(HERE, "baseline", "measured.json")
    with open(path) as f:
        data = json.load(f)
    assert data["ising_c6"]["evals_per_sec"] > 0
    assert data["ising_c6"]["correct_digits"] > 11.0
