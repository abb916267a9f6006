"""Driver smoke tests: run the CLI programs as subprocesses on the forced
CPU platform (the reference's 'run appropriate ./test_*' workflow,
README.md:19-20).  The heavy ones are @slow."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_driver(name, *args, timeout=600, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ROOT
    env.update(extra_env or {})
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "drivers", name), *map(str, args)],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


def test_print_s_vectors():
    out = run_driver("print_s_vectors.py", 3, timeout=120)
    assert out.count("\n") == 4
    assert "+1 +1 +1" in out


def test_print_cos_coeff():
    out = run_driver("print_cos_coeff.py", 2, 3, timeout=300)
    assert out.count("coeff=") == 3


@pytest.mark.slow
def test_crs_stdnorm_driver():
    # TTCROSS_ACCCHK=1 also exercises the post-run randomized accuracy check
    out = run_driver("crs_stdnorm.py", 4, 33, 4, 1, extra_env={"TTCROSS_ACCCHK": "1"})
    assert "correct digits" in out
    assert "accchk:" in out


@pytest.mark.slow
def test_crs_ising_driver():
    out = run_driver("crs_ising.py", "c", 3, 33, 6, 1)
    digits = float(out.rsplit("correct digits:", 1)[1].split()[0])
    assert digits >= 6


@pytest.mark.slow
def test_crs_quantics_driver():
    """Quantics driver smoke: 2^16 virtual grid, greedy + 1 maxvol
    replacement sweep (the deep-grid conditioning cure it defaults to)."""
    out = run_driver("crs_quantics.py", 16, 8, 1, 1, timeout=600)
    digits = float(out.rsplit("correct digits:", 1)[1].split()[0])
    assert digits >= 10, out


def test_crs_ising_qde_driver():
    """qd-engine driver smoke: C_4 n=17 rank 10 crosses in ~1 s of engine
    time and must beat the n=17 rule floor region (measured 12.4)."""
    out = run_driver("crs_ising_qde.py", 4, 17, 10, 1, timeout=300)
    digits = float(out.rsplit("correct digits:", 1)[1].split()[0])
    assert digits >= 11, out


@pytest.mark.slow
def test_crs_batch_driver():
    """Family driver smoke: 3 MVN correlation lanes in one fused program,
    per-lane digit report."""
    out = run_driver("crs_batch.py", 4, 33, 8, 3, timeout=900)
    assert out.count("corr ") == 3
    digits = [float(line.rsplit("correct digits", 1)[1].split()[0])
              for line in out.splitlines() if "correct digits" in line]
    assert len(digits) == 3 and min(digits) > 2.0, out


@pytest.mark.slow
def test_crs_greeks_driver():
    """Frozen-skeleton Greeks driver smoke: the jax.grad sensitivity must
    match the driver's own central-FD column."""
    out = run_driver("crs_greeks.py", 4, 33, 12, 3, timeout=900)
    line = [ln for ln in out.splitlines() if "d mass / d rho" in ln][0]
    g = float(line.split("=")[1].split()[0])
    fd = float(line.rsplit("check", 1)[1].split()[0])
    assert abs(g - fd) < 1e-5 * max(1.0, abs(g)), out
    assert out.count("d/drho") == 3, out
