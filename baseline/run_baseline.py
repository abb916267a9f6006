#!/usr/bin/env python
"""Measure the same-host reference baseline (BASELINE.md / SURVEY.md §6).

Builds the C++17+OpenMP twin of dtt_dmrgg (ttcross_baseline.cpp), runs the
BASELINE.md configs K times each, and writes baseline/measured.json with
median metrics — the file bench.py reads to compute vs_baseline from a
MEASURED number instead of the stated nominal.

Usage: python baseline/run_baseline.py [K]
"""

import json
import os
import platform
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BIN = os.path.join(HERE, "ttcross_baseline")
SRC = os.path.join(HERE, "ttcross_baseline.cpp")

# (name, argv, json key): the BASELINE.md measurement table
CONFIGS = [
    ("stdnorm_d10", ["stdnorm", "10", "33", "8", "1"], "stdnorm_d10"),
    ("mvn_d6", ["mvn", "6", "65", "20", "1"], "mvn_d6"),
    ("coscoeff_d6", ["coscoeff", "6", "65", "20", "1"], "coscoeff_d6"),
    ("ising_c6", ["ising", "C", "6", "64", "24", "1"], "ising_c6"),
]


def build():
    if (os.path.exists(BIN)
            and os.path.getmtime(BIN) >= os.path.getmtime(SRC)):
        return
    cmd = ["g++", "-O2", "-march=native", "-fopenmp", "-std=c++17",
           "-o", BIN, SRC]
    subprocess.run(cmd, check=True)


def run_one(argv):
    proc = subprocess.run([BIN] + argv, capture_output=True, text=True,
                          timeout=1800, check=True)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line from {argv}")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    build()
    out = {
        "host": {
            "cpu": platform.processor() or platform.machine(),
            "nproc": os.cpu_count(),
            "omp_threads": int(os.environ.get("OMP_NUM_THREADS",
                                              os.cpu_count())),
            "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
            "compiler": subprocess.run(
                ["g++", "--version"], capture_output=True,
                text=True).stdout.splitlines()[0],
        },
        "note": ("Same-host C++17+OpenMP twin of the reference dtt_dmrgg "
                 "(dmrgg.f90); median of %d runs per config. Re-run "
                 "baseline/run_baseline.py after a host change." % k),
    }
    for name, argv, key in CONFIGS:
        runs = [run_one(argv) for _ in range(k)]
        med = statistics.median(r["evals_per_sec"] for r in runs)
        out[key] = {
            "evals_per_sec": round(med, 1),
            "wall_time_s": statistics.median(r["wall_time_s"] for r in runs),
            "n_evals": runs[0]["n_evals"],
            "correct_digits": max(r["correct_digits"] for r in runs),
            "threads": runs[0]["threads"],
            "runs": k,
        }
        print(json.dumps({"config": name, **out[key]}), flush=True)
    path = os.path.join(HERE, "measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
