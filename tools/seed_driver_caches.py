#!/usr/bin/env python
"""Pre-seed the export/compile caches for every driver's DEFAULT config.

First-run engine compiles on this platform go through a remote TPU
toolchain and can take minutes (an uncached driver config measured >9
minutes, VERDICT r4); the export cache (cross/export_cache.py) makes
every LATER process load the AOT artifact instead.  This tool runs each
driver once with its default CLI so a user's first real run is warm:

    python tools/seed_driver_caches.py          # all drivers
    python tools/seed_driver_caches.py stdnorm mvn   # substring filter

Each driver runs in its OWN subprocess (the engines cache per-process;
what persists is the on-disk artifact), sequentially — never run two
TPU processes at once on this platform (they wedge the tunnel).
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# driver file -> default argv (the readarg defaults, kept explicit so a
# default change shows up in review); None = no TPU engine work (host
# tiers / table prints) — nothing to seed
DRIVERS = [
    ("crs_stdnorm.py", []),
    ("crs_mvn.py", []),
    ("crs_ising.py", []),
    ("crs_mvn_complex.py", []),
    ("crs_chf.py", []),
    ("crs_pdf.py", []),
    ("crs_store.py", []),
    ("crs_coscoeff.py", []),
    ("crs_batch.py", []),
    ("crs_greeks.py", []),
    ("crs_quantics.py", []),
]

TIMEOUT_S = int(os.environ.get("TTCROSS_SEED_TIMEOUT_S", "2400"))


def main(argv):
    filters = [a for a in argv if not a.startswith("-")]
    results = []
    for name, args in DRIVERS:
        if filters and not any(f in name for f in filters):
            continue
        path = os.path.join(ROOT, "drivers", name)
        t0 = time.time()
        try:
            proc = subprocess.run([sys.executable, path] + args,
                                  capture_output=True, text=True,
                                  timeout=TIMEOUT_S)
            el = time.time() - t0
            ok = proc.returncode == 0
            tail = (proc.stdout.strip().splitlines() or [""])[-1]
            print(f"{name:22s} rc={proc.returncode} {el:7.1f}s  {tail[:60]}",
                  flush=True)
            if not ok:
                print(proc.stderr[-800:], flush=True)
        except subprocess.TimeoutExpired:
            el = time.time() - t0
            ok = False
            print(f"{name:22s} TIMEOUT after {el:.0f}s", flush=True)
        results.append((name, ok, el))
    bad = [n for n, ok, _ in results if not ok]
    print(f"\nseeded {len(results) - len(bad)}/{len(results)} driver "
          f"default configs" + (f"; FAILED: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
