"""C_256 'wide' config probe (n=33, rank 12, jacobi) on the live device:
the long-chain line where per-sweep batches are ~2.3x the n=17 config at
the same sweep latency, so device evals/s should roughly double while the
same-host C++ twin stays flat (~320k evals/s, measured 2026-08-19)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from ttcross_tpu.apps.ising import make_ising
from ttcross_tpu.cross import cross

p = make_ising("C", m=256, n=33)
cargs = dict(max_rank=12, accuracy=1e-10, pivoting=1,
             quad=[p.quad_weights] * p.d, truth=p.truth,
             sweep_mode="jacobi")
for i in range(3):
    t0 = time.perf_counter()
    res = cross(p.fun, [p.n] * p.d, **cargs)
    el = time.perf_counter() - t0
    print(f"run{i}: {el:.3f}s sweeps={res.sweeps} neval={res.neval} "
          f"digits={-np.log10(max(res.errors[-1], 1e-17)):.2f} "
          f"evals/s={res.neval/el:,.0f}")
