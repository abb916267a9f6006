import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
from ttcross_tpu.apps.ising import make_ising
from ttcross_tpu.cross import cross

p = make_ising("C", m=256, n=17)
cargs = dict(max_rank=10, accuracy=1e-10, pivoting=1,
             quad=[p.quad_weights] * p.d, truth=p.truth,
             sweep_mode="jacobi")
for i in range(3):
    t0 = time.perf_counter()
    res = cross(p.fun, [p.n] * p.d, **cargs)
    el = time.perf_counter() - t0
    print(f"run{i}: {el:.3f}s sweeps={res.sweeps} neval={res.neval} "
          f"digits={-np.log10(res.errors[-1]):.2f} "
          f"ms/sweep={1e3*el/max(res.sweeps,1):.1f}")
