"""f32 precision tier (the reference's real*4 compile-time dispatch,
dmrgg.f90:62-84 / README.md:41-45): the engine runs with TTCROSS_NO_X64=1
and converges to f32-level digits."""

import os
import subprocess
import sys
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_f32_engine_subprocess():
    code = textwrap.dedent("""
        import os
        os.environ["TTCROSS_NO_X64"] = "1"
        os.environ["JAX_PLATFORMS"] = "cpu"
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        import ttcross_tpu
        import jax.numpy as jnp
        assert jnp.asarray(1.0).dtype == jnp.float32
        from ttcross_tpu.cross import cross
        from ttcross_tpu.config import precision_thresholds
        se, sp = precision_thresholds()
        assert sp == 1e-3, sp   # the real*4 dispatch row
        import ttcross_tpu.tt as tt
        rng = np.random.default_rng(0)
        cores = [rng.standard_normal((r1, 7, r2)).astype(np.float32)
                 for (r1, r2) in [(1, 2), (2, 2), (2, 1)]]
        T = tt.from_cores(cores)
        dense = np.asarray(tt.full(T))
        def fun(ind):
            return tt.gather(T, ind)
        res = cross(fun, [7] * 3, max_rank=4, pivoting=1, accuracy=1e-5,
                    dtype=jnp.float32)
        err = np.abs(np.asarray(tt.full(res.tt)) - dense).max()
        assert err < 1e-4, err   # f32-level recovery
        print("F32OK", err)
    """)
    env = dict(os.environ, TTCROSS_NO_X64="1", JAX_PLATFORMS="cpu", PYTHONPATH=ROOT)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600, env=env, cwd=ROOT)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "F32OK" in out.stdout
