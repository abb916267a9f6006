"""Cross vs TT-SVD comparison (the role of plot-ttcross-and-ttsvd-data.py:
27-29, which prints the mean abs error between the two pipelines)."""

import numpy as np

import ttcross_tpu.tt as tt
from ttcross_tpu.apps import make_mvn
from ttcross_tpu.cross import cross


def test_cross_matches_ttsvd_pipeline():
    """Cross interpolation and dense TT-SVD compression of the same tensor
    must agree to the cross's interpolation accuracy."""
    prob = make_mvn(d=3, n=17)
    d, n = 3, prob.n
    grids = np.meshgrid(*[np.arange(n)] * d, indexing="ij")
    ind = np.stack([g.ravel() for g in grids], axis=1)
    dense = np.asarray(prob.fun(ind)).reshape([n] * d)

    t_svd = tt.from_dense(dense, tol=1e-12)
    res = cross(prob.fun, [n] * d, max_rank=12, pivoting=1, accuracy=1e-12)

    a = np.asarray(tt.full(res.tt))
    b = np.asarray(tt.full(t_svd))
    mean_abs = np.abs(a - b).mean()
    assert mean_abs < 1e-10, mean_abs
    # the quadrature values agree too
    w = [prob.quad_weights] * d
    va = float(tt.contract(res.tt, w))
    vb = float(tt.contract(t_svd, w))
    assert abs(va - vb) < 1e-10
