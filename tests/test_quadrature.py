import numpy as np

from ttcross_tpu.ops import lgwt, map_to_interval, quad_rinv, quad_rinv_error


def test_lgwt_matches_numpy():
    for n in (5, 17, 33, 65):
        x, w = lgwt(n)
        xr, wr = np.polynomial.legendre.leggauss(n)
        np.testing.assert_allclose(x, xr, atol=1e-13)
        np.testing.assert_allclose(w, wr, atol=1e-13)
        assert abs(w.sum() - 2.0) < 1e-13


def test_lgwt_integrates_polynomials():
    n = 9
    x, w = lgwt(n)
    # exact for degree <= 2n-1
    for k in range(0, 2 * n - 1, 2):
        np.testing.assert_allclose(np.dot(w, x**k), 2.0 / (k + 1), rtol=1e-12)


def test_map_to_interval():
    x, w = lgwt(17)
    xm, wm = map_to_interval(x, w, 2.0, 5.0)
    assert xm.min() > 2.0 and xm.max() < 5.0
    np.testing.assert_allclose(wm.sum(), 3.0, rtol=1e-13)


def test_quad_rinv_accuracy():
    q = quad_rinv(201)
    err = quad_rinv_error(q, 0.1, 100.0, 50)
    assert err < 1e-7, err


def test_weighted_lottery_distribution():
    import numpy as np

    from ttcross_tpu.ops import weighted_lottery

    wcol = np.array([0.0, 1.0, 3.0, 0.0])
    wrow = np.array([2.0, 0.0, 2.0])
    pts = np.asarray(weighted_lottery(0, wcol, wrow, 2000))
    assert set(np.unique(pts[:, 0])) <= {1, 2}
    assert set(np.unique(pts[:, 1])) <= {0, 2}
    frac = (pts[:, 0] == 2).mean()
    assert 0.65 < frac < 0.85  # ~3/4 weight on index 2
