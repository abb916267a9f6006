import numpy as np
import pytest

import ttcross_tpu.tt as tt
from ttcross_tpu.tt.serialize import (
    load_hdf5,
    load_npz,
    load_state,
    load_ttbin,
    load_ttbin_ref,
    save_hdf5,
    save_npz,
    save_state,
    save_ttbin,
    save_ttbin_ref,
)


def random_tt(rng, complex_=False):
    cores = [rng.standard_normal((r1, n, r2)) for (r1, n, r2) in
             [(1, 4, 3), (3, 5, 2), (2, 3, 1)]]
    if complex_:
        cores = [c + 1j * rng.standard_normal(c.shape) for c in cores]
    return tt.from_cores(cores)


def test_ttbin_roundtrip(rng, tmp_path):
    t = random_tt(rng)
    p = str(tmp_path / "t.ttx")
    save_ttbin(t, p)
    t2 = load_ttbin(p)
    assert t2.n == t.n and t2.r == t.r
    np.testing.assert_array_equal(np.asarray(tt.full(t2)), np.asarray(tt.full(t)))


def test_ttbin_complex_roundtrip(rng, tmp_path):
    t = random_tt(rng, complex_=True)
    p = str(tmp_path / "t.ttx")
    save_ttbin(t, p)
    t2 = load_ttbin(p)
    assert np.iscomplexobj(np.asarray(t2.cores[0]))
    np.testing.assert_array_equal(np.asarray(tt.full(t2)), np.asarray(tt.full(t)))


def test_ttbin_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ttx"
    p.write_bytes(b"NOPE" + b"\0" * 64)
    with pytest.raises(ValueError, match="magic"):
        load_ttbin(str(p))


def test_ttbin_ref_roundtrip(rng, tmp_path):
    t = random_tt(rng)
    p = str(tmp_path / "t.tt")
    save_ttbin_ref(t, p, comment="roundtrip")
    t2 = load_ttbin_ref(p)
    assert t2.n == t.n and t2.r == t.r
    np.testing.assert_array_equal(np.asarray(tt.full(t2)), np.asarray(tt.full(t)))


def test_ttbin_ref_complex_roundtrip(rng, tmp_path):
    t = random_tt(rng, complex_=True)
    p = str(tmp_path / "t.tt")
    save_ttbin_ref(t, p)
    t2 = load_ttbin_ref(p)
    assert np.iscomplexobj(np.asarray(t2.cores[0]))
    np.testing.assert_array_equal(np.asarray(tt.full(t2)), np.asarray(tt.full(t)))


def test_ttbin_ref_loads_synthetic_reference_layout(tmp_path):
    """Golden-bytes fixture: a file laid out byte-for-byte as gfortran's
    dtt_write emits it (unformatted stream access = raw bytes; tthead
    sequence {txt char8, ver 2xi4, inf 4xi4, comment char64, i 8xi4},
    then l,m, n(l:m), r(l-1:m) as i4, then cores in Fortran column-major
    (r_{b-1}, n_b, r_b) order — ttio.f90:10-17, 29-109)."""
    import struct

    rng = np.random.default_rng(7)
    n, r = [2, 3], [1, 2, 1]
    cores = [rng.standard_normal((r[b], n[b], r[b + 1])) for b in range(2)]
    blob = b"TT      "                                 # txt
    blob += struct.pack("<2i", 1, 0)                   # ver
    blob += struct.pack("<4i", 2048, 0, 0, 0)          # inf (tt_size, real)
    blob += b" " * 64                                  # comment
    blob += struct.pack("<8i", 1, 2, 0, 0, 0, 0, 0, 0)  # i(1)=l, i(2)=m
    blob += struct.pack("<2i", 1, 2)                   # l, m
    blob += np.asarray(n, "<i4").tobytes()             # n(l:m)
    blob += np.asarray(r, "<i4").tobytes()             # r(l-1:m)
    for c in cores:
        blob += np.asarray(c, "<f8").tobytes(order="F")  # column-major
    p = tmp_path / "ref.tt"
    p.write_bytes(blob)
    t = load_ttbin_ref(str(p))
    assert t.n == (2, 3) and t.r == (1, 2, 1)
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(t.cores[b]), cores[b])


def test_ttbin_ref_rejects_wrong_version(tmp_path):
    blob = b"TT      " + np.asarray([9, 0], "<i4").tobytes() + b"\0" * 120
    p = tmp_path / "bad.tt"
    p.write_bytes(blob)
    with pytest.raises(ValueError, match="version"):
        load_ttbin_ref(str(p))


def test_npz_roundtrip(rng, tmp_path):
    t = random_tt(rng)
    p = str(tmp_path / "t.npz")
    save_npz(t, p)
    t2 = load_npz(p)
    np.testing.assert_array_equal(np.asarray(tt.full(t2)), np.asarray(tt.full(t)))


def test_hdf5_roundtrip_reference_schema(rng, tmp_path):
    h5py = pytest.importorskip("h5py")
    t = random_tt(rng)
    p = str(tmp_path / "t.h5")
    save_hdf5(t, p)
    with h5py.File(p) as f:  # exact schema of utils.f90:8-57
        assert set(f["TT"].keys()) == {"modes", "ranks", "core_0", "core_1", "core_2"}
        assert list(f["TT"]["modes"][...]) == [4, 5, 3]
    t2 = load_hdf5(p)
    np.testing.assert_array_equal(np.asarray(tt.full(t2)), np.asarray(tt.full(t)))


def test_state_checkpoint_roundtrip(tmp_path):
    import jax

    from ttcross_tpu.cross.state import empty_state

    st = empty_state(4, 6, 3, jax.random.PRNGKey(7))
    st = st._replace(amax=st.amax + 3.25, rk=st.rk.at[1].set(2))
    p = str(tmp_path / "st.npz")
    save_state(st, p)
    st2 = load_state(p)
    assert float(st2.amax) == 3.25
    assert int(st2.rk[1]) == 2
    np.testing.assert_array_equal(np.asarray(st2.key), np.asarray(st.key))
