import numpy as np
import pytest

import ttcross_tpu.tt as tt
from ttcross_tpu.tt.serialize import (
    load_hdf5,
    load_npz,
    load_state,
    load_ttbin,
    save_hdf5,
    save_npz,
    save_state,
    save_ttbin,
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
