"""TT serialization: binary stream format, npz, and HDF5 export.

Maps ttio.f90 (custom 'TT' stream format with header/version check,
ttio.f90:10-17, 29-399) and utils.f90's HDF5 export schema
(save_dtt_to_hdf5, utils.f90:8-57: group "TT" with int datasets
modes/ranks and double datasets core_0..core_{d-1}).  Unlike the
reference, the HDF5 path is read AND write, and there is an additional
engine-state checkpoint (the reference never persists a running cross —
SURVEY.md §5 'checkpoint/resume').
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from .types import TT, from_cores

__all__ = ["save_ttbin", "load_ttbin", "save_ttbin_ref", "load_ttbin_ref",
           "save_npz", "load_npz",
           "save_hdf5", "load_hdf5", "save_state", "load_state"]

_MAGIC = b"TTX1"
_VERSION = (1, 0)

# the reference stream format's compile-time constants (ttio.f90:5-17)
_REF_TT_SIZE = 2048
_REF_HEAD = struct.Struct("<8s2i4i64s8i")   # txt, ver(2), inf(4), comment, i(8)


def save_ttbin(t: TT, path: str) -> None:
    """Binary stream format: magic 'TTX1', version, flags (bit0 = complex),
    d, modes, ranks, then cores in C order (design follows the reference's
    header+payload stream, ttio.f90:29-109)."""
    is_complex = bool(jnp.iscomplexobj(t.cores[0]))
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<4i", *_VERSION, 1 if is_complex else 0, t.d))
        f.write(np.asarray(t.n, dtype="<i8").tobytes())
        f.write(np.asarray(t.r, dtype="<i8").tobytes())
        for c in t.cores:
            arr = np.asarray(c, dtype="<c16" if is_complex else "<f8")
            f.write(arr.tobytes())


def load_ttbin(path: str) -> TT:
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"not a ttcross binary TT file (magic {magic!r})")
        vmaj, vmin, flags, d = struct.unpack("<4i", f.read(16))
        if vmaj != _VERSION[0]:
            raise ValueError(f"unsupported TT file version {vmaj}.{vmin}")
        n = np.frombuffer(f.read(8 * d), dtype="<i8")
        r = np.frombuffer(f.read(8 * (d + 1)), dtype="<i8")
        dt = "<c16" if flags & 1 else "<f8"
        cores = []
        for c in range(d):
            count = int(r[c] * n[c] * r[c + 1])
            buf = np.frombuffer(f.read(count * np.dtype(dt).itemsize), dtype=dt)
            cores.append(buf.reshape(r[c], n[c], r[c + 1]))
    return from_cores([jnp.asarray(c) for c in cores])


def save_ttbin_ref(t: TT, path: str, comment: str = "") -> None:
    """Write the REFERENCE's binary 'TT' stream format (ttio.f90:10-17,
    29-109; gfortran unformatted stream access = raw bytes, no record
    markers), byte-compatible with dtt_read/ztt_read:

      tthead {txt 'TT      ', ver (1,0) i4x2, inf (tt_size, complex?, 0, 0)
              i4x4, comment char(64), i i4x8 with i(1)=l, i(2)=m}
      l, m                      i4x2          (l=1, m=d here)
      n(l:m), r(l-1:m)          i4
      cores                     f8 (c16 if complex), Fortran column-major
                                (r_{b-1}, n_b, r_b) per core, concatenated

    A TT written here loads in the Fortran with `call read(tt, fnam)`."""
    is_complex = bool(jnp.iscomplexobj(t.cores[0]))
    l, m = 1, t.d
    head = _REF_HEAD.pack(
        b"TT      ", 1, 0, _REF_TT_SIZE, 1 if is_complex else 0, 0, 0,
        comment.encode()[:64].ljust(64), l, m, 0, 0, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack("<2i", l, m))
        f.write(np.asarray(t.n, dtype="<i4").tobytes())
        f.write(np.asarray(t.r, dtype="<i4").tobytes())
        for c in t.cores:
            arr = np.asarray(c, dtype="<c16" if is_complex else "<f8")
            # our (r1, n, r2) C-order core == Fortran (r1, n, r2)
            # column-major after axis reversal
            f.write(arr.transpose(2, 1, 0).tobytes())


def load_ttbin_ref(path: str) -> TT:
    """Read a reference-written 'TT' stream (dtt_write/ztt_write,
    ttio.f90:29-192), applying the reference reader's own validation:
    txt starts with 'TT' and ver(1) == 1 (ttio.f90:240-248)."""
    with open(path, "rb") as f:
        head = f.read(_REF_HEAD.size)
        if len(head) < _REF_HEAD.size:
            raise ValueError("truncated TT header")
        fields = _REF_HEAD.unpack(head)
        txt, vmaj, vmin = fields[0], fields[1], fields[2]
        inf = fields[3:7]
        if txt[:2] != b"TT":
            raise ValueError(f"not a TT header: {txt!r}")
        if vmaj != 1:
            raise ValueError(f"unsupported TT file version {vmaj}.{vmin}")
        is_complex = inf[1] == 1
        l, m = struct.unpack("<2i", f.read(8))
        d = m - l + 1
        if d < 1:
            raise ValueError(f"strange l,m: {l},{m}")
        n = np.frombuffer(f.read(4 * d), dtype="<i4")
        r = np.frombuffer(f.read(4 * (d + 1)), dtype="<i4")
        dt = np.dtype("<c16" if is_complex else "<f8")
        cores = []
        for b in range(d):
            count = int(r[b] * n[b] * r[b + 1])
            buf = np.frombuffer(f.read(count * dt.itemsize), dtype=dt)
            if buf.size != count:
                raise ValueError(f"truncated core {b}")
            # Fortran column-major (r1, n, r2) -> C-order via reversed
            # shape + axis reversal
            cores.append(buf.reshape(int(r[b + 1]), int(n[b]),
                                     int(r[b])).transpose(2, 1, 0))
    return from_cores([jnp.asarray(c) for c in cores])


def save_npz(t: TT, path: str) -> None:
    np.savez(path, d=t.d, **{f"core_{c}": np.asarray(t.cores[c]) for c in range(t.d)})


def load_npz(path: str) -> TT:
    data = np.load(path)
    d = int(data["d"])
    return from_cores([jnp.asarray(data[f"core_{c}"]) for c in range(d)])


def save_hdf5(t: TT, path: str) -> None:
    """HDF5 export with the reference's schema (utils.f90:8-57): group "TT",
    datasets modes (int), ranks (int), core_0..core_{d-1} (float)."""
    import h5py

    with h5py.File(path, "w") as f:
        g = f.create_group("TT")
        g.create_dataset("modes", data=np.asarray(t.n, dtype=np.int64))
        g.create_dataset("ranks", data=np.asarray(t.r, dtype=np.int64))
        for c in range(t.d):
            g.create_dataset(f"core_{c}", data=np.asarray(t.cores[c]))


def load_hdf5(path: str) -> TT:
    """HDF5 reader (the reference is write-only, utils.f90 — parity plus)."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f["TT"]
        d = g["modes"].shape[0]
        return from_cores([jnp.asarray(g[f"core_{c}"][...]) for c in range(d)])


def save_state(state, path: str) -> None:
    """Checkpoint a running cross (CrossState pytree) — engine-state
    persistence the reference lacks (SURVEY.md §5)."""
    np.savez(path, **{k: np.asarray(v) for k, v in state._asdict().items()})


def load_state(path: str):
    from ..cross.state import CrossState

    data = np.load(path)
    vals = {}
    for k in CrossState._fields:
        if k in data.files:
            vals[k] = jnp.asarray(data[k])
        elif k == "padded":   # checkpoints predating the padded counter
            vals[k] = jnp.zeros((), jnp.int64)
        else:
            raise KeyError(f"checkpoint missing CrossState field {k!r}")
    return CrossState(**vals)
