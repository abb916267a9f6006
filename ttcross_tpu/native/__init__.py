"""Native (C++) runtime components, bound via ctypes.

Builds lazily on first use with g++ (no pybind11 in the image); every entry
point has a pure-Python fallback so the package works without a toolchain.
See src/ttcross_native.cpp for what lives here and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "gauss_legendre_dd", "contract_q", "tt_write_native",
           "tt_read_native", "gaussian_chf_native", "build",
           "mpfr_available", "build_mpfr"]

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "src", "ttcross_native.cpp")
_LIB = os.path.join(_DIR, "libttcross_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library (g++ -O2 -lquadmath)."""
    if os.path.exists(_LIB) and not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return True
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC, "-lquadmath"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(_LIB)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.gauss_legendre_q.argtypes = [ctypes.c_int64, f64p, f64p, f64p, f64p]
        lib.dd_contract_chain.argtypes = [
            ctypes.c_int64, i64p, i64p, f64p, f64p, f64p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        lib.tt_write_raw.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p,
                                     i64p, f64p, ctypes.c_int64, ctypes.c_int32]
        lib.tt_read_header.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                                       ctypes.POINTER(ctypes.c_int32), i64p, i64p,
                                       ctypes.c_int64]
        lib.tt_read_data.argtypes = [ctypes.c_char_p, ctypes.c_int64, f64p,
                                     ctypes.c_int64]
        lib.gaussian_chf_batch.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                           f64p, f64p, f64p, f64p, f64p]
        lib.stdnorm_q.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                  f64p, f64p, f64p, f64p]
        lib.ising_c_q.argtypes = [ctypes.c_int64, ctypes.c_int64, i64p,
                                  f64p, f64p, f64p, f64p, f64p, f64p]
        lib.cross_value_q.argtypes = [
            ctypes.c_int64, i64p, i64p, f64p, f64p, f64p, f64p, f64p, f64p,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ------------------------------------------------------------------ MPFR
# Second shared library: the native arbitrary-precision cross engine
# (src/mpfr_cross.cpp, the reference's compiled-MPFR role).  Built and
# loaded separately so the base lib keeps zero external dependencies;
# the image ships libmpfr.so.6/libgmp.so.10 without dev symlinks, hence
# the -l: versioned-name links.
_MPFR_SRC = os.path.join(_DIR, "src", "mpfr_cross.cpp")
_MPFR_LIB = os.path.join(_DIR, "libttcross_mpfr.so")
_mpfr_lib = None
_mpfr_tried = False


def build_mpfr(force: bool = False) -> bool:
    if (os.path.exists(_MPFR_LIB) and not force
            and os.path.getmtime(_MPFR_LIB) >= os.path.getmtime(_MPFR_SRC)):
        return True
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", _MPFR_LIB, _MPFR_SRC,
           "-l:libmpfr.so.6", "-l:libgmp.so.10"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return True
    except Exception:
        return False


def _load_mpfr():
    global _mpfr_lib, _mpfr_tried
    with _lock:
        if _mpfr_lib is not None or _mpfr_tried:
            return _mpfr_lib
        _mpfr_tried = True
        if not build_mpfr():
            return None
        lib = ctypes.CDLL(_MPFR_LIB)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
        lib.mp_selftest.restype = ctypes.c_int64
        lib.mp_ising_cross.restype = ctypes.c_int64
        lib.mp_ising_cross.argtypes = [
            ctypes.c_char, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            i64p, f64p, f64p, ctypes.c_int64]
        lib.mp_cross_cb.restype = ctypes.c_int64
        lib.mp_cross_cb.argtypes = [
            MP_FUN_CB, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), i64p]
        # ABI sanity before trusting the hand-declared struct layout
        if lib.mp_selftest() != 27182818:
            _mpfr_lib = None
            return None
        _mpfr_lib = lib
        return _mpfr_lib


MP_FUN_CB = ctypes.CFUNCTYPE(None, ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_char), ctypes.c_int64)


def mpfr_available() -> bool:
    return _load_mpfr() is not None


def gauss_legendre_dd(n: int):
    """Gauss-Legendre nodes/weights as double-double (hi, lo) pairs,
    computed natively in __float128 (~1e-34 accuracy).  Falls back to the
    f64 rule with zero lo parts."""
    lib = _load()
    if lib is None:
        from ..ops.quadrature import lgwt

        x, w = lgwt(n)
        z = np.zeros(n)
        return (x, z.copy()), (w, z.copy())
    xh = np.zeros(n)
    xl = np.zeros(n)
    wh = np.zeros(n)
    wl = np.zeros(n)
    rc = lib.gauss_legendre_q(n, xh, xl, wh, wl)
    if rc != 0:
        raise RuntimeError(f"gauss_legendre_q failed: {rc}")
    return (xh, xl), (wh, wl)


def contract_q(t, weights_hi, weights_lo=None):
    """Quad-precision TT chain contraction on host (verification reference
    for the device dd path).  Returns (hi, lo)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    d = t.d
    rk = np.asarray(t.r, dtype=np.int64)
    nm = np.asarray(t.n, dtype=np.int64)
    flat = np.concatenate([np.asarray(c, dtype=np.float64).ravel() for c in t.cores])
    N = int(nm.max())
    wh = np.zeros((d, N))
    wl = np.zeros((d, N))
    for c in range(d):
        wh[c, : nm[c]] = np.asarray(weights_hi[c])
        if weights_lo is not None:
            wl[c, : nm[c]] = np.asarray(weights_lo[c])
    hi = ctypes.c_double()
    lo = ctypes.c_double()
    rc = lib.dd_contract_chain(d, rk, nm, flat, wh.ravel(), wl.ravel(), N,
                               ctypes.byref(hi), ctypes.byref(lo))
    if rc != 0:
        raise RuntimeError(f"dd_contract_chain failed: {rc}")
    return hi.value, lo.value


def stdnorm_dd(ind, nodes_hi, nodes_lo):
    """exp(-sum x^2) at dd nodes in __float128; ind (B, d) -> (hi, lo)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    ind = np.ascontiguousarray(ind, dtype=np.int64)
    B, d = ind.shape
    hi = np.zeros(B)
    lo = np.zeros(B)
    lib.stdnorm_q(B, d, ind, np.ascontiguousarray(nodes_hi),
                  np.ascontiguousarray(nodes_lo), hi, lo)
    return hi, lo


def ising_c_dd(ind, nodes_hi, nodes_lo, w_hi, w_lo):
    """Ising C-kind integrand at dd nodes/weights in __float128."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    ind = np.ascontiguousarray(ind, dtype=np.int64)
    B, d = ind.shape
    hi = np.zeros(B)
    lo = np.zeros(B)
    lib.ising_c_q(B, d, ind, np.ascontiguousarray(nodes_hi),
                  np.ascontiguousarray(nodes_lo), np.ascontiguousarray(w_hi),
                  np.ascontiguousarray(w_lo), hi, lo)
    return hi, lo


def cross_value_dd(rk, n, cores_hi, cores_lo, ahat_hi, ahat_lo,
                   weights_hi, weights_lo):
    """Quadrature value of the cross interpolant in __float128: chain of
    per-core contractions with Ahat^{-1} LU solves (the mp-tier
    dtt_lua + dtt_quad pipeline).  cores/ahat are lists of (hi, lo) numpy
    arrays; returns (hi, lo)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    d = len(n)
    rk = np.ascontiguousarray(rk, dtype=np.int64)
    nm = np.ascontiguousarray(n, dtype=np.int64)
    ch = np.ascontiguousarray(np.concatenate([np.asarray(c).ravel() for c in cores_hi]))
    cl = np.ascontiguousarray(np.concatenate([np.asarray(c).ravel() for c in cores_lo]))
    if len(ahat_hi):
        ahh = np.ascontiguousarray(np.concatenate([np.asarray(a).ravel() for a in ahat_hi]))
        ahl = np.ascontiguousarray(np.concatenate([np.asarray(a).ravel() for a in ahat_lo]))
    else:
        ahh = np.zeros(1)
        ahl = np.zeros(1)
    N = int(nm.max())
    wh = np.zeros((d, N))
    wl = np.zeros((d, N))
    for c in range(d):
        wh[c, : nm[c]] = np.asarray(weights_hi[c])
        wl[c, : nm[c]] = np.asarray(weights_lo[c])
    hi = ctypes.c_double()
    lo = ctypes.c_double()
    rc = lib.cross_value_q(d, rk, nm, ch, cl, ahh, ahl,
                           np.ascontiguousarray(wh.ravel()),
                           np.ascontiguousarray(wl.ravel()), N,
                           ctypes.byref(hi), ctypes.byref(lo))
    if rc != 0:
        raise RuntimeError(f"cross_value_q failed: {rc} (singular pivot block?)")
    return hi.value, lo.value


def gaussian_chf_native(omega, mu, sigma):
    """Independent C++ (long double) Gaussian CHF for the cross-language
    check (test_chf_equal parity).  omega (B, n) -> complex (B,)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    omega = np.ascontiguousarray(omega, dtype=np.float64)
    B, n = omega.shape
    mu = np.ascontiguousarray(mu, dtype=np.float64)
    sigma = np.ascontiguousarray(sigma, dtype=np.float64)
    re = np.zeros(B)
    im = np.zeros(B)
    lib.gaussian_chf_batch(B, n, omega, mu, sigma.ravel(), re, im)
    return re + 1j * im


def tt_write_native(t, path: str) -> None:
    lib = _load()
    if lib is None:
        from ..tt.serialize import save_ttbin

        save_ttbin(t, path)
        return
    is_complex = np.iscomplexobj(np.asarray(t.cores[0]))
    parts = []
    for c in t.cores:
        a = np.asarray(c)
        parts.append(a.view(np.float64).ravel() if is_complex else a.astype(np.float64).ravel())
    flat = np.ascontiguousarray(np.concatenate(parts))
    rc = lib.tt_write_raw(path.encode(), t.d, np.asarray(t.n, np.int64),
                          np.asarray(t.r, np.int64), flat, flat.size,
                          1 if is_complex else 0)
    if rc != 0:
        raise RuntimeError(f"tt_write_raw failed: {rc}")


def tt_read_native(path: str):
    from ..tt.types import from_cores

    lib = _load()
    if lib is None:
        from ..tt.serialize import load_ttbin

        return load_ttbin(path)
    MAXD = 4096
    d = ctypes.c_int64()
    cx = ctypes.c_int32()
    n = np.zeros(MAXD, np.int64)
    r = np.zeros(MAXD + 1, np.int64)
    rc = lib.tt_read_header(path.encode(), ctypes.byref(d), ctypes.byref(cx), n, r, MAXD)
    if rc != 0:
        raise ValueError(f"not a native TT file (rc={rc})")
    d = d.value
    n, r = n[:d], r[: d + 1]
    mult = 2 if cx.value else 1
    count = int(sum(r[c] * n[c] * r[c + 1] for c in range(d))) * mult
    flat = np.zeros(count)
    rc = lib.tt_read_data(path.encode(), d, flat, count)
    if rc != 0:
        raise ValueError(f"tt_read_data failed (rc={rc})")
    cores = []
    off = 0
    for c in range(d):
        cnt = int(r[c] * n[c] * r[c + 1]) * mult
        buf = flat[off: off + cnt]
        off += cnt
        if cx.value:
            buf = buf.view(np.complex128)
        cores.append(buf.reshape(int(r[c]), int(n[c]), int(r[c + 1])))
    return from_cores(cores)
