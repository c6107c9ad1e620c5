"""ctypes bindings for the native host helpers (``src/mcpt_native.cpp``).

Build with ``make -C mcpt/native`` (or ``mcpt.native.ensure_built()``).  Every
entry point has a pure-Python fallback — the native library accelerates the
host side (obj parsing, CPU BVH builds for large scenes), it is never required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmcpt_native.so")
_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build the shared library if missing; returns availability."""
    if os.path.exists(_SO):
        return True
    try:
        subprocess.run(
            ["make", "-C", _DIR],
            check=True,
            capture_output=quiet,
        )
    except Exception:
        return False
    return os.path.exists(_SO)


def load() -> "ctypes.CDLL | None":
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not ensure_built():
        return None
    lib = ctypes.CDLL(_SO)
    c_float_p = ctypes.POINTER(ctypes.c_float)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    lib.mcpt_load_obj.restype = ctypes.c_void_p
    lib.mcpt_load_obj.argtypes = [ctypes.c_char_p, ctypes.c_char_p, c_int_p,
                                  c_int_p]
    lib.mcpt_get_tris.argtypes = [ctypes.c_void_p, c_float_p, c_int_p]
    lib.mcpt_get_mats.argtypes = [ctypes.c_void_p] + [c_float_p] * 5 + [c_int_p]
    lib.mcpt_free.argtypes = [ctypes.c_void_p]
    lib.mcpt_build_lbvh.argtypes = [c_float_p, ctypes.c_int, c_float_p,
                                    c_float_p, c_int_p, c_int_p, c_int_p]
    lib.mcpt_treelet_optimize.argtypes = [ctypes.c_int, c_float_p, c_float_p,
                                          c_int_p, c_int_p, c_int_p]
    lib.mcpt_epo.restype = ctypes.c_double
    lib.mcpt_epo.argtypes = [c_float_p, ctypes.c_int, c_float_p, c_float_p,
                             c_int_p, c_int_p, ctypes.c_double,
                             ctypes.c_double, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def load_object_native(directory: str, objname: str):
    """Native .obj/.mtl load → LoadedObject (same result as the Python
    loader, reference ``thirdpartywrapper.cpp:25-99`` semantics)."""
    from mcpt.io.objloader import LoadedObject

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n_tris = ctypes.c_int(0)
    n_mats = ctypes.c_int(0)
    h = lib.mcpt_load_obj(
        directory.encode(), objname.encode(), ctypes.byref(n_tris),
        ctypes.byref(n_mats),
    )
    if not h:
        raise FileNotFoundError(os.path.join(directory, objname))
    try:
        nt, nm = n_tris.value, n_mats.value
        verts = np.zeros((nt, 3, 3), np.float32)
        mat_id = np.zeros(nt, np.int32)
        lib.mcpt_get_tris(h, _fp(verts), _ip(mat_id))
        kd = np.zeros((nm, 3), np.float32)
        ks = np.zeros((nm, 3), np.float32)
        ka = np.zeros((nm, 3), np.float32)
        ns = np.zeros(nm, np.float32)
        ni = np.ones(nm, np.float32)
        mtype = np.zeros(nm, np.int32)
        if nm:
            lib.mcpt_get_mats(h, _fp(kd), _fp(ks), _fp(ka), _fp(ns), _fp(ni),
                              _ip(mtype))
        return LoadedObject(
            verts=verts, mat_id=mat_id, mtype=mtype, kd=kd, ks=ks, ka=ka,
            ns=ns, ni=ni, mat_names=[],
        )
    finally:
        lib.mcpt_free(h)


def build_lbvh_native(verts: np.ndarray):
    """Native CPU LBVH → numpy arrays (reference layout contract)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    v = np.ascontiguousarray(verts, np.float32).reshape(-1, 9)
    n = v.shape[0]
    n_nodes = 2 * n - 1
    bbmin = np.zeros((n_nodes, 3), np.float32)
    bbmax = np.zeros((n_nodes, 3), np.float32)
    left = np.zeros(n_nodes, np.int32)
    right = np.zeros(n_nodes, np.int32)
    parent = np.full(n_nodes, -1, np.int32)
    lib.mcpt_build_lbvh(_fp(v), n, _fp(bbmin), _fp(bbmax), _ip(left),
                        _ip(right), _ip(parent))
    return bbmin, bbmax, left, right, parent


def treelet_optimize_native(bbmin, bbmax, left, right, parent):
    """In-place native treelet restructuring on flat numpy BVH arrays."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = (left.shape[0] + 1) // 2
    for a, dt in ((bbmin, np.float32), (bbmax, np.float32), (left, np.int32),
                  (right, np.int32), (parent, np.int32)):
        assert a.dtype == dt and a.flags.c_contiguous
    lib.mcpt_treelet_optimize(n, _fp(bbmin), _fp(bbmax), _ip(left), _ip(right),
                              _ip(parent))
    return bbmin, bbmax, left, right, parent


def epo_native(verts, bbmin, bbmax, left, right, c_inn, c_tri,
               n_threads: int | None = None) -> float:
    """Native EPO walk (parallel over leaves); see mcpt_native.cpp."""
    import os

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    v = np.ascontiguousarray(verts, np.float32).reshape(-1, 9)
    bmn = np.ascontiguousarray(bbmin, np.float32)
    bmx = np.ascontiguousarray(bbmax, np.float32)
    lf = np.ascontiguousarray(left, np.int32)
    rt = np.ascontiguousarray(right, np.int32)
    if n_threads is None:
        n_threads = min(16, os.cpu_count() or 1)
    return float(lib.mcpt_epo(_fp(v), v.shape[0], _fp(bmn), _fp(bmx),
                              _ip(lf), _ip(rt), float(c_inn), float(c_tri),
                              int(n_threads)))
