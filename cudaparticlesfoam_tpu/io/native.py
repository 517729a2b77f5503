"""ctypes loader for the native I/O runtime (csrc/fastio.cpp).

Compiles the shared library on first use (g++, cached next to csrc/) and
exposes typed wrappers; every caller has a pure-Python fallback, so a
missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _build_and_load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.abspath(os.path.join(_CSRC, "fastio.cpp"))
        so = os.path.abspath(os.path.join(_CSRC, "libfastio.so"))
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except Exception:
            return None

        lib.parse_doubles.restype = ctypes.c_long
        lib.parse_doubles.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_long,
        ]
        lib.parse_longs.restype = ctypes.c_long
        lib.parse_longs.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            np.ctypeslib.ndpointer(np.int64, flags="C"), ctypes.c_long,
        ]
        lib.write_particles_vtu.restype = ctypes.c_int
        lib.write_particles_vtu.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_void_p,            # convex ids or NULL
            ctypes.c_long, ctypes.c_int,
        ]
        lib.write_particles_obj.restype = ctypes.c_int
        lib.write_particles_obj.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_long,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _build_and_load() is not None


def parse_doubles(text: str) -> np.ndarray | None:
    lib = _build_and_load()
    if lib is None:
        return None
    raw = text.encode()
    # one generous-bound pass: numbers are >= 2 chars apart on average in
    # these files; cap = len/2 + 1 always suffices
    cap = len(raw) // 2 + 2
    out = np.empty(cap, np.float64)
    n = lib.parse_doubles(raw, len(raw), out, cap)
    if n > cap:  # paranoia: re-run with the exact size
        out = np.empty(n, np.float64)
        n = lib.parse_doubles(raw, len(raw), out, n)
    return out[:n].copy()


def parse_longs(text: str) -> np.ndarray | None:
    lib = _build_and_load()
    if lib is None:
        return None
    raw = text.encode()
    cap = len(raw) // 2 + 2
    out = np.empty(cap, np.int64)
    n = lib.parse_longs(raw, len(raw), out, cap)
    if n > cap:
        out = np.empty(n, np.int64)
        n = lib.parse_longs(raw, len(raw), out, n)
    return out[:n].copy()


def write_particles_vtu(
    path: str, pos, vel, tet_ids, types, convex_ids=None, ke_quirk=True
) -> bool:
    lib = _build_and_load()
    if lib is None:
        return False
    pos = np.ascontiguousarray(pos, np.float64)
    vel = np.ascontiguousarray(vel, np.float64)
    tet_ids = np.ascontiguousarray(tet_ids, np.int32)
    types = np.ascontiguousarray(types, np.int32)
    if convex_ids is not None:
        convex_ids = np.ascontiguousarray(convex_ids, np.int32)
        cptr = convex_ids.ctypes.data_as(ctypes.c_void_p)
    else:
        cptr = None
    rc = lib.write_particles_vtu(
        path.encode(), pos, vel, tet_ids, types, cptr, len(pos), int(ke_quirk)
    )
    return rc == 0


def write_particles_obj(path: str, pos) -> bool:
    lib = _build_and_load()
    if lib is None:
        return False
    pos = np.ascontiguousarray(pos, np.float64)
    return lib.write_particles_obj(path.encode(), pos, len(pos)) == 0


# ---------------------------------------------------------------------------
# native mesh builders (csrc/meshbuild.cpp, OpenMP)
# ---------------------------------------------------------------------------

_mb_lib = None
_mb_tried = False


def _build_and_load_meshbuild():
    global _mb_lib, _mb_tried
    with _lock:
        if _mb_lib is not None or _mb_tried:
            return _mb_lib
        _mb_tried = True
        src = os.path.abspath(os.path.join(_CSRC, "meshbuild.cpp"))
        so = os.path.abspath(os.path.join(_CSRC, "libmeshbuild.so"))
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    ["g++", "-O3", "-ffp-contract=off", "-fopenmp", "-shared", "-fPIC", src, "-o", so],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except Exception:
            return None

        f64 = np.ctypeslib.ndpointer(np.float64, flags="C")
        i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
        lib.face_base_points.restype = None
        lib.face_base_points.argtypes = [
            f64, i64, i64, i64, i64, f64,
            ctypes.c_int64, ctypes.c_int64, i64,
        ]
        lib.face_centres_areas.restype = None
        lib.face_centres_areas.argtypes = [
            f64, i64, i64, ctypes.c_int64, f64, f64,
        ]
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C")
        lib.build_tet_tables.restype = None
        lib.build_tet_tables.argtypes = [
            f64, i64, ctypes.c_int64, ctypes.c_int64,
            i32, i32, i32, i32, i32, i32, i32,
            f64, f64, i32, f64, f64, i64,
        ]
        _mb_lib = lib
        return _mb_lib


def face_base_points(points, face_verts, face_offsets, owner, neighbour,
                     n_int, cell_ctrs) -> "np.ndarray | None":
    """OpenMP quality-driven base-point search; None if no toolchain
    (caller falls back to the numpy implementation)."""
    lib = _build_and_load_meshbuild()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float64)
    face_verts = np.ascontiguousarray(face_verts, np.int64)
    face_offsets = np.ascontiguousarray(face_offsets, np.int64)
    owner = np.ascontiguousarray(owner, np.int64)
    neighbour = np.ascontiguousarray(neighbour, np.int64)
    cell_ctrs = np.ascontiguousarray(cell_ctrs, np.float64)
    nf = len(face_offsets) - 1
    out = np.empty(nf, np.int64)
    lib.face_base_points(
        points, face_verts, face_offsets, owner, neighbour, cell_ctrs,
        nf, int(n_int), out,
    )
    return out


def face_centres_areas(points, face_verts, face_offsets):
    """OpenMP face centroids + area vectors; None if no toolchain."""
    lib = _build_and_load_meshbuild()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float64)
    face_verts = np.ascontiguousarray(face_verts, np.int64)
    face_offsets = np.ascontiguousarray(face_offsets, np.int64)
    nf = len(face_offsets) - 1
    ctrs = np.empty((nf, 3), np.float64)
    areas = np.empty((nf, 3), np.float64)
    lib.face_centres_areas(points, face_verts, face_offsets, nf, ctrs, areas)
    return ctrs, areas


def build_tet_tables(points, tets):
    """OpenMP C++ canonicalize + face tables + walk table (bit-faithful
    to the numpy reference, see csrc/meshbuild.cpp); None if no toolchain.

    Returns (tets_canon, faces, tet_faces, face_front, face_back,
    bd_face_ids, bd_tet, bd_slot, a, tinv, nbr, n, dpl).
    """
    lib = _build_and_load_meshbuild()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, np.float64)
    tets = np.ascontiguousarray(tets, np.int64).copy()   # canonicalized in place
    nt = len(tets)
    m4 = 4 * nt
    faces = np.empty((m4, 3), np.int32)
    tet_faces = np.empty((nt, 4), np.int32)
    face_front = np.empty(m4, np.int32)
    face_back = np.empty(m4, np.int32)
    bd_ids = np.empty(m4, np.int32)
    bd_tet = np.empty(m4, np.int32)
    bd_slot = np.empty(m4, np.int32)
    a = np.empty((nt, 3), np.float64)
    tinv = np.empty((nt, 3, 3), np.float64)
    nbr = np.empty((nt, 4), np.int32)
    n = np.empty((nt, 4, 3), np.float64)
    dpl = np.empty((nt, 4), np.float64)
    counts = np.zeros(2, np.int64)
    lib.build_tet_tables(
        points, tets, nt, len(points),
        faces, tet_faces, face_front, face_back, bd_ids, bd_tet, bd_slot,
        a, tinv, nbr, n, dpl, counts,
    )
    nf, nbd = int(counts[0]), int(counts[1])
    return (
        tets, faces[:nf].copy(), tet_faces, face_front[:nf].copy(),
        face_back[:nf].copy(), bd_ids[:nbd].copy(), bd_tet[:nbd].copy(),
        bd_slot[:nbd].copy(), a, tinv, nbr, n, dpl,
    )
