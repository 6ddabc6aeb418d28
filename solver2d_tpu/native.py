"""ctypes loader for the native C++ scene compiler (csrc/s2native.cpp).

Builds the shared library on first use (g++, cached next to the source);
falls back to the pure-Python path silently when no compiler is available.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_HERE, "csrc", "s2native.cpp")
_LIB = os.path.join(_HERE, "csrc", "libs2native.so")

_lock = threading.Lock()
_lib = None
_tried = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get() -> "ct.CDLL | None":
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ct.CDLL(_LIB)
        except OSError:
            return None
        lib.s2n_compile_scene.argtypes = [
            ct.c_int, _f32p, _f32p, _i32p, _f32p, _f32p, _i32p,
            ct.c_int, _f32p, _f32p, _i32p,
            ct.c_float, ct.c_float,
            _f32p, _f32p, _f32p, _f32p, _f32p, _f32p, _f32p,
        ]
        lib.s2n_shape_mass.argtypes = [
            _f32p, _f32p, ct.c_int, ct.c_float, ct.c_float, _f32p, _f32p, _f32p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get() is not None


def compile_scene(verts, normals, counts, radii, densities, shape_body,
                  body_origin, body_angle, body_type, speculative, aabb_margin):
    """Batched mass properties + AABBs. Returns dict of numpy arrays."""
    lib = get()
    assert lib is not None
    n_shapes = len(counts)
    n_bodies = len(body_angle)
    out = dict(
        mass=np.zeros(n_bodies, np.float32),
        inv_mass=np.zeros(n_bodies, np.float32),
        inertia=np.zeros(n_bodies, np.float32),
        inv_inertia=np.zeros(n_bodies, np.float32),
        local_center=np.zeros((n_bodies, 2), np.float32),
        aabb=np.zeros((n_shapes, 4), np.float32),
        fat_aabb=np.zeros((n_shapes, 4), np.float32),
    )
    lib.s2n_compile_scene(
        n_shapes,
        np.ascontiguousarray(verts, np.float32),
        np.ascontiguousarray(normals, np.float32),
        np.ascontiguousarray(counts, np.int32),
        np.ascontiguousarray(radii, np.float32),
        np.ascontiguousarray(densities, np.float32),
        np.ascontiguousarray(shape_body, np.int32),
        n_bodies,
        np.ascontiguousarray(body_origin, np.float32),
        np.ascontiguousarray(body_angle, np.float32),
        np.ascontiguousarray(body_type, np.int32),
        speculative, aabb_margin,
        out["mass"], out["inv_mass"], out["inertia"], out["inv_inertia"],
        out["local_center"].reshape(-1), out["aabb"].reshape(-1), out["fat_aabb"].reshape(-1),
    )
    return out


def shape_mass(verts, normals, count, radius, density):
    lib = get()
    assert lib is not None
    m = np.zeros(1, np.float32)
    c = np.zeros(2, np.float32)
    inertia = np.zeros(1, np.float32)
    lib.s2n_shape_mass(
        np.ascontiguousarray(verts, np.float32).reshape(-1),
        np.ascontiguousarray(normals, np.float32).reshape(-1),
        int(count), float(radius), float(density), m, c, inertia,
    )
    return float(m[0]), c.copy(), float(inertia[0])
