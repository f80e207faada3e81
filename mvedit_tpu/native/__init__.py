"""ctypes bindings for the native mesh runtime (numpy fallback).

`weld_vertices` and `decimate_qem` call into libmesh_native.so (built by the
Makefile here; auto-built on first import when g++ is available). Pure-numpy
fallbacks keep the API working without a toolchain.
"""
import ctypes
import os
import subprocess

import numpy as np

__all__ = ["weld_vertices", "decimate_qem", "native_available"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libmesh_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.weld_vertices.restype = ctypes.c_int64
    lib.weld_vertices.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
    lib.decimate_qem.restype = ctypes.c_int64
    lib.decimate_qem.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def native_available():
    return _load() is not None


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def weld_vertices(verts, faces, eps=1e-6):
    """Merge duplicate vertices; returns (verts', faces')."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    lib = _load()
    if lib is None:
        # numpy fallback: quantize + unique
        key = np.round(verts / max(eps, 1e-12)).astype(np.int64)
        _, first, remap = np.unique(key, axis=0, return_index=True,
                                    return_inverse=True)
        return verts[first], remap[faces].astype(np.int32)
    out_v = np.empty_like(verts)
    remap = np.empty((len(verts),), np.int64)
    n = lib.weld_vertices(_ptr(verts, ctypes.c_float), len(verts),
                          ctypes.c_float(eps), _ptr(out_v, ctypes.c_float),
                          _ptr(remap, ctypes.c_int64))
    return out_v[:n].copy(), remap[faces].astype(np.int32)


def decimate_qem(verts, faces, target_faces):
    """QEM mesh simplification (Open3D simplify_quadric_decimation
    replacement). Returns (verts', faces')."""
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    if target_faces >= len(faces):
        return verts.copy(), faces.copy()
    lib = _load()
    if lib is None:
        # fallback: random face subset (degraded; native path is the real
        # implementation)
        keep = np.linspace(0, len(faces) - 1, target_faces).astype(np.int64)
        f2 = faces[keep]
        used = np.unique(f2)
        remap = np.full(len(verts), -1, np.int64)
        remap[used] = np.arange(len(used))
        return verts[used], remap[f2].astype(np.int32)
    out_v = np.empty_like(verts)
    out_f = np.empty_like(faces)
    packed = lib.decimate_qem(
        _ptr(verts, ctypes.c_float), len(verts),
        _ptr(faces, ctypes.c_int32), len(faces),
        ctypes.c_int64(int(target_faces)),
        _ptr(out_v, ctypes.c_float), _ptr(out_f, ctypes.c_int32))
    nf = packed >> 32
    nv = packed & 0xFFFFFFFF
    return out_v[:nv].copy(), out_f[:nf].copy()
