"""ctypes bindings for the C++ runtime pieces (native/).

Builds native/libkhronos_native.so on first use (make + g++); every binding
has a pure-python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libkhronos_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(
                    ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
                )
            lib = ctypes.CDLL(_SO_PATH)
            lib.mesh_accum_create.restype = ctypes.c_void_p
            lib.mesh_accum_create.argtypes = [ctypes.c_double]
            lib.mesh_accum_destroy.argtypes = [ctypes.c_void_p]
            lib.mesh_accum_add.restype = ctypes.c_int64
            lib.mesh_accum_add.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.mesh_accum_num_vertices.restype = ctypes.c_int64
            lib.mesh_accum_num_vertices.argtypes = [ctypes.c_void_p]
            lib.mesh_accum_num_faces.restype = ctypes.c_int64
            lib.mesh_accum_num_faces.argtypes = [ctypes.c_void_p]
            lib.mesh_accum_get.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class NativeMeshAccumulator:
    """Drop-in fast path for stm.scene_graph.MeshAccumulator."""

    def __init__(self, resolution: float = 0.005):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.resolution = resolution
        self._h = lib.mesh_accum_create(ctypes.c_double(resolution))

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.mesh_accum_destroy(self._h)
                self._h = None
        except Exception:
            pass

    def add_triangles(self, tri_vertices, tri_colors, tri_first_ns, tri_last_ns, tri_labels) -> int:
        T = len(tri_vertices)
        if T == 0:
            return 0
        v = np.ascontiguousarray(tri_vertices, np.float32)
        c = np.ascontiguousarray(tri_colors, np.float32)
        f = np.ascontiguousarray(tri_first_ns, np.int64)
        l = np.ascontiguousarray(tri_last_ns, np.int64)
        lab = np.ascontiguousarray(tri_labels, np.int32)
        return int(
            self._lib.mesh_accum_add(
                self._h,
                _ptr(v, ctypes.c_float),
                _ptr(c, ctypes.c_float),
                _ptr(f, ctypes.c_int64),
                _ptr(l, ctypes.c_int64),
                _ptr(lab, ctypes.c_int32),
                ctypes.c_int64(T),
            )
        )

    def build(self):
        from khronos_tpu.stm.scene_graph import Mesh

        V = int(self._lib.mesh_accum_num_vertices(self._h))
        F = int(self._lib.mesh_accum_num_faces(self._h))
        verts = np.zeros((V, 3), np.float32)
        colors = np.zeros((V, 3), np.float32)
        labels = np.zeros((V,), np.int32)
        first = np.zeros((V,), np.int64)
        last = np.zeros((V,), np.int64)
        faces = np.zeros((F, 3), np.int64)
        if V:
            self._lib.mesh_accum_get(
                self._h,
                _ptr(verts, ctypes.c_float),
                _ptr(colors, ctypes.c_float),
                _ptr(labels, ctypes.c_int32),
                _ptr(first, ctypes.c_int64),
                _ptr(last, ctypes.c_int64),
                _ptr(faces, ctypes.c_int64),
            )
        return Mesh(
            vertices=verts, colors=colors, labels=labels,
            first_seen_ns=first, last_seen_ns=last, faces=faces,
        )


def make_mesh_accumulator(resolution: float = 0.005):
    """Native accumulator when available, python fallback otherwise."""
    if available():
        return NativeMeshAccumulator(resolution)
    from khronos_tpu.stm.scene_graph import MeshAccumulator

    return MeshAccumulator(resolution)
