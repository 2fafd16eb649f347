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
# void (*)(int64 item, void* user) — ctypes re-acquires the GIL per call,
# so Python stage bodies run safely on the C++ worker threads.
STAGE_CB = ctypes.CFUNCTYPE(None, ctypes.c_int64, ctypes.c_void_p)
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
            stale = not os.path.exists(_SO_PATH)
            if not stale:
                so_mtime = os.path.getmtime(_SO_PATH)
                for f in os.listdir(_NATIVE_DIR):
                    if f.endswith((".cpp", ".h")) and os.path.getmtime(
                        os.path.join(_NATIVE_DIR, f)
                    ) > so_mtime:
                        stale = True
                        break
            if stale:
                subprocess.run(
                    ["make", "-sB"], cwd=_NATIVE_DIR, check=True, capture_output=True
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
            # pipeline executor (native/executor.cpp)
            lib.exec_create.restype = ctypes.c_void_p
            lib.exec_create.argtypes = [ctypes.c_int, ctypes.c_int64]
            lib.exec_set_stage.argtypes = [
                ctypes.c_void_p, ctypes.c_int, STAGE_CB, ctypes.c_void_p, ctypes.c_int
            ]
            lib.exec_start.argtypes = [ctypes.c_void_p]
            lib.exec_push.restype = ctypes.c_int
            lib.exec_push.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int
            ]
            lib.exec_drain.argtypes = [ctypes.c_void_p]
            lib.exec_stop.argtypes = [ctypes.c_void_p]
            lib.exec_destroy.argtypes = [ctypes.c_void_p]
            lib.exec_processed.restype = ctypes.c_int64
            lib.exec_processed.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.exec_max_depth.restype = ctypes.c_int64
            lib.exec_max_depth.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.exec_queue_size.restype = ctypes.c_int64
            lib.exec_queue_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
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

    def __getstate__(self):
        """Checkpoint support: serialize the accumulated mesh content; the
        native hash table is rebuilt on restore by re-adding triangles."""
        mesh = self.build()
        return {"resolution": self.resolution, "mesh": mesh}

    def __setstate__(self, state):
        self.__init__(state["resolution"])
        mesh = state["mesh"]
        if len(mesh.faces):
            tri = mesh.vertices[mesh.faces]  # [T, 3, 3]
            col = mesh.colors[mesh.faces]
            first = mesh.first_seen_ns[mesh.faces]
            last = mesh.last_seen_ns[mesh.faces]
            lab = mesh.labels[mesh.faces]  # [T, 3]
            self.add_triangles(tri, col, first, last, lab)

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


class NativePipelineExecutor:
    """Stage threads + bounded queues on the C++ runtime (native/executor.cpp).

    Equivalent of the reference's hydra module spin threads + PipelineQueues
    and its detached change-detection thread (backend.cpp:189-216). Each
    stage_fn runs on a dedicated native worker thread; a stage may push work
    to any downstream stage from inside its callback. Exceptions raised by a
    stage are captured and re-raised from drain()/stop().
    """

    def __init__(self, stage_fns, capacity: int = 8, workers=None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._n = len(stage_fns)
        self._errors = []
        self._err_lock = threading.Lock()
        self._h = lib.exec_create(self._n, capacity)
        self._cbs = []  # keep CFUNCTYPE objects alive for the executor's life
        workers = workers or [1] * self._n
        for i, fn in enumerate(stage_fns):
            cb = STAGE_CB(self._wrap(fn))
            self._cbs.append(cb)
            lib.exec_set_stage(self._h, i, cb, None, int(workers[i]))
        lib.exec_start(self._h)

    def _wrap(self, fn):
        def call(item, _user):
            try:
                fn(int(item))
            except BaseException as e:  # never propagate into C++
                with self._err_lock:
                    self._errors.append(e)

        return call

    def push(self, stage: int, item: int, block: bool = True) -> bool:
        ok = self._lib.exec_push(self._h, stage, int(item), 1 if block else 0)
        return bool(ok)

    def drain(self):
        self._lib.exec_drain(self._h)
        self._raise_pending()

    def stop(self):
        if self._h:
            self._lib.exec_stop(self._h)
        self._raise_pending()

    def _raise_pending(self):
        with self._err_lock:
            if self._errors:
                e = self._errors[0]
                self._errors.clear()
                raise e

    def processed(self, stage: int) -> int:
        return int(self._lib.exec_processed(self._h, stage))

    def max_depth(self, stage: int) -> int:
        return int(self._lib.exec_max_depth(self._h, stage))

    def queue_size(self, stage: int) -> int:
        return int(self._lib.exec_queue_size(self._h, stage))

    def close(self):
        if getattr(self, "_h", None):
            self._lib.exec_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class _PyPipelineExecutor:
    """Pure-python fallback with identical semantics (threads + queues)."""

    def __init__(self, stage_fns, capacity: int = 8, workers=None):
        import queue

        self._fns = stage_fns
        self._queues = [queue.Queue(maxsize=capacity) for _ in stage_fns]
        self._in_flight = [0] * len(stage_fns)
        self._processed = [0] * len(stage_fns)
        self._lock = threading.Lock()
        self._idle = threading.Condition(self._lock)
        self._stop = False
        self._errors = []
        self._threads = []
        workers = workers or [1] * len(stage_fns)
        for i in range(len(stage_fns)):
            for _ in range(int(workers[i])):
                t = threading.Thread(target=self._worker, args=(i,), daemon=True)
                t.start()
                self._threads.append(t)

    def _worker(self, si):
        import queue

        q = self._queues[si]
        while True:
            try:
                item = q.get(timeout=0.05)
            except queue.Empty:
                if self._stop:
                    return
                continue
            with self._lock:
                self._in_flight[si] += 1
            try:
                self._fns[si](item)
            except BaseException as e:
                with self._lock:
                    self._errors.append(e)
            with self._lock:
                self._in_flight[si] -= 1
                self._processed[si] += 1
                self._idle.notify_all()

    def push(self, stage, item, block=True):
        try:
            self._queues[stage].put(int(item), block=block)
            return True
        except Exception:
            return False

    def drain(self):
        with self._idle:
            while any(not q.empty() for q in self._queues) or any(
                n > 0 for n in self._in_flight
            ):
                self._idle.wait(timeout=0.05)
            if self._errors:
                e = self._errors[0]
                self._errors.clear()
                raise e

    def stop(self):
        self.drain()
        self._stop = True
        for t in self._threads:
            t.join(timeout=2.0)

    def processed(self, stage):
        return self._processed[stage]

    def max_depth(self, stage):
        return -1

    def queue_size(self, stage):
        return self._queues[stage].qsize()

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()


def make_pipeline_executor(stage_fns, capacity: int = 8, workers=None):
    """Native stage executor when available, python threads otherwise."""
    if available():
        return NativePipelineExecutor(stage_fns, capacity=capacity, workers=workers)
    return _PyPipelineExecutor(stage_fns, capacity=capacity, workers=workers)
