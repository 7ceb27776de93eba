"""ctypes bindings for the native streaming-scheduler core (scheduler.cpp).

The C++ core owns the chunk table, state machine, queues, budget and zone logic
(the reference Terrain class's host logic, /root/reference/src/terrain/terrain.cpp);
each ``tick`` returns a flat int32 plan of per-stage batches with all neighbor-slot
tables pre-resolved.  Compiled lazily with g++ and cached next to the source; callers
fall back to the pure-Python scheduler when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libscheduler.so")
_SRC = os.path.join(_DIR, "scheduler.cpp")

_lib = None
_tried = False

# stage ids in the plan stream (must match scheduler.cpp)
ST_HEIGHTFIELD = 0
ST_GATHER_HEIGHTFIELD = 1
ST_LAYERS = 2
ST_EROSION = 3
ST_CAVES = 4
ST_FEATURE_PLACEMENTS = 5
ST_GATHER_FEATURES = 6
ST_FILL = 7
ST_VBOS = 8

PLAN_CAP = 65536  # int32s; a frame's plan is far below this (16-chunk batches)
_EVICT_CAP = 8192


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.sched_create.restype = ctypes.c_void_p
        lib.sched_create.argtypes = [ctypes.c_int] * 3
        lib.sched_free.argtypes = [ctypes.c_void_p]
        lib.sched_set_player_chunk.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        lib.sched_tick.restype = ctypes.c_int64
        lib.sched_tick.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.c_void_p, ctypes.c_int64,
        ]
        for f in (lib.sched_destroy_far_vbos, lib.sched_newly_filled):
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        for f in (lib.sched_state_at, lib.sched_slot_of):
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        for f in (lib.sched_queues_busy, lib.sched_drawable_count):
            f.restype = ctypes.c_int
            f.argtypes = [ctypes.c_void_p]
        lib.sched_chunk_count.restype = ctypes.c_int64
        lib.sched_chunk_count.argtypes = [ctypes.c_void_p]
        lib.sched_action_time_left.restype = ctypes.c_double
        lib.sched_action_time_left.argtypes = [ctypes.c_void_p]
        lib.sched_force_update.argtypes = [ctypes.c_void_p]
        lib.sched_snapshot.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


class NativeSchedulerCore:
    """Thin RAII handle over the C++ scheduler core."""

    def __init__(self, capacity: int, radius: int | None, skip_erosion: bool):
        lib = _load()
        if lib is None:
            raise RuntimeError("native scheduler core unavailable (no g++?)")
        self._lib = lib
        self.capacity = capacity
        self._h = ctypes.c_void_p(
            lib.sched_create(capacity, -1 if radius is None else radius, int(skip_erosion))
        )
        self._plan = np.empty(PLAN_CAP, np.int32)
        self._ex = np.empty(_EVICT_CAP, np.int32)
        self._ez = np.empty(_EVICT_CAP, np.int32)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.sched_free(h)
            self._h = None

    def set_player_chunk(self, cx: int, cz: int):
        self._lib.sched_set_player_chunk(self._h, cx, cz)

    def tick(self, dt: float) -> np.ndarray:
        n = self._lib.sched_tick(
            self._h, dt, self._plan.ctypes.data, ctypes.c_int64(PLAN_CAP)
        )
        if n < 0:
            raise RuntimeError("scheduler plan buffer overflow")
        return self._plan[:n]

    def _pairs(self, fn) -> list:
        n = fn(self._h, self._ex.ctypes.data, self._ez.ctypes.data, _EVICT_CAP)
        n = min(n, _EVICT_CAP)
        return [(int(self._ex[i]), int(self._ez[i])) for i in range(n)]

    def destroy_far_vbos(self) -> list:
        return self._pairs(self._lib.sched_destroy_far_vbos)

    def newly_filled(self) -> list:
        return self._pairs(self._lib.sched_newly_filled)

    def state_at(self, cx: int, cz: int) -> int:
        return self._lib.sched_state_at(self._h, cx, cz)

    def slot_of(self, cx: int, cz: int) -> int:
        return self._lib.sched_slot_of(self._h, cx, cz)

    def queues_busy(self) -> bool:
        return bool(self._lib.sched_queues_busy(self._h))

    def drawable_count(self) -> int:
        return self._lib.sched_drawable_count(self._h)

    def chunk_count(self) -> int:
        return self._lib.sched_chunk_count(self._h)

    def action_time_left(self) -> float:
        return self._lib.sched_action_time_left(self._h)

    def force_update(self):
        self._lib.sched_force_update(self._h)

    def snapshot(self):
        """(state u8[C], cx i32[C], cz i32[C], in_use u8[C]) copies."""
        c = self.capacity
        st = np.empty(c, np.uint8)
        cx = np.empty(c, np.int32)
        cz = np.empty(c, np.int32)
        iu = np.empty(c, np.uint8)
        self._lib.sched_snapshot(
            self._h, st.ctypes.data, cx.ctypes.data, cz.ctypes.data, iu.ctypes.data
        )
        return st, cx, cz, iu
