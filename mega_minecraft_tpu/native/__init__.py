"""Native (C++) runtime components, loaded via ctypes.

The reference's engine logic is C++; this package holds the TPU build's native
equivalents for CPU-side hot paths (currently: the mesher face scan, the analogue of
Chunk::createVBOs' host loop).  Compiled lazily with g++ on first use and cached next
to the source; every entry point has a pure-numpy fallback so the framework runs
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libmesher.so")
_SRC = os.path.join(_DIR, "mesher.cpp")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.count_faces.restype = ctypes.c_int64
        lib.count_faces.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.emit_faces.restype = ctypes.c_int64
        lib.emit_faces.argtypes = [ctypes.c_void_p] * 6 + [ctypes.c_int64]
        lib.block_histogram.restype = None
        lib.block_histogram.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _padded_volume(blocks, neighbors):
    pad = np.zeros((18, 18, 384), np.uint8)
    pad[1:17, 1:17] = blocks
    halo = np.zeros(4, np.uint8)  # +z +x -z -x
    nb = neighbors.get((0, 1))
    if nb is not None:
        pad[17, 1:17] = np.asarray(nb)[0, :]
        halo[0] = 1
    nb = neighbors.get((1, 0))
    if nb is not None:
        pad[1:17, 17] = np.asarray(nb)[:, 0]
        halo[1] = 1
    nb = neighbors.get((0, -1))
    if nb is not None:
        pad[0, 1:17] = np.asarray(nb)[15, :]
        halo[2] = 1
    nb = neighbors.get((-1, 0))
    if nb is not None:
        pad[1:17, 0] = np.asarray(nb)[:, 15]
        halo[3] = 1
    return np.ascontiguousarray(pad), halo


def extract_faces(blocks, neighbors):
    """Fast face extraction: returns (positions [N,3] i32 local coords, dirs [N] u8,
    block_ids [N] u8) for all visible non-X-shaped faces, or None if the native lib
    is unavailable."""
    lib = _load()
    if lib is None:
        return None
    from ..world.blocks import TRANSPARENCY

    pad, halo = _padded_volume(np.asarray(blocks, np.uint8), neighbors)
    trans = np.ascontiguousarray(TRANSPARENCY)
    n = lib.count_faces(
        pad.ctypes.data, trans.ctypes.data, halo.ctypes.data
    )
    pos = np.empty((n, 3), np.int32)
    dirs = np.empty(n, np.uint8)
    blks = np.empty(n, np.uint8)
    m = lib.emit_faces(
        pad.ctypes.data, trans.ctypes.data, halo.ctypes.data,
        pos.ctypes.data, dirs.ctypes.data, blks.ctypes.data, n,
    )
    assert m == n
    return pos, dirs, blks


def block_histogram(blocks):
    """[.., ...] u8 -> [256] i64 counts (native; numpy fallback)."""
    lib = _load()
    b = np.ascontiguousarray(np.asarray(blocks, np.uint8).reshape(-1))
    if lib is None:
        return np.bincount(b, minlength=256).astype(np.int64)
    out = np.zeros(256, np.int64)
    lib.block_histogram(b.ctypes.data, b.size, out.ctypes.data)
    return out
