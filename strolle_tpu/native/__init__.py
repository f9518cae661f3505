"""ctypes bindings to the C++ host runtime (native/strolle_native.cpp).

The native library holds the host-side performance pieces of the
engine — BVH build/refit, the range allocator, the guillotine atlas
allocator, triangle transforms — mirroring the reference's host-Rust
components (strolle/src/bvh/builder.rs, utils/allocator.rs,
images.rs). It is compiled on first use with the in-repo Makefile
(g++ is part of the toolchain); every caller has a numpy fallback, so
`available()` returning False only costs performance, never features.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstrolle_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build_lib() -> bool:
    src = os.path.join(_NATIVE_DIR, "strolle_native.cpp")
    if not os.path.exists(src):
        return False
    fresh = os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(src)
    if fresh:
        return True
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=300,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("STROLLE_NO_NATIVE"):
            return None
        if not _build_lib():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i = ctypes.c_int
        i32 = ctypes.c_int32
        i64 = ctypes.c_int64
        p = ctypes.c_void_p

        lib.strolle_bvh_build.restype = i
        lib.strolle_bvh_build.argtypes = [
            f32p, i, f32p, f32p, i32p, i32p, i32p, i, ctypes.POINTER(i),
        ]
        lib.strolle_bvh_refit.restype = i
        lib.strolle_bvh_refit.argtypes = [f32p, i, f32p, f32p, i32p, i32p, i]

        lib.strolle_bvh_ctx_new.restype = p
        lib.strolle_bvh_ctx_free.argtypes = [p]
        lib.strolle_bvh_build_incremental.restype = i
        lib.strolle_bvh_build_incremental.argtypes = [
            p, f32p, i, f32p, f32p, i32p, i32p, i32p, i,
            ctypes.POINTER(i), ctypes.POINTER(i),
        ]

        lib.strolle_alloc_new.restype = p
        lib.strolle_alloc_free.argtypes = [p]
        lib.strolle_alloc_take.restype = i64
        lib.strolle_alloc_take.argtypes = [p, i64]
        lib.strolle_alloc_give.argtypes = [p, i64, i64]
        lib.strolle_alloc_free_ranges.restype = i64
        lib.strolle_alloc_free_ranges.argtypes = [p]

        lib.strolle_atlas_new.restype = p
        lib.strolle_atlas_new.argtypes = [i32, i32]
        lib.strolle_atlas_free.argtypes = [p]
        lib.strolle_atlas_alloc.restype = i
        lib.strolle_atlas_alloc.argtypes = [
            p, i32, i32, ctypes.POINTER(i32), ctypes.POINTER(i32),
        ]
        lib.strolle_atlas_dealloc.argtypes = [p, i32, i32, i32, i32]

        lib.strolle_transform_triangles.restype = i
        lib.strolle_transform_triangles.argtypes = [f32p, f32p, i, f32p]

        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# -- BVH --------------------------------------------------------------------


def bvh_build(positions: np.ndarray):
    """Native binned-SAH build. `positions` [T,3,3] f32.

    Returns (child_min, child_max, child, child_count, order, max_depth)
    as numpy arrays trimmed to the node count, or None when the native
    library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float32)
    t = positions.shape[0]
    max_nodes = max(2 * t, 16)
    cmin = np.empty((max_nodes, 2, 3), np.float32)
    cmax = np.empty((max_nodes, 2, 3), np.float32)
    child = np.empty((max_nodes, 2), np.int32)
    count = np.empty((max_nodes, 2), np.int32)
    order = np.empty((t,), np.int32)
    depth = ctypes.c_int(0)
    n = lib.strolle_bvh_build(
        positions.reshape(-1, 9), t, cmin.reshape(-1, 6), cmax.reshape(-1, 6),
        child, count, order, max_nodes, ctypes.byref(depth),
    )
    if n < 0:
        return None
    return (
        cmin[:n].copy(), cmax[:n].copy(), child[:n].copy(), count[:n].copy(),
        order.astype(np.int64), int(depth.value),
    )


class BvhContext:
    """Stateful incremental builder: cross-frame subtree-hash reuse
    (strolle/src/bvh/builder.rs:204-279 ghost semantics). `build`
    matches strolle_bvh_build's contract and additionally reports how
    many node rows were copied from the previous frame's tree."""

    def __init__(self):
        lib = _load()
        self._lib = lib
        self._h = lib.strolle_bvh_ctx_new() if lib is not None else None
        self.last_reused = 0

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.strolle_bvh_ctx_free(self._h)
            self._h = None

    def build(self, positions: np.ndarray):
        if self._h is None:
            return None
        positions = np.ascontiguousarray(positions, np.float32)
        t = positions.shape[0]
        max_nodes = max(2 * t, 16)
        cmin = np.empty((max_nodes, 2, 3), np.float32)
        cmax = np.empty((max_nodes, 2, 3), np.float32)
        child = np.empty((max_nodes, 2), np.int32)
        count = np.empty((max_nodes, 2), np.int32)
        order = np.empty((t,), np.int32)
        depth = ctypes.c_int(0)
        reused = ctypes.c_int(0)
        n = self._lib.strolle_bvh_build_incremental(
            self._h, positions.reshape(-1, 9), t, cmin.reshape(-1, 6),
            cmax.reshape(-1, 6), child, count, order, max_nodes,
            ctypes.byref(depth), ctypes.byref(reused),
        )
        if n < 0:
            return None
        self.last_reused = int(reused.value)
        return (
            cmin[:n].copy(), cmax[:n].copy(), child[:n].copy(),
            count[:n].copy(), order.astype(np.int64), int(depth.value),
        )


def bvh_refit(
    positions: np.ndarray,
    child_min: np.ndarray,
    child_max: np.ndarray,
    child: np.ndarray,
    child_count: np.ndarray,
) -> bool:
    """Recomputes child AABBs in place for moved vertices (topology
    unchanged). `positions` is the reordered [T,3,3] array the leaf
    ranges index. Returns False when native is unavailable."""
    lib = _load()
    if lib is None:
        return False
    positions = np.ascontiguousarray(positions, np.float32)
    lib.strolle_bvh_refit(
        positions.reshape(-1, 9),
        positions.shape[0],
        child_min.reshape(-1, 6),
        child_max.reshape(-1, 6),
        np.ascontiguousarray(child, np.int32),
        np.ascontiguousarray(child_count, np.int32),
        child.shape[0],
    )
    return True


# -- range allocator --------------------------------------------------------


class RangeAllocator:
    """Free-range recycling for slot/triangle storage
    (utils/allocator.rs). Falls back to pure Python when native is
    unavailable."""

    def __init__(self):
        lib = _load()
        self._lib = lib
        self._h = lib.strolle_alloc_new() if lib is not None else None
        self._py: list[tuple[int, int]] = []

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.strolle_alloc_free(self._h)
            self._h = None

    def take(self, length: int) -> int | None:
        if self._h is not None:
            r = self._lib.strolle_alloc_take(self._h, length)
            return None if r < 0 else int(r)
        # python fallback: first fit with merge-compaction on miss
        for attempt in range(2):
            for i, (start, ln) in enumerate(self._py):
                if ln >= length:
                    if ln == length:
                        self._py.pop(i)
                    else:
                        self._py[i] = (start + length, ln - length)
                    return start
            if attempt == 0:
                self._compact_py()
        return None

    def give(self, start: int, length: int) -> None:
        if self._h is not None:
            self._lib.strolle_alloc_give(self._h, start, length)
        else:
            self._py.append((start, length))

    def _compact_py(self):
        self._py.sort()
        out: list[tuple[int, int]] = []
        for s, ln in self._py:
            if out and out[-1][0] + out[-1][1] == s:
                out[-1] = (out[-1][0], out[-1][1] + ln)
            else:
                out.append((s, ln))
        self._py = out

    def num_free_ranges(self) -> int:
        if self._h is not None:
            return int(self._lib.strolle_alloc_free_ranges(self._h))
        self._compact_py()
        return len(self._py)


# -- guillotine atlas allocator ---------------------------------------------


class AtlasAllocator:
    """2-D guillotine allocator for the texture atlas (images.rs /
    guillotiere). Python shelf fallback."""

    def __init__(self, width: int, height: int):
        lib = _load()
        self._lib = lib
        self._h = lib.strolle_atlas_new(width, height) if lib else None
        self._w, self._ht = width, height
        self._shelf_x = 0
        self._shelf_y = 0
        self._shelf_h = 0

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.strolle_atlas_free(self._h)
            self._h = None

    def alloc(self, w: int, h: int) -> tuple[int, int] | None:
        if self._h is not None:
            x = ctypes.c_int32(0)
            y = ctypes.c_int32(0)
            ok = self._lib.strolle_atlas_alloc(
                self._h, w, h, ctypes.byref(x), ctypes.byref(y)
            )
            return None if ok != 0 else (int(x.value), int(y.value))
        # shelf fallback
        if self._shelf_x + w > self._w:
            self._shelf_y += self._shelf_h
            self._shelf_x = 0
            self._shelf_h = 0
        if self._shelf_y + h > self._ht or w > self._w:
            return None
        pos = (self._shelf_x, self._shelf_y)
        self._shelf_x += w
        self._shelf_h = max(self._shelf_h, h)
        return pos

    def dealloc(self, x: int, y: int, w: int, h: int) -> None:
        if self._h is not None:
            self._lib.strolle_atlas_dealloc(self._h, x, y, w, h)


# -- triangle transform -----------------------------------------------------


def transform_triangles(
    positions: np.ndarray, normals: np.ndarray, matrix: np.ndarray
):
    """Applies an affine transform to [T,3,3] positions and normals
    (inverse-transpose for normals, mesh_triangle.rs:48-87). Returns
    new arrays; numpy fallback when native is unavailable."""
    positions = np.ascontiguousarray(positions, np.float32).copy()
    normals = np.ascontiguousarray(normals, np.float32).copy()
    m = np.ascontiguousarray(matrix, np.float32)
    lib = _load()
    if lib is not None and positions.size:
        rc = lib.strolle_transform_triangles(
            positions.reshape(-1, 9),
            normals.reshape(-1, 9),
            positions.shape[0],
            m.reshape(-1),
        )
        if rc == 0:
            return positions, normals
    positions = positions @ m[:3, :3].T + m[:3, 3]
    nm = np.linalg.inv(m[:3, :3]).T
    normals = normals @ nm.T
    normals /= np.maximum(np.linalg.norm(normals, axis=-1, keepdims=True), 1e-20)
    return positions, normals
