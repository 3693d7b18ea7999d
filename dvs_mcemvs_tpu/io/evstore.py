"""Python binding of the native event store (native/evstore.cpp).

The store replaces the reference's per-chunk rosbag re-parsing
(src/main.cpp:191-199 re-reads the input bags for every sliding-window
chunk) with a one-time ingest into a columnar mmap file; windows are
O(log E) native binary searches and the next chunk's pages are warmed by a
background prefetch thread while the device computes the current one.

The shared library is built on demand with g++ (no pip/cmake needed) and
cached under native/build/.  Falls back with ImportError if no compiler is
available — callers treat the store as an optional acceleration and keep
the pure-numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..mapper import Events

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "evstore.cpp")
_SO = os.path.join(_REPO, "native", "build", "libevstore.so")

_lib = None


def _build_library() -> str:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC",
               "-Wall", _SRC, "-shared", "-pthread", "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(_build_library())
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.evs_create.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                               ctypes.c_void_p, ctypes.c_void_p,
                               ctypes.c_void_p, ctypes.c_uint64]
    lib.evs_create.restype = ctypes.c_int
    lib.evs_open.argtypes = [ctypes.c_char_p]
    lib.evs_open.restype = ctypes.c_void_p
    lib.evs_close.argtypes = [ctypes.c_void_p]
    lib.evs_count.argtypes = [ctypes.c_void_p]
    lib.evs_count.restype = ctypes.c_uint64
    lib.evs_t0.argtypes = [ctypes.c_void_p]
    lib.evs_t0.restype = ctypes.c_double
    lib.evs_t1.argtypes = [ctypes.c_void_p]
    lib.evs_t1.restype = ctypes.c_double
    lib.evs_window.argtypes = [ctypes.c_void_p, ctypes.c_double,
                               ctypes.c_double, u64p, u64p]
    lib.evs_window_inclusive.argtypes = lib.evs_window.argtypes
    lib.evs_read.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                             ctypes.c_uint64, ctypes.c_void_p,
                             ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_void_p]
    lib.evs_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                 ctypes.c_double]
    lib.evs_prefetch.restype = ctypes.c_int
    lib.evs_prefetch_busy.argtypes = [ctypes.c_void_p]
    lib.evs_prefetch_busy.restype = ctypes.c_int
    _lib = lib
    return lib


def write_store(path: str, events: Events) -> None:
    """Ingest an event stream (absolute seconds, sorted) into a store file."""
    lib = _load()
    n = events.num
    t = np.ascontiguousarray(events.t, np.float64)
    x = np.ascontiguousarray(events.x, np.uint16)
    y = np.ascontiguousarray(events.y, np.uint16)
    p = (np.ascontiguousarray(events.p, np.int8)
         if events.p is not None else None)
    rc = lib.evs_create(
        path.encode(), t.ctypes.data_as(ctypes.c_void_p),
        x.ctypes.data_as(ctypes.c_void_p), y.ctypes.data_as(ctypes.c_void_p),
        p.ctypes.data_as(ctypes.c_void_p) if p is not None else None,
        ctypes.c_uint64(n))
    if rc != 0:
        raise OSError(f"evs_create({path}) failed with {rc}")


class EventStore:
    """Open store: O(log E) windows, zero-copy reads, async prefetch."""

    def __init__(self, path: str):
        self._lib = _load()
        self._h = self._lib.evs_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open event store {path}")
        self.path = path

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.evs_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover - gc timing
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    @property
    def count(self) -> int:
        return int(self._lib.evs_count(self._h))

    @property
    def time_range(self) -> Tuple[float, float]:
        return (float(self._lib.evs_t0(self._h)),
                float(self._lib.evs_t1(self._h)))

    def window_indices(self, t0: float, t1: float,
                       inclusive_end: bool = True) -> Tuple[int, int]:
        lo = ctypes.c_uint64()
        hi = ctypes.c_uint64()
        fn = (self._lib.evs_window_inclusive if inclusive_end
              else self._lib.evs_window)
        fn(self._h, ctypes.c_double(t0), ctypes.c_double(t1),
           ctypes.byref(lo), ctypes.byref(hi))
        return int(lo.value), int(hi.value)

    def read(self, lo: int, hi: int) -> Events:
        """Decode [lo, hi) into an Events batch (t absolute seconds)."""
        n = max(0, hi - lo)
        x = np.empty(n, np.int32)
        y = np.empty(n, np.int32)
        t = np.empty(n, np.float32)
        p = np.empty(n, np.int8)
        self._lib.evs_read(
            self._h, ctypes.c_uint64(lo), ctypes.c_uint64(hi),
            x.ctypes.data_as(ctypes.c_void_p), y.ctypes.data_as(ctypes.c_void_p),
            t.ctypes.data_as(ctypes.c_void_p), p.ctypes.data_as(ctypes.c_void_p))
        t0, _ = self.time_range
        return Events(x, y, t.astype(np.float64) + t0, p)

    def window(self, t0: float, t1: float) -> Events:
        """Events with t in [t0, t1] (matching Events.time_window)."""
        lo, hi = self.window_indices(t0, t1)
        return self.read(lo, hi)

    def prefetch(self, t0: float, t1: float) -> bool:
        """Start warming the pages of a future window; non-blocking."""
        return bool(self._lib.evs_prefetch(
            self._h, ctypes.c_double(t0), ctypes.c_double(t1)))

    @property
    def prefetch_busy(self) -> bool:
        return bool(self._lib.evs_prefetch_busy(self._h))


def cache_path_for(source_path: str) -> str:
    return source_path + ".evs"


def open_or_build(source_path: str, events: Optional[Events] = None) -> EventStore:
    """Open the .evs cache next to `source_path`, ingesting once if absent
    (or stale).  `events` supplies the decoded stream on first build."""
    cache = cache_path_for(source_path)
    fresh = (os.path.exists(cache)
             and os.path.getmtime(cache) >= os.path.getmtime(source_path))
    if not fresh:
        if events is None:
            raise ValueError(f"no cache at {cache} and no events provided")
        write_store(cache, events)
    return EventStore(cache)
