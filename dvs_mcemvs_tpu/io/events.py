"""Event-stream readers: HDF5 (DSEC / TUM-VIE), npy/npz, text, rosbag.

Replaces the reference's rosbag-only ingest (mapper_emvs_stereo/src/
data_loading.cpp:33-302) with the datasets' native array formats.  The
reference normalizes all timestamps against a hidden function-local static
`initial_timestamp` shared across files (data_loading.cpp:30-31); here that
shared origin is an explicit `TimeOrigin` object threaded through every
reader.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from ..mapper import Events


@dataclasses.dataclass
class TimeOrigin:
    """Explicit replacement for data_loading.cpp's static initial_timestamp:
    the first timestamp seen by any reader becomes t=0 for the whole run."""

    t0: Optional[float] = None

    def normalize(self, t: np.ndarray) -> np.ndarray:
        if self.t0 is None and t.size:
            self.t0 = float(t[0])
        return t - (self.t0 or 0.0)


def _finalize(x, y, t, p, offset: float, t_start: float, t_stop: float,
              origin: Optional[TimeOrigin]) -> Events:
    """Shared tail of every reader: per-camera time offset
    (data_loading.cpp:99), global origin, window crop, and a stable
    sort by timestamp (:212-216)."""
    t = np.asarray(t, np.float64) + offset
    if origin is not None:
        t = origin.normalize(t)
    keep = (t >= t_start) & (t <= t_stop)
    x, y, t = x[keep], y[keep], t[keep]
    p = p[keep] if p is not None else None
    order = np.argsort(t, kind="stable")
    return Events(
        np.ascontiguousarray(x[order], np.int32),
        np.ascontiguousarray(y[order], np.int32),
        np.ascontiguousarray(t[order], np.float64),
        None if p is None else np.ascontiguousarray(p[order], np.int8),
    )


def read_events_h5(
    path: str,
    t_start: float = 0.0,
    t_stop: float = 1e19,
    offset: float = 0.0,
    origin: Optional[TimeOrigin] = None,
    group: str = "events",
) -> Events:
    """DSEC / TUM-VIE HDF5 events: datasets {x, y, t, p} under `group`
    (or at the file root), with optional `t_offset` (µs) and `ms_to_idx`.

    Timestamps stored as integer microseconds are converted to float seconds.
    DSEC files are blosc-compressed; reading them needs `hdf5plugin`, which is
    surfaced as a clear error when absent.
    """
    import h5py

    try:
        import hdf5plugin  # noqa: F401  (registers codecs on import)
    except ImportError:
        pass

    with h5py.File(path, "r") as f:
        g = f[group] if group in f else f
        t_offset = float(f["t_offset"][()]) if "t_offset" in f else 0.0
        try:
            t = np.asarray(g["t"])
        except OSError as e:  # pragma: no cover - depends on codec presence
            raise OSError(
                f"cannot decode {path}: DSEC event files are blosc-compressed "
                "and need the hdf5plugin package"
            ) from e
        x = np.asarray(g["x"])
        y = np.asarray(g["y"])
        p = np.asarray(g["p"]) if "p" in g else None
    if np.issubdtype(t.dtype, np.integer):
        t = (t.astype(np.float64) + t_offset) * 1e-6
    return _finalize(x, y, t, p, offset, t_start, t_stop, origin)


def read_events_npz(
    path: str,
    t_start: float = 0.0,
    t_stop: float = 1e19,
    offset: float = 0.0,
    origin: Optional[TimeOrigin] = None,
) -> Events:
    """npz with arrays x, y, t, p — the framework's native fixture format.
    Integer t is microseconds; float t is seconds."""
    data = np.load(path)
    t = np.asarray(data["t"])
    if np.issubdtype(t.dtype, np.integer):
        t = t.astype(np.float64) * 1e-6
    p = data["p"] if "p" in data else None
    return _finalize(np.asarray(data["x"]), np.asarray(data["y"]), t, p,
                     offset, t_start, t_stop, origin)


def read_events_txt(
    path: str,
    t_start: float = 0.0,
    t_stop: float = 1e19,
    offset: float = 0.0,
    origin: Optional[TimeOrigin] = None,
) -> Events:
    """Plain text events `t x y p` per line (rpg / ECCV18 distribution
    format), t in seconds."""
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None, :]
    t, x, y = data[:, 0], data[:, 1], data[:, 2]
    p = data[:, 3] if data.shape[1] > 3 else None
    return _finalize(x, y, t, p, offset, t_start, t_stop, origin)


def read_events_rosbag(
    path: str,
    topic: str,
    t_start: float = 0.0,
    t_stop: float = 1e19,
    offset: float = 0.0,
    origin: Optional[TimeOrigin] = None,
) -> Events:
    """dvs_msgs/EventArray rosbag reader (parity with
    data_loading.cpp:221-302) via the pure-python `rosbags` package; kept
    behind an import gate since bags are a legacy input here."""
    try:
        from rosbags.highlevel import AnyReader
        from pathlib import Path
    except ImportError as e:
        raise ImportError(
            "rosbag ingest needs the 'rosbags' package; convert the bag to "
            "h5/npz instead (scripts/convert_events.py)"
        ) from e
    xs, ys, ts, ps = [], [], [], []
    with AnyReader([Path(path)]) as reader:
        conns = [c for c in reader.connections if c.topic == topic]
        for conn, _, raw in reader.messages(connections=conns):
            msg = reader.deserialize(raw, conn.msgtype)
            for ev in msg.events:
                xs.append(ev.x)
                ys.append(ev.y)
                ts.append(ev.ts.sec + 1e-9 * ev.ts.nanosec)
                ps.append(1 if ev.polarity else 0)
    return _finalize(np.asarray(xs), np.asarray(ys), np.asarray(ts),
                     np.asarray(ps), offset, t_start, t_stop, origin)


READERS = {
    ".h5": read_events_h5,
    ".hdf5": read_events_h5,
    ".npz": read_events_npz,
    ".txt": read_events_txt,
    ".zip": read_events_txt,
}


def read_events(path: str, **kwargs) -> Events:
    """Dispatch on file extension; rosbags need an explicit topic via
    `read_events_rosbag`."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".bag":
        raise ValueError("use read_events_rosbag(path, topic=...) for bags")
    if ext not in READERS:
        raise ValueError(f"no event reader for extension {ext!r}")
    return READERS[ext](path, **kwargs)


def write_events_npz(path: str, ev: Events) -> None:
    arrays = dict(x=ev.x, y=ev.y, t=ev.t)
    if ev.p is not None:
        arrays["p"] = ev.p
    np.savez_compressed(path, **arrays)
