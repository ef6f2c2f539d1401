"""ctypes bindings for the native runtime library (native/hunterrt.cpp).

Builds the shared library on demand with g++ (no network, no pybind11).
Provides:
  - UdpChannel: latest-wins UDP transport (LCM-bridge parity) with
    LowState/LowCmd wire structs matching lcm_msg's low_state_t/low_cmd_t
  - RateKeeper: absolute-deadline loop timing with overrun stats
    (LeggedHWLoop parity)
  - TripleBuffer: lock-free policy handoff (MRT/RealtimeBuffer parity)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

NJ = 10

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "hunterrt.cpp",
)
_CACHE = os.path.expanduser("~/.cache/hunterrt")


class LowState(ctypes.Structure):
    _fields_ = [
        ("t", ctypes.c_double),
        ("quat", ctypes.c_double * 4),
        ("gyro", ctypes.c_double * 3),
        ("accel", ctypes.c_double * 3),
        ("q", ctypes.c_double * NJ),
        ("dq", ctypes.c_double * NJ),
        ("tau", ctypes.c_double * NJ),
        ("seq", ctypes.c_uint64),
    ]


class LowCmd(ctypes.Structure):
    _fields_ = [
        ("pos", ctypes.c_double * NJ),
        ("vel", ctypes.c_double * NJ),
        ("kp", ctypes.c_double * NJ),
        ("kd", ctypes.c_double * NJ),
        ("ff", ctypes.c_double * NJ),
        ("seq", ctypes.c_uint64),
    ]


_lib: Optional[ctypes.CDLL] = None


def load_library() -> ctypes.CDLL:
    """Compile (if needed) and load libhunterrt.so."""
    global _lib
    if _lib is not None:
        return _lib
    os.makedirs(_CACHE, exist_ok=True)
    so_path = os.path.join(_CACHE, "libhunterrt.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", so_path, "-lpthread"],
            check=True,
        )
    lib = ctypes.CDLL(so_path)
    lib.rt_channel_open_send.restype = ctypes.c_void_p
    lib.rt_channel_open_send.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.rt_channel_open_recv.restype = ctypes.c_void_p
    lib.rt_channel_open_recv.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.rt_channel_send.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.rt_channel_recv_latest.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.rt_channel_close.argtypes = [ctypes.c_void_p]
    lib.rt_rate_create.restype = ctypes.c_void_p
    lib.rt_rate_create.argtypes = [ctypes.c_double]
    lib.rt_rate_sleep.restype = ctypes.c_double
    lib.rt_rate_sleep.argtypes = [ctypes.c_void_p]
    lib.rt_rate_stats.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(t) for t in
                                                      (ctypes.c_uint64, ctypes.c_uint64,
                                                       ctypes.c_double, ctypes.c_double)]
    lib.rt_rate_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_set_realtime_priority.argtypes = [ctypes.c_int]
    lib.rt_tbuf_create.restype = ctypes.c_void_p
    lib.rt_tbuf_create.argtypes = [ctypes.c_int]
    lib.rt_tbuf_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_tbuf_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.rt_tbuf_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    _lib = lib
    return lib


class UdpChannel:
    """Latest-wins UDP channel (multicast when addr is 224.x-239.x)."""

    def __init__(self, addr: str, port: int, mode: str):
        lib = load_library()
        self._lib = lib
        if mode == "send":
            self._h = lib.rt_channel_open_send(addr.encode(), port)
        elif mode == "recv":
            self._h = lib.rt_channel_open_recv(addr.encode(), port)
        else:
            raise ValueError(mode)
        if not self._h:
            raise OSError(f"failed to open UDP channel {addr}:{port} ({mode})")

    def send_struct(self, s) -> int:
        return self._lib.rt_channel_send(self._h, ctypes.byref(s), ctypes.sizeof(s))

    def recv_latest(self, struct_type):
        out = struct_type()
        n = self._lib.rt_channel_recv_latest(self._h, ctypes.byref(out),
                                             ctypes.sizeof(out))
        return out if n == ctypes.sizeof(out) else None

    def close(self):
        if self._h:
            self._lib.rt_channel_close(self._h)
            self._h = None


class RateKeeper:
    """Absolute-deadline rate keeper; `sleep()` returns lateness in ms."""

    def __init__(self, frequency_hz: float):
        self._lib = load_library()
        self._h = self._lib.rt_rate_create(frequency_hz)

    def sleep(self) -> float:
        return self._lib.rt_rate_sleep(self._h)

    def stats(self):
        c, o = ctypes.c_uint64(), ctypes.c_uint64()
        w, a = ctypes.c_double(), ctypes.c_double()
        self._lib.rt_rate_stats(self._h, ctypes.byref(c), ctypes.byref(o),
                                ctypes.byref(w), ctypes.byref(a))
        return {"cycles": c.value, "overruns": o.value,
                "worst_late_ms": w.value, "avg_late_ms": a.value}

    def __del__(self):
        try:
            self._lib.rt_rate_destroy(self._h)
        except Exception:
            pass


def set_realtime_priority(priority: int = 50) -> bool:
    """Best-effort SCHED_FIFO elevation; returns True on success."""
    return load_library().rt_set_realtime_priority(priority) == 0


class TripleBuffer:
    """Lock-free single-writer single-reader handoff of numpy payloads."""

    def __init__(self, capacity_bytes: int):
        self._lib = load_library()
        self._h = self._lib.rt_tbuf_create(capacity_bytes)
        self._cap = capacity_bytes

    def write(self, arr: np.ndarray) -> None:
        data = np.ascontiguousarray(arr)
        r = self._lib.rt_tbuf_write(
            self._h, data.ctypes.data_as(ctypes.c_void_p), data.nbytes
        )
        if r != 0:
            raise ValueError("payload exceeds buffer capacity")

    def read(self, dtype, shape) -> Optional[np.ndarray]:
        out = np.empty(shape, dtype=dtype)
        n = self._lib.rt_tbuf_read(
            self._h, out.ctypes.data_as(ctypes.c_void_p), out.nbytes
        )
        if n == 0:
            return None
        return out

    def __del__(self):
        try:
            self._lib.rt_tbuf_destroy(self._h)
        except Exception:
            pass
