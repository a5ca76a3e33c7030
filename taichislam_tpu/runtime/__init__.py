"""Native runtime components (C++ + ctypes).

``NativeUDPMulticastTransport`` wraps taichislam_tpu/runtime/transport.cpp —
an LCM-UDPM-wire-compatible multicast transport with a background receive
thread (the role the native LCM C library plays for the reference). Build
with ``sh taichislam_tpu/runtime/build.sh``; ``native_available()`` reports
whether the shared library is present/loadable, and callers fall back to the
pure-Python transport otherwise.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

_LIB = None
_LIB_TRIED = False


def _load():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    here = os.path.dirname(__file__)
    path = os.path.join(here, "libtslam_transport.so")
    src = os.path.join(here, "transport.cpp")
    # the .so is not tracked in git (unauditable binary); build on first use
    # when stale or missing, falling back to pure Python on any failure
    if os.path.exists(src) and (
            not os.path.exists(path)
            or os.path.getmtime(path) < os.path.getmtime(src)):
        import subprocess
        try:
            subprocess.run(["sh", os.path.join(here, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            pass
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.tslam_transport_create.restype = ctypes.c_void_p
    lib.tslam_transport_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_int]
    lib.tslam_transport_destroy.argtypes = [ctypes.c_void_p]
    lib.tslam_transport_publish.restype = ctypes.c_int
    lib.tslam_transport_publish.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                            ctypes.c_char_p, ctypes.c_size_t]
    lib.tslam_transport_poll.restype = ctypes.c_long
    lib.tslam_transport_poll.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeUDPMulticastTransport:
    """Same interface as utils.comm.UDPMulticastTransport (publish/poll/
    close), backed by the C++ library; receive runs on a native thread so
    bursts of submap fragments are drained without the GIL."""

    MAX_MSG = 64 * 1024 * 1024

    def __init__(self, url: str = "udpm://224.0.0.251:7667?ttl=1"):
        from taichislam_tpu.utils.comm import _parse_udpm_url
        lib = _load()
        if lib is None:
            raise OSError("libtslam_transport.so not built "
                          "(run taichislam_tpu/runtime/build.sh)")
        addr, port, ttl = _parse_udpm_url(url)
        self._lib = lib
        self._h = lib.tslam_transport_create(addr.encode(), port, ttl)
        if not self._h:
            raise OSError(f"native transport failed to bind {addr}:{port}")
        self._chan_buf = ctypes.create_string_buffer(256)
        self._data_buf = ctypes.create_string_buffer(self.MAX_MSG)

    def publish(self, channel: str, data: bytes):
        rc = self._lib.tslam_transport_publish(self._h, channel.encode(),
                                               bytes(data), len(data))
        if rc != 0:
            raise OSError("native transport publish failed")

    def poll(self, timeout_ms: int) -> List[Tuple[str, bytes]]:
        out = []
        remaining = timeout_ms
        while True:
            n = self._lib.tslam_transport_poll(
                self._h, max(remaining, 0), self._chan_buf, 256,
                self._data_buf, self.MAX_MSG)
            if n < 0:
                break
            out.append((self._chan_buf.value.decode(),
                        self._data_buf.raw[:n]))
            remaining = 0  # drain whatever is already queued
        return out

    def close(self):
        if self._h:
            self._lib.tslam_transport_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
