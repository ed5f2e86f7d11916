"""ctypes bindings for the C++ host runtime (ggs_native.cpp).

Builds the shared library on first use (g++ is baked into the image; no
pybind11, so the ABI is plain C + ctypes). Falls back gracefully: callers
should check `available()` and use the PIL path otherwise.

Provides:
    write_png_rgb8(path, arr)         — synchronous PNG encode+write
    FrameWriter(max_queue)            — async snapshot writer: submit() is
                                        non-blocking (bounded queue), so
                                        frame IO never stalls the training
                                        loop (the reference writes PNGs
                                        synchronously from the GA loop,
                                        modules/utils.py:62-69)
    csv_append(path, header, values)  — appending metrics rows
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libggs_native.so")
_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "-s"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.ggs_write_png_rgb8.restype = ctypes.c_int
        lib.ggs_write_png_rgb8.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.ggs_frame_writer_new.restype = ctypes.c_void_p
        lib.ggs_frame_writer_new.argtypes = [ctypes.c_int]
        lib.ggs_frame_writer_submit.restype = ctypes.c_int
        lib.ggs_frame_writer_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.ggs_frame_writer_flush.argtypes = [ctypes.c_void_p]
        lib.ggs_frame_writer_errors.restype = ctypes.c_long
        lib.ggs_frame_writer_errors.argtypes = [ctypes.c_void_p]
        lib.ggs_frame_writer_free.argtypes = [ctypes.c_void_p]
        lib.ggs_csv_append.restype = ctypes.c_int
        lib.ggs_csv_append.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.ggs_apng_new.restype = ctypes.c_void_p
        lib.ggs_apng_new.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.ggs_apng_add.restype = ctypes.c_int
        lib.ggs_apng_add.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.ggs_apng_finish.restype = ctypes.c_int
        lib.ggs_apng_finish.argtypes = [ctypes.c_void_p]
        lib.ggs_apng_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_u8(arr) -> np.ndarray:
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    assert a.ndim == 3 and a.shape[2] == 3, f"expected [H, W, 3] uint8, got {a.shape}"
    return a


def write_png_rgb8(path: str, arr) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("ggs_native unavailable")
    a = _as_u8(arr)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rc = lib.ggs_write_png_rgb8(
        path.encode(), a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        a.shape[0], a.shape[1],
    )
    if rc != 0:
        raise IOError(f"ggs_write_png_rgb8 failed with code {rc} for {path}")


class FrameWriter:
    """Async PNG writer backed by a C++ worker thread with a bounded queue."""

    def __init__(self, max_queue: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("ggs_native unavailable")
        self._lib = lib
        self._h = lib.ggs_frame_writer_new(max_queue)

    def submit(self, path: str, arr) -> None:
        a = _as_u8(arr)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        rc = self._lib.ggs_frame_writer_submit(
            self._h, path.encode(),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), a.shape[0], a.shape[1],
        )
        if rc != 0:
            raise IOError(f"frame submit failed for {path}")

    def flush(self) -> None:
        self._lib.ggs_frame_writer_flush(self._h)

    @property
    def errors(self) -> int:
        return int(self._lib.ggs_frame_writer_errors(self._h))

    def close(self) -> None:
        if self._h is not None:
            self._lib.ggs_frame_writer_flush(self._h)
            self._lib.ggs_frame_writer_free(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass


class ApngWriter:
    """Streaming animated-PNG builder (C++ encoder).

    Frames stream in as [H, W, 3] uint8 and are deflated immediately, so
    only compressed frames stay in memory; close() writes the .apng (acTL +
    fcTL/fdAT chunks, full-frame replace, infinite loop). This turns the
    reference's frame-cadence config (SAVE_VIDEO/FPS, modules/config.py:
    61-64) into an actual assembled animation — the reference never
    assembles one.
    """

    def __init__(self, path: str, h: int, w: int, fps: int = 30):
        lib = _load()
        if lib is None:
            raise RuntimeError("ggs_native unavailable")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._lib = lib
        self._h = lib.ggs_apng_new(path.encode(), h, w, fps)
        if not self._h:
            raise ValueError(f"bad APNG dims {h}x{w}")
        self._path = path
        self._shape = (h, w)
        self.frames = 0

    def add(self, arr) -> None:
        if self._h is None:
            raise ValueError("ApngWriter is closed")
        a = _as_u8(arr)
        assert a.shape[:2] == self._shape, f"{a.shape[:2]} != {self._shape}"
        rc = self._lib.ggs_apng_add(
            self._h, a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc != 0:
            raise IOError(f"APNG frame add failed for {self._path}")
        self.frames += 1

    def close(self) -> bool:
        """Write the file. Returns False if no frames were added."""
        if self._h is None:
            return False
        ok = self._lib.ggs_apng_finish(self._h) == 0
        self._lib.ggs_apng_free(self._h)
        self._h = None
        return ok

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # best-effort
        try:
            if self._h is not None:
                self._lib.ggs_apng_free(self._h)
                self._h = None
        except Exception:
            pass


def csv_append(path: str, header: str, values: Sequence[float]) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("ggs_native unavailable")
    arr = (ctypes.c_double * len(values))(*[float(v) for v in values])
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rc = lib.ggs_csv_append(path.encode(), header.encode(), arr, len(values))
    if rc != 0:
        raise IOError(f"csv append failed for {path}")
