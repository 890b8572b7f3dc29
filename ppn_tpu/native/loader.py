"""ctypes wrapper for the native JPEG decode+resize worker pool.

Auto-builds ``libppnloader.so`` with the bundled Makefile on first use
(g++ + libjpeg ship in the image); every entry point degrades gracefully to
a PIL fallback when the toolchain is unavailable, so the framework never
hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libppnloader.so")
_lib = None
_lib_lock = threading.Lock()


def _rebuild() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s", "-B"], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_DIR, "loader.cc")
        stale = (not os.path.exists(_SO)
                 or os.path.getmtime(_SO) < os.path.getmtime(src))
        if stale and not _rebuild() and not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ppn_decode_resize.restype = ctypes.c_int
        lib.ppn_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        try:
            lib.ppn_jpeg_dims.restype = ctypes.c_int
            lib.ppn_jpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        except AttributeError:
            pass  # stale .so from before ppn_jpeg_dims; dims fall back to PIL
        lib.ppn_loader_create.restype = ctypes.c_void_p
        lib.ppn_loader_create.argtypes = [ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int]
        lib.ppn_loader_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
        lib.ppn_loader_get.restype = ctypes.c_int64
        lib.ppn_loader_get.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float)]
        lib.ppn_loader_pending.restype = ctypes.c_int
        lib.ppn_loader_pending.argtypes = [ctypes.c_void_p]
        lib.ppn_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(jpeg_bytes: bytes) -> Tuple[int, int]:
    """(width, height) from the JPEG header — no full decode.

    Dataset loaders need the original size to rescale GT coordinates
    before the resized pixels arrive.
    """
    lib = _load()
    if lib is not None and hasattr(lib, "ppn_jpeg_dims"):
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.ppn_jpeg_dims(jpeg_bytes, len(jpeg_bytes),
                             ctypes.byref(w), ctypes.byref(h)) == 0:
            return int(w.value), int(h.value)
        raise ValueError("corrupt JPEG (header unreadable)")
    from PIL import Image

    return Image.open(io.BytesIO(jpeg_bytes)).size


def decode_resize(jpeg_bytes: bytes, out_size: Tuple[int, int]
                  ) -> np.ndarray:
    """JPEG bytes → (H, W, 3) float32 RGB in [0,1] at out_size.

    Native one-shot path; PIL fallback when the .so can't be built.
    """
    H, W = out_size
    lib = _load()
    if lib is not None:
        out = np.empty((H, W, 3), np.float32)
        rc = lib.ppn_decode_resize(
            jpeg_bytes, len(jpeg_bytes), H, W,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc == 0:
            return out
        raise ValueError("native JPEG decode failed (corrupt input?)")
    from PIL import Image

    img = Image.open(io.BytesIO(jpeg_bytes)).convert("RGB")
    img = img.resize((W, H), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


class NativeJpegLoader:
    """Asynchronous decode+resize pool (the DataLoader-worker analog).

    submit(id, jpeg_bytes) from any thread; get() blocks for the next
    finished frame → (id, (H, W, 3) float32). Out-of-order completion by
    design — carry ids.
    """

    def __init__(self, out_size: Tuple[int, int], num_workers: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native loader unavailable (g++/libjpeg missing?); use "
                "decode_resize() which falls back to PIL")
        self._lib = lib
        self._h, self._w = out_size
        self._handle = lib.ppn_loader_create(num_workers, self._h, self._w)

    def submit(self, job_id: int, jpeg_bytes: bytes) -> None:
        self._lib.ppn_loader_submit(self._handle, job_id, jpeg_bytes,
                                    len(jpeg_bytes))

    def get(self) -> Tuple[int, Optional[np.ndarray]]:
        out = np.empty((self._h, self._w, 3), np.float32)
        rid = self._lib.ppn_loader_get(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rid < 0:
            return (-int(rid) - 2, None)  # decode failure for that id
        return (int(rid), out)

    def pending(self) -> int:
        return self._lib.ppn_loader_pending(self._handle)

    def close(self) -> None:
        if self._handle:
            self._lib.ppn_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
