"""ctypes bindings for the native decode tier (native/posedec.cc).

``decode_jpeg_batch`` / ``decode_png_gray_batch`` decode+resize+normalize a
whole list of encoded blobs in one GIL-free C call with an internal thread
pool. Falls back transparently to cv2 when the shared library has not been
built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import logging
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger("pose3d_tpu.native")

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False


def _find_library() -> Optional[Path]:
    env = os.environ.get("POSEDEC_LIB")
    if env and Path(env).exists():
        return Path(env)
    here = Path(__file__).resolve()
    for base in [here.parents[2], here.parents[1], Path.cwd()]:
        cand = base / "native" / "libposedec.so"
        if cand.exists():
            return cand
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _LIB is None and not _SEARCHED:
        _SEARCHED = True
        path = _find_library()
        if path is not None:
            try:
                lib = ctypes.CDLL(str(path))
                for name in ("pd_decode_jpeg_batch", "pd_decode_png_gray_batch"):
                    fn = getattr(lib, name)
                    fn.restype = ctypes.c_int
                    fn.argtypes = [
                        ctypes.POINTER(ctypes.c_char_p),
                        ctypes.POINTER(ctypes.c_int64),
                        ctypes.c_int, ctypes.c_int, ctypes.c_int,
                        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                    ]
                _LIB = lib
                logger.info("Loaded native decoder %s", path)
            except OSError:
                logger.exception("Failed to load %s", path)
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _batch_call(fn_name: str, blobs: Sequence[bytes], out_hw, channels: int,
                num_threads: int) -> np.ndarray:
    lib = get_lib()
    n = len(blobs)
    h, w = out_hw
    out = np.zeros((n, h, w, channels), np.float32)
    arr = (ctypes.c_char_p * n)(*blobs)
    sizes = (ctypes.c_int64 * n)(*[len(b) for b in blobs])
    fn = getattr(lib, fn_name)
    ok = fn(
        ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(sizes, ctypes.POINTER(ctypes.c_int64)),
        n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if ok != n:
        logger.warning("%s: %d/%d blobs decoded", fn_name, ok, n)
    return out


def _cv2_fallback(blobs, out_hw, gray: bool) -> np.ndarray:
    import cv2

    h, w = out_hw
    c = 1 if gray else 3
    out = np.zeros((len(blobs), h, w, c), np.float32)
    for i, b in enumerate(blobs):
        buf = np.frombuffer(b, np.uint8)
        img = cv2.imdecode(
            buf, cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
        )
        if img is None:
            continue
        if not gray:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        out[i] = (img.astype(np.float32) / 255.0).reshape(h, w, c)
    return out


def decode_jpeg_batch(blobs: Sequence[bytes], out_hw,
                      num_threads: int = 8) -> np.ndarray:
    """[N encoded JPEGs] → [N, H, W, 3] float32 RGB in [0, 1]."""
    if native_available():
        return _batch_call("pd_decode_jpeg_batch", blobs, out_hw, 3,
                           num_threads)
    return _cv2_fallback(blobs, out_hw, gray=False)


def decode_png_gray_batch(blobs: Sequence[bytes], out_hw,
                          num_threads: int = 8) -> np.ndarray:
    """[N encoded PNGs] → [N, H, W, 1] float32 gray in [0, 1]."""
    if native_available():
        return _batch_call("pd_decode_png_gray_batch", blobs, out_hw, 1,
                           num_threads)
    return _cv2_fallback(blobs, out_hw, gray=True)
