"""ctypes bindings for the native host-pipeline tier (native/posedec.cc +
native/chunkio.cc).

``decode_jpeg_batch`` / ``decode_png_gray_batch`` decode+resize+normalize a
whole list of encoded blobs in one GIL-free C call with an internal thread
pool. ``read_chunk_members`` inflates a whole chunk archive (tar / tar.gz)
into memory in one native pass — no extract-to-disk. Both fall back
transparently (cv2 / tarfile) when the shared library has not been built
(``make -C native``).
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
                        ctypes.POINTER(ctypes.c_uint8),
                    ]
                try:  # uint8-output decode (absent in older builds)
                    for name in ("pd_decode_jpeg_batch_u8",
                                 "pd_decode_png_gray_batch_u8"):
                        fn = getattr(lib, name)
                        fn.restype = ctypes.c_int
                        fn.argtypes = [
                            ctypes.POINTER(ctypes.c_char_p),
                            ctypes.POINTER(ctypes.c_int64),
                            ctypes.c_int, ctypes.c_int, ctypes.c_int,
                            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                            ctypes.POINTER(ctypes.c_uint8),
                        ]
                    lib._has_u8 = True
                except AttributeError:
                    lib._has_u8 = False
                try:  # chunkio entry points (absent in pre-round-3 builds)
                    lib.pd_chunk_open.restype = ctypes.c_void_p
                    lib.pd_chunk_open.argtypes = [ctypes.c_char_p]
                    lib.pd_chunk_count.restype = ctypes.c_int64
                    lib.pd_chunk_count.argtypes = [ctypes.c_void_p]
                    lib.pd_chunk_name.restype = ctypes.c_char_p
                    lib.pd_chunk_name.argtypes = [ctypes.c_void_p,
                                                  ctypes.c_int64]
                    lib.pd_chunk_data.restype = ctypes.POINTER(ctypes.c_uint8)
                    lib.pd_chunk_data.argtypes = [
                        ctypes.c_void_p, ctypes.c_int64,
                        ctypes.POINTER(ctypes.c_int64),
                    ]
                    lib.pd_chunk_close.argtypes = [ctypes.c_void_p]
                    lib.pd_chunk_error.restype = ctypes.c_char_p
                    lib._has_chunkio = True
                except AttributeError:
                    lib._has_chunkio = False
                _LIB = lib
                logger.info("Loaded native decoder %s", path)
            except OSError:
                logger.exception("Failed to load %s", path)
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def _batch_call(fn_name: str, blobs: Sequence[bytes], out_hw, channels: int,
                num_threads: int, out_dtype=np.float32):
    lib = get_lib()
    n = len(blobs)
    h, w = out_hw
    out = np.zeros((n, h, w, channels), out_dtype)
    flags = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*blobs)
    sizes = (ctypes.c_int64 * n)(*[len(b) for b in blobs])
    fn = getattr(lib, fn_name)
    out_ctype = (
        ctypes.c_uint8 if out_dtype == np.uint8 else ctypes.c_float
    )
    ok = fn(
        ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(sizes, ctypes.POINTER(ctypes.c_int64)),
        n, h, w,
        out.ctypes.data_as(ctypes.POINTER(out_ctype)),
        num_threads,
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if ok != n:
        logger.warning("%s: %d/%d blobs decoded", fn_name, ok, n)
    return out, flags.astype(bool)


def _cv2_fallback(blobs, out_hw, gray: bool, dtype=np.float32):
    import cv2

    h, w = out_hw
    c = 1 if gray else 3
    out = np.zeros((len(blobs), h, w, c), dtype)
    flags = np.zeros((len(blobs),), bool)
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
        if dtype == np.uint8:
            out[i] = img.reshape(h, w, c)
        else:
            out[i] = (img.astype(np.float32) / 255.0).reshape(h, w, c)
        flags[i] = True
    return out, flags


_warned_u8_bridge = False


def _quantize(out_f32: np.ndarray) -> np.ndarray:
    """f32 [0,1] → rounded uint8 (bridge for native builds without the
    _u8 entry points — one extra pass, same result as the native round).

    Warns once: this path allocates the full float32 batch first, so the
    uint8 mode's 4× host-memory saving does not hold — a stale
    libposedec.so (predating pd_decode_*_batch_u8) is the usual cause."""
    global _warned_u8_bridge
    if not _warned_u8_bridge:
        _warned_u8_bridge = True
        logger.warning(
            "uint8 decode is using the f32-decode+quantize bridge "
            "(native lib lacks the _u8 entry points — rebuild "
            "libposedec.so to restore the 4x host-memory saving)"
        )
    return np.clip(out_f32 * 255.0 + 0.5, 0, 255).astype(np.uint8)


def decode_jpeg_batch(blobs: Sequence[bytes], out_hw,
                      num_threads: int = 8, dtype=np.float32):
    """[N encoded JPEGs] → ([N, H, W, 3] RGB, [N] bool per-slot success
    flags). ``dtype=np.float32`` (default) yields [0, 1] floats;
    ``np.uint8`` yields 0..255 bytes (the memory-lean pipeline mode)."""
    u8 = np.dtype(dtype) == np.uint8
    if native_available():
        lib = get_lib()
        if u8 and getattr(lib, "_has_u8", False):
            return _batch_call("pd_decode_jpeg_batch_u8", blobs, out_hw, 3,
                               num_threads, np.uint8)
        out, flags = _batch_call("pd_decode_jpeg_batch", blobs, out_hw, 3,
                                 num_threads)
        return (_quantize(out), flags) if u8 else (out, flags)
    return _cv2_fallback(blobs, out_hw, gray=False,
                         dtype=np.uint8 if u8 else np.float32)


def decode_png_gray_batch(blobs: Sequence[bytes], out_hw,
                          num_threads: int = 8, dtype=np.float32):
    """[N encoded PNGs] → ([N, H, W, 1] gray, [N] bool per-slot success
    flags). ``dtype`` as in :func:`decode_jpeg_batch`."""
    u8 = np.dtype(dtype) == np.uint8
    if native_available():
        lib = get_lib()
        if u8 and getattr(lib, "_has_u8", False):
            return _batch_call("pd_decode_png_gray_batch_u8", blobs, out_hw,
                               1, num_threads, np.uint8)
        out, flags = _batch_call("pd_decode_png_gray_batch", blobs, out_hw,
                                 1, num_threads)
        return (_quantize(out), flags) if u8 else (out, flags)
    return _cv2_fallback(blobs, out_hw, gray=True,
                         dtype=np.uint8 if u8 else np.float32)


def chunkio_available() -> bool:
    lib = get_lib()
    return lib is not None and getattr(lib, "_has_chunkio", False)


def read_chunk_members(tar_path) -> Optional[dict]:
    """Native in-memory read of a chunk archive: one C call inflates the
    tar/tar.gz and returns ``{member_name: bytes}`` for every regular file —
    no extraction to disk (native/chunkio.cc). Returns None when the native
    library is unavailable or cannot parse the archive (e.g. .tar.bz2/.xz),
    so callers can fall back to the Python ``tarfile`` streaming path."""
    if not chunkio_available():
        return None
    lib = get_lib()
    handle = lib.pd_chunk_open(str(tar_path).encode())
    if not handle:
        logger.warning(
            "native chunk read failed for %s: %s — falling back",
            tar_path, lib.pd_chunk_error().decode(errors="replace"),
        )
        return None
    try:
        members = {}
        for i in range(lib.pd_chunk_count(handle)):
            name = lib.pd_chunk_name(handle, i).decode(errors="replace")
            size = ctypes.c_int64()
            ptr = lib.pd_chunk_data(handle, i, ctypes.byref(size))
            members[name] = ctypes.string_at(ptr, size.value) if size.value \
                else b""
        return members
    finally:
        lib.pd_chunk_close(handle)
