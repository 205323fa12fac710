"""Host input-pipeline micro-benchmark: chunk access modes.

Builds one synthetic chunk (reference container format) at a realistic
image size and times the three chunk-access paths end-to-end
(archive → decoded fixed-shape float arrays):

  extract   tar.extractall to disk, then per-file reads  (reference
            chunked_dataset.py:329-341 semantics)
  stream    native chunkio.cc: inflate archive into memory, decode from
            the in-memory blobs (no disk round-trip)
  stream-py same, but through the Python tarfile fallback

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/loader_bench.py
(pure host code — no TPU, no jax).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

from helpers_synthetic import make_synthetic_chunk  # noqa: E402

from pose3d_tpu.data import native  # noqa: E402
from pose3d_tpu.data.chunks import (  # noqa: E402
    decode_chunk_samples,
    open_chunk_store,
)


def run(n_samples: int = 128, image_hw=(500, 500), out_size=(500, 500),
        reps: int = 3):
    work = Path(tempfile.mkdtemp(prefix="loader_bench_"))
    try:
        print(f"building synthetic chunk: {n_samples} samples @ {image_hw}")
        tar_path, _ = make_synthetic_chunk(
            work, 0, num_samples=n_samples, image_hw=image_hw, prefix="bench"
        )
        print(f"archive: {tar_path.stat().st_size / 1e6:.1f} MB, "
              f"native chunkio: {native.chunkio_available()}")

        def bench(label, fn):
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                n = fn()
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(f"{label:10s}: {best * 1e3:8.1f} ms best of {reps} "
                  f"({n} samples, {n_samples / best:.1f} samples/s)")
            return best

        def extract_path():
            cache = work / "cache"
            shutil.rmtree(cache, ignore_errors=True)  # cold every rep
            store = open_chunk_store(tar_path, cache, mode="extract")
            return len(decode_chunk_samples(store.samples, store, out_size))

        def stream_native():
            store = open_chunk_store(tar_path, mode="stream")
            return len(decode_chunk_samples(store.samples, store, out_size))

        def stream_python():
            orig = native.read_chunk_members
            native.read_chunk_members = lambda p: None
            try:
                store = open_chunk_store(tar_path, mode="stream")
                return len(
                    decode_chunk_samples(store.samples, store, out_size)
                )
            finally:
                native.read_chunk_members = orig

        def stream_uint8():
            store = open_chunk_store(tar_path, mode="stream")
            return len(decode_chunk_samples(store.samples, store, out_size,
                                            pixel_dtype="uint8"))

        t_extract = bench("extract", extract_path)
        t_stream = bench("stream", stream_native)
        bench("stream-py", stream_python)
        t_u8 = bench("stream-u8", stream_uint8)
        print(f"stream vs extract: {t_extract / t_stream:.2f}x; "
              f"uint8 vs f32 decode: {t_stream / t_u8:.2f}x "
              f"(plus 4x less decoded-sample memory)")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    run()
