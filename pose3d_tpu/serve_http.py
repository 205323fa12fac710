"""Batching inference server over an exported serving artifact.

The reference's only "serving" story is its per-image inference CLI
(reference infer.py:424 — one model dispatch per file, no batching; see
SURVEY.md §3.2). This module is the deployment-side answer: a
dependency-free HTTP server that loads ONE ``jax.export`` artifact
(pose3d_tpu/serve.py) and serves it with *dynamic micro-batching* — the
standard TPU serving shape, where requests queue on the host and a single
dispatcher forms device batches so the MXU always sees wide matmuls:

  * requests accumulate up to ``max_batch`` samples or ``max_wait_ms``,
    whichever comes first, then run as ONE device call;
  * batch sizes are bucketed to powers of two (padded with zeros, answers
    sliced back), so a dynamic-batch artifact compiles a handful of
    executables instead of one per request size — and a static-batch
    artifact always pads to its fixed size;
  * the transport is stdlib http.server (ThreadingHTTPServer) carrying
    ``.npz`` payloads — no framework, no pickle, loadable by any client
    with numpy.

Endpoints:
  POST /predict   body: npz{image[B,H,W,3], depth[B,H,W,1],
                  keypoints_2d[B,J,2]} (float32) → npz{joints_3d[B,J,3]};
                  X-Batch-* response headers carry queue/device timing.
  GET  /healthz   200 once the warmup batch has run.
  GET  /meta      artifact sidecar + batching config + live counters.

The batching core (``MicroBatcher``) is transport-independent and tested
directly (tests/test_serving.py)."""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger("pose3d_tpu.serve_http")

INPUT_KEYS = ("image", "depth", "keypoints_2d")


def _bucket(n: int, cap: int) -> int:
    """Smallest power of two ≥ n, capped at ``cap`` — bounds the number of
    compiled executables for a dynamic-batch artifact to log2(cap)+1."""
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


class MicroBatcher:
    """Coalesce concurrent predict requests into device batches.

    ``call_fn(image, depth, keypoints_2d) -> joints`` runs one device
    batch (e.g. ``jax.jit(exported.call)``). ``static_batch`` pins every
    device call to that exact size (static-batch artifacts); otherwise
    calls are padded to power-of-two buckets ≤ ``max_batch``.
    """

    def __init__(
        self,
        call_fn,
        *,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        static_batch: Optional[int] = None,
    ):
        if static_batch is not None:
            max_batch = static_batch
        self._call_fn = call_fn
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.static_batch = static_batch
        self._queue: queue.Queue = queue.Queue()
        self._closed = False
        self.device_calls = 0
        self.samples_served = 0
        self.samples_padded = 0
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="microbatcher", daemon=True
        )
        self._thread.start()

    # -- client side --------------------------------------------------

    def submit(self, image, depth, keypoints_2d) -> Future:
        """Enqueue a [b, ...] request; resolves to joints [b, J, 3]."""
        if self._closed:
            raise RuntimeError("server is shutting down")
        arrays = (np.asarray(image, np.float32),
                  np.asarray(depth, np.float32),
                  np.asarray(keypoints_2d, np.float32))
        b = arrays[0].shape[0]
        if any(a.shape[0] != b for a in arrays):
            raise ValueError("inputs disagree on batch size")
        fut: Future = Future()
        self._queue.put((arrays, fut, time.monotonic()))
        return fut

    def close(self):
        self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=5)
        # Fail anything still queued (behind the sentinel, or racing a
        # submit) — otherwise their handler threads block on .result()
        # for the full request timeout during shutdown.
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[1].done():
                item[1].set_exception(
                    RuntimeError("server shut down before dispatch")
                )

    def stats(self) -> dict:
        return {
            "device_calls": self.device_calls,
            "samples_served": self.samples_served,
            "samples_padded": self.samples_padded,
            "max_batch": self.max_batch,
            "max_wait_ms": self.max_wait_s * 1e3,
            "static_batch": self.static_batch,
        }

    # -- dispatcher ---------------------------------------------------

    def _dispatch_loop(self):
        while not self._closed:
            item = self._queue.get()
            if item is None:
                break
            items = [item]
            n = item[0][0].shape[0]
            deadline = time.monotonic() + self.max_wait_s
            while n < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._closed = True
                    break
                items.append(nxt)
                n += nxt[0][0].shape[0]
            try:
                self._run_batch(items)
            except Exception as e:  # resolve futures, keep serving
                logger.exception("batch failed")
                for _, fut, _ in items:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_batch(self, items):
        t0 = time.monotonic()
        arrays = [np.concatenate([it[0][i] for it in items], axis=0)
                  for i in range(3)]
        n = arrays[0].shape[0]
        out_parts = []
        # chunk oversized coalesced batches; pad the final chunk
        for lo in range(0, n, self.max_batch):
            chunk = [a[lo:lo + self.max_batch] for a in arrays]
            cn = chunk[0].shape[0]
            target = (self.static_batch if self.static_batch is not None
                      else _bucket(cn, self.max_batch))
            if cn < target:
                pad = target - cn
                self.samples_padded += pad
                chunk = [
                    np.concatenate(
                        [a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
                    ) for a in chunk
                ]
            joints = np.asarray(self._call_fn(*chunk))  # forces readback
            self.device_calls += 1
            out_parts.append(joints[:cn])
        joints = np.concatenate(out_parts, axis=0)
        self.samples_served += n
        t1 = time.monotonic()
        lo = 0
        for arrays_i, fut, t_enq in items:
            b = arrays_i[0].shape[0]
            fut.set_result({
                "joints_3d": joints[lo:lo + b],
                "queue_ms": (t0 - t_enq) * 1e3,
                "device_ms": (t1 - t0) * 1e3,
                "batch_size": n,
            })
            lo += b


class PipelineBatcher(MicroBatcher):
    """MicroBatcher over *lists of decoded RGB images* (variable sizes)
    for the full-pipeline mode: stage 1 (keypoints + depth) + lifter per
    device batch. ``call_fn(images: list[np.ndarray]) -> (joints [n,J,3],
    keypoints [n,J,3])``. Batch sizes still bucket to powers of two —
    the list is padded by repeating its last image (results sliced off) so
    the jitted stage-1/lifter programs compile once per bucket."""

    def submit(self, images) -> Future:
        if not images:
            raise ValueError("empty image list")
        fut: Future = Future()
        self._queue.put((images, fut, time.monotonic()))
        return fut

    def _run_batch(self, items):
        t0 = time.monotonic()
        images = [im for imgs, _, _ in items for im in imgs]
        n = len(images)
        joints_parts, kpts_parts = [], []
        for lo in range(0, n, self.max_batch):
            chunk = images[lo:lo + self.max_batch]
            cn = len(chunk)
            target = (self.static_batch if self.static_batch is not None
                      else _bucket(cn, self.max_batch))
            if cn < target:
                self.samples_padded += target - cn
                chunk = chunk + [chunk[-1]] * (target - cn)
            joints, kpts = self._call_fn(chunk)
            self.device_calls += 1
            joints_parts.append(np.asarray(joints)[:cn])
            kpts_parts.append(np.asarray(kpts)[:cn])
        joints = np.concatenate(joints_parts, axis=0)
        kpts = np.concatenate(kpts_parts, axis=0)
        self.samples_served += n
        t1 = time.monotonic()
        lo = 0
        for imgs, fut, t_enq in items:
            b = len(imgs)
            fut.set_result({
                "joints_3d": joints[lo:lo + b],
                "keypoints": kpts[lo:lo + b],
                "queue_ms": (t0 - t_enq) * 1e3,
                "device_ms": (t1 - t0) * 1e3,
                "batch_size": n,
            })
            lo += b


def _load_pipeline_call(checkpoint, stage1_kwargs, ema=False):
    """Full reference pipeline as one batched callable: decoded RGB
    images -> stage 1 (batched keypoints + depth) -> jitted lifter ->
    joints. The serving twin of cli/infer's per-batch body (the
    reference runs this per image with three separate model dispatches,
    infer.py:424)."""
    from pose3d_tpu.cli.infer import load_pose_model, make_lifter
    from pose3d_tpu.stage1 import get_stage1_provider

    model, variables, model_cfg = load_pose_model(checkpoint, ema=ema)
    provider = get_stage1_provider("jax", **stage1_kwargs)
    lift = make_lifter(model, variables, model_cfg)

    def call(images):
        s1s = provider.predict_batch(images)
        joints = lift(images, s1s)
        kpts = np.stack([s.keypoints for s in s1s]).astype(np.float32)
        return joints, kpts

    return call, tuple(model_cfg.image_size), model_cfg.num_joints


# ----------------------------------------------------------------------
# HTTP layer
# ----------------------------------------------------------------------

def _load_call_fn(artifact_dir):
    """Jitted artifact call + static input contract from the avals."""
    import jax

    from pose3d_tpu.serve import load_exported

    exported = load_exported(artifact_dir)
    a_img = exported.in_avals[0]
    batch_dim = a_img.shape[0]
    static_batch = int(batch_dim) if isinstance(batch_dim, int) else None
    image_hw = tuple(int(d) for d in a_img.shape[1:3])
    num_joints = int(exported.in_avals[2].shape[1])
    return jax.jit(exported.call), static_batch, image_hw, num_joints


class _Handler(BaseHTTPRequestHandler):
    server_version = "pose3d-serve/1"

    # quieter than the default stderr-per-request
    def log_message(self, fmt, *args):
        logger.debug("%s " + fmt, self.address_string(), *args)

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        srv = self.server
        if self.path == "/healthz":
            err = getattr(srv, "warmup_error", None)
            if srv.ready:
                payload = {"status": "ok"}
            elif err:
                payload = {"status": "failed", "error": err}
            else:
                payload = {"status": "warming up"}
            self._json(200 if srv.ready else 503, payload)
        elif self.path == "/meta":
            self._json(200, {
                "artifact": srv.artifact_meta,
                "batching": srv.batcher.stats(),
                "image_size": list(srv.image_hw),
                "num_joints": srv.num_joints,
            })
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        srv = self.server
        if self.path == "/predict_image" and getattr(srv, "pipeline", False):
            self._predict_image()
            return
        if self.path != "/predict" or getattr(srv, "pipeline", False):
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", "0"))
            data = np.load(io.BytesIO(self.rfile.read(length)))
            missing = [k for k in INPUT_KEYS if k not in data.files]
            if missing:
                raise ValueError(f"missing npz keys: {missing}")
            args = [data[k] for k in INPUT_KEYS]
            # Validate EVERY array shape up front: a malformed request
            # that reaches the batcher fails np.concatenate for the whole
            # coalesced batch, 500-ing every concurrent well-formed
            # request (cross-request poisoning, review finding).
            img, depth, kpts = args
            if img.ndim != 4 or img.shape[3] != 3:
                raise ValueError(f"image must be [b,H,W,3], got {img.shape}")
            b = img.shape[0]
            if b < 1:
                raise ValueError("batch size must be >= 1")
            hw = tuple(img.shape[1:3])
            if hw != srv.image_hw:
                raise ValueError(
                    f"image is {hw}, artifact expects {srv.image_hw}"
                )
            if depth.shape != (b,) + srv.image_hw + (1,):
                raise ValueError(
                    f"depth must be {(b,) + srv.image_hw + (1,)}, "
                    f"got {depth.shape}"
                )
            if kpts.shape != (b, srv.num_joints, 2):
                raise ValueError(
                    f"keypoints_2d must be {(b, srv.num_joints, 2)}, "
                    f"got {kpts.shape}"
                )
        except Exception as e:
            self._json(400, {"error": str(e)})
            return
        try:
            result = srv.batcher.submit(*args).result(timeout=srv.timeout_s)
        except Exception as e:
            self._json(500, {"error": str(e)})
            return
        buf = io.BytesIO()
        np.savez(buf, joints_3d=result["joints_3d"])
        body = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-Batch-Size", str(result["batch_size"]))
        self.send_header("X-Queue-Ms", f"{result['queue_ms']:.2f}")
        self.send_header("X-Device-Ms", f"{result['device_ms']:.2f}")
        self.end_headers()
        self.wfile.write(body)

    def _predict_image(self):
        """Full-pipeline endpoint: raw encoded image (JPEG/PNG bytes) in,
        npz{joints_3d [J,3], keypoints [J,3]} out."""
        import cv2

        srv = self.server
        try:
            length = int(self.headers.get("Content-Length", "0"))
            raw = np.frombuffer(self.rfile.read(length), np.uint8)
            bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
            if bgr is None:
                raise ValueError("body is not a decodable image")
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        except Exception as e:
            self._json(400, {"error": str(e)})
            return
        try:
            result = srv.batcher.submit([rgb]).result(timeout=srv.timeout_s)
        except Exception as e:
            self._json(500, {"error": str(e)})
            return
        buf = io.BytesIO()
        np.savez(buf, joints_3d=result["joints_3d"][0],
                 keypoints=result["keypoints"][0])
        body = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "application/octet-stream")
        self.send_header("Content-Length", str(len(body)))
        self.send_header("X-Batch-Size", str(result["batch_size"]))
        self.send_header("X-Queue-Ms", f"{result['queue_ms']:.2f}")
        self.send_header("X-Device-Ms", f"{result['device_ms']:.2f}")
        self.end_headers()
        self.wfile.write(body)


def make_server(
    artifact_dir,
    host: str = "127.0.0.1",
    port: int = 8000,
    *,
    max_batch: int = 8,
    max_wait_ms: float = 5.0,
    request_timeout_s: float = 60.0,
) -> ThreadingHTTPServer:
    """Build (but don't start) the serving HTTP server; the caller runs
    ``serve_forever()``. Runs one warmup batch so the first request does
    not pay the compile."""
    from pose3d_tpu.serve import load_exported_meta

    call_fn, static_batch, image_hw, num_joints = _load_call_fn(artifact_dir)
    batcher = MicroBatcher(
        call_fn, max_batch=max_batch, max_wait_ms=max_wait_ms,
        static_batch=static_batch,
    )
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.batcher = batcher
    srv.image_hw = image_hw
    srv.num_joints = num_joints
    srv.timeout_s = request_timeout_s
    srv.pipeline = False
    try:
        srv.artifact_meta = load_exported_meta(artifact_dir)
    except Exception:
        srv.artifact_meta = {}
    srv.ready = False

    srv.warmup_error = None

    def warmup():
        try:
            h, w = image_hw
            batcher.submit(
                np.zeros((1, h, w, 3), np.float32),
                np.ones((1, h, w, 1), np.float32),
                np.full((1, num_joints, 2), 0.5, np.float32),
            ).result()
        except Exception as e:  # surface via /healthz, not a dead thread
            srv.warmup_error = f"{type(e).__name__}: {e}"
            logger.exception("warmup failed — server will stay unready")
            return
        srv.ready = True
        logger.info("warmup done; serving on %s:%d", host, srv.server_port)

    threading.Thread(target=warmup, daemon=True).start()
    return srv


def make_pipeline_server(
    checkpoint,
    host: str = "127.0.0.1",
    port: int = 8000,
    *,
    max_batch: int = 8,
    max_wait_ms: float = 5.0,
    request_timeout_s: float = 600.0,
    stage1_kwargs: Optional[dict] = None,
    ema: bool = False,
) -> ThreadingHTTPServer:
    """Full-pipeline server: POST an encoded image to /predict_image and
    get back npz{joints_3d, keypoints} — the reference's entire infer
    flow (YOLO keypoints + DepthPro depth + lifter, infer.py:396-502) as
    one micro-batched service. ``stage1_kwargs`` go to JaxStage1
    (kp_weights/depth_weights/confidence_threshold/...)."""
    call, image_hw, num_joints = _load_pipeline_call(
        checkpoint, stage1_kwargs or {}, ema=ema
    )
    batcher = PipelineBatcher(
        call, max_batch=max_batch, max_wait_ms=max_wait_ms
    )
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.batcher = batcher
    srv.image_hw = image_hw
    srv.num_joints = num_joints
    srv.timeout_s = request_timeout_s
    srv.pipeline = True
    srv.artifact_meta = {"mode": "pipeline", "checkpoint": str(checkpoint)}
    srv.ready = False
    srv.warmup_error = None

    def warmup():
        h, w = image_hw
        try:
            batcher.submit(
                [np.zeros((h, w, 3), np.uint8)]
            ).result()
        except Exception as e:  # surface via /healthz, not a dead thread
            srv.warmup_error = f"{type(e).__name__}: {e}"
            logger.exception("warmup failed — server will stay unready")
            return
        srv.ready = True
        logger.info("pipeline warmup done; serving on %s:%d",
                    host, srv.server_port)

    threading.Thread(target=warmup, daemon=True).start()
    return srv


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(
        description="Serve the lifter with dynamic micro-batching: either "
                    "an exported artifact (--artifact; POST npz to "
                    "/predict) or the FULL pipeline (--checkpoint + stage-1 "
                    "weights; POST an encoded image to /predict_image)"
    )
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--artifact",
                      help="pose3d-export output directory (lifter-only "
                           "npz serving)")
    mode.add_argument("--checkpoint",
                      help="framework checkpoint dir or reference .pth: "
                           "serve the full image->joints pipeline "
                           "(stage 1 + lifter)")
    p.add_argument("--kp-weights", default=None,
                   help="pipeline mode: ultralytics yolo11-pose .pt")
    p.add_argument("--depth-weights", default=None,
                   help="pipeline mode: DepthPro safetensors")
    p.add_argument("--confidence-threshold", type=float, default=0.0)
    p.add_argument("--ema", action="store_true",
                   help="Serve the checkpoint's EMA weights (recorded by "
                        "training with --ema-decay); pipeline mode only")
    p.add_argument("--allow-untrained", action="store_true",
                   help="pipeline mode: allow randomly initialized "
                        "stage-1 networks (noise output; testing only)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8,
                   help="device batch cap (dynamic artifacts; a "
                        "static-batch artifact pins its own size)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="how long to hold a partial batch for coalescing")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    if args.artifact:
        if args.ema:
            raise SystemExit(
                "--ema applies to --checkpoint pipeline mode; for artifact "
                "mode export the averaged weights with pose3d-export --ema"
            )
        if not Path(args.artifact).exists():
            raise SystemExit(f"artifact not found: {args.artifact}")
        srv = make_server(
            args.artifact, args.host, args.port,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        )
    else:
        # same untrained-noise gate as cli/infer (randomly initialized
        # stage-1 networks emit noise, not predictions)
        if not (args.kp_weights and args.depth_weights) \
                and not args.allow_untrained:
            raise SystemExit(
                "pipeline serving without --kp-weights/--depth-weights "
                "would run randomly initialized stage-1 networks; provide "
                "weights or pass --allow-untrained"
            )
        s1 = {"confidence_threshold": args.confidence_threshold}
        if args.kp_weights:
            s1["kp_weights"] = args.kp_weights
        if args.depth_weights:
            s1["depth_weights"] = args.depth_weights
        srv = make_pipeline_server(
            args.checkpoint, args.host, args.port,
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            stage1_kwargs=s1, ema=args.ema,
        )
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.batcher.close()


if __name__ == "__main__":
    main()
