"""Serving export: compile the lifter to a self-contained StableHLO artifact.

The reference has no deployment story — its "serving" is cloning the
training repo and running torch eagerly per image (reference infer.py).
Here a trained checkpoint exports to ONE serialized ``jax.export``
artifact: the inference function ahead-of-time lowered to StableHLO with
the weights baked in as constants. The artifact

  * loads and runs with nothing but ``jax`` installed — no pose3d_tpu,
    no flax, no checkpoint directory (``load_exported`` is a thin wrapper
    over ``jax.export.deserialize``);
  * is lowered for the platform list chosen at export time (e.g. export
    on a CPU dev box, serve on TPU);
  * optionally takes a *symbolic* batch dimension, so one artifact serves
    any request batch size without recompilation at load time.

This is the standard JAX serving recipe (jax.export is what
TF-Serving/SavedModel interop and Pathways serving build on), applied to
the lifter: image + depth + 2D keypoints → 3D joints.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jexport

logger = logging.getLogger("pose3d_tpu.serve")

_SIDECAR = "meta.json"
_PAYLOAD = "model.jaxexp"


class Int8Weight(NamedTuple):
    """Weight-only int8 quantized kernel: ``q * scale`` reconstructs the
    fp32 weight (symmetric per-output-channel scales). A NamedTuple is a
    pytree, so quantized leaves travel inside the variables tree."""

    q: jax.Array       # int8, original kernel shape
    scale: jax.Array   # f32, broadcastable (1, ..., out_features)


def _quantize_leaf(w):
    axes = tuple(range(w.ndim - 1))  # per-output-channel (last dim)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return Int8Weight(q, scale)


def quantize_variables(variables, min_size: int = 4096):
    """Weight-only int8 PTQ: every ``kernel`` leaf of at least ``min_size``
    elements becomes an :class:`Int8Weight` (symmetric, per-output-channel
    scale). Biases, norms, embeddings and batch_stats stay fp32 — they are
    a small fraction of the bytes and carry most of the calibration
    sensitivity. Standard weight-only recipe: the artifact shrinks ~4x and
    the matmuls still run in bf16/f32 after an elementwise dequant that
    XLA fuses into the consumer."""

    def f(path, leaf):
        key = getattr(path[-1], "key", None)
        if (key == "kernel" and hasattr(leaf, "size")
                and leaf.size >= min_size
                and leaf.dtype == jnp.float32):
            return _quantize_leaf(leaf)
        return leaf

    out = dict(variables)
    out["params"] = jax.tree_util.tree_map_with_path(
        f, variables["params"]
    )
    return out


def dequantize_variables(variables):
    """Inverse of :func:`quantize_variables` (lossy): reconstruct fp32
    kernels from Int8Weight leaves. Runs inside the jitted serving fn, so
    the exported artifact carries int8 constants and XLA fuses the
    ``convert * scale`` into each kernel's consumer."""

    def f(n):
        if isinstance(n, Int8Weight):
            return n.q.astype(jnp.float32) * n.scale
        return n

    return jax.tree_util.tree_map(
        f, variables, is_leaf=lambda n: isinstance(n, Int8Weight)
    )


def _has_quantized(variables) -> bool:
    return any(
        isinstance(n, Int8Weight)
        for n in jax.tree_util.tree_leaves(
            variables, is_leaf=lambda n: isinstance(n, Int8Weight)
        )
    )


def make_serving_fn(model, variables):
    """Inference closure with the weights captured as constants, so the
    exported artifact is self-contained (no separate weight feed).
    Int8Weight leaves (quantize_variables) dequantize inside the traced
    fn — the baked constants stay int8."""

    def fn(image, depth, keypoints_2d):
        return model.apply(
            dequantize_variables(variables),
            image, depth, keypoints_2d, train=False,
        )

    return fn


def export_lifter(
    model,
    variables,
    image_size,
    batch_size: Optional[int] = None,
    num_joints: int = 17,
    platforms: Optional[Sequence[str]] = None,
    quantize: Optional[str] = None,
):
    """Lower the lifter's inference step to a jax.export.Exported.

    ``batch_size=None`` exports with a symbolic batch dimension ``b``:
    the artifact then accepts any batch size at call time.
    ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` to build one artifact that runs on both.
    ``quantize="int8"`` applies weight-only per-channel int8 PTQ to the
    large kernels before lowering — the serialized constants shrink ~4x;
    dequant happens inside the traced fn and fuses into each consumer.
    """
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode {quantize!r}")
    if quantize == "int8":
        variables = quantize_variables(variables)
    h, w = image_size
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch_size
    specs = (
        jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((b, h, w, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, num_joints, 2), jnp.float32),
    )
    fn = jax.jit(make_serving_fn(model, variables))
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jexport.export(fn, **kwargs)(*specs)


def save_exported(exported, path, extra_meta: Optional[dict] = None) -> Path:
    """Write ``<path>/model.jaxexp`` (serialized StableHLO + calling
    convention) plus a human-readable sidecar with the input contract."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    payload = exported.serialize()
    (path / _PAYLOAD).write_bytes(payload)
    meta = {
        "format": "pose3d_tpu/export/v1",
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "inputs": [str(a) for a in exported.in_avals],
        "outputs": [str(a) for a in exported.out_avals],
        "payload_bytes": len(payload),
    }
    meta.update(extra_meta or {})
    (path / _SIDECAR).write_text(json.dumps(meta, indent=2))
    logger.info("Exported %s (%.1f MB) for platforms %s",
                path, len(payload) / 1e6, meta["platforms"])
    return path


def load_exported(path):
    """Load an exported artifact; returns the jax.export.Exported whose
    ``.call(image, depth, keypoints_2d)`` runs the model. Needs only jax —
    usable from a serving process without this package."""
    path = Path(path)
    payload = (path / _PAYLOAD if path.is_dir() else path).read_bytes()
    return jexport.deserialize(payload)


def load_exported_meta(path) -> dict:
    return json.loads((Path(path) / _SIDECAR).read_text())
