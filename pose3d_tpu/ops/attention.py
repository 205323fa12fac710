"""Multi-head attention core.

One function, two backends:
  * ``xla``   — einsum attention; XLA already fuses softmax into the matmul
                pipeline well at the model's fixed ~1k-token shapes.
  * ``pallas`` — fused flash-attention kernel (pose3d_tpu.ops.pallas) for
                the hot path; falls back to xla off-TPU.

The model's sequences are static (1 CLS + 1024 image + 16 heatmap tokens —
reference src/models/transformers.py:274-280), so no ring/sequence
parallelism is needed (SURVEY.md §5); a single-chip fused kernel covers the
attention hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(q, k, v, *, backend: str = "xla"):
    """Attention over [B, T, H, D] tensors (heads on axis 2).

    Returns [B, T, H, D]. Softmax is computed in fp32 regardless of the
    input dtype (bf16-safe).
    """
    if backend == "pallas" and jax.default_backend() == "tpu":
        from pose3d_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)
    if backend == "pallas_interpret":
        # Pallas interpreter on any backend — exercises the real kernel
        # (incl. its custom_partitioning under a mesh) in CPU tests and
        # the driver's multichip dryrun.
        from pose3d_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, interpret=True)
    # backend == "pallas" off-TPU falls through to the XLA path.

    dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale  # fp32 MXU accumulation: bf16 logits would quantize the
    # softmax (the stage-1 einsums this path replaced kept fp32 scores)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v,
                      preferred_element_type=jnp.float32).astype(dtype)
