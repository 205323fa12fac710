"""Sequence parallelism (Megatron-SP) over the mesh ``model`` axis.

The reference attends over at most 1,041 tokens and SURVEY.md §5 scopes
ring-attention/Ulysses out; what *is* worth having alongside tensor
parallelism is Megatron-style sequence parallelism: the operations between
the TP regions (LayerNorm, dropout, residual adds) are replicated under
plain TP, and SP shards them over the token axis instead. The TP
all-reduce after each row-parallel matmul becomes a reduce-scatter, and an
all-gather runs before the next column-parallel matmul — same communicated
bytes, but the residual-stream activation memory and the LayerNorm/-add
FLOPs divide by the model-axis size.

TPU-native mechanics: no manual collectives. The transformer applies a
sharding *constraint* P(batch, "model", None) to its residual token
streams (``TransformerPoseEstimation(sp_constraint=...)`` /
``ViTBackbone(sp_constraint=...)``) and XLA GSPMD picks the
reduce-scatter/all-gather decomposition around the Megatron-sharded
matmuls (parallel/tp.py). Token counts that do not divide the axis are
handled by GSPMD's implicit padding (the flagship's 1,025/1,041-token
streams are not powers of two).

Equivalence vs plain TP is asserted by tests/test_sequence_parallel.py.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_constraint(
    mesh: Mesh, axis: str = "model", batch_axis: str = "data",
) -> Callable:
    """Return a callable pinning [B, T, D] token streams to
    P(batch_axis, axis, None) — batch over the data axis, tokens over the
    model axis. Feed it to the transformer's ``sp_constraint`` hook."""
    sharding = NamedSharding(mesh, P(batch_axis, axis, None))

    def constrain(x):
        if x.ndim != 3:
            return x
        return jax.lax.with_sharding_constraint(x, sharding)

    return constrain
