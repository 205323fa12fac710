"""Tensor parallelism over the mesh ``model`` axis.

The reference is single-device; SURVEY.md §2.2 calls for an *optional*
model axis for the ViT MLP/attention ("not needed at 86 M params but design
mesh-ready"). This module delivers that readiness: given a 2-D
``(data, model)`` mesh, it assigns Megatron-style PartitionSpecs to the
transformer's large kernels —

  * MLP up-projection   [D, hidden]      → P(None, "model")   (column)
  * MLP down-projection [hidden, D]      → P("model", None)   (row)
  * attention q/k/v     [D, H, head_dim] → P(None, "model", None)  (heads)
  * attention out       [H, head_dim, D] → P("model", None, None)
  * everything else replicated

and places the whole TrainState accordingly (optimizer moments follow their
parameters). With the state committed this way and the train step jitted
with unconstrained state shardings, XLA GSPMD propagates the layouts and
inserts the all-reduces after the row-parallel matmuls — no manual
collectives.

The fused Pallas attention kernel is partition-aware via
jax.experimental.custom_partitioning (ops/pallas/flash_attention.py): its
(batch, head) grid shards over the mesh data/model axes under GSPMD/Shardy,
so ``attention_backend="pallas"`` composes with a model axis > 1
(tests/test_pallas_attention.py::test_flash_attention_tensor_parallel).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, PartitionSpec as P


def _spec_for(path_keys, leaf) -> P:
    path = "/".join(path_keys)
    is_kernel = path_keys[-1] == "kernel"
    # stacked-blocks layout (parallel/pp.py): leaves under a "blocks"
    # subtree carry a leading layer dimension — shift the Megatron spec
    # right by one so it still lands on the weight dims.
    shift = (None,) if "blocks" in path_keys else ()
    if "Mlp_" in path and is_kernel:
        if "Dense_0" in path:
            return P(*shift, None, "model")
        if "Dense_1" in path:
            return P(*shift, "model", None)
    if "Mlp_" in path and path_keys[-1] == "bias" and "Dense_0" in path:
        return P(*shift, "model")
    if "MultiHeadAttention_" in path:
        if any(f"/{n}/" in "/" + path + "/" for n in ("query", "key", "value")):
            if is_kernel:
                return P(*shift, None, "model", None)
            if path_keys[-1] == "bias":
                return P(*shift, "model", None)
        if "/out/" in "/" + path + "/" and is_kernel:
            return P(*shift, "model", None, None)
    return P()


def tp_param_spec(params: Dict) -> Dict:
    """PartitionSpec pytree for a transformer param tree."""
    def f(path, leaf):
        keys = tuple(
            str(getattr(p, "key", getattr(p, "idx", "?"))) for p in path
        )
        return _spec_for(keys, leaf)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_state_for_tp(state, mesh: Mesh):
    """Return ``state`` with params (and matching optimizer moments)
    committed with TP shardings over ``mesh``; batch_stats, step and
    scalars replicated (parallel/commit.py — one bulk device_put)."""
    from pose3d_tpu.parallel.commit import commit_state_to_mesh

    return commit_state_to_mesh(state, mesh, tp_param_spec(state.params))
