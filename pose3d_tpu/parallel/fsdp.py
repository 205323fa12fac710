"""FSDP-style (ZeRO-3) parameter + optimizer sharding over the ``data`` axis.

The reference trains replicated on one GPU (SURVEY.md §2.2: no distributed
training of any kind). This framework's data-parallel step replicates the
TrainState over the mesh; at the flagship scales (CNN ≈ 40 M params, ViT-B
≈ 119 M with heads) that is fine on one v5e, but AdamW triples the param
memory (2 moments) and replication multiplies it by the mesh size. This
module supplies the TPU-native equivalent of torch FSDP / ZeRO-3: every
large parameter (and its optimizer moments, which follow the same spec) is
sharded over the mesh ``data`` axis, and XLA GSPMD inserts the all-gathers
at each use site and reduce-scatters for the gradients — no manual
collectives, exactly the "annotate shardings, let XLA insert collectives"
recipe this repo uses for DP and TP.

Mechanics:

  * ``fsdp_param_spec`` walks the param pytree and, for each leaf of at
    least ``min_size`` elements, shards the largest dimension divisible by
    the data-axis size (ties → the earliest such dim). Leaves that already
    carry a sharded dim from a base spec (tensor parallelism) keep it and
    are *additionally* sharded over ``data`` on a remaining dim when one
    divides — the standard 2-D (fsdp × tp) layout.
  * ``shard_state_for_fsdp`` device_puts the TrainState accordingly
    (optimizer moments follow their parameters; batch_stats and scalars
    replicated) — the same committed-placement pattern as
    parallel/tp.shard_state_for_tp, consumed by
    train/step.make_train_step(state_sharding="auto") where GSPMD
    propagates the layouts through the whole step and the updated state
    comes back still sharded.

Per-step communication cost is one all-gather per parameter use plus a
reduce-scatter per gradient — the same bytes as plain DP's all-reduce, so
on an ICI mesh FSDP costs roughly nothing extra while dividing param +
moment memory by the mesh size (scaling-book ZeRO-3 recipe).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

# Don't bother sharding tiny tensors (biases, norm scales): the all-gather
# latency outweighs the few KB saved. 2**13 elements = 32 KiB fp32.
DEFAULT_MIN_SIZE = 2 ** 13


def _fsdp_spec_for(shape, axis_size: int, axis: str,
                   base: Optional[P], min_size: int) -> P:
    base_spec = tuple(base) if base is not None else ()
    base_spec = base_spec + (None,) * (len(shape) - len(base_spec))
    size = 1
    for s in shape:
        size *= s
    if size < min_size:
        return P(*base_spec) if any(base_spec) else P()
    # pick the largest dim not already sharded whose extent divides the axis
    best = -1
    for i, extent in enumerate(shape):
        if base_spec[i] is not None:
            continue
        if extent % axis_size == 0 and (best < 0 or extent > shape[best]):
            best = i
    if best < 0:
        return P(*base_spec) if any(base_spec) else P()
    spec = list(base_spec)
    spec[best] = axis
    return P(*spec)


def fsdp_param_spec(
    params: Dict,
    axis_size: int,
    axis: str = "data",
    base_specs: Optional[Dict] = None,
    min_size: int = DEFAULT_MIN_SIZE,
) -> Dict:
    """PartitionSpec pytree sharding each large param over ``axis``.

    ``base_specs``: optional pre-existing spec pytree (e.g.
    parallel/tp.tp_param_spec output) whose sharded dims are preserved;
    FSDP then uses a *different* dim, yielding 2-D fsdp×tp layouts.
    """
    if base_specs is None:
        base_specs = jax.tree_util.tree_map(lambda _: None, params)
    return jax.tree_util.tree_map(
        lambda p, b: _fsdp_spec_for(p.shape, axis_size, axis, b, min_size),
        params, base_specs,
        is_leaf=lambda n: n is None or hasattr(n, "shape"),
    )


def shard_state_for_fsdp(
    state,
    mesh: Mesh,
    axis: str = "data",
    base_specs: Optional[Dict] = None,
    min_size: int = DEFAULT_MIN_SIZE,
):
    """Return ``state`` with params and matching optimizer moments committed
    to FSDP shardings over ``mesh``; batch_stats and scalars replicated.

    Feed the result to make_train_step(state_sharding="auto") — GSPMD keeps
    the layouts through the update, so the state stays sharded step over
    step (asserted by tests/test_fsdp.py)."""
    from pose3d_tpu.parallel.commit import commit_state_to_mesh

    specs = fsdp_param_spec(
        state.params, mesh.shape[axis], axis=axis,
        base_specs=base_specs, min_size=min_size,
    )
    return commit_state_to_mesh(state, mesh, specs)
