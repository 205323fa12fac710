"""Shared machinery: commit a TrainState to mesh placements.

Used by both tensor parallelism (parallel/tp.py) and FSDP
(parallel/fsdp.py): given a PartitionSpec pytree for the params, place
params and the optax moments that mirror them with those specs, and
replicate everything else (batch_stats, step, optimizer scalars).

The whole state is committed in ONE ``jax.device_put`` call on the full
pytree — not one dispatch per leaf. Through this environment's remote-TPU
tunnel each dispatch costs ~30 ms and per-array transfers ~0.6-1 s
(CLAUDE.md), so a ~700-leaf flagship state would otherwise spend tens of
seconds on what is a single resharding step.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def commit_state_to_mesh(state, mesh: Mesh, specs: Dict):
    """Return ``state`` with params placed per ``specs`` (a PartitionSpec
    pytree matching ``state.params``), optimizer moments following their
    parameters, and batch_stats / step / scalars replicated."""
    repl = NamedSharding(mesh, P())

    def named(spec_tree):
        return jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), spec_tree,
            is_leaf=lambda n: isinstance(n, P),
        )

    param_sh = named(specs)

    def opt_shardings(node):
        # optax states mirror the param tree where they hold per-param
        # moments; shard those like their params, replicate the rest
        # (counts, schedules).
        if isinstance(node, dict) or hasattr(node, "keys"):
            if jax.tree_util.tree_structure(node) == jax.tree_util.tree_structure(
                state.params
            ):
                return param_sh
        return jax.tree_util.tree_map(lambda _: repl, node)

    is_param_shaped = (
        lambda n: jax.tree_util.tree_structure(n)
        == jax.tree_util.tree_structure(state.params)
    )
    opt_sh = jax.tree_util.tree_map(
        opt_shardings, state.opt_state, is_leaf=is_param_shaped
    )
    bs_sh = jax.tree_util.tree_map(lambda _: repl, state.batch_stats)

    tree = [state.step, state.params, state.opt_state, state.batch_stats]
    shardings = [repl, param_sh, opt_sh, bs_sh]
    extra_fields = []
    ema = getattr(state, "ema_params", None)
    if ema is not None:
        # EMA weights mirror the param tree — same specs
        tree.append(ema)
        shardings.append(param_sh)
        extra_fields.append("ema_params")
    ema_bs = getattr(state, "ema_batch_stats", None)
    if ema_bs is not None:
        # EMA stats mirror batch_stats — replicated like them
        tree.append(ema_bs)
        shardings.append(
            jax.tree_util.tree_map(lambda _: repl, ema_bs)
        )
        extra_fields.append("ema_batch_stats")
    placed = jax.device_put(tuple(tree), tuple(shardings))
    kw = dict(zip(extra_fields, placed[4:]))
    return state.replace(
        step=placed[0], params=placed[1], opt_state=placed[2],
        batch_stats=placed[3], **kw,
    )
