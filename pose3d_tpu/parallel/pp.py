"""Pipeline parallelism (GPipe) over a mesh ``stage`` axis.

The reference is single-device and SURVEY.md §2.2 scopes pipeline
parallelism out for the flagship sizes ("model fits one chip"); like
parallel/tp.py this module supplies the *mesh-readiness*: a TPU-native
GPipe schedule for the transformer's homogeneous encoder stack, so the
framework scales past one chip's HBM by placing contiguous layer groups on
successive mesh stages and streaming microbatches through them over ICI.

Design (scaling-book pipelining recipe, built from JAX primitives — no
torch-style send/recv threads):

  * The encoder blocks live as ONE stacked parameter subtree with a
    leading layer dimension (``ViTBackbone(stacked_blocks=True)``), sharded
    ``P("stage")`` on that dimension — each stage holds L/S contiguous
    layers, AdamW moments follow (parallel/commit.py).
  * ``gpipe`` runs inside ``jax.shard_map`` manual over ONLY the stage
    axis (``axis_names={"stage"}``): batch/data axes stay under GSPMD, so
    dp×pp composes without manual resharding.
  * The schedule is the classic GPipe loop: T = M + S − 1 ticks; at each
    tick every stage applies its local layers (a ``lax.scan`` over the
    local slice of the stacked params) and passes activations to the next
    stage with ``lax.ppermute``. Stage 0 feeds microbatch t; the last
    stage collects finished microbatches. Bubble fraction (S−1)/T — pick
    num_microbatches ≥ num_stages to amortize.
  * Reverse-mode AD is native: ppermute transposes to the reversed
    permutation, so the backward pipeline runs automatically in the same
    program — no hand-written backward schedule.

Numerics: the forward is bit-identical to the sequential layer loop (same
per-sample ops, only executed on different devices); asserted by
tests/test_pipeline_parallel.py.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"


def gpipe(
    block_apply: Callable,
    stacked_params,
    x: jax.Array,
    *,
    mesh: Mesh,
    num_microbatches: int,
    stage_axis: str = STAGE_AXIS,
):
    """Run ``x`` through L stacked layers pipelined over ``stage_axis``.

    ``block_apply(params_one_layer, x) -> x`` must be a pure, deterministic
    single-layer application (dropout handled by the caller being
    deterministic or rate 0 — the schedule replays layers on every stage
    each tick, so per-call rng would desync between the microbatch path
    and the sequential oracle).

    ``stacked_params``: pytree whose leaves have a leading layer dimension
    L (L % num_stages == 0), expected committed ``P(stage_axis, ...)``.
    ``x``: [B, ...] activations, B % num_microbatches == 0, replicated
    along ``stage_axis`` (any data-axis sharding is left to GSPMD — the
    shard_map is manual over the stage axis only).
    """
    S = mesh.shape[stage_axis]
    M = num_microbatches
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches {M}")
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible by {S} stages")

    # XLA:CPU workaround: bf16 COLLECTIVES inside a partial-auto shard_map
    # CHECK-fail the CPU compiler ("Invalid binary instruction opcode
    # copy", hlo_instruction.cc:1585; float-normalization vs the
    # partitioner's copy insertion — bf16 elementwise ops and f32/f16
    # collectives are fine, measured by targeted micro-repros). The fix
    # keeps every value that crosses a stage collective — including the
    # hidden ones AD inserts (pvary transposes to psum) — in f32: block
    # outputs upcast into the carries, the result downcasts at the end.
    # Bit-exact (bf16 values embed exactly in f32; the broadcast psum adds
    # only zeros). TPU handles bf16 collectives natively — no upcast, no
    # extra ICI bytes on the real target.
    upcast = (
        x.dtype == jnp.bfloat16 and jax.default_backend() == "cpu"
    )

    def stage_fn(local_params, x_full):
        orig_dtype = x_full.dtype
        if upcast:
            x_full = x_full.astype(jnp.float32)
        carry_dtype = x_full.dtype
        stage = jax.lax.axis_index(stage_axis)
        mb = B // M
        x_mb = x_full.reshape((M, mb) + x_full.shape[1:])

        def local_layers(y):
            return jax.lax.scan(
                lambda c, p: (block_apply(p, c).astype(carry_dtype), None),
                y, local_params,
            )[0]

        def tick(carry, t):
            buf_in, outbuf = carry
            # stage 0 injects microbatch t (clamped in the drain phase —
            # those ticks' results are never collected); later stages
            # consume the ppermuted output of the previous tick.
            first_in = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            y = local_layers(jnp.where(stage == 0, first_in, buf_in))
            # the last stage finishes microbatch t-(S-1) at tick t
            out_idx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(
                outbuf, out_idx, 0, keepdims=False
            )
            collect = jnp.logical_and(stage == S - 1, t >= S - 1)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(collect, y, prev), out_idx, 0
            )
            recv = jax.lax.ppermute(
                y, stage_axis, [(i, i + 1) for i in range(S - 1)]
            )
            return (recv, outbuf), None

        mb_shape = (mb,) + x_full.shape[1:]
        # initial carries are stage-varying from tick 1 on; pcast keeps the
        # scan carry types fixed (jax VMA rule for scans under shard_map)
        init = jax.lax.pcast(
            (
                jnp.zeros(mb_shape, carry_dtype),
                jnp.zeros((M,) + mb_shape, carry_dtype),
            ),
            (stage_axis,),
            to="varying",
        )
        (_, outbuf), _ = jax.lax.scan(tick, init, jnp.arange(M + S - 1))
        # broadcast the last stage's collected outputs to every stage
        # (sum of a one-hot-by-stage selection == replication)
        out = jax.lax.psum(
            jnp.where(stage == S - 1, outbuf, jnp.zeros_like(outbuf)),
            stage_axis,
        )
        return out.reshape(x_full.shape).astype(orig_dtype)

    pspec = jax.tree_util.tree_map(lambda _: P(stage_axis), stacked_params)
    return jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        axis_names={stage_axis},
    )(stacked_params, x)


def make_pipeline_runner(
    mesh: Mesh, num_microbatches: int, stage_axis: str = STAGE_AXIS
) -> Callable:
    """Block-runner closure for ``ViTBackbone(stacked_blocks=True,
    block_runner=...)``: pipelines the stacked encoder blocks over
    ``mesh``'s stage axis."""

    def runner(block_apply, stacked_params, x):
        return gpipe(
            block_apply, stacked_params, x,
            mesh=mesh, num_microbatches=num_microbatches,
            stage_axis=stage_axis,
        )

    return runner


# ---------------------------------------------------------------------------
# Layout converters: looped (block_0..block_{L-1}, the weight-porting layout,
# stage1/port.py) <-> stacked ("blocks" with a leading layer dim).
# ---------------------------------------------------------------------------

def stack_vit_blocks(backbone_params: Dict) -> Dict:
    """Convert a looped ViTBackbone param subtree to the stacked layout."""
    out = {k: v for k, v in backbone_params.items()
           if not k.startswith("block_")}
    depth = sum(1 for k in backbone_params if k.startswith("block_"))
    if not depth:
        raise ValueError("no block_<i> subtrees to stack")
    blocks = [backbone_params[f"block_{i}"] for i in range(depth)]
    out["blocks"] = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *blocks
    )
    return out


def unstack_vit_blocks(backbone_params: Dict) -> Dict:
    """Inverse of :func:`stack_vit_blocks`."""
    out = {k: v for k, v in backbone_params.items() if k != "blocks"}
    stacked = backbone_params["blocks"]
    depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    for i in range(depth):
        out[f"block_{i}"] = jax.tree_util.tree_map(
            lambda x, i=i: x[i], stacked
        )
    return out


def pp_param_spec(
    params: Dict,
    stage_axis: str = STAGE_AXIS,
    base_specs: Optional[Dict] = None,
) -> Dict:
    """PartitionSpec pytree sharding every stacked-``blocks`` leaf over
    ``stage_axis`` on its leading (layer) dimension; other leaves take
    ``base_specs`` (default replicated).

    ``base_specs`` composes: parallel/tp.tp_param_spec emits stacked-aware
    Megatron specs with a leading None on blocks leaves (e.g.
    ``P(None, None, "model")``), which pp then upgrades to
    ``P(stage_axis, None, "model")`` — the 2-D pp×tp layout."""
    if base_specs is None:
        base_specs = jax.tree_util.tree_map(lambda _: P(), params)

    def f(path, leaf, base):
        keys = tuple(
            str(getattr(p, "key", getattr(p, "idx", "?"))) for p in path
        )
        if "blocks" in keys:
            rest = tuple(base)[1:] if base is not None else ()
            return P(stage_axis, *rest)
        return base

    return jax.tree_util.tree_map_with_path(
        f, params, base_specs,
        is_leaf=lambda n: n is None or hasattr(n, "shape"),
    )


def shard_state_for_pp(
    state, mesh: Mesh, stage_axis: str = STAGE_AXIS,
    base_specs: Optional[Dict] = None,
):
    """Return ``state`` with the stacked encoder blocks (and their AdamW
    moments) committed ``P(stage_axis)`` over ``mesh``; everything else per
    ``base_specs`` (default replicated). Feed to
    ``make_train_step(state_sharding="auto", state_like=...)``."""
    from pose3d_tpu.parallel.commit import commit_state_to_mesh

    specs = pp_param_spec(
        state.params, stage_axis=stage_axis, base_specs=base_specs
    )
    return commit_state_to_mesh(state, mesh, specs)
