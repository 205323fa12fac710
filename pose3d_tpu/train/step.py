"""Jitted train/eval steps with scan-based gradient accumulation, sharded
over the device mesh.

The reference accumulates gradients across ``gradient_accumulation_steps``
raw batches with separate forward/backward dispatches and an optimizer step
every A-th batch (src/train.py:83-121). Here one jitted call consumes a
*superbatch* of A microbatches ([A, B, ...]) and runs the whole
accumulate→update pipeline on-device via ``lax.scan`` — one XLA program per
optimizer step, no per-microbatch host round-trips (which matters doubly
through a remote-TPU tunnel).

Parallelism: the microbatch axis B is sharded over the mesh batch axes
(in_shardings P(None, "data", ...) on a plain mesh; jointly over
("replica", "data") on a hybrid multi-slice mesh — core/mesh.
batch_spec_entry); XLA GSPMD inserts the gradient all-reduce over
ICI (and across slices over DCN on a hybrid mesh). BatchNorm batch
statistics are computed per ghost group over the sharded batch axis,
which lowers to a local reduce plus one [G, C]-sized all-reduce per
BatchNorm layer — on a hybrid mesh these small partials DO cross DCN
(each group spans every batch shard), a per-layer latency cost that is
negligible in bytes next to the gradient all-reduce.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pose3d_tpu.core.mesh import batch_axes, batch_spec_entry
from pose3d_tpu.geometry.metrics import mpjpe, pa_mpjpe
from pose3d_tpu.ops.losses import LossWeights, composite_pose_loss


def _mesh_batch_devices(mesh) -> int:
    """Number of devices the batch axis shards over (1 without a mesh)."""
    if mesh is None:
        return 1
    n = 1
    for a in batch_axes(mesh):
        n *= mesh.shape.get(a, 1)
    return n


def decompact_batch(batch):
    """On-device inverse of data.collate.compact_batch: uint8 image → [0,1]
    float, uint8 depth + per-sample (min, max) → metric float. No-op for
    float batches. Runs inside jit, so the host→device transfer carries
    1 byte/pixel instead of 4."""
    out = dict(batch)
    img = batch["image"]
    if img.dtype == jnp.uint8:
        out["image"] = img.astype(jnp.float32) / 255.0
    depth = batch["depth"]
    if depth.dtype == jnp.uint8 and "depth_scale" in batch:
        s = batch["depth_scale"].astype(jnp.float32)  # [B, 2]
        dmin = s[:, 0][:, None, None, None]
        dmax = s[:, 1][:, None, None, None]
        out["depth"] = depth.astype(jnp.float32) / 255.0 * (dmax - dmin) + dmin
    out.pop("depth_scale", None)
    return out


def _loss_fn(params, batch_stats, apply_fn, micro, rng, weights,
             augment=None):
    micro = decompact_batch(micro)
    if augment is not None:
        rng, k_aug = jax.random.split(rng)
        micro = augment(micro, k_aug)
    out, muts = apply_fn(
        {"params": params, "batch_stats": batch_stats},
        micro["image"], micro["depth"], micro["keypoints_2d"],
        train=True, mutable=["batch_stats"], rngs={"dropout": rng},
    )
    loss, comps = composite_pose_loss(out, micro["joints_3d"], weights)
    return loss, (comps, muts["batch_stats"])


def make_train_step(
    model,
    weights: LossWeights = LossWeights(),
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    state_sharding: str = "replicated",
    accum_mode: str = "grouped",
    bn_momentum: float = 0.9,
    augment=None,
    state_like=None,
    ema_decay: Optional[float] = None,
):
    """Build the jitted train step.

    Signature of the returned fn:
      (state, superbatch, rng) -> (state, metrics)
    where superbatch is a dict of [A, B, ...] arrays (A = accumulation
    steps; pass A=1 for no accumulation) and metrics holds the batch-mean
    loss components (reference logging contract, src/train.py:124-139).

    ``model`` (when given) supplies the apply function — a step built
    with a reconfigured model (different attention backend, sharding
    constraints, …) honors it; ``model=None`` falls back to
    ``state.apply_fn``.

    ``accum_mode`` selects how the A microbatches are accumulated:

    * ``"ghost"`` — ghost-BatchNorm superbatch: ONE forward/
      backward over all A·B samples, with the per-microbatch loss vmapped
      over the accumulation axis so every BatchNorm instance computes its
      batch statistics over its own group of B samples. Mathematically
      identical to the sequential path — per-group BN stats, dropout rngs
      (``fold_in(rng, i)`` per group), mean-of-per-group gradients, and
      the A-fold running-stat EMA chain applied in closed form
      (r_A = m^A·r_0 + Σ_i m^(A-1-i)·(1-m)·s_i) — but XLA sees one
      batch-A·B program: A× fewer kernel launches and full-width MXU
      convolutions. Equivalence is asserted by tests/test_ghost_accum.py.
      ``bn_momentum`` must match the BatchNorm modules' momentum (0.9
      everywhere in this repo, matching torch's default EMA in the
      reference models).
    * ``"grouped"`` (default) — same ghost-BatchNorm semantics, but instead of
      vmapping the model the superbatch is flattened to ONE [A·B] batch
      and the per-group statistics are computed *inside* every BatchNorm
      call via ``nn.intercept_methods`` (train/ghost_bn.py). The model
      then compiles to the exact program of the fast A=1 configuration
      (the ghost vmap costs ~25-30 ms/step of copies on the 500px CNN,
      docs/ROUND3.md). BN statistics, the EMA chain and gradients match
      the scan path exactly; dropout masks are iid-equivalent but not
      bitwise equal (one flat mask instead of per-group fold_in masks) —
      so "ghost" remains the mode with provable bit-level dropout parity.
      Requires normalization="batch" (flax BN; the custom DotStats/Pallas
      BN variants are rejected at trace time). Same-session chip A/B at
      the reference's 10×10 config: grouped 278.1 vs ghost 257.4 img/s
      (100×1 control 281.6).
    * ``"scan"`` — sequential ``lax.scan`` over microbatches (one
      forward/backward per microbatch, the literal analogue of the
      reference's accumulation loop, src/train.py:83-121). Kept as the
      equivalence oracle and for memory-constrained configs where the
      A·B-sample activation footprint of "ghost" does not fit.

    ``augment``: optional in-jit augmentation callable
    ``(batch, key) -> batch`` applied after decompaction, before the
    model (ops/augment_device.make_device_augment) — device-side
    augmentation with per-sample randomness derived from the step rng.

    ``state_sharding``: "replicated" pins the whole state replicated over
    the mesh (pure data parallelism); "auto" leaves state shardings to the
    committed placement of the input arrays — used for tensor parallelism
    and FSDP, where pose3d_tpu.parallel.shard_state_for_{tp,fsdp}
    pre-places the params and GSPMD propagates their layouts.

    ``ema_decay``: maintain an exponential moving average of the params
    AND the BatchNorm running statistics inside the step (state.ema_params
    ← d_t·ema + (1−d_t)·params after the optimizer update, ditto
    state.ema_batch_stats over the updated running stats — timm ModelEma
    semantics; requires create_train_state(ema=True)). The
    effective decay ramps, d_t = min(ema_decay, (1+t)/(10+t)) with t the
    optimizer step count, so short runs aren't dominated by the random
    init the average starts from (round-4 measurement: constant 0.999 gave
    681.5 mm EMA vs 511.0 mm raw MPJPE at 600 steps); past t ≈
    10/(1−ema_decay) the ramp saturates and behavior equals the plain
    constant-decay EMA. Evaluate or export the averaged weights via
    train.state.with_ema_params.

    ``state_like``: optional pre-sharded TrainState whose committed
    placements pin BOTH in_ and out_shardings of the state under
    ``state_sharding="auto"``. Without it GSPMD is free to pick different
    output layouts than the inputs (it does — e.g. re-sharding a
    replicated bias over ``data``), which silently changes the committed
    placement of the returned state and forces a recompile on the next
    call. Pass the state you intend to feed the step.
    """
    if accum_mode not in ("ghost", "grouped", "scan"):
        raise ValueError(f"unknown accum_mode {accum_mode!r}")

    def scan_step(state, batch, rng):
        apply_fn = model.apply if model is not None else state.apply_fn
        accum = batch["image"].shape[0]

        def body(carry, micro):
            params, bstats, grads, i = carry
            rng_i = jax.random.fold_in(rng, i)
            (loss, (comps, new_bstats)), g = jax.value_and_grad(
                _loss_fn, has_aux=True
            )(params, bstats, apply_fn, micro, rng_i, weights, augment)
            grads = jax.tree_util.tree_map(jnp.add, grads, g)
            return (params, new_bstats, grads, i + 1), comps

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (_, batch_stats, grads, _), comps_seq = jax.lax.scan(
            body, (state.params, state.batch_stats, zero_grads, 0), batch
        )

        # Mean gradient over microbatches — matches loss/accum scaling
        # (reference src/train.py:89).
        grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
        return _apply_update(state, grads, batch_stats, comps_seq)

    def ghost_step(state, batch, rng):
        apply_fn = model.apply if model is not None else state.apply_fn
        accum = batch["image"].shape[0]

        def mean_loss(params, bstats):
            rngs = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
                jnp.arange(accum)
            )
            losses, (comps, gstats) = jax.vmap(
                _loss_fn, in_axes=(None, None, None, 0, 0, None, None)
            )(params, bstats, apply_fn, batch, rngs, weights, augment)
            return losses.mean(), (comps, gstats)

        (_, (comps_seq, gstats)), grads = jax.value_and_grad(
            mean_loss, has_aux=True
        )(state.params, state.batch_stats)

        # Closed-form A-fold EMA chain over the per-group batch stats
        # (shared formula: train/ghost_bn.ema_chain). Each vmapped group
        # updated from the same r_0: g_i = m·r_0 + (1-m)·s_i, so the
        # chain increments are g_i − m·r_0.
        from pose3d_tpu.train.ghost_bn import ema_chain

        m = bn_momentum
        batch_stats = jax.tree_util.tree_map(
            lambda r0, g: ema_chain(r0, g - m * r0, m),
            state.batch_stats, gstats,
        )
        return _apply_update(state, grads, batch_stats, comps_seq)

    def grouped_step(state, batch, rng):
        import flax.linen as nn

        from pose3d_tpu.train.ghost_bn import ghost_batchnorm_interceptor

        apply_fn = model.apply if model is not None else state.apply_fn
        accum = batch["image"].shape[0]
        # Flatten [A, B, ...] -> [A*B, ...]. The ORDER matters on a mesh:
        # the superbatch is fed with the B axis sharded (P(None, batch)),
        # and the A-major merge (sample a*B+b) interleaves ownership along
        # the flat axis — GSPMD cannot represent that sharding, so it
        # ALL-GATHERS the entire batch and runs the model replicated on
        # every device (measured: compiled HLO on a 4-device hybrid mesh
        # carried replica_groups=[1,4] all-gathers of the full image batch
        # and full-flat-batch convolutions — zero data-parallel speedup).
        # The group-MINOR merge (sample b*A+g, via a local transpose of
        # each device's own rows) keeps the flat axis contiguously sharded:
        # compute stays data-parallel and each BatchNorm group's statistics
        # cost one [G, C]-sized all-reduce (the only cross-device — and on
        # a hybrid mesh cross-slice — traffic besides the gradient
        # all-reduce). On a single device the A-major order is kept: the
        # reshape is free, preserving the measured headline program.
        group_major = _mesh_batch_devices(mesh) <= 1
        if group_major:
            flat = jax.tree_util.tree_map(
                lambda x: x.reshape((-1,) + x.shape[2:]), batch
            )
        else:
            flat = jax.tree_util.tree_map(
                lambda x: x.swapaxes(0, 1).reshape(
                    (x.shape[0] * x.shape[1],) + x.shape[2:]
                ),
                batch,
            )

        def loss_fn(params, bstats):
            micro = decompact_batch(flat)
            if augment is not None:
                # distinct stream from the dropout rng (which uses `rng`
                # unfolded); 0x617567 = "aug"
                micro = augment(micro, jax.random.fold_in(rng, 0x617567))
            with nn.intercept_methods(
                ghost_batchnorm_interceptor(accum, group_major=group_major)
            ):
                out, muts = apply_fn(
                    {"params": params, "batch_stats": bstats},
                    micro["image"], micro["depth"], micro["keypoints_2d"],
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
            loss, comps = composite_pose_loss(
                out, micro["joints_3d"], weights
            )
            return loss, (comps, muts["batch_stats"])

        # mean loss over the flat batch == mean of per-microbatch means
        # (equal group sizes), so gradients match the scan/ghost scaling
        # (reference src/train.py:89 loss/accum).
        (_, (comps, batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats)
        return _apply_update(state, grads, batch_stats, comps)

    def _apply_update(state, grads, batch_stats, comps_seq):
        updates, opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        kw = {}
        if ema_decay is not None:
            if state.ema_params is None:
                raise ValueError(
                    "ema_decay given but the state carries no ema_params — "
                    "build it with create_train_state(..., ema=True)"
                )
            # Decay ramp (timm/torch-EMA style): d_t = min(d, (1+t)/(10+t)).
            # A constant decay initialized at the init params is dominated
            # by the random init for ~1/(1-d) steps — measured 681.5 mm EMA
            # vs 511.0 mm raw MPJPE on a 600-step run at d=0.999
            # (docs/ROUND4.md §4). The ramp starts the average hot (d_1 ≈
            # 0.18 tracks the live params) and converges to the configured
            # decay, so short runs stay usable and long-horizon behavior is
            # unchanged. Equivalent to Adam-style debiasing without
            # changing the stored-average semantics or checkpoint schema.
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            kw["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: e * d + (1.0 - d) * p,
                state.ema_params, params,
            )
            if state.ema_batch_stats is not None:
                # Average the BatchNorm running stats with the same decay
                # (timm ModelEma: buffers are part of the averaged model).
                # Averaged weights + the LIVE model's stats are an era
                # mismatch that breaks a BN net — 2909 mm vs 491 mm raw on
                # the 600-step CNN demo (docs/ROUND5.md).
                kw["ema_batch_stats"] = jax.tree_util.tree_map(
                    lambda e, s: e * d + (1.0 - d) * s,
                    state.ema_batch_stats, batch_stats,
                )
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            **kw,
        )
        metrics = jax.tree_util.tree_map(jnp.mean, comps_seq)
        return new_state, metrics

    step = {
        "ghost": ghost_step,
        "grouped": grouped_step,
        "scan": scan_step,
    }[accum_mode]

    if mesh is not None:
        # prefix pytree: one spec applied to every leaf of the batch dict
        batch_sharding = NamedSharding(mesh, P(None, batch_spec_entry(mesh)))
        repl = NamedSharding(mesh, P())
        if state_sharding == "auto":
            if state_like is not None:
                st_sh = jax.tree_util.tree_map(
                    lambda x: x.sharding, state_like
                )
                return jax.jit(
                    step,
                    in_shardings=(st_sh, batch_sharding, repl),
                    out_shardings=(st_sh, repl),
                    donate_argnums=(0,) if donate else (),
                )
            # state layouts flow from the committed input arrays (TP).
            return jax.jit(
                step,
                in_shardings=(None, batch_sharding, repl),
                donate_argnums=(0,) if donate else (),
            )
        return jax.jit(
            step,
            in_shardings=(repl, batch_sharding, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, weights: LossWeights = LossWeights(),
                   mesh: Optional[Mesh] = None,
                   compat_pa: bool = False,
                   per_sample: bool = False,
                   state_sharding: str = "replicated"):
    """Jitted eval step: forward + loss components + MPJPE + PA-MPJPE for
    one batch (reference validation loop body, src/train.py:203-261).

    ``per_sample=True`` returns every metric as a [B] vector so the caller
    can mask padded samples (exact validation over ragged final batches
    without a dynamic-shape recompile).

    ``state_sharding="auto"`` accepts a state with committed non-replicated
    placements (FSDP/TP) — jit rejects resharding committed args against a
    pinned replicated spec, so the spec is left to the arrays and GSPMD
    inserts the all-gathers at use (standard ZeRO-3 eval)."""
    from jax.numpy.linalg import norm as _norm
    from pose3d_tpu.geometry.metrics import procrustes_align
    from pose3d_tpu.ops.losses import composite_pose_loss_per_sample

    def step(state, batch):
        batch = decompact_batch(batch)
        out = (model.apply if model is not None
               else state.apply_fn)(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], batch["depth"], batch["keypoints_2d"],
            train=False,
        )
        gt = batch["joints_3d"]
        if per_sample:
            _, comps = composite_pose_loss_per_sample(out, gt, weights)
            metrics = dict(comps)
            metrics["mpjpe"] = _norm(
                out.astype(jnp.float32) - gt, axis=-1
            ).mean(axis=-1)
            aligned = procrustes_align(
                out.astype(jnp.float32), gt.astype(jnp.float32),
                compat_transposed_rotation=compat_pa,
            )
            metrics["pa_mpjpe"] = _norm(aligned - gt, axis=-1).mean(axis=-1)
        else:
            _, comps = composite_pose_loss(out, gt, weights)
            metrics = dict(comps)
            metrics["mpjpe"] = mpjpe(out, gt)
            metrics["pa_mpjpe"] = pa_mpjpe(
                out, gt, compat_transposed_rotation=compat_pa
            )
        return metrics, out

    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(batch_spec_entry(mesh)))
        repl = NamedSharding(mesh, P())
        state_spec = None if state_sharding == "auto" else repl
        return jax.jit(
            step,
            in_shardings=(state_spec, batch_sharding),
            out_shardings=(repl, repl),
        )
    return jax.jit(step)


def make_predict_fn(model, mesh: Optional[Mesh] = None):
    """Jitted inference forward: (variables, image, depth, kpts) -> joints."""

    def fwd(variables, image, depth, keypoints_2d):
        return model.apply(variables, image, depth, keypoints_2d, train=False)

    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(batch_spec_entry(mesh)))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            fwd,
            in_shardings=(repl, batch_sharding, batch_sharding, batch_sharding),
            out_shardings=batch_sharding,
        )
    return jax.jit(fwd)
