"""Per-op profile of the train step on the real chip — CORRECTED method.

xplane on this platform has two device lines: ``XLA Ops`` (serialized —
interval union == sum == wall) and ``Async XLA Ops`` (overlapping spans
that sum to ~25x the wall). Round 2 mixed async spans into totals and
concluded attention was 47% of the ViT step (it is 20%); this script now
aggregates ONLY the serialized ``XLA Ops`` line, grouped by op category
(trailing instruction numbers stripped). See docs/ROUND3.md.

Usage:
  python scripts/profile_step.py cnn   [batch=100]   # accum=1
  python scripts/profile_step.py cnn10 [accum=10]    # ghost 10x10 config
  python scripts/profile_step.py vit   [batch=8]
"""

from __future__ import annotations

import collections
import glob
import sys
import tempfile

import numpy as np


def summarize_xla_ops(log_dir: str, steps: int, top_k: int = 18):
    """(categories, top_ops, total_ns) from the serialized XLA Ops line."""
    import jax

    files = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        return [], [], 0
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[-1], "rb").read()
    )
    by_cat: collections.Counter = collections.Counter()
    cnt: collections.Counter = collections.Counter()
    by_op: collections.Counter = collections.Counter()
    total = 0
    for plane in pd.planes:
        if plane.name != "/device:TPU:0":
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":  # NOT "Async XLA Ops"
                continue
            for ev in line.events:
                name = ev.name.split(" = ")[0].lstrip("%")
                cat = name.rstrip("0123456789.")
                by_cat[cat] += ev.duration_ns
                cnt[cat] += 1
                by_op[name] += ev.duration_ns
                total += ev.duration_ns
    cats = [
        (c, ns, cnt[c] // steps) for c, ns in by_cat.most_common(top_k)
    ]
    return cats, by_op.most_common(10), total


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from pose3d_tpu.core.config import (
        CNNModelConfig,
        TransformerModelConfig,
    )
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state, make_train_step

    kind = sys.argv[1] if len(sys.argv) > 1 else "cnn"
    accum = 1
    if kind == "cnn":
        cfg = CNNModelConfig()
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 100
        size = 500
        model, variables = init_model(cfg, batch_size=B)
    elif kind == "cnn10":
        cfg = CNNModelConfig()
        accum = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        B = 10
        size = 500
        model, variables = init_model(cfg, batch_size=B)
    else:
        cfg = TransformerModelConfig()
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        size = 512
        model, variables = init_model(cfg, batch_size=B,
                                      attention_backend="pallas")
    state = create_train_state(model, variables)
    step = make_train_step(model, donate=True)

    rng = np.random.default_rng(0)
    batch = {
        "image": jax.device_put(
            rng.uniform(size=(accum, B, size, size, 3)).astype(np.float32)),
        "depth": jax.device_put(
            rng.uniform(1, 8, size=(accum, B, size, size, 1)).astype(
                np.float32)),
        "keypoints_2d": jax.device_put(
            rng.uniform(0.1, 0.9, size=(accum, B, 17, 2)).astype(np.float32)),
        "joints_3d": jax.device_put(
            (rng.normal(size=(accum, B, 17, 3)) * 100).astype(np.float32)),
    }
    key = jax.device_put(jax.random.PRNGKey(0))

    def run(k):
        nonlocal state
        m = None
        for _ in range(k):
            state, m = step(state, batch, key)
        return float(np.asarray(m["total_loss"]))

    run(4)  # compile + layout recompiles
    log_dir = tempfile.mkdtemp(prefix=f"prof_{kind}_")
    STEPS = 3
    jax.profiler.start_trace(log_dir)
    run(STEPS)
    jax.profiler.stop_trace()

    cats, tops, total_ns = summarize_xla_ops(log_dir, STEPS)
    print(f"== {kind} B={B} accum={accum}: device time "
          f"{total_ns / STEPS / 1e6:.1f} ms/step")
    print("-- by category:")
    for cat, ns, n_ops in cats:
        print(f"  {ns / STEPS / 1e6:8.2f} ms/step {100 * ns / total_ns:5.1f}%"
              f" {n_ops:6d} ops/step  {cat}")
    print("-- top individual ops:")
    for name, ns in tops:
        print(f"  {ns / STEPS / 1e6:8.2f} ms/step  {name[:80]}")


if __name__ == "__main__":
    main()
