"""Per-op profile of the train step on the real chip.

Captures an xplane trace of a few steady-state steps and prints the
busiest device ops ('XLA Ops' line only — other lines double-count async
spans, CLAUDE.md note). Usage:

  python scripts/profile_step.py cnn   [batch=100]
  python scripts/profile_step.py vit   [batch=8]
"""

from __future__ import annotations

import collections
import glob
import sys
import tempfile

import numpy as np


def summarize_xla_ops(log_dir: str, top_k: int = 25):
    import jax

    files = sorted(glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True))
    if not files:
        return []
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[-1], "rb").read()
    )
    totals: collections.Counter = collections.Counter()
    total_ns = 0
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                totals[ev.name] += ev.duration_ns
                total_ns += ev.duration_ns
    return totals.most_common(top_k), total_ns


def main():
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()
    import jax

    from pose3d_tpu.core.config import (
        CNNModelConfig,
        TransformerModelConfig,
    )
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state, make_train_step

    kind = sys.argv[1] if len(sys.argv) > 1 else "cnn"
    if kind == "cnn":
        cfg = CNNModelConfig()
        B = int(sys.argv[2]) if len(sys.argv) > 2 else 100
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
            rng.uniform(size=(1, B, size, size, 3)).astype(np.float32)),
        "depth": jax.device_put(
            rng.uniform(1, 8, size=(1, B, size, size, 1)).astype(
                np.float32)),
        "keypoints_2d": jax.device_put(
            rng.uniform(0.1, 0.9, size=(1, B, 17, 2)).astype(np.float32)),
        "joints_3d": jax.device_put(
            (rng.normal(size=(1, B, 17, 3)) * 100).astype(np.float32)),
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
    jax.profiler.start_trace(log_dir)
    run(3)
    jax.profiler.stop_trace()

    ops, total_ns = summarize_xla_ops(log_dir)
    print(f"== {kind} B={B}: total device time {total_ns / 1e6:.1f} ms "
          f"over 3 steps ({total_ns / 3e6:.1f} ms/step)")
    for name, ns in ops:
        print(f"  {ns / 1e6 / 3:8.2f} ms/step  {100 * ns / total_ns:5.1f}%"
              f"  {name[:90]}")


if __name__ == "__main__":
    main()
