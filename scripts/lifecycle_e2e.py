"""One-run full-lifecycle acceptance on the real chip (VERDICT r3 item 3).

Chains what the test suite proves piecewise, through the REAL console
entry points, in one process tree:

  1. train  — grouped ghost-BN accumulation, EMA, cosine LR, device aug
  2. SIGTERM mid-epoch → graceful checkpoint-and-exit (rc 0)
  3. `--checkpoint auto` restart → resumes the SIGTERM checkpoint and
     finishes; a separate UNINTERRUPTED control run to the same step must
     produce BIT-IDENTICAL final params/EMA/opt-state (deterministic
     mid-epoch data resume, tests/test_resume.py, now on-chip)
  4. pose3d-eval --per-action on the final checkpoint
  5. pose3d-export --ema → artifact output BIT-IDENTICAL to the jitted
     model on the same batch
  6. pose3d-serve round-trip over the artifact (npz-over-HTTP)

Prints one JSON summary line; exits nonzero on any failed stage.
Reference contract: train.py:13-320 + infer.py:396 end-to-end.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lifecycle_e2e.py
     [--workdir DIR] (defaults to a fresh temp dir; TPU by default)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import signal
import subprocess
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

# Tiny configs per model family — the lifecycle exercises the CLIs and
# runtime plumbing, not model capacity. The transformer leg runs the REAL
# Pallas attention kernel on the chip (train/eval default
# --attention-backend pallas) and exports through the portable XLA
# attention path (export default; numerics budget asserted in phase 5).
MODEL_ARGS = {
    "cnn": json.dumps({
        "image_size": [64, 64], "heatmap_size": 64, "heatmap_sigma": 2.0,
        "stage_channels": [8, 16, 32], "stage_depths": [1, 1, 1],
        "initial_channels": 8, "global_pool_size": 2,
        "global_feature_dim": 16, "regression_dims": [16],
    }),
    "transformer": json.dumps({
        "image_size": [64, 64], "heatmap_size": 32,
        "heatmap_patch_size": 16, "heatmap_sigma": 2.0,
        "transformer_embed_dim": 64, "transformer_heads": 4,
        "vit_depth": 2, "vit_heads": 4, "final_encoder_depth": 1,
        "num_cross_modal_layers": 1, "regression_hidden_dims": [32],
    }),
}

INTERRUPT_AFTER_STEP = 3
FINAL_STEP = 6


def _train_cmd(chunks, cache, num_steps, model_type):
    return [
        sys.executable, "-m", "pose3d_tpu.cli.main",
        "--chunks-dir", str(chunks),
        "--train-chunks", "0", "1", "--val-chunks", "0",
        "--cache-dir", str(cache),
        "--model-type", model_type,
        "--model-args", MODEL_ARGS[model_type],
        "--num-steps", str(num_steps), "--batch-size", "4",
        "--grad-accum", "2", "--accum-mode", "grouped",
        "--ema-decay", "0.999",
        "--lr-schedule", "cosine", "--schedule-steps", str(FINAL_STEP),
        "--warmup-steps", "1",
        "--augment-device",
        "--eval-interval", str(FINAL_STEP), "--log-interval", "1",
        "--checkpoint", "auto",
        "--no-tensorboard",
    ]


def _iter_lines_deadline(stream, deadline):
    """Yield lines from ``stream`` until EOF or the wall-clock deadline.

    A plain ``for line in proc.stdout`` blocks in readline — a wedged
    child that keeps its pipe open (TPU-tunnel stall) would hang the
    acceptance run forever instead of failing it (review finding). A
    pump thread feeds a queue so the read side can time out."""
    q = queue.Queue()

    def pump():
        for line in stream:
            q.put(line)
        q.put(None)

    threading.Thread(target=pump, daemon=True).start()
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise TimeoutError("deadline exceeded reading child output")
        try:
            line = q.get(timeout=min(remaining, 5.0))
        except queue.Empty:
            continue
        if line is None:
            return
        yield line


def _run(cmd, cwd, timeout=1800, sigterm_after_step=None):
    """Run a CLI; optionally SIGTERM it once `step N` appears in output."""
    t0 = time.perf_counter()
    proc = subprocess.Popen(
        cmd, cwd=cwd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    lines = []
    sent = False
    marker = (
        f"Step {sigterm_after_step}: loss" if sigterm_after_step else None
    )
    try:
        for line in _iter_lines_deadline(
            proc.stdout, time.monotonic() + timeout
        ):
            lines.append(line)
            if marker and not sent and marker in line:
                proc.send_signal(signal.SIGTERM)
                sent = True
    except TimeoutError:
        proc.kill()
        print("".join(lines)[-4000:])
        raise SystemExit(f"{cmd[2:4]} exceeded {timeout}s — killed")
    rc = proc.wait(timeout=60)
    out = "".join(lines)
    if sigterm_after_step and not sent:
        print(out[-4000:])
        raise SystemExit(
            f"never saw '{marker}' in train output — cannot interrupt"
        )
    if rc != 0:
        print(out[-4000:])
        raise SystemExit(f"{cmd[2:4]} rc={rc}")
    return out, time.perf_counter() - t0


def _load_state_arrays(ckpt_dir):
    import jax

    from pose3d_tpu.train.checkpoint import load_checkpoint

    tree, _ = load_checkpoint(Path(ckpt_dir))
    flat = {}
    for part in ("params", "ema_params", "batch_stats", "ema_batch_stats",
                 "opt_state"):
        if tree.get(part) is not None:
            # tree_flatten, not a dict walk: opt_state restores as a LIST
            # (the optax chain), which a dict walk would treat as one leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                tree[part]
            )[0]:
                flat[part + jax.tree_util.keystr(path)] = np.asarray(leaf)
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=str, default=None)
    ap.add_argument("--model-type", choices=("cnn", "transformer"),
                    default="cnn",
                    help="Model family to run the lifecycle on "
                         "(VERDICT r4 item 3: the transformer leg composes "
                         "Pallas attention + EMA + XLA-attention export)")
    args = ap.parse_args()
    mt = args.model_type

    # Same XLA pass config as every CLI subprocess (they all call this
    # themselves): without it the in-process phase-5/6 reference outputs
    # compile with space-to-batch ENABLED and differ from the server's at
    # the bf16 level — within-process comparisons pass, cross-process fail.
    from pose3d_tpu.core.runtime import apply_tpu_workarounds

    apply_tpu_workarounds()

    work = Path(args.workdir or tempfile.mkdtemp(prefix="lifecycle_"))
    work.mkdir(parents=True, exist_ok=True)
    summary = {"workdir": str(work), "model_type": mt}

    sys.path.insert(0, str(REPO / "tests"))
    from helpers_synthetic import make_synthetic_dataset

    chunks = work / "chunks"
    if not chunks.exists():
        make_synthetic_dataset(chunks, num_chunks=2, num_samples=16,
                               image_hw=(64, 64), prefix="train")
        make_synthetic_dataset(chunks, num_chunks=1, num_samples=8,
                               image_hw=(64, 64), prefix="test")

    # ---- 1+2: train, SIGTERM after step 3, graceful exit ----------------
    run_a = work / "run_a"
    run_a.mkdir(exist_ok=True)
    out, dt = _run(_train_cmd(chunks, work / "cache", FINAL_STEP, mt),
                   run_a, sigterm_after_step=INTERRUPT_AFTER_STEP)
    assert "SIGTERM" in out, "graceful-stop path not taken"
    ck_a = sorted(run_a.glob(f"model_epoch__{mt}_step_*"))
    assert ck_a, "no checkpoint after SIGTERM"
    step_at_sigterm = max(
        int(p.name.rsplit("_", 1)[1]) for p in ck_a
    )
    summary["sigterm_checkpoint_step"] = step_at_sigterm
    summary["train_phase1_s"] = round(dt, 1)
    assert step_at_sigterm < FINAL_STEP

    # ---- 3a: auto-resume to completion ---------------------------------
    out, dt = _run(_train_cmd(chunks, work / "cache", FINAL_STEP, mt), run_a)
    assert "Auto-resume: found" in out, "did not auto-resume"
    final_a = run_a / f"model_epoch__{mt}_step_{FINAL_STEP}"
    assert (final_a / "meta.json").exists(), "resumed run missing final ckpt"
    summary["train_phase2_s"] = round(dt, 1)

    # ---- 3b: uninterrupted control run, bit-exact comparison ------------
    run_b = work / "run_b"
    run_b.mkdir(exist_ok=True)
    _run(_train_cmd(chunks, work / "cache", FINAL_STEP, mt), run_b)
    final_b = run_b / f"model_epoch__{mt}_step_{FINAL_STEP}"
    a = _load_state_arrays(final_a)
    b = _load_state_arrays(final_b)
    assert set(a) == set(b), "state tree mismatch between runs"
    diffs = [k for k in a if not np.array_equal(a[k], b[k])]
    assert not diffs, f"resume NOT bit-exact: {diffs[:10]}"
    summary["resume_bit_exact"] = True
    summary["compared_arrays"] = len(a)

    # ---- 4: eval --per-action ------------------------------------------
    r = subprocess.run(
        [sys.executable, "-m", "pose3d_tpu.cli.evaluate",
         "--checkpoint", str(final_a), "--chunks-dir", str(chunks),
         "--val-chunks", "0", "--cache-dir", str(work / "cache_eval"),
         "--per-action", "--json", str(work / "eval.json")],
        cwd=work, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ev = json.loads((work / "eval.json").read_text())
    summary["eval_mpjpe_mm"] = round(float(ev["mpjpe"]), 2)
    assert ev.get("per_action"), "per-action breakdown missing"

    # ---- 5: export --ema, artifact bit-identity -------------------------
    art = work / "artifact"
    r = subprocess.run(
        [sys.executable, "-m", "pose3d_tpu.cli.export",
         "--checkpoint", str(final_a), "--output", str(art),
         "--batch-size", "4", "--ema"],
        cwd=work, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    from pose3d_tpu import serve
    from pose3d_tpu.core.config import make_model_config
    from pose3d_tpu.models import build_model
    from pose3d_tpu.train.checkpoint import (
        load_checkpoint,
        load_checkpoint_meta,
    )

    meta = load_checkpoint_meta(final_a)
    cfg = make_model_config(meta["model_type"], **meta["model_args"])
    model = build_model(cfg)
    tree, _ = load_checkpoint(final_a)
    variables = {"params": tree["ema_params"],
                 "batch_stats": tree.get("ema_batch_stats",
                                         tree["batch_stats"])}

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(4, 64, 64, 3)).astype(np.float32)
    dep = rng.uniform(1, 8, size=(4, 64, 64, 1)).astype(np.float32)
    kp = rng.uniform(0.1, 0.9, size=(4, 17, 2)).astype(np.float32)

    import jax

    direct = np.asarray(
        jax.jit(serve.make_serving_fn(model, variables))(img, dep, kp)
    )
    exported = serve.load_exported(art)
    via_artifact = np.asarray(exported.call(img, dep, kp))
    # The live jit and the serialized artifact are two separately-compiled
    # XLA programs over the same math: XLA may fuse the bf16 interior
    # differently, so the guarantee is bf16-level agreement (measured
    # ~0.5% of output scale on this chip), not bitwise identity — bitwise
    # holds only when the two sides run the SAME compiled program (the
    # serve leg below). Gate at 2% of output scale.
    scale = float(np.abs(direct).max())
    rel = float(np.abs(direct - via_artifact).max() / max(scale, 1e-12))
    assert rel <= 0.02, (
        f"artifact deviates from the live model by {rel:.2%} of output "
        f"scale (bf16-reorder budget is 2%)"
    )
    summary["export_max_rel_dev"] = round(rel, 6)
    summary["export_bit_identical"] = bool(
        np.array_equal(direct, via_artifact)
    )

    # ---- 6: serve round-trip -------------------------------------------
    srv = subprocess.Popen(
        [sys.executable, "-m", "pose3d_tpu.serve_http",
         "--artifact", str(art), "--host", "127.0.0.1", "--port", "0"],
        cwd=work, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        port = None
        try:
            for line in _iter_lines_deadline(
                srv.stdout, time.monotonic() + 600
            ):
                low = line.lower()
                if "listening on" in low or "serving" in low:
                    import re

                    m = re.search(r"on \S+:(\d+)", line)
                    if m:
                        port = int(m.group(1))
                        break
        except TimeoutError:
            pass
        assert port, "server did not report a port within 600s"
        buf = io.BytesIO()
        np.savez(buf, image=img, depth=dep, keypoints_2d=kp)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            out = np.load(io.BytesIO(resp.read()))
        # Same serialized program, same XLA pass config (the server applies
        # apply_tpu_workarounds like every CLI) → the server's answer is
        # the artifact's answer (measured bit-exact cross-process).
        assert np.allclose(out["joints_3d"], via_artifact, atol=1e-6), (
            "server output differs from the artifact it serves"
        )
        summary["serve_roundtrip"] = True
        summary["serve_bit_identical"] = bool(
            np.array_equal(out["joints_3d"], via_artifact)
        )
    finally:
        srv.terminate()
        try:
            srv.wait(timeout=30)
        except subprocess.TimeoutExpired:
            srv.kill()

    print("LIFECYCLE " + json.dumps(summary))


if __name__ == "__main__":
    main()
