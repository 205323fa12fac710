"""Serving export: jax.export artifacts round-trip (serialize →
deserialize → call) and match the live model exactly; the CLI exports a
checkpoint end-to-end. Reference has no serving path at all — deployment
there means running the training repo (reference infer.py)."""

import pytest
import json

import jax
import numpy as np

from pose3d_tpu.core.config import CNNModelConfig, TransformerModelConfig
from pose3d_tpu.models import init_model
from pose3d_tpu.serve import (
    export_lifter,
    load_exported,
    load_exported_meta,
    save_exported,
)

TINY_CNN = CNNModelConfig(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    stage_channels=(8, 16, 32), stage_depths=(1, 1, 1),
    initial_channels=8, global_pool_size=2, global_feature_dim=16,
    regression_dims=(16,),
)

TINY_VIT = TransformerModelConfig(
    image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
    transformer_embed_dim=64, transformer_heads=4,
    vit_depth=1, vit_heads=4, final_encoder_depth=1,
    num_cross_modal_layers=1, regression_hidden_dims=(32,),
)


def _inputs(rng, b, hw):
    return (
        rng.uniform(size=(b, hw, hw, 3)).astype(np.float32),
        rng.uniform(1, 8, size=(b, hw, hw, 1)).astype(np.float32),
        rng.uniform(0.1, 0.9, size=(b, 17, 2)).astype(np.float32),
    )


def test_export_static_batch_roundtrip(tmp_path):
    model, variables = init_model(TINY_CNN, batch_size=2)
    exp = export_lifter(model, variables, (32, 32), batch_size=2)
    save_exported(exp, tmp_path / "art", extra_meta={"model_type": "cnn"})

    meta = load_exported_meta(tmp_path / "art")
    assert meta["model_type"] == "cnn"
    assert meta["payload_bytes"] > 0

    art = load_exported(tmp_path / "art")
    img, dep, kp = _inputs(np.random.default_rng(0), 2, 32)
    got = np.asarray(art.call(img, dep, kp))
    want = np.asarray(
        model.apply(variables, img, dep, kp, train=False)
    )
    assert got.shape == (2, 17, 3)
    # eager-vs-compiled fusion differences are ~2e-6 on the fp32 CNN
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # against the artifact's own jitted source the match is exact
    jit_src = jax.jit(
        lambda i, d, k: model.apply(variables, i, d, k, train=False)
    )
    np.testing.assert_array_equal(got, np.asarray(jit_src(img, dep, kp)))


@pytest.mark.slow
def test_export_dynamic_batch_serves_any_size(tmp_path):
    model, variables = init_model(TINY_CNN, batch_size=2)
    exp = export_lifter(model, variables, (32, 32), batch_size=None)
    save_exported(exp, tmp_path / "art")
    art = load_exported(tmp_path / "art")
    for b in (1, 3):
        img, dep, kp = _inputs(np.random.default_rng(b), b, 32)
        got = np.asarray(art.call(img, dep, kp))
        want = np.asarray(
            model.apply(variables, img, dep, kp, train=False)
        )
        assert got.shape == (b, 17, 3)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_export_transformer(tmp_path):
    model, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla"
    )
    exp = export_lifter(model, variables, (64, 64), batch_size=2)
    save_exported(exp, tmp_path / "art")
    art = load_exported(tmp_path / "art")
    img, dep, kp = _inputs(np.random.default_rng(1), 2, 64)
    got = np.asarray(art.call(img, dep, kp))
    want = np.asarray(model.apply(variables, img, dep, kp, train=False))
    # the ViT runs bf16 activations: eager and compiled programs round
    # differently at each fusion boundary (~3e-3 observed)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)


def test_export_cli_from_checkpoint(tmp_path, monkeypatch):
    from pose3d_tpu.cli.export import main as export_main
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    model, variables = init_model(TINY_CNN, batch_size=2)
    state = create_train_state(model, variables)
    ck = save_checkpoint(
        tmp_path / "ckpt", state, "cnn",
        json.loads(json.dumps({
            "image_size": [32, 32], "heatmap_size": 32,
            "heatmap_sigma": 2.0, "stage_channels": [8, 16, 32],
            "stage_depths": [1, 1, 1], "initial_channels": 8,
            "global_pool_size": 2, "global_feature_dim": 16,
            "regression_dims": [16],
        })),
    )
    out = export_main([
        "--checkpoint", str(ck), "--output", str(tmp_path / "served"),
        "--batch-size", "dynamic",
    ])
    art = load_exported(out)
    img, dep, kp = _inputs(np.random.default_rng(2), 2, 32)
    got = np.asarray(art.call(img, dep, kp))
    vars_restored = {
        "params": state.params, "batch_stats": state.batch_stats
    }
    want = np.asarray(
        model.apply(vars_restored, img, dep, kp, train=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    meta = load_exported_meta(out)
    assert meta["model_type"] == "cnn"
    assert meta["batch"] == "dynamic"


def test_int8_quantize_roundtrip_error_bound():
    """Symmetric per-channel int8: reconstruction error is at most half a
    quantization step (scale/2) per element."""
    import jax

    from pose3d_tpu.serve import dequantize_variables, quantize_variables

    rng = np.random.default_rng(0)
    w = (rng.normal(size=(128, 64)) * 0.3).astype(np.float32)
    variables = {"params": {"layer": {"kernel": jax.numpy.asarray(w)}}}
    qv = quantize_variables(variables, min_size=1024)
    from pose3d_tpu.serve import Int8Weight

    leaf = qv["params"]["layer"]["kernel"]
    assert isinstance(leaf, Int8Weight)
    assert leaf.q.dtype == jax.numpy.int8
    back = np.asarray(dequantize_variables(qv)["params"]["layer"]["kernel"])
    scale = np.asarray(leaf.scale)  # [1, 64]
    assert np.all(np.abs(back - w) <= scale / 2 + 1e-9)
    # small leaves stay untouched
    small = {"params": {"layer": {"kernel": jax.numpy.ones((4, 4))}}}
    assert not isinstance(
        quantize_variables(small)["params"]["layer"]["kernel"], Int8Weight
    )


def test_int8_quantized_export_smaller_and_close(tmp_path):
    """quantize="int8" shrinks the serialized artifact (int8 constants)
    while the outputs stay close to the fp32 artifact."""
    model, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="xla"
    )
    fp = export_lifter(model, variables, (64, 64), batch_size=2)
    q = export_lifter(model, variables, (64, 64), batch_size=2,
                      quantize="int8")
    save_exported(fp, tmp_path / "fp")
    save_exported(q, tmp_path / "q", extra_meta={"quantize": "int8"})
    b_fp = load_exported_meta(tmp_path / "fp")["payload_bytes"]
    b_q = load_exported_meta(tmp_path / "q")["payload_bytes"]
    assert b_q < 0.6 * b_fp, (b_q, b_fp)

    img, dep, kp = _inputs(np.random.default_rng(3), 2, 64)
    out_fp = np.asarray(load_exported(tmp_path / "fp").call(img, dep, kp))
    out_q = np.asarray(load_exported(tmp_path / "q").call(img, dep, kp))
    assert np.isfinite(out_q).all()
    assert np.abs(out_q - out_fp).max() > 0  # quantization actually applied
    scale = np.abs(out_fp).max() + 1e-6
    assert np.abs(out_q - out_fp).max() < 0.2 * scale, (
        np.abs(out_q - out_fp).max(), scale
    )


@pytest.mark.slow
def test_export_vit_trained_with_pallas_attention(tmp_path):
    """The export story for Pallas-trained transformer checkpoints
    (VERDICT r4 item 3): checkpoints carry only weights — the attention
    backend is a program choice, not state — so export always lowers
    through the portable XLA attention path (cli/export.py default) and
    the artifact must agree with the live Pallas-attention model within
    the bf16 fusion budget. CPU stand-in for the chip kernel is
    ``pallas_interpret`` (the same kernel, interpreted)."""
    from pose3d_tpu.models import build_model

    # one parameter set, two programs over it
    model_pallas, variables = init_model(
        TINY_VIT, batch_size=2, attention_backend="pallas_interpret"
    )
    model_xla = build_model(TINY_VIT, attention_backend="xla")

    exp = export_lifter(model_xla, variables, (64, 64), batch_size=2)
    save_exported(exp, tmp_path / "art")
    art = load_exported(tmp_path / "art")

    img, dep, kp = _inputs(np.random.default_rng(2), 2, 64)
    live = np.asarray(
        model_pallas.apply(variables, img, dep, kp, train=False)
    )
    via_artifact = np.asarray(art.call(img, dep, kp))
    assert live.shape == via_artifact.shape == (2, 17, 3)
    # kernel-vs-einsum numerics (2e-7 fwd at fp32; here the model runs
    # bf16 activations) + separate-compilation fusion reorders
    np.testing.assert_allclose(via_artifact, live, rtol=2e-2, atol=1e-2)
