"""Reverse checkpoint export: pose3d_tpu checkpoint → reference-format
torch ``.pth`` (compat_export). The oracle is the reference's own torch
implementation: the exported state_dict must strict-load into
``CNNPoseEstimation`` with identical key order, reproduce our JAX forward,
and the exported AdamW state must load into a real torch AdamW with the
optax moments on the right parameters."""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = Path("/root/reference")
if not (REF / "src").exists():
    pytest.skip("reference tree not available", allow_module_level=True)
sys.path.insert(0, str(REF / "src"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from model_config import ModelConfig as RefModelConfig  # noqa: E402
from models.cnn import CNNPoseEstimation as RefCNN  # noqa: E402

from pose3d_tpu.compat import port_reference_cnn  # noqa: E402
from pose3d_tpu.compat_export import (  # noqa: E402
    export_reference_cnn,
    export_torch_optimizer_state,
)
from pose3d_tpu.core.config import CNNModelConfig  # noqa: E402
from pose3d_tpu.models import init_model  # noqa: E402

# Same architecture zoo coverage as test_checkpoint_convert.KW: dual-path
# blocks with coord attention + shortcut, IRBs with se/eca, expand 1/3/6.
KW = dict(
    image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
    initial_channels=8, stage_channels=[8, 16, 16],
    stage_depths=[2, 2, 3], stage_strides=[2, 2, 2],
    stage_expand_ratios=[1, 3, 6],
    global_pool_size=2, global_feature_dim=16, regression_dims=[16, 12],
    se_reduction=4,
)


def _our_model(seed=0):
    cfg = CNNModelConfig.from_dict({**KW, "in_channels": 21})
    # fp32 activations: the torch oracle computes in fp32, and the default
    # bf16 compute dtype adds ~1e-2 relative noise that has nothing to do
    # with the export mapping under test
    model, variables = init_model(cfg, rng=jax.random.PRNGKey(seed),
                                  batch_size=2, dtype=jnp.float32)
    # randomize BN stats so running stats are non-trivial in the export
    rng = np.random.default_rng(seed + 7)
    variables = jax.tree_util.tree_map(np.asarray, variables)

    def jiggle(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return (rng.normal(size=leaf.shape) * 0.05).astype(leaf.dtype)
        if name == "var":
            return (rng.uniform(0.7, 1.2, size=leaf.shape)).astype(leaf.dtype)
        return leaf

    variables = jax.tree_util.tree_map_with_path(jiggle, variables)
    return cfg, model, variables


def _to_torch_sd(writer):
    return {k: torch.from_numpy(np.array(v)) for k, v in writer.sd.items()}


def test_cnn_export_round_trips_bitwise():
    """export → port must reproduce the original variables exactly."""
    cfg, _, variables = _our_model()
    writer = export_reference_cnn(variables, cfg)
    back = port_reference_cnn(writer.sd, cfg)
    flat_a, tree_a = jax.tree_util.tree_flatten_with_path(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )
    flat_b, tree_b = jax.tree_util.tree_flatten_with_path(back)
    assert tree_a == tree_b
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_cnn_export_strict_load_key_order_and_forward_parity():
    """The exported state_dict strict-loads into the reference model, in the
    reference's exact state_dict/parameters() order, and the torch forward
    matches our JAX forward."""
    cfg, model, variables = _our_model(seed=1)
    writer = export_reference_cnn(variables, cfg)

    tmodel = RefCNN(RefModelConfig("cnn", **KW))
    # exact registration order — this is what makes optimizer indices valid
    assert list(writer.sd.keys()) == list(tmodel.state_dict().keys())
    assert writer.param_keys == [n for n, _ in tmodel.named_parameters()]

    missing, unexpected = tmodel.load_state_dict(_to_torch_sd(writer))
    assert not missing and not unexpected
    tmodel.eval()

    rng = np.random.default_rng(3)
    img = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    dep = rng.uniform(1, 8, size=(2, 32, 32, 1)).astype(np.float32)
    kpt = rng.uniform(0.1, 0.9, size=(2, 17, 2)).astype(np.float32)
    ours = np.asarray(
        model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(img), jnp.asarray(dep), jnp.asarray(kpt), train=False,
        )
    )
    with torch.no_grad():
        theirs = tmodel(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2))),
            torch.from_numpy(np.transpose(dep, (0, 3, 1, 2))),
            torch.from_numpy(kpt),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def _trained_state(cfg, model, variables):
    """One real optimizer step so the optax moments are nonzero."""
    from pose3d_tpu.train import create_train_state, make_train_step

    state = create_train_state(model, {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    })
    step = make_train_step(model, donate=False)
    rng = np.random.default_rng(11)
    batch = {
        "image": rng.uniform(size=(1, 2, 32, 32, 3)).astype(np.float32),
        "depth": rng.uniform(1, 8, size=(1, 2, 32, 32, 1)).astype(np.float32),
        "keypoints_2d": rng.uniform(
            0.1, 0.9, size=(1, 2, 17, 2)).astype(np.float32),
        "joints_3d": (rng.normal(size=(1, 2, 17, 3)) * 100).astype(np.float32),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    return state


def test_optimizer_state_exports_optax_moments():
    cfg, model, variables = _our_model(seed=2)
    state = _trained_state(cfg, model, variables)
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    opt_sd = export_torch_optimizer_state(
        jax.device_get(state.opt_state), variables, cfg, step=1
    )

    tmodel = RefCNN(RefModelConfig("cnn", **KW))
    writer = export_reference_cnn(variables, cfg)
    tmodel.load_state_dict(_to_torch_sd(writer))
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3, weight_decay=0.01)
    opt.load_state_dict(opt_sd)

    # moments landed on the right parameters, with the layout transforms
    # applied (spot-check the final head Linear: flax kernel.T)
    mu = None
    from pose3d_tpu.compat_export import _find_adam_moments

    _count, mu, _nu = _find_adam_moments(jax.device_get(state.opt_state))
    n_hidden = len(cfg.regression_dims)
    want = np.asarray(
        mu["PoseRegressionHead_0"][f"Dense_{n_hidden}"]["kernel"]).T
    name_to_param = dict(tmodel.named_parameters())
    key = f"pose_head.decoder.{n_hidden}.weight"
    got = opt.state[name_to_param[key]]["exp_avg"].numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)
    assert float(np.abs(want).max()) > 0  # the step really moved moments

    # and the loaded optimizer steps without complaint
    out = tmodel(
        torch.zeros(2, 3, 32, 32), torch.ones(2, 1, 32, 32),
        torch.full((2, 17, 2), 0.5),
    )
    out.sum().backward()
    opt.step()


def test_export_cli_round_trip_and_reference_resume_schema(tmp_path):
    """pose3d-convert --to-torch writes a .pth the reference can resume
    from (schema keys incl. the global_step quirk) and that our own
    importer round-trips bitwise."""
    import json

    from pose3d_tpu.cli.convert import main as convert_main
    from pose3d_tpu.train.checkpoint import save_checkpoint

    cfg, model, variables = _our_model(seed=4)
    state = _trained_state(cfg, model, variables)
    ck = save_checkpoint(
        tmp_path / "ckpt", state, "cnn",
        json.loads(json.dumps({**KW, "in_channels": 21})),
    )
    pth = tmp_path / "export.pth"
    convert_main([str(ck), str(pth), "--to-torch"])

    ckpt = torch.load(pth, weights_only=False)
    # reference train.py:300-309 schema + the global_step read quirk
    for key in ("step", "global_step", "model_state_dict",
                "optimizer_state_dict", "model_args", "model_type"):
        assert key in ckpt, key
    assert ckpt["step"] == ckpt["global_step"] == 1
    assert "model_type" not in ckpt["model_args"]  # passed positionally
    # the reference can reconstruct the architecture from model_args
    tmodel = RefCNN(RefModelConfig("cnn", **ckpt["model_args"]))
    missing, unexpected = tmodel.load_state_dict(ckpt["model_state_dict"])
    assert not missing and not unexpected
    opt = torch.optim.AdamW(tmodel.parameters(), lr=1e-3, weight_decay=0.01)
    opt.load_state_dict(ckpt["optimizer_state_dict"])

    # bitwise round trip through our own .pth importer
    from pose3d_tpu.cli.convert import convert

    back_dir = tmp_path / "back"
    convert(str(pth), str(back_dir))
    from pose3d_tpu.train.checkpoint import load_checkpoint

    tree, meta = load_checkpoint(back_dir)
    assert meta["step"] == 1
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(
            jax.device_get(tree["params"]))[0],
        jax.tree_util.tree_flatten_with_path(
            jax.device_get(state.params))[0],
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_export_ema_and_flag_validation(tmp_path):
    import json

    from pose3d_tpu.cli.convert import main as convert_main
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    cfg, model, variables = _our_model(seed=5)
    state = create_train_state(model, {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }, ema=True)
    state = state.replace(
        ema_params=jax.tree_util.tree_map(lambda x: x * 0.5, state.params)
    )
    ck = save_checkpoint(
        tmp_path / "ckpt", state, "cnn",
        json.loads(json.dumps({**KW, "in_channels": 21})),
    )
    pth = tmp_path / "ema.pth"
    convert_main([str(ck), str(pth), "--to-torch", "--ema"])
    ckpt = torch.load(pth, weights_only=False)
    half = 0.5 * np.asarray(
        variables["params"]["PoseRegressionHead_0"]["Dense_2"]["kernel"]).T
    np.testing.assert_allclose(
        ckpt["model_state_dict"]["pose_head.decoder.2.weight"].numpy(),
        half, rtol=1e-6,
    )
    # EMA export writes momentum-free optimizer state
    assert ckpt["optimizer_state_dict"]["state"] == {}

    with pytest.raises(SystemExit, match="--to-torch only"):
        convert_main([str(ck), str(pth), "--ema"])


# -- transformer export ------------------------------------------------------

TKW = dict(
    image_size=(64, 64), heatmap_size=32, heatmap_patch_size=16,
    transformer_embed_dim=64, transformer_heads=4,
    vit_depth=2, vit_heads=4, final_encoder_depth=1,
    num_cross_modal_layers=1, regression_hidden_dims=(32,),
)


def _our_transformer(seed=0):
    from pose3d_tpu.core.config import TransformerModelConfig

    cfg = TransformerModelConfig(**TKW)
    model, variables = init_model(
        cfg, rng=jax.random.PRNGKey(seed), batch_size=2,
        dtype=jnp.float32, attention_backend="xla",
    )
    return cfg, model, jax.tree_util.tree_map(np.asarray, variables)


def test_transformer_export_round_trips_bitwise():
    from pose3d_tpu.compat import port_reference_transformer
    from pose3d_tpu.compat_export import export_reference_transformer

    cfg, _, variables = _our_transformer()
    writer = export_reference_transformer(variables, cfg)
    back = port_reference_transformer(writer.sd, cfg)
    flat_a, tree_a = jax.tree_util.tree_flatten_with_path(variables["params"])
    flat_b, tree_b = jax.tree_util.tree_flatten_with_path(back["params"])
    assert tree_a == tree_b
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_transformer_export_handles_stacked_layout():
    """A checkpoint written from the pipeline-parallel stacked-ViT layout
    exports identically to its looped twin."""
    from pose3d_tpu.compat_export import export_reference_transformer
    from pose3d_tpu.parallel.pp import stack_vit_blocks

    cfg, _, variables = _our_transformer(seed=1)
    looped = export_reference_transformer(variables, cfg)
    stacked_params = dict(variables["params"])
    stacked_params["vit_backbone"] = stack_vit_blocks(
        variables["params"]["vit_backbone"]
    )
    stacked = export_reference_transformer({"params": stacked_params}, cfg)
    assert list(looped.sd.keys()) == list(stacked.sd.keys())
    for k in looped.sd:
        np.testing.assert_array_equal(looped.sd[k], stacked.sd[k], err_msg=k)


def _reference_transformer_skeleton():
    """The reference TransformerPoseEstimation's registration structure,
    assembled from its own classes (timm stubbed out as in
    test_transformer_convert.py) plus a timm-layout backbone skeleton —
    the ground truth for state_dict()/parameters() ordering."""
    import types

    sys.modules.setdefault("timm", types.ModuleType("timm"))
    from models.common import GaussianHeatmapGenerator as RefHeatmapGen
    from models.transformers import (
        CrossModalFusionBlock as RefFusion,
        PatchEmbedding as RefPatchEmbed,
        PoseRegressionHead as RefTHead,
        TransformerEncoderBlock as RefEncoder,
    )

    D = TKW["transformer_embed_dim"]
    n_img = (64 // 16) * (64 // 16)
    n_hm = (32 // 16) * (32 // 16)

    class TimmBlockSkeleton(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = torch.nn.LayerNorm(D)
            self.attn = torch.nn.Module()
            self.attn.qkv = torch.nn.Linear(D, 3 * D)
            self.attn.proj = torch.nn.Linear(D, D)
            self.norm2 = torch.nn.LayerNorm(D)
            self.mlp = torch.nn.Module()
            self.mlp.fc1 = torch.nn.Linear(D, 4 * D)
            self.mlp.fc2 = torch.nn.Linear(4 * D, D)

    class TimmViTSkeleton(torch.nn.Module):
        # timm VisionTransformer: own params cls_token/pos_embed lead the
        # state_dict; children patch_embed, blocks, norm follow
        def __init__(self):
            super().__init__()
            self.cls_token = torch.nn.Parameter(torch.zeros(1, 1, D))
            self.pos_embed = torch.nn.Parameter(torch.zeros(1, 1 + n_img, D))
            self.patch_embed = torch.nn.Module()
            self.patch_embed.proj = torch.nn.Conv2d(4, D, 16, stride=16)
            self.blocks = torch.nn.ModuleList(
                TimmBlockSkeleton() for _ in range(TKW["vit_depth"])
            )
            self.norm = torch.nn.LayerNorm(D)

    class RefTransformerSkeleton(torch.nn.Module):
        # assignment sequence mirrors reference transformers.py:174-304
        def __init__(self):
            super().__init__()
            self.vit_backbone = TimmViTSkeleton()
            self.heatmap_generator = RefHeatmapGen(17, 32, 2.0)
            self.heatmap_patch_embed = RefPatchEmbed(32, 32, 16, 17, D)
            self.pos_embed_hm = torch.nn.Parameter(torch.zeros(1, n_hm, D))
            self.cross_modal_fusion_layers = torch.nn.ModuleList(
                RefFusion(D, 4, 4.0, 0.0, 0.0)
                for _ in range(TKW["num_cross_modal_layers"])
            )
            self.final_cls_token = torch.nn.Parameter(torch.zeros(1, 1, D))
            self.final_pos_embed = torch.nn.Parameter(
                torch.zeros(1, 1 + n_img + n_hm, D)
            )
            self.final_encoder = torch.nn.ModuleList(
                RefEncoder(D, 4, 4.0, 0.0, 0.0)
                for _ in range(TKW["final_encoder_depth"])
            )
            self.norm_out = torch.nn.LayerNorm(D)
            self.pose_head = RefTHead(D, 17, TKW["regression_hidden_dims"],
                                      0.25)

    return RefTransformerSkeleton()


def test_transformer_export_strict_load_and_key_order():
    from pose3d_tpu.compat_export import export_reference_transformer

    cfg, _, variables = _our_transformer(seed=2)
    writer = export_reference_transformer(variables, cfg)
    skeleton = _reference_transformer_skeleton()
    assert list(writer.sd.keys()) == list(skeleton.state_dict().keys())
    assert writer.param_keys == [n for n, _ in skeleton.named_parameters()]
    missing, unexpected = skeleton.load_state_dict(_to_torch_sd(writer))
    assert not missing and not unexpected


def test_transformer_export_cli_round_trip(tmp_path):
    import json

    from pose3d_tpu.cli.convert import convert
    from pose3d_tpu.cli.convert import main as convert_main
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg, model, variables = _our_transformer(seed=3)
    state = create_train_state(model, variables)
    ck = save_checkpoint(
        tmp_path / "ckpt", state, "transformer",
        json.loads(json.dumps(TKW)),
    )
    pth = tmp_path / "vit.pth"
    convert_main([str(ck), str(pth), "--to-torch"])
    ckpt = torch.load(pth, weights_only=False)
    assert ckpt["model_type"] == "transformer"
    # moments are zero pre-step but indexed for every trainable tensor
    n_params = len([k for k in ckpt["model_state_dict"]
                    if "heatmap_generator" not in k
                    and "num_batches_tracked" not in k])
    assert len(ckpt["optimizer_state_dict"]["state"]) == n_params

    back_dir = tmp_path / "back"
    convert(str(pth), str(back_dir))
    tree, _ = load_checkpoint(back_dir)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(
            jax.device_get(tree["params"]))[0],
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_export_frozen_backbone_falls_back_to_fresh_optimizer(tmp_path):
    """A frozen-backbone checkpoint stores masked placeholders where the
    moments would be; the model export must still succeed, with a
    momentum-free (but loadable) optimizer state."""
    import json

    from pose3d_tpu.compat_export import export_torch_checkpoint
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    cfg, model, variables = _our_transformer(seed=4)
    state = create_train_state(
        model, variables, frozen_prefixes=("vit_backbone",)
    )
    ck = save_checkpoint(
        tmp_path / "ckpt", state, "transformer", json.loads(json.dumps(TKW)),
    )
    pth = tmp_path / "frozen.pth"
    export_torch_checkpoint(str(ck), str(pth))
    ckpt = torch.load(pth, weights_only=False)
    skeleton = _reference_transformer_skeleton()
    missing, unexpected = skeleton.load_state_dict(ckpt["model_state_dict"])
    assert not missing and not unexpected
    opt = torch.optim.AdamW(skeleton.parameters(), lr=1e-3)
    opt.load_state_dict(ckpt["optimizer_state_dict"])  # loadable fallback


# -- review-pass regression tests --------------------------------------------

def test_dual_path_stage_entry_without_shortcut_round_trips():
    """A dual-path stage entry with stride 1 and an unchanged channel count
    has NO shortcut conv (reference cnn.py:347); the shared stage schedule
    must replay that in both directions and strict-load into the
    reference model."""
    kw = dict(
        image_size=(32, 32), heatmap_size=32, heatmap_sigma=2.0,
        initial_channels=8, stage_channels=[8, 16, 16, 16],
        stage_depths=[1, 1, 1, 2], stage_strides=[2, 2, 2, 1],
        stage_expand_ratios=[1, 3, 6, 6],
        global_pool_size=2, global_feature_dim=16, regression_dims=[16],
        se_reduction=4,
    )
    cfg = CNNModelConfig.from_dict({**kw, "in_channels": 21})
    model, variables = init_model(cfg, rng=jax.random.PRNGKey(9),
                                  batch_size=2, dtype=jnp.float32)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    writer = export_reference_cnn(variables, cfg)

    tmodel = RefCNN(RefModelConfig("cnn", **kw))
    assert list(writer.sd.keys()) == list(tmodel.state_dict().keys())
    missing, unexpected = tmodel.load_state_dict(_to_torch_sd(writer))
    assert not missing and not unexpected

    back = port_reference_cnn(writer.sd, cfg)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(back["params"])[0],
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))


def test_adam_step_comes_from_optax_count_not_meta_step(tmp_path):
    """A reference .pth imported at a high step gets a FRESH optax
    optimizer; exporting it back must write per-param Adam step 0 (the
    moment count), not the training step — torch's bias correction would
    otherwise over-scale the first resumed updates."""
    import json

    from pose3d_tpu.compat_export import export_torch_checkpoint
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    cfg, model, variables = _our_model(seed=6)
    state = create_train_state(model, {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    })
    state = state.replace(step=jax.numpy.asarray(50_000, jax.numpy.int32))
    ck = save_checkpoint(
        tmp_path / "ckpt", state, "cnn",
        json.loads(json.dumps({**KW, "in_channels": 21})),
    )
    pth = tmp_path / "divergent.pth"
    export_torch_checkpoint(str(ck), str(pth))
    ckpt = torch.load(pth, weights_only=False)
    assert ckpt["global_step"] == 50_000
    steps = {float(s["step"]) for s in
             ckpt["optimizer_state_dict"]["state"].values()}
    assert steps == {0.0}


def test_cli_exit_code_and_direction_flag_validation(tmp_path):
    """main() returns 0 (the console wrapper sys.exit()s its return) and
    direction-specific flags are rejected in the wrong direction."""
    import json

    from pose3d_tpu.cli.convert import main as convert_main
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    cfg, model, variables = _our_model(seed=7)
    state = create_train_state(model, variables)
    ck = save_checkpoint(
        tmp_path / "ckpt", state, "cnn",
        json.loads(json.dumps({**KW, "in_channels": 21})),
    )
    pth = tmp_path / "o.pth"
    assert convert_main([str(ck), str(pth), "--to-torch"]) == 0
    with pytest.raises(SystemExit, match="--to-torch only"):
        convert_main([str(pth), str(tmp_path / "fwd"), "--lr", "5e-4"])
    assert convert_main([str(pth), str(tmp_path / "fwd")]) == 0
