"""Reference-checkpoint compatibility: port torch ``.pth`` weights from the
reference project onto this framework's models.

``port_reference_cnn`` maps a reference ``CNNPoseEstimation`` state_dict
(src/models/cnn.py) onto our Flax CNN by replaying the exact stage-assembly
rules both models share (reference cnn.py:519-589) and converting each
block's tensors (conv OIHW→HWIO, Linear transpose, BatchNorm running
stats). Together with ``stage1.port.port_vit_backbone`` this gives
reference users a migration path for trained checkpoints
(see cli/convert.py).

Numerical parity is validated end-to-end in tests/test_checkpoint_convert.py
(full-model forward against the reference's torch implementation).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from pose3d_tpu.core.config import CNNModelConfig


def _t(w) -> np.ndarray:
    return w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)


def _conv_k(sd, key):  # torch [O, I/g, kh, kw] → flax [kh, kw, I/g, O]
    return np.transpose(_t(sd[key]), (2, 3, 1, 0))


def _cba(sd: Dict, prefix: str) -> Tuple[Dict, Dict]:
    """reference ConvBnAct at ``prefix`` → (params, batch_stats)."""
    p = {
        "Conv_0": {"kernel": _conv_k(sd, prefix + "conv.weight")},
        "BatchNorm_0": {
            "scale": _t(sd[prefix + "norm.weight"]),
            "bias": _t(sd[prefix + "norm.bias"]),
        },
    }
    if prefix + "conv.bias" in sd:
        p["Conv_0"]["bias"] = _t(sd[prefix + "conv.bias"])
    s = {
        "BatchNorm_0": {
            "mean": _t(sd[prefix + "norm.running_mean"]),
            "var": _t(sd[prefix + "norm.running_var"]),
        }
    }
    return p, s


def _dwsep(sd, prefix):
    p0, s0 = _cba(sd, prefix + "depthwise.")
    p1, s1 = _cba(sd, prefix + "pointwise.")
    return ({"ConvBnAct_0": p0, "ConvBnAct_1": p1},
            {"ConvBnAct_0": s0, "ConvBnAct_1": s1})


def _se(sd, prefix):
    return {
        "Dense_0": {"kernel": _t(sd[prefix + "fc.0.weight"]).T},
        "Dense_1": {"kernel": _t(sd[prefix + "fc.2.weight"]).T},
    }


def _eca(sd, prefix):
    return {"Conv_0": {
        "kernel": np.transpose(_t(sd[prefix + "conv.weight"]), (2, 1, 0))
    }}


def _coord(sd, prefix):
    def c1d(key):  # [O, I, 1, 1] → [1, I, O]
        return np.transpose(_t(sd[key])[:, :, :, 0], (2, 1, 0))

    p = {
        "Conv_0": {"kernel": c1d(prefix + "conv1.weight"),
                   "bias": _t(sd[prefix + "conv1.bias"])},
        "BatchNorm_0": {"scale": _t(sd[prefix + "bn1.weight"]),
                        "bias": _t(sd[prefix + "bn1.bias"])},
        "Conv_1": {"kernel": c1d(prefix + "conv_h.weight"),
                   "bias": _t(sd[prefix + "conv_h.bias"])},
        "Conv_2": {"kernel": c1d(prefix + "conv_w.weight"),
                   "bias": _t(sd[prefix + "conv_w.bias"])},
    }
    s = {"BatchNorm_0": {"mean": _t(sd[prefix + "bn1.running_mean"]),
                         "var": _t(sd[prefix + "bn1.running_var"])}}
    return p, s


def _attach_attention(p, s, sd, prefix, att_type):
    if att_type == "se":
        p["SEBlock_0"] = _se(sd, prefix)
    elif att_type == "eca":
        p["ECABlock_0"] = _eca(sd, prefix)
    elif att_type == "coord":
        cp, cs = _coord(sd, prefix)
        p["CoordAttention_0"] = cp
        s["CoordAttention_0"] = cs


def _inverted_residual(sd, prefix, expand_ratio: int, att_type: str):
    idx = 0
    p: Dict = {}
    s: Dict = {}
    cba_i = 0
    if expand_ratio != 1:
        p[f"ConvBnAct_{cba_i}"], s[f"ConvBnAct_{cba_i}"] = _cba(
            sd, f"{prefix}conv.{idx}."
        )
        idx += 1
        cba_i += 1
    p[f"ConvBnAct_{cba_i}"], s[f"ConvBnAct_{cba_i}"] = _cba(
        sd, f"{prefix}conv.{idx}."
    )
    idx += 1
    cba_i += 1
    _attach_attention(p, s, sd, f"{prefix}conv.{idx}.", att_type)
    idx += 1
    p[f"ConvBnAct_{cba_i}"], s[f"ConvBnAct_{cba_i}"] = _cba(
        sd, f"{prefix}conv.{idx}."
    )
    return p, s


def _dual_path(sd, prefix, has_shortcut: bool, att_type):
    p: Dict = {}
    s: Dict = {}
    p["ConvBnAct_0"], s["ConvBnAct_0"] = _cba(sd, prefix + "residual_path.0.")
    p["DepthwiseSeparableConv_0"], s["DepthwiseSeparableConv_0"] = _dwsep(
        sd, prefix + "residual_path.1."
    )
    p["ConvBnAct_1"], s["ConvBnAct_1"] = _cba(sd, prefix + "residual_path.2.")
    p["ConvBnAct_2"], s["ConvBnAct_2"] = _cba(sd, prefix + "dense_path.0.")
    p["DepthwiseSeparableConv_1"], s["DepthwiseSeparableConv_1"] = _dwsep(
        sd, prefix + "dense_path.1."
    )
    nxt = 3
    if has_shortcut:
        p[f"ConvBnAct_{nxt}"], s[f"ConvBnAct_{nxt}"] = _cba(
            sd, prefix + "shortcut."
        )
        nxt += 1
    p[f"ConvBnAct_{nxt}"], s[f"ConvBnAct_{nxt}"] = _cba(sd, prefix + "fusion.")
    if att_type:
        _attach_attention(p, s, sd, prefix + "attention.", att_type)
    return p, s


def _wasp(sd, prefix):
    p: Dict = {"branch_weights": _t(sd[prefix + "weights"])}
    s: Dict = {}
    p["ConvBnAct_0"], s["ConvBnAct_0"] = _cba(sd, prefix + "conv1x1.")
    for i in range(4):
        p[f"ConvBnAct_{i+1}"], s[f"ConvBnAct_{i+1}"] = _cba(
            sd, f"{prefix}atrous_branches.{i}."
        )
    p["ConvBnAct_5"], s["ConvBnAct_5"] = _cba(sd, prefix + "global_branch.1.")
    p["ConvBnAct_6"], s["ConvBnAct_6"] = _cba(sd, prefix + "fusion.")
    return p, s


def _pose_head(sd, prefix, n_hidden: int):
    p: Dict = {}
    for k in range(n_hidden):
        p[f"Dense_{k}"] = {
            "kernel": _t(sd[f"{prefix}decoder.{k}.0.weight"]).T,
            "bias": _t(sd[f"{prefix}decoder.{k}.0.bias"]),
        }
    p[f"Dense_{n_hidden}"] = {
        "kernel": _t(sd[f"{prefix}decoder.{n_hidden}.weight"]).T,
        "bias": _t(sd[f"{prefix}decoder.{n_hidden}.bias"]),
    }
    return p


def iter_cnn_stage_blocks(cfg: CNNModelConfig):
    """Replay the stage-assembly schedule both models share (reference
    cnn.py:519-589 == our CNNPoseEstimation.__call__): yields one
    ``(torch_prefix, flax_name, is_dual, att_type, expand, has_shortcut)``
    per backbone block, in call order.

    This is the single source of truth for the importer
    (:func:`port_reference_cnn`) and the exporter
    (compat_export.export_reference_cnn) — the two walks must stay exact
    inverses. ``has_shortcut`` replays the DualPathBlock rule
    ``stride != 1 or in_channels != out_channels`` (reference cnn.py:347)
    with the true channel flow — a stage entry with stride 1 and an
    unchanged channel count has NO shortcut conv.
    """
    irb = 0
    dpb = 0
    in_channels = cfg.initial_channels
    for i in range(len(cfg.stage_channels)):
        out_channels = cfg.stage_channels[i]
        expand = cfg.stage_expand_ratios[i]
        lead_att = "coord" if i >= 2 else "se"
        for j in range(cfg.stage_depths[i]):
            if j == 0:
                is_dual = i >= 2 and cfg.use_dual_path_blocks
                att = lead_att
                stride = cfg.stage_strides[i]
                block_in = in_channels
            else:
                is_dual = (
                    i >= 2 and cfg.use_dual_path_blocks and j % 2 == 0
                )
                att = lead_att if is_dual else (
                    "eca" if j % 2 == 0 else "se"
                )
                stride = 1
                block_in = out_channels
            if is_dual:
                flax_name = f"DualPathBlock_{dpb}"
                dpb += 1
            else:
                flax_name = f"InvertedResidual_{irb}"
                irb += 1
            yield (
                f"stages.{i}.{j}.", flax_name, is_dual, att, expand,
                stride != 1 or block_in != out_channels,
            )
        in_channels = out_channels


def port_reference_cnn(sd: Dict, cfg: CNNModelConfig) -> Dict:
    """Map a reference CNNPoseEstimation state_dict onto our CNN's
    variables ({params, batch_stats})."""
    params: Dict = {}
    stats: Dict = {}

    params["ConvBnAct_0"], stats["ConvBnAct_0"] = _cba(sd, "conv1.0.")
    params["ConvBnAct_1"], stats["ConvBnAct_1"] = _cba(sd, "conv1.1.")

    for prefix, name, is_dual, att, expand, has_shortcut \
            in iter_cnn_stage_blocks(cfg):
        if is_dual:
            params[name], stats[name] = _dual_path(
                sd, prefix, has_shortcut=has_shortcut, att_type=att
            )
        else:
            params[name], stats[name] = _inverted_residual(
                sd, prefix, expand, att
            )

    p, s = _wasp(sd, "wasp.")
    params["WASPModule_0"] = p
    stats["WASPModule_0"] = s

    # global features: Sequential[pool, ConvBnAct, ECA, pool]
    p, s = _cba(sd, "global_features.1.")
    params["ConvBnAct_2"] = p
    stats["ConvBnAct_2"] = s
    params["ECABlock_0"] = _eca(sd, "global_features.2.")

    params["PoseRegressionHead_0"] = _pose_head(
        sd, "pose_head.", len(cfg.regression_dims)
    )
    return {"params": params, "batch_stats": stats}


# -- transformer (reference src/models/transformers.py) ---------------------

def _ln_p(sd, prefix):
    return {"scale": _t(sd[prefix + "weight"]), "bias": _t(sd[prefix + "bias"])}


def _torch_mha(sd, prefix, num_heads):
    """torch nn.MultiheadAttention (packed in_proj) → our MultiHeadAttention
    {query, key, value, out} DenseGeneral trees."""
    w = _t(sd[prefix + "in_proj_weight"])   # [3D, D]
    b = _t(sd[prefix + "in_proj_bias"])     # [3D]
    qw, kw, vw = np.split(w, 3, axis=0)
    qb, kb, vb = np.split(b, 3, axis=0)
    D = qw.shape[1]
    hd = D // num_heads

    def dg(w_, b_):
        return {"kernel": w_.T.reshape(D, num_heads, hd),
                "bias": b_.reshape(num_heads, hd)}

    return {
        "query": dg(qw, qb), "key": dg(kw, kb), "value": dg(vw, vb),
        "out": {
            "kernel": _t(sd[prefix + "out_proj.weight"]).T.reshape(
                num_heads, hd, D
            ),
            "bias": _t(sd[prefix + "out_proj.bias"]),
        },
    }


def _lin(sd, prefix):
    return {"kernel": _t(sd[prefix + "weight"]).T,
            "bias": _t(sd[prefix + "bias"])}


def port_reference_encoder_block(sd, prefix, num_heads):
    """reference TransformerEncoderBlock (transformers.py:49-82) → ours."""
    return {
        "LayerNorm_0": _ln_p(sd, prefix + "norm1."),
        "MultiHeadAttention_0": _torch_mha(sd, prefix + "attn.", num_heads),
        "LayerNorm_1": _ln_p(sd, prefix + "norm2."),
        "Mlp_0": {
            "Dense_0": _lin(sd, prefix + "mlp.0."),
            "Dense_1": _lin(sd, prefix + "mlp.3."),
        },
    }


def port_reference_fusion_block(sd, prefix, num_heads):
    """reference CrossModalFusionBlock (transformers.py:85-137) → ours.
    LayerNorm indices follow our call order: img_q, hm_kv, hm_q, img_kv,
    img_mlp, hm_mlp."""
    return {
        "LayerNorm_0": _ln_p(sd, prefix + "norm_img_q."),
        "LayerNorm_1": _ln_p(sd, prefix + "norm_hm_kv."),
        "img_to_hm": _torch_mha(sd, prefix + "cross_attn_img_to_hm.",
                                num_heads),
        "LayerNorm_2": _ln_p(sd, prefix + "norm_hm_q."),
        "LayerNorm_3": _ln_p(sd, prefix + "norm_img_kv."),
        "hm_to_img": _torch_mha(sd, prefix + "cross_attn_hm_to_img.",
                                num_heads),
        "LayerNorm_4": _ln_p(sd, prefix + "norm_img_mlp."),
        "mlp_img": {
            "Dense_0": _lin(sd, prefix + "mlp_img.0."),
            "Dense_1": _lin(sd, prefix + "mlp_img.3."),
        },
        "LayerNorm_5": _ln_p(sd, prefix + "norm_hm_mlp."),
        "mlp_hm": {
            "Dense_0": _lin(sd, prefix + "mlp_hm.0."),
            "Dense_1": _lin(sd, prefix + "mlp_hm.3."),
        },
    }


def port_reference_transformer(sd: Dict, cfg) -> Dict:
    """Map a reference TransformerPoseEstimation state_dict onto our
    TransformerPoseEstimation variables. The timm backbone weights inside
    ``vit_backbone.*`` are ported with stage1.port.port_vit_backbone
    (the reference already inflated patch_embed to 4 channels in-place,
    transformers.py:184-224, so no further inflation happens here)."""
    from pose3d_tpu.stage1.port import port_vit_backbone

    sd = {k: _t(v) for k, v in sd.items()}
    H, W = cfg.image_size
    n_patches = (H // cfg.vit_patch_size) * (W // cfg.vit_patch_size)

    params: Dict = {}
    params["vit_backbone"] = port_vit_backbone(
        sd, num_heads=cfg.vit_heads, depth=cfg.vit_depth,
        in_channels=cfg.image_in_channels, num_patches=n_patches,
        prefix="vit_backbone.",
    )
    params["heatmap_patch_embed"] = {"Conv_0": {
        "kernel": np.transpose(sd["heatmap_patch_embed.proj.weight"],
                               (2, 3, 1, 0)),
        "bias": sd["heatmap_patch_embed.proj.bias"],
    }}
    params["pos_embed_hm"] = sd["pos_embed_hm"]
    for i in range(cfg.num_cross_modal_layers):
        params[f"fusion_{i}"] = port_reference_fusion_block(
            sd, f"cross_modal_fusion_layers.{i}.", cfg.transformer_heads
        )
    params["final_cls_token"] = sd["final_cls_token"]
    params["final_pos_embed"] = sd["final_pos_embed"]
    for i in range(cfg.final_encoder_depth):
        params[f"final_block_{i}"] = port_reference_encoder_block(
            sd, f"final_encoder.{i}.", cfg.transformer_heads
        )
    params["norm_out"] = _ln_p(sd, "norm_out.")
    # flat head (transformers.py:20-25): Linear at decoder indices 0,3,6,...
    head: Dict = {}
    n_hidden = len(cfg.regression_hidden_dims)
    for k in range(n_hidden):
        head[f"Dense_{k}"] = _lin(sd, f"pose_head.decoder.{3 * k}.")
    head[f"Dense_{n_hidden}"] = _lin(
        sd, f"pose_head.decoder.{3 * n_hidden}."
    )
    params["pose_head"] = head
    return {"params": params}
