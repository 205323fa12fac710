"""Reverse checkpoint compatibility: export a pose3d_tpu checkpoint back to
the reference's torch ``.pth`` format.

This is the inverse of :mod:`pose3d_tpu.compat` — a model trained with this
framework on TPU drops straight into the reference project's ``infer.py``
and ``main.py`` (reference train.py:300-309 checkpoint schema). The
state_dict is emitted in the reference modules' exact torch registration
order, including non-trainable buffers torch's strict ``load_state_dict``
requires (BatchNorm ``num_batches_tracked``, the heatmap generator's
meshgrid buffers — reference common.py:17-21), and the AdamW optimizer
state is reconstructed from the optax moments so a reference user resumes
training with momentum intact (reference main.py:129-133 reads
``optimizer_state_dict`` unconditionally).

The key/index conventions mirrored here:

* ``state_dict`` lists each module's own parameters, then its buffers, then
  its children in registration order — e.g. WASP's learned branch weights
  precede its child convolutions even though they are assigned later
  (reference cnn.py:466).
* ``model.parameters()`` (which defines torch optimizer param indices)
  walks the same order, skipping buffers.

Numerical parity and strict-load/optimizer round-trips are tested against
the reference's own torch implementation in tests/test_torch_export.py.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from typing import Dict, List, Tuple

import numpy as np

logger = logging.getLogger("CompatExport")


class _Writer:
    """Ordered state_dict builder that also records parameter keys (in
    ``model.parameters()`` order) separately from buffers."""

    def __init__(self):
        self.sd: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self.param_keys: List[str] = []

    def p(self, key: str, arr) -> None:  # trainable parameter
        self.sd[key] = np.ascontiguousarray(np.asarray(arr))
        self.param_keys.append(key)

    def b(self, key: str, arr) -> None:  # buffer
        self.sd[key] = np.ascontiguousarray(np.asarray(arr))


def _conv_k(kernel) -> np.ndarray:  # flax [kh, kw, I/g, O] → torch [O, I/g, kh, kw]
    return np.transpose(np.asarray(kernel), (3, 2, 0, 1))


def _x_cba(w: _Writer, p: Dict, s: Dict, prefix: str) -> None:
    """Our ConvBnAct params/stats → reference ConvBnAct keys
    (conv → norm → act registration order, reference cnn.py:121-135)."""
    conv = p["Conv_0"]
    w.p(prefix + "conv.weight", _conv_k(conv["kernel"]))
    if "bias" in conv:
        w.p(prefix + "conv.bias", conv["bias"])
    bn = p["BatchNorm_0"]
    st = s["BatchNorm_0"]
    w.p(prefix + "norm.weight", bn["scale"])
    w.p(prefix + "norm.bias", bn["bias"])
    w.b(prefix + "norm.running_mean", st["mean"])
    w.b(prefix + "norm.running_var", st["var"])
    w.b(prefix + "norm.num_batches_tracked", np.asarray(0, np.int64))


def _x_dwsep(w, p, s, prefix):
    _x_cba(w, p["ConvBnAct_0"], s["ConvBnAct_0"], prefix + "depthwise.")
    _x_cba(w, p["ConvBnAct_1"], s["ConvBnAct_1"], prefix + "pointwise.")


def _x_se(w, p, prefix):
    # reference SEBlock fc = Sequential[Linear, act, Linear, Sigmoid]
    # (cnn.py:15-20); Linears are bias-free
    w.p(prefix + "fc.0.weight", np.asarray(p["Dense_0"]["kernel"]).T)
    w.p(prefix + "fc.2.weight", np.asarray(p["Dense_1"]["kernel"]).T)


def _x_eca(w, p, prefix):
    # flax Conv1d kernel [k, 1, 1] → torch [1, 1, k] (cnn.py:37)
    w.p(prefix + "conv.weight",
        np.transpose(np.asarray(p["Conv_0"]["kernel"]), (2, 1, 0)))


def _x_coord(w, p, s, prefix):
    """Registration order conv1, bn1, conv_h, conv_w (cnn.py:58-70)."""
    def c1d(kernel):  # flax [1, I, O] → torch [O, I, 1, 1]
        return np.transpose(np.asarray(kernel), (2, 1, 0))[..., None]

    w.p(prefix + "conv1.weight", c1d(p["Conv_0"]["kernel"]))
    w.p(prefix + "conv1.bias", p["Conv_0"]["bias"])
    bn = p["BatchNorm_0"]
    st = s["BatchNorm_0"]
    w.p(prefix + "bn1.weight", bn["scale"])
    w.p(prefix + "bn1.bias", bn["bias"])
    w.b(prefix + "bn1.running_mean", st["mean"])
    w.b(prefix + "bn1.running_var", st["var"])
    w.b(prefix + "bn1.num_batches_tracked", np.asarray(0, np.int64))
    w.p(prefix + "conv_h.weight", c1d(p["Conv_1"]["kernel"]))
    w.p(prefix + "conv_h.bias", p["Conv_1"]["bias"])
    w.p(prefix + "conv_w.weight", c1d(p["Conv_2"]["kernel"]))
    w.p(prefix + "conv_w.bias", p["Conv_2"]["bias"])


def _x_attention(w, p, s, prefix, att_type):
    if att_type == "se":
        _x_se(w, p["SEBlock_0"], prefix)
    elif att_type == "eca":
        _x_eca(w, p["ECABlock_0"], prefix)
    elif att_type == "coord":
        _x_coord(w, p["CoordAttention_0"], s["CoordAttention_0"], prefix)


def _x_inverted_residual(w, p, s, prefix, expand_ratio: int, att_type: str):
    """Sequential indices replay reference cnn.py:210-255: [expand?],
    depthwise, attention, projection."""
    idx = 0
    cba_i = 0
    if expand_ratio != 1:
        _x_cba(w, p[f"ConvBnAct_{cba_i}"], s[f"ConvBnAct_{cba_i}"],
               f"{prefix}conv.{idx}.")
        idx += 1
        cba_i += 1
    _x_cba(w, p[f"ConvBnAct_{cba_i}"], s[f"ConvBnAct_{cba_i}"],
           f"{prefix}conv.{idx}.")
    idx += 1
    cba_i += 1
    _x_attention(w, p, s, f"{prefix}conv.{idx}.", att_type)
    idx += 1
    _x_cba(w, p[f"ConvBnAct_{cba_i}"], s[f"ConvBnAct_{cba_i}"],
           f"{prefix}conv.{idx}.")


def _x_dual_path(w, p, s, prefix, has_shortcut: bool, att_type):
    """Registration order residual_path, dense_path, attention, fusion,
    shortcut (reference cnn.py:280-355) — note attention registers BEFORE
    fusion/shortcut even though it is applied last in forward."""
    _x_cba(w, p["ConvBnAct_0"], s["ConvBnAct_0"], prefix + "residual_path.0.")
    _x_dwsep(w, p["DepthwiseSeparableConv_0"], s["DepthwiseSeparableConv_0"],
             prefix + "residual_path.1.")
    _x_cba(w, p["ConvBnAct_1"], s["ConvBnAct_1"], prefix + "residual_path.2.")
    _x_cba(w, p["ConvBnAct_2"], s["ConvBnAct_2"], prefix + "dense_path.0.")
    _x_dwsep(w, p["DepthwiseSeparableConv_1"], s["DepthwiseSeparableConv_1"],
             prefix + "dense_path.1.")
    if att_type:
        _x_attention(w, p, s, prefix + "attention.", att_type)
    nxt = 3
    fusion_idx = nxt + (1 if has_shortcut else 0)
    _x_cba(w, p[f"ConvBnAct_{fusion_idx}"], s[f"ConvBnAct_{fusion_idx}"],
           prefix + "fusion.")
    if has_shortcut:
        _x_cba(w, p[f"ConvBnAct_{nxt}"], s[f"ConvBnAct_{nxt}"],
               prefix + "shortcut.")


def _x_wasp(w, p, s, prefix):
    """Own ``weights`` parameter first (state_dict lists a module's own
    parameters before its children), then conv1x1, atrous branches, global
    branch, fusion (reference cnn.py:436-478)."""
    w.p(prefix + "weights", p["branch_weights"])
    _x_cba(w, p["ConvBnAct_0"], s["ConvBnAct_0"], prefix + "conv1x1.")
    for i in range(4):
        _x_cba(w, p[f"ConvBnAct_{i + 1}"], s[f"ConvBnAct_{i + 1}"],
               f"{prefix}atrous_branches.{i}.")
    _x_cba(w, p["ConvBnAct_5"], s["ConvBnAct_5"], prefix + "global_branch.1.")
    _x_cba(w, p["ConvBnAct_6"], s["ConvBnAct_6"], prefix + "fusion.")


def _x_pose_head(w, p, prefix, n_hidden: int):
    """reference common.py:55-89: hidden layers are Sequential[Linear, act,
    Dropout] at decoder.{k}.0, final Linear at decoder.{n_hidden}."""
    for k in range(n_hidden):
        d = p[f"Dense_{k}"]
        w.p(f"{prefix}decoder.{k}.0.weight", np.asarray(d["kernel"]).T)
        w.p(f"{prefix}decoder.{k}.0.bias", d["bias"])
    d = p[f"Dense_{n_hidden}"]
    w.p(f"{prefix}decoder.{n_hidden}.weight", np.asarray(d["kernel"]).T)
    w.p(f"{prefix}decoder.{n_hidden}.bias", d["bias"])


def _heatmap_grids(heatmap_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """The generator's persistent meshgrid buffers (reference
    common.py:17-21): x_grid[i, j] = j, y_grid[i, j] = i."""
    coords = np.arange(heatmap_size, dtype=np.float32)
    y_grid, x_grid = np.meshgrid(coords, coords, indexing="ij")
    return x_grid, y_grid


def export_reference_cnn(variables: Dict, cfg) -> _Writer:
    """Map our CNN variables ({params, batch_stats}) onto a reference
    ``CNNPoseEstimation.state_dict()`` — a :class:`_Writer` whose ``sd`` is
    the ordered state_dict (numpy values, exact torch key order) and whose
    ``param_keys`` is the ``model.parameters()`` order.

    Inverse of :func:`pose3d_tpu.compat.port_reference_cnn`; the stage
    assembly walk replays reference cnn.py:519-589 identically.
    """
    if getattr(cfg, "normalization", "batch") != "batch":
        raise ValueError(
            "torch export supports normalization='batch' (the reference "
            f"default); got {cfg.normalization!r}"
        )
    params = variables["params"]
    stats = variables["batch_stats"]
    w = _Writer()

    _x_cba(w, params["ConvBnAct_0"], stats["ConvBnAct_0"], "conv1.0.")
    _x_cba(w, params["ConvBnAct_1"], stats["ConvBnAct_1"], "conv1.1.")

    x_grid, y_grid = _heatmap_grids(cfg.heatmap_size)
    w.b("heatmap_generator.x_grid", x_grid)
    w.b("heatmap_generator.y_grid", y_grid)

    # shared stage schedule — keeps this walk and port_reference_cnn's
    # exact inverses (incl. the shortcut rule) by construction
    from pose3d_tpu.compat import iter_cnn_stage_blocks

    for prefix, name, is_dual, att, expand, has_shortcut \
            in iter_cnn_stage_blocks(cfg):
        if is_dual:
            _x_dual_path(w, params[name], stats[name], prefix,
                         has_shortcut=has_shortcut, att_type=att)
        else:
            _x_inverted_residual(w, params[name], stats[name], prefix,
                                 expand, att)

    _x_wasp(w, params["WASPModule_0"], stats["WASPModule_0"], "wasp.")

    # global features: Sequential[pool, ConvBnAct, ECA, pool] (cnn.py:602-613)
    _x_cba(w, params["ConvBnAct_2"], stats["ConvBnAct_2"],
           "global_features.1.")
    _x_eca(w, params["ECABlock_0"], "global_features.2.")

    _x_pose_head(w, params["PoseRegressionHead_0"], "pose_head.",
                 len(cfg.regression_dims))
    return w


def _find_adam_moments(opt_state) -> Tuple[object, Dict, Dict]:
    """Locate the (count, mu, nu) of the ScaleByAdamState inside an optax
    opt_state restored from a checkpoint (nested dicts) or live
    (NamedTuples)."""
    def walk(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):  # ScaleByAdamState
            return getattr(node, "count", None), node.mu, node.nu
        if isinstance(node, dict):
            if "mu" in node and "nu" in node:
                return node.get("count"), node["mu"], node["nu"]
            children = node.values()
        elif isinstance(node, (list, tuple)):
            children = node
        else:
            return None
        for c in children:
            found = walk(c)
            if found is not None:
                return found
        return None

    found = walk(opt_state)
    if found is None:
        raise ValueError("no AdamW moments (mu/nu) found in opt_state")
    return found


def export_torch_optimizer_state(
    opt_state, variables: Dict, cfg, step: int,
    lr: float = 1e-3, weight_decay: float = 0.01,
    exporter=export_reference_cnn,
) -> Dict:
    """Build a torch ``AdamW.state_dict()`` from the optax moments.

    The moments are laid out by running the SAME export walk over the mu/nu
    trees (they mirror the params tree, and AdamW moments must follow every
    layout transform — transposes included — since the update is
    elementwise). Param indices follow ``model.parameters()`` order, i.e.
    the exporter's recorded parameter-key order. The per-parameter Adam
    ``step`` (which drives torch's bias correction) comes from the optax
    ``ScaleByAdamState.count`` — NOT the training step, which diverges
    when an imported checkpoint carries a fresh optimizer around an old
    step counter; ``step`` is only the fallback when no count was stored.
    """
    import torch

    count, mu, nu = _find_adam_moments(opt_state)
    adam_step = float(np.asarray(count)) if count is not None else float(step)
    stats = variables["batch_stats"]
    ref = exporter(variables, cfg)
    w_mu = exporter({"params": mu, "batch_stats": stats}, cfg)
    w_nu = exporter({"params": nu, "batch_stats": stats}, cfg)

    state = {}
    for idx, key in enumerate(ref.param_keys):
        m, v = w_mu.sd.get(key), w_nu.sd.get(key)
        if m is None or v is None or m.shape != ref.sd[key].shape:
            continue
        state[idx] = {
            "step": torch.tensor(adam_step),
            "exp_avg": torch.from_numpy(np.array(m, np.float32)),
            "exp_avg_sq": torch.from_numpy(np.array(v, np.float32)),
        }
    # A real torch AdamW supplies the param_groups schema for the installed
    # torch version (keys like foreach/fused vary across releases).
    dummies = [torch.nn.Parameter(torch.zeros(1)) for _ in ref.param_keys]
    groups = torch.optim.AdamW(
        dummies, lr=lr, weight_decay=weight_decay
    ).state_dict()["param_groups"]
    return {"state": state, "param_groups": groups}


def export_torch_checkpoint(
    checkpoint_dir: str, out_path: str, ema: bool = False,
    lr: float = 1e-3, weight_decay: float = 0.01,
    include_optimizer: bool = True,
) -> str:
    """Export a framework checkpoint directory to a reference-format
    ``.pth`` (reference train.py:300-309 schema: step, model_state_dict,
    optimizer_state_dict, model_args, model_type).

    ``global_step`` is written alongside ``step`` because the reference's
    resume path reads the key it never writes (main.py:144 reads
    ``global_step``; train.py:301 saves ``step``) — emitting both makes
    resume actually restore the step for reference users.

    ``ema=True`` exports the EMA weights (recorded by ``--ema-decay``
    training); optimizer state is omitted then — averaged weights are an
    inference artifact and the raw-param moments would not correspond.
    """
    import torch

    from pose3d_tpu.core.config import make_model_config
    from pose3d_tpu.train.checkpoint import load_checkpoint_meta

    tree = _load_tree_host(checkpoint_dir)
    meta = load_checkpoint_meta(checkpoint_dir)
    model_type = meta["model_type"]
    cfg = make_model_config(model_type, **meta.get("model_args", {}))

    params = tree["params"]
    batch_stats = tree.get("batch_stats", {})
    if ema:
        if "ema_params" not in tree:
            raise ValueError(
                f"checkpoint {checkpoint_dir} carries no EMA weights "
                "(train with --ema-decay to record them)"
            )
        params = tree["ema_params"]
        # the torch export's BN running_mean/var buffers must come from
        # the averaged mirror too (legacy checkpoints: live stats)
        batch_stats = tree.get("ema_batch_stats", batch_stats)
    variables = {"params": params, "batch_stats": batch_stats}

    if model_type == "cnn":
        exporter = export_reference_cnn
    elif model_type == "transformer":
        exporter = export_reference_transformer
    else:
        raise ValueError(f"unsupported model_type {model_type!r}")
    writer = exporter(variables, cfg)
    sd = OrderedDict(
        (k, torch.from_numpy(np.array(v))) for k, v in writer.sd.items()
    )

    step = int(meta.get("step", 0))
    model_args = dict(meta.get("model_args", {}))
    model_args.pop("model_type", None)  # reference passes it positionally

    if include_optimizer and not ema:
        mismatch = _moments_mismatch_reason(tree["opt_state"], params)
        if mismatch:
            # expected for frozen-backbone checkpoints (masked subtrees);
            # anything else in the mapping walk below raises loudly
            logger.warning("optimizer state not exported (%s); the "
                           "reference rebuilds fresh moments", mismatch)
            opt_sd = _fresh_torch_optimizer_groups(
                len(writer.param_keys), lr, weight_decay
            )
        else:
            opt_sd = export_torch_optimizer_state(
                tree["opt_state"], variables, cfg, step,
                lr=lr, weight_decay=weight_decay, exporter=exporter,
            )
    else:
        opt_sd = _fresh_torch_optimizer_groups(
            len(writer.param_keys), lr, weight_decay
        )

    ckpt = {
        "step": step,
        "global_step": step,
        "model_state_dict": sd,
        "optimizer_state_dict": opt_sd,
        "model_args": model_args,
        "model_type": model_type,
    }
    torch.save(ckpt, out_path)
    logger.info("Exported %s (step %d, %s%s) -> %s", checkpoint_dir, step,
                model_type, " EMA" if ema else "", out_path)
    return str(out_path)


def _moments_mismatch_reason(opt_state, params) -> str:
    """Return why the optax moments cannot be mapped 1:1 onto ``params``
    (no Adam state found, or a frozen/masked optimizer whose mu tree does
    not mirror the params tree), or '' when they line up. Keeping this an
    explicit structural check — instead of a broad except around the
    mapping walk — lets real mapping regressions raise instead of being
    silently downgraded to a momentum-free export."""
    import jax

    try:
        _, mu, _ = _find_adam_moments(opt_state)
    except ValueError as e:
        return str(e)
    s_mu = jax.tree_util.tree_structure(mu)
    s_p = jax.tree_util.tree_structure(params)
    if s_mu != s_p:
        return "moments tree does not mirror params (frozen/masked subtrees)"
    return ""


def _fresh_torch_optimizer_groups(n_params: int, lr: float,
                                  weight_decay: float) -> Dict:
    """Momentum-free but loadable AdamW state (reference main.py:129-133
    loads it unconditionally on resume)."""
    import torch

    dummies = [torch.nn.Parameter(torch.zeros(1)) for _ in range(n_params)]
    return torch.optim.AdamW(
        dummies, lr=lr, weight_decay=weight_decay
    ).state_dict()


def _load_tree_host(checkpoint_dir: str) -> Dict:
    """Restore the checkpoint tree host-side as numpy — never through the
    device (a remote-TPU tunnel costs ~1 s/array; the exporter only needs
    host arrays)."""
    from pathlib import Path

    import jax
    import orbax.checkpoint as ocp

    path = Path(checkpoint_dir).absolute() / "state"
    with ocp.PyTreeCheckpointer() as ckptr:
        metadata = ckptr.metadata(path)
        md_tree = getattr(
            getattr(metadata, "item_metadata", metadata), "tree", metadata
        )
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), md_tree
        )
        return ckptr.restore(path, restore_args=restore_args)


# -- transformer (reference src/models/transformers.py) ---------------------

def _x_ln(w, p, prefix):
    w.p(prefix + "weight", p["scale"])
    w.p(prefix + "bias", p["bias"])


def _x_torch_mha(w, p, prefix):
    """Our MultiHeadAttention {query,key,value,out} DenseGeneral trees →
    torch nn.MultiheadAttention (packed in_proj; registration order
    in_proj_weight, in_proj_bias, out_proj)."""
    out_k = np.asarray(p["out"]["kernel"])  # [H, hd, D]
    D = out_k.shape[-1]

    def lin(tree):  # DenseGeneral [D, H, hd] → torch [D(out), D(in)]
        return np.asarray(tree["kernel"]).reshape(D, D).T, \
            np.asarray(tree["bias"]).reshape(D)

    qw, qb = lin(p["query"])
    kw, kb = lin(p["key"])
    vw, vb = lin(p["value"])
    w.p(prefix + "in_proj_weight", np.concatenate([qw, kw, vw], axis=0))
    w.p(prefix + "in_proj_bias", np.concatenate([qb, kb, vb], axis=0))
    w.p(prefix + "out_proj.weight", out_k.reshape(D, D).T)
    w.p(prefix + "out_proj.bias", p["out"]["bias"])


def _x_lin(w, p, prefix):
    w.p(prefix + "weight", np.asarray(p["kernel"]).T)
    w.p(prefix + "bias", p["bias"])


def _x_encoder_block(w, p, prefix):
    """reference TransformerEncoderBlock registration order: norm1, attn,
    norm2, mlp[0]/mlp[3] (transformers.py:60-73)."""
    _x_ln(w, p["LayerNorm_0"], prefix + "norm1.")
    _x_torch_mha(w, p["MultiHeadAttention_0"], prefix + "attn.")
    _x_ln(w, p["LayerNorm_1"], prefix + "norm2.")
    _x_lin(w, p["Mlp_0"]["Dense_0"], prefix + "mlp.0.")
    _x_lin(w, p["Mlp_0"]["Dense_1"], prefix + "mlp.3.")


def _x_fusion_block(w, p, prefix):
    """reference CrossModalFusionBlock registration order
    (transformers.py:96-125)."""
    _x_ln(w, p["LayerNorm_0"], prefix + "norm_img_q.")
    _x_ln(w, p["LayerNorm_1"], prefix + "norm_hm_kv.")
    _x_torch_mha(w, p["img_to_hm"], prefix + "cross_attn_img_to_hm.")
    _x_ln(w, p["LayerNorm_2"], prefix + "norm_hm_q.")
    _x_ln(w, p["LayerNorm_3"], prefix + "norm_img_kv.")
    _x_torch_mha(w, p["hm_to_img"], prefix + "cross_attn_hm_to_img.")
    _x_ln(w, p["LayerNorm_4"], prefix + "norm_img_mlp.")
    _x_lin(w, p["mlp_img"]["Dense_0"], prefix + "mlp_img.0.")
    _x_lin(w, p["mlp_img"]["Dense_1"], prefix + "mlp_img.3.")
    _x_ln(w, p["LayerNorm_5"], prefix + "norm_hm_mlp.")
    _x_lin(w, p["mlp_hm"]["Dense_0"], prefix + "mlp_hm.0.")
    _x_lin(w, p["mlp_hm"]["Dense_1"], prefix + "mlp_hm.3.")


def _x_vit_backbone(w, p, prefix, depth: int):
    """Our ViTBackbone → timm VisionTransformer keys (inverse of
    stage1/port.port_vit_backbone). timm's own parameters (cls_token,
    pos_embed) precede its children (patch_embed, blocks, norm) in
    state_dict/parameters() order regardless of __init__ assignment order.

    A stacked-layout backbone (pipeline-parallel training,
    ``vit_stacked=True``) is converted to the looped porting layout first.
    """
    if "blocks" in p:
        from pose3d_tpu.parallel.pp import unstack_vit_blocks

        p = unstack_vit_blocks(p)
    w.p(prefix + "cls_token", p["cls_token"])
    w.p(prefix + "pos_embed", p["pos_embed"])
    w.p(prefix + "patch_embed.proj.weight",
        _conv_k(p["patch_embed"]["Conv_0"]["kernel"]))
    w.p(prefix + "patch_embed.proj.bias", p["patch_embed"]["Conv_0"]["bias"])
    for i in range(depth):
        blk = p[f"block_{i}"]
        b = f"{prefix}blocks.{i}."
        _x_ln(w, blk["LayerNorm_0"], b + "norm1.")
        attn = blk["MultiHeadAttention_0"]
        out_k = np.asarray(attn["out"]["kernel"])  # [H, hd, D]
        D = out_k.shape[-1]

        def lin(tree):
            return np.asarray(tree["kernel"]).reshape(D, D).T, \
                np.asarray(tree["bias"]).reshape(D)

        qw, qb = lin(attn["query"])
        kw, kb = lin(attn["key"])
        vw, vb = lin(attn["value"])
        w.p(b + "attn.qkv.weight", np.concatenate([qw, kw, vw], axis=0))
        w.p(b + "attn.qkv.bias", np.concatenate([qb, kb, vb], axis=0))
        w.p(b + "attn.proj.weight", out_k.reshape(D, D).T)
        w.p(b + "attn.proj.bias", attn["out"]["bias"])
        _x_ln(w, blk["LayerNorm_1"], b + "norm2.")
        _x_lin(w, blk["Mlp_0"]["Dense_0"], b + "mlp.fc1.")
        _x_lin(w, blk["Mlp_0"]["Dense_1"], b + "mlp.fc2.")
    _x_ln(w, p["norm"], prefix + "norm.")


def export_reference_transformer(variables: Dict, cfg) -> _Writer:
    """Map our TransformerPoseEstimation variables onto a reference
    ``TransformerPoseEstimation.state_dict()`` (exact torch key order).

    Inverse of :func:`pose3d_tpu.compat.port_reference_transformer`. The
    module's own parameters (pos_embed_hm, final_cls_token,
    final_pos_embed — transformers.py:252,273,280) lead, then children in
    registration order: vit_backbone, heatmap_generator (buffers only),
    heatmap_patch_embed, cross_modal_fusion_layers, final_encoder,
    norm_out, pose_head. The flat head's Linears sit at decoder indices
    0, 3, 6, ... (transformers.py:20-26).
    """
    params = variables["params"]
    w = _Writer()
    w.p("pos_embed_hm", params["pos_embed_hm"])
    w.p("final_cls_token", params["final_cls_token"])
    w.p("final_pos_embed", params["final_pos_embed"])
    _x_vit_backbone(w, params["vit_backbone"], "vit_backbone.",
                    depth=cfg.vit_depth)
    x_grid, y_grid = _heatmap_grids(cfg.heatmap_size)
    w.b("heatmap_generator.x_grid", x_grid)
    w.b("heatmap_generator.y_grid", y_grid)
    _x_lin_conv = params["heatmap_patch_embed"]["Conv_0"]
    w.p("heatmap_patch_embed.proj.weight", _conv_k(_x_lin_conv["kernel"]))
    w.p("heatmap_patch_embed.proj.bias", _x_lin_conv["bias"])
    for i in range(cfg.num_cross_modal_layers):
        _x_fusion_block(w, params[f"fusion_{i}"],
                        f"cross_modal_fusion_layers.{i}.")
    for i in range(cfg.final_encoder_depth):
        _x_encoder_block(w, params[f"final_block_{i}"], f"final_encoder.{i}.")
    _x_ln(w, params["norm_out"], "norm_out.")
    head = params["pose_head"]
    n_hidden = len(cfg.regression_hidden_dims)
    for k in range(n_hidden):
        _x_lin(w, head[f"Dense_{k}"], f"pose_head.decoder.{3 * k}.")
    _x_lin(w, head[f"Dense_{n_hidden}"],
           f"pose_head.decoder.{3 * n_hidden}.")
    return w
