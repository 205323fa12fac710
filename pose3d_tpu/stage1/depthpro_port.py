"""HF DepthPro checkpoint → flax DepthProDepthEstimator porting.

Maps ``apple/DepthPro-hf`` weights (safetensors or torch .pth/.bin state
dict) mechanically onto :class:`pose3d_tpu.stage1.depthpro
.DepthProDepthEstimator`, whose flax child names mirror the torch module
paths. Architecture hyperparameters are read from a sibling
``config.json`` when present, else inferred from tensor shapes (with the
apple/DepthPro-hf defaults for the few that shapes cannot determine).

Reference call sites: /root/reference/infer.py:142-149,240-252;
preprocess.py:30-31,72-78.
"""

from __future__ import annotations

import json
import logging
import re
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from pose3d_tpu.stage1.depthpro import DepthProArch, ViTArch

logger = logging.getLogger("pose3d_tpu.stage1.depthpro_port")

# keys that exist in HF checkpoints but have no forward-path effect
_DEAD_KEY_PATTERNS = (
    re.compile(r"\.mask_token$"),
    # first fusion layer receives no residual input; its residual_layer1
    # params are created but never used by HF's forward
    re.compile(r"^fusion_stage\.intermediate\.0\.residual_layer1\."),
    re.compile(r"\.num_batches_tracked$"),
)


def load_state_dict(path) -> Dict[str, np.ndarray]:
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v, np.float32)
                for k, v in load_file(path).items()}
    import torch

    try:
        # tensor-only checkpoints load without unpickling arbitrary classes
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        logger.warning(
            "%s is not loadable with weights_only=True; falling back to "
            "unpickling (trusted-source file assumed — prefer .safetensors)",
            path,
        )
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().float().cpu().numpy()
            for k, v in obj.items() if hasattr(v, "detach")}


def arch_from_state_dict(
    sd: Dict[str, np.ndarray],
    config: Optional[dict] = None,
    image_size: int = 1536,
) -> DepthProArch:
    """Recover DepthProArch from checkpoint shapes (+ optional HF
    config.json dict for the shape-invisible fields)."""
    config = config or {}
    vit_cfg = config.get("image_model_config", {}) or {}

    enc = "depth_pro.encoder.image_encoder.model."
    hidden = sd[enc + "embeddings.cls_token"].shape[-1]
    proj = sd[enc + "embeddings.patch_embeddings.projection.weight"]
    vit_patch = proj.shape[-1]
    n_pos = sd[enc + "embeddings.position_embeddings"].shape[1] - 1
    vit_image = vit_patch * int(round(n_pos ** 0.5))
    layer_ids = {
        int(m.group(1))
        for k in sd
        if (m := re.search(r"encoder\.layer\.(\d+)\.norm1\.weight$", k))
    }
    num_layers = max(layer_ids) + 1
    num_heads = vit_cfg.get("num_attention_heads") or max(hidden // 64, 1)
    vit = ViTArch(
        hidden_size=hidden, num_layers=num_layers, num_heads=num_heads,
        patch_size=vit_patch, image_size=vit_image,
        mlp_ratio=(
            sd[enc + "encoder.layer.0.mlp.fc1.weight"].shape[0] // hidden
        ),
    )

    up = "depth_pro.neck.feature_upsample."
    scaled_dims = []
    for i in range(8):
        k = up + f"scaled_images.{i}.layers.0.weight"
        if k not in sd:
            break
        scaled_dims.append(sd[k].shape[0])
    inter_dims = []
    for i in range(8):
        # layers.1 is the first deconv: ConvTranspose weight [in, out, k, k]
        k = up + f"intermediate.{i}.layers.1.weight"
        if k not in sd:
            break
        inter_dims.append(sd[k].shape[1])
    fusion = sd["head.layers.0.weight"].shape[1]
    use_fov = any(k.startswith("fov_model.") for k in sd)
    n_fov_layers = (
        len({k for k in sd if k.startswith("fov_model.head.layers")
             and k.endswith(".weight")}) - 1
    ) if use_fov else 2

    return DepthProArch(
        fusion_hidden_size=fusion,
        patch_size=vit_image,
        intermediate_hook_ids=tuple(
            config.get("intermediate_hook_ids", (11, 5))
        )[: len(inter_dims)],
        intermediate_feature_dims=tuple(inter_dims),
        scaled_images_ratios=tuple(
            config.get("scaled_images_ratios", (0.25, 0.5, 1.0))
        ),
        scaled_images_overlap_ratios=tuple(
            config.get("scaled_images_overlap_ratios", (0.0, 0.5, 0.25))
        ),
        scaled_images_feature_dims=tuple(scaled_dims),
        merge_padding_value=config.get("merge_padding_value", 3),
        use_fov_model=use_fov,
        num_fov_head_layers=n_fov_layers,
        image_size=image_size,
        vit=vit,
    )


from pose3d_tpu.stage1.port import (
    fold_torch_path as _fold,
    set_in_tree as _set,
    validate_variables,
)


def _is_deconv(path) -> bool:
    """torch ConvTranspose2d sites (shape-ambiguous vs Conv2d when
    in==out, so identified by module path)."""
    if path[-1] == "deconv":
        return True
    if "feature_upsample" in path:
        blk = path[path.index("feature_upsample") + 1]
        leaf = path[-1]
        if not leaf.startswith("layers_"):
            return False
        j = int(leaf.split("_")[1])
        if blk == "image_block":
            return True
        if blk.startswith("scaled_images") or blk.startswith("intermediate"):
            return j >= 1
    if path[0] == "head" and path[-1] == "layers_1":
        return True
    return False


def map_depthpro_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torch state_dict → flax variables {"params": …} (no batch stats —
    DepthPro uses LayerNorm only)."""
    params: Dict = {}
    for key, val in sd.items():
        if any(p.search(key) for p in _DEAD_KEY_PATTERNS):
            continue
        segs = _fold(key)
        leaf, path = segs[-1], segs[:-1]
        if leaf == "lambda1":  # LayerScale → vector param at layer level
            _set(params, path[:-1], path[-1], val)
        elif leaf in ("cls_token", "position_embeddings"):
            _set(params, path, leaf, val)
        elif leaf == "weight":
            if val.ndim == 4:
                if _is_deconv(path):
                    # torch ConvTranspose2d [in, out, kh, kw] →
                    # flax [kh, kw, in, out], spatially flipped
                    # (lax.conv_transpose does not flip the kernel)
                    k = np.transpose(val, (2, 3, 0, 1))[::-1, ::-1]
                    _set(params, path, "kernel", np.ascontiguousarray(k))
                else:
                    _set(params, path, "kernel",
                         np.transpose(val, (2, 3, 1, 0)))
            elif val.ndim == 2:
                _set(params, path, "kernel", val.T)
            elif val.ndim == 1:  # LayerNorm
                _set(params, path, "scale", val)
            else:
                raise ValueError(f"unexpected weight rank for {key}")
        elif leaf == "bias":
            _set(params, path, "bias", val)
        else:
            raise ValueError(f"unmapped checkpoint key: {key}")
    return {"params": params}


def validate_against_model(model, variables, image_size: int) -> None:
    """Shape-check via the shared helper (port.validate_variables)."""
    validate_variables(model, variables, image_size)


def load_depth_pro(path, dtype=None, image_size: int = 1536,
                   validate: bool = True):
    """Load + port a DepthPro checkpoint.

    Returns (model, variables): ``model.apply(variables, pixels)`` →
    (canonical inverse depth, fov_deg)."""
    import jax.numpy as jnp

    from pose3d_tpu.stage1.depthpro import DepthProDepthEstimator

    sd = load_state_dict(path)
    cfg_path = Path(path).parent / "config.json"
    config = None
    if cfg_path.exists():
        with open(cfg_path) as f:
            config = json.load(f)
    arch = arch_from_state_dict(sd, config, image_size=image_size)
    logger.info("porting DepthPro: %s", arch)
    model = DepthProDepthEstimator(
        arch=arch, dtype=dtype if dtype is not None else jnp.float32
    )
    variables = map_depthpro_state_dict(sd)
    if validate:
        validate_against_model(model, variables, image_size)
    return model, variables
