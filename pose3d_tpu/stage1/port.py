"""Torch → JAX weight porting.

Brings pretrained torch checkpoints onto this framework's native modules:

  * :func:`port_vit_backbone` — timm-format ViT state_dict
    (``vit_base_patch16_384`` family) onto
    :class:`pose3d_tpu.models.transformer.ViTBackbone`, including the two
    adaptations the reference performs when wrapping timm
    (src/models/transformers.py:174-224):
      - patch-embed inflation 3→C_in channels: RGB kernels copied, extra
        channels get the mean over RGB;
      - positional-embedding grid interpolation to the configured image
        size (timm does this via ``img_size=`` at model creation).
  * :func:`load_torch_state_dict` — reads a ``.pth``/``.pt``/
    ``.safetensors`` file into a flat dict of numpy arrays (torch only
    needed for the pickle formats).

These run entirely on host (numpy); the result plugs into ``model.init``
output via :func:`merge_params`.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

logger = logging.getLogger("pose3d_tpu.port")


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {name: fp32 numpy array}.

    Tries ``weights_only=True`` first (same hardening as the yolo/depthpro
    loaders): plain unpickling executes arbitrary bytecode from the file,
    so the fallback is for TRUSTED sources only (prefer .safetensors)."""
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return {k: np.asarray(v, np.float32)
                for k, v in load_file(path).items()}
    import torch

    def _extract(obj):
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        if isinstance(obj, dict) and "model" in obj and hasattr(
            obj["model"], "state_dict"
        ):
            obj = obj["model"].state_dict()
        return {
            # .float(): fp16/bf16 checkpoints must not leak half-precision
            # params into the model (repo invariant: fp32 params)
            k: v.detach().float().cpu().numpy()
            for k, v in obj.items()
            if hasattr(v, "detach")
        }

    try:
        sd = _extract(torch.load(path, map_location="cpu",
                                 weights_only=True))
        if sd:
            return sd
        logger.warning("no tensors under weights_only=True in %s", path)
    except Exception:
        logger.warning(
            "%s is not loadable with weights_only=True; falling back to "
            "unpickling (trusted-source file assumed — prefer "
            ".safetensors)", path,
        )
    return _extract(torch.load(path, map_location="cpu",
                               weights_only=False))


def _interpolate_pos_embed(pos: np.ndarray, n_new: int) -> np.ndarray:
    """Bicubic-resize the grid part of a [1, 1+N, D] pos embedding to
    1+n_new tokens (square grids)."""
    import cv2

    n_old = pos.shape[1] - 1
    if n_old == n_new:
        return pos
    d = pos.shape[2]
    g_old = int(round(n_old ** 0.5))
    g_new = int(round(n_new ** 0.5))
    grid = pos[0, 1:].reshape(g_old, g_old, d).astype(np.float32)
    grid = cv2.resize(grid, (g_new, g_new), interpolation=cv2.INTER_CUBIC)
    return np.concatenate(
        [pos[:, :1], grid.reshape(1, g_new * g_new, d)], axis=1
    )


def _inflate_patch_embed(weight_oihw: np.ndarray, in_channels: int
                         ) -> np.ndarray:
    """[D, 3, P, P] torch conv weight → [P, P, C_in, D] flax kernel with
    RGB-copy + mean-channel inflation (reference transformers.py:188-224)."""
    d, c_orig, p, _ = weight_oihw.shape
    hwio = np.transpose(weight_oihw, (2, 3, 1, 0))  # [P, P, 3, D]
    if in_channels == c_orig:
        return hwio
    out = np.zeros((p, p, in_channels, d), hwio.dtype)
    n = min(in_channels, c_orig)
    out[:, :, :n] = hwio[:, :, :n]
    if in_channels > c_orig:
        mean = hwio.mean(axis=2)
        for c in range(c_orig, in_channels):
            out[:, :, c] = mean
    return out


def port_vit_backbone(
    torch_sd: Dict[str, np.ndarray],
    num_heads: int,
    depth: int,
    in_channels: int = 4,
    num_patches: int = 1024,
    prefix: str = "",
) -> Dict:
    """Map a timm ViT state_dict onto ViTBackbone's param tree.

    Returns a nested dict matching
    {patch_embed, cls_token, pos_embed, block_i/..., norm}.
    """
    g = lambda k: torch_sd[prefix + k]  # noqa: E731
    d_model = g("cls_token").shape[-1]
    head_dim = d_model // num_heads

    params: Dict = {}
    params["cls_token"] = g("cls_token")
    params["pos_embed"] = _interpolate_pos_embed(
        g("pos_embed"), num_patches
    )
    params["patch_embed"] = {
        "Conv_0": {
            "kernel": _inflate_patch_embed(
                g("patch_embed.proj.weight"), in_channels
            ),
            "bias": g("patch_embed.proj.bias"),
        }
    }
    for i in range(depth):
        b = f"blocks.{i}."
        qkv_w = g(b + "attn.qkv.weight")  # [3D, D]
        qkv_b = g(b + "attn.qkv.bias")    # [3D]
        qw, kw, vw = np.split(qkv_w, 3, axis=0)   # each [D, D] (out, in)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)

        def dense_general(w, bias):
            # torch Linear weight [out, in] → DenseGeneral kernel
            # [in, H, head_dim]
            return {
                "kernel": w.T.reshape(d_model, num_heads, head_dim),
                "bias": bias.reshape(num_heads, head_dim),
            }

        params[f"block_{i}"] = {
            "LayerNorm_0": {
                "scale": g(b + "norm1.weight"),
                "bias": g(b + "norm1.bias"),
            },
            "MultiHeadAttention_0": {
                "query": dense_general(qw, qb),
                "key": dense_general(kw, kb),
                "value": dense_general(vw, vb),
                "out": {
                    # torch proj [D, D] (out, in) → [H, head_dim, D]
                    "kernel": g(b + "attn.proj.weight").T.reshape(
                        num_heads, head_dim, d_model
                    ),
                    "bias": g(b + "attn.proj.bias"),
                },
            },
            "LayerNorm_1": {
                "scale": g(b + "norm2.weight"),
                "bias": g(b + "norm2.bias"),
            },
            "Mlp_0": {
                "Dense_0": {
                    "kernel": g(b + "mlp.fc1.weight").T,
                    "bias": g(b + "mlp.fc1.bias"),
                },
                "Dense_1": {
                    "kernel": g(b + "mlp.fc2.weight").T,
                    "bias": g(b + "mlp.fc2.bias"),
                },
            },
        }
    params["norm"] = {
        "scale": g("norm.weight"),
        "bias": g("norm.bias"),
    }
    return params


def merge_params(variables: Dict, sub_tree: Dict, *path: str) -> Dict:
    """Return ``variables`` with params[path...] replaced by ``sub_tree``
    (shapes validated leaf-by-leaf)."""
    import jax

    def check(old, new, where):
        old_l, old_t = jax.tree_util.tree_flatten(old)
        new_l, new_t = jax.tree_util.tree_flatten(new)
        if old_t != new_t:
            raise ValueError(
                f"Tree mismatch at {where}:\n{old_t}\nvs\n{new_t}"
            )
        for o, n in zip(old_l, new_l):
            if tuple(o.shape) != tuple(np.shape(n)):
                raise ValueError(
                    f"Shape mismatch at {where}: {o.shape} vs {np.shape(n)}"
                )

    params = dict(variables["params"])
    node = params
    for p in path[:-1]:
        node[p] = dict(node[p])
        node = node[p]
    check(node[path[-1]], sub_tree, "/".join(path))
    node[path[-1]] = jax.tree_util.tree_map(np.asarray, sub_tree)
    return {**variables, "params": params}


# -- shared torch→flax tree plumbing (used by yolo_port + depthpro_port;
#    previously duplicated in both, review finding) ------------------------

def fold_torch_path(key: str):
    """torch module path → flax path segments: numeric segments join the
    previous one with '_' (``model.23.cv3.0.0.0`` → ``model_23/cv3_0_0_0``)."""
    out = []
    for s in key.split("."):
        if s.isdigit() and out:
            out[-1] = out[-1] + "_" + s
        else:
            out.append(s)
    return out


def set_in_tree(tree: Dict, path, leaf_name: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def tree_paths(tree, prefix=()):
    """Yield ((path…), shape-tuple) for every leaf of a nested dict."""
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), tuple(np.shape(v))


def validate_variables(model, variables, input_size: int,
                       columns=("params",), init_kwargs=None) -> None:
    """Shape-check a ported variables tree against the model's own init
    structure (via eval_shape — no FLOPs)."""
    import jax
    import jax.numpy as jnp

    kw = init_kwargs or {}
    ref = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, input_size, input_size, 3), jnp.float32),
            **kw,
        )
    )
    for col in columns:
        want = dict(tree_paths(ref[col]))
        have = dict(tree_paths(variables[col]))
        missing = sorted(set(want) - set(have))
        extra = sorted(set(have) - set(want))
        if missing or extra:
            raise ValueError(
                f"{col} tree mismatch: missing={missing[:8]} "
                f"extra={extra[:8]} (of {len(missing)}/{len(extra)})"
            )
        bad = [(p, have[p], want[p]) for p in want if have[p] != want[p]]
        if bad:
            raise ValueError(f"{col} shape mismatches: {bad[:8]}")
