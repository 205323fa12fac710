"""ultralytics YOLO11-pose checkpoint → flax YOLO11Pose porting.

The reference consumes ``yolo11x-pose.pt`` through the ultralytics runtime
(/root/reference/infer.py:138, preprocess.py:28). Here the checkpoint's
state_dict is mapped mechanically onto :class:`pose3d_tpu.stage1.yolo11
.YOLO11Pose`, whose flax child names mirror the torch module paths
(``model.23.cv4.0.1`` → ``model_23/cv4_0_1``).

Loading: ultralytics ``.pt`` files pickle whole ``DetectionModel`` objects,
so unpickling normally requires the ultralytics package. When it is not
installed, :func:`load_ultralytics_state_dict` injects stub module classes
for any missing ``ultralytics.*`` import (unpickling restores instance
``__dict__`` without calling ``__init__``, and ``nn.Module.state_dict``
only needs ``_modules``/``_parameters``/``_buffers``), which recovers the
tensors without the dependency. Plain state_dict ``.pt`` files and
``.safetensors`` exports load directly.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import logging
import sys
import types
from typing import Dict, Tuple

import numpy as np

logger = logging.getLogger("pose3d_tpu.stage1.yolo_port")


# ---------------------------------------------------------------------------
# Checkpoint loading
# ---------------------------------------------------------------------------


class _StubModule(types.ModuleType):
    """Module that fabricates torch.nn.Module subclasses on attribute
    access, so pickled ultralytics class references resolve."""

    def __getattr__(self, name):
        if name.startswith("__") and name.endswith("__"):
            raise AttributeError(name)
        import torch

        cls = type(name, (torch.nn.Module,), {"__module__": self.__name__})
        setattr(self, name, cls)
        return cls


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def __init__(self, prefixes=("ultralytics",)):
        self.prefixes = prefixes

    def find_spec(self, fullname, path=None, target=None):
        if any(fullname == p or fullname.startswith(p + ".")
               for p in self.prefixes):
            if fullname in sys.modules:
                return None
            return importlib.machinery.ModuleSpec(fullname, self)
        return None

    def create_module(self, spec):
        return _StubModule(spec.name)

    def exec_module(self, module):  # nothing to execute
        module.__path__ = []  # mark as package so submodules import


def load_ultralytics_state_dict(path) -> Dict[str, np.ndarray]:
    """Read a YOLO checkpoint into {torch_key: fp32 numpy array}.

    Accepts: ultralytics-pickled ``.pt`` ({"model": DetectionModel, ...}),
    a bare/nested state_dict ``.pt``/``.pth``, or ``.safetensors``."""
    path = str(path)
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
        return {_strip(k): np.asarray(v, np.float32) for k, v in sd.items()}

    import torch

    # Prefer the safe loader: a plain tensor-only checkpoint needs no
    # unpickling of arbitrary classes. Ultralytics .pt files embed nn.Module
    # objects, so they fall through to the stub-unpickle path — which
    # executes pickle bytecode from the file: only load weights from a
    # TRUSTED source (or convert to .safetensors first).
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = _extract_state_dict(obj)
        if not sd:
            raise ValueError("no tensors under weights_only=True")
        return sd
    except Exception:
        logger.warning(
            "%s is not loadable with weights_only=True; falling back to "
            "unpickling (trusted-source .pt assumed — prefer .safetensors)",
            path,
        )

    finder = _StubFinder()
    sys.meta_path.insert(0, finder)
    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    finally:
        sys.meta_path.remove(finder)
        for name in [m for m in sys.modules
                     if isinstance(sys.modules[m], _StubModule)]:
            del sys.modules[name]

    return _extract_state_dict(obj)


def _extract_state_dict(obj) -> Dict[str, np.ndarray]:
    if isinstance(obj, dict) and "model" in obj and hasattr(
        obj["model"], "state_dict"
    ):
        obj = obj["model"].state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    elif hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        return {}
    return {
        _strip(k): v.detach().float().cpu().numpy()
        for k, v in obj.items()
        if hasattr(v, "detach")
    }


def _strip(key: str) -> str:
    for p in ("module.", "ema."):
        if key.startswith(p):
            key = key[len(p):]
    return key


# ---------------------------------------------------------------------------
# Architecture inference + key mapping
# ---------------------------------------------------------------------------


def infer_architecture(sd: Dict[str, np.ndarray]) -> Tuple[str, int, Tuple]:
    """(scale, nc, kpt_shape) from checkpoint tensor shapes."""
    w0 = sd["model.0.conv.weight"].shape[0]
    if w0 == 16:
        scale = "n"
    elif w0 == 32:
        scale = "s"
    elif w0 == 96:
        scale = "x"
    elif w0 == 64:
        # m and l share widths; l (depth 1.0) has a second C3k2 module
        scale = "l" if any(k.startswith("model.2.m.1.") for k in sd) else "m"
    else:
        raise ValueError(f"unrecognized YOLO11 width: stem={w0}")
    nc = sd["model.23.cv3.0.2.weight"].shape[0]
    nk = sd["model.23.cv4.0.2.weight"].shape[0]
    if nk % 3 == 0:
        kpt_shape = (nk // 3, 3)
    elif nk % 2 == 0:
        kpt_shape = (nk // 2, 2)
    else:
        raise ValueError(f"cannot factor keypoint channels {nk}")
    return scale, nc, kpt_shape


from pose3d_tpu.stage1.port import (
    fold_torch_path as _fold,
    set_in_tree as _set,
    tree_paths as _tree_paths,
    validate_variables,
)


def map_yolo_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torch state_dict → flax variables {"params":…, "batch_stats":…}."""
    params: Dict = {}
    bstats: Dict = {}
    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        segs = _fold(key)
        leaf = segs[-1]
        path = segs[:-1]
        if "dfl" in path:
            # fixed arange(16) expectation conv — decode_pose hardcodes it
            if leaf == "weight":
                expected = np.arange(val.size, dtype=np.float32)
                if not np.allclose(val.reshape(-1), expected):
                    logger.warning(
                        "checkpoint DFL weights differ from arange — decode "
                        "assumes the standard fixed DFL"
                    )
            continue
        if path and path[-1] == "bn":
            if leaf == "weight":
                _set(params, path, "scale", val)
            elif leaf == "bias":
                _set(params, path, "bias", val)
            elif leaf == "running_mean":
                _set(bstats, path, "mean", val)
            elif leaf == "running_var":
                _set(bstats, path, "var", val)
            else:
                raise ValueError(f"unexpected BN leaf: {key}")
        elif leaf == "weight":
            if val.ndim == 4:  # torch OIHW → flax HWIO
                _set(params, path, "kernel", np.transpose(val, (2, 3, 1, 0)))
            elif val.ndim == 2:
                _set(params, path, "kernel", val.T)
            else:
                raise ValueError(f"unexpected weight rank for {key}")
        elif leaf == "bias":
            _set(params, path, "bias", val)
        else:
            raise ValueError(f"unmapped checkpoint key: {key}")
    return {"params": params, "batch_stats": bstats}


def validate_against_model(model, variables, input_size: int = 64) -> None:
    """Shape-check the mapped tree against the model's own init structure
    (shared helper, port.validate_variables)."""
    validate_variables(model, variables, input_size,
                       columns=("params", "batch_stats"),
                       init_kwargs={"train": False})


def load_yolo11_pose(path, dtype=None, validate: bool = True):
    """Load + port a YOLO11-pose checkpoint.

    Returns (model, variables) ready for
    ``model.apply(variables, images, train=False)``."""
    import jax.numpy as jnp

    from pose3d_tpu.stage1.yolo11 import YOLO11Pose

    sd = load_ultralytics_state_dict(path)
    scale, nc, kpt_shape = infer_architecture(sd)
    logger.info("porting YOLO11%s-pose: nc=%d kpt_shape=%s", scale, nc,
                kpt_shape)
    model = YOLO11Pose(
        scale=scale, nc=nc, kpt_shape=kpt_shape,
        dtype=dtype if dtype is not None else jnp.float32,
    )
    variables = map_yolo_state_dict(sd)
    if validate:
        validate_against_model(model, variables)
    return model, variables
