"""Bulk host↔device transfer.

Motivation (measured on the remote-TPU 'axon' tunnel): transferring a
225-leaf parameter tree with per-leaf ``jax.device_put`` costs ~0.6 s *per
array* in tunnel round-trips — minutes for a 27 M-param model — while one
contiguous 308 MB transfer takes seconds. ``bulk_device_put`` packs all
leaves of a pytree into one flat buffer per dtype on the host, ships those
few buffers, and slices/reshapes them back into the tree on-device inside a
single jitted program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def bulk_device_put(tree: Any, device: Optional[jax.Device] = None) -> Any:
    """device_put a pytree using one transfer per distinct dtype."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree

    np_leaves = [np.asarray(l) for l in leaves]
    order: dict = {}
    for i, l in enumerate(np_leaves):
        order.setdefault(l.dtype.str, []).append(i)

    flats = {
        key: np.concatenate([np_leaves[i].reshape(-1) for i in idxs])
        for key, idxs in order.items()
    }
    flats_dev = {
        k: jax.device_put(v, device) if device is not None else jax.device_put(v)
        for k, v in flats.items()
    }

    specs = [(l.shape, l.dtype.str, int(l.size)) for l in np_leaves]

    def unpack(flat_bufs):
        offsets = {k: 0 for k in flat_bufs}
        out = []
        for i, (shape, key, size) in enumerate(specs):
            buf = flat_bufs[key]
            off = offsets[key]
            out.append(jax.lax.dynamic_slice_in_dim(buf, off, size).reshape(shape))
            offsets[key] = off + size
        return out

    out_leaves = jax.jit(unpack)(flats_dev)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
