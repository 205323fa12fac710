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


def bulk_device_get(tree: Any) -> Any:
    """device_get a pytree using one device→host transfer per distinct
    dtype: leaves are concatenated on-device by a single jitted program,
    fetched as one buffer, and split/reshaped on host. (Per-leaf
    device_get costs ~1 s/array through a remote-TPU tunnel.)"""
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves:
        return tree
    already_np = all(isinstance(l, np.ndarray) for l in leaves)
    if already_np:
        return tree

    order: dict = {}
    for i, l in enumerate(leaves):
        order.setdefault(np.dtype(l.dtype).str, []).append(i)

    @jax.jit
    def pack(ls):
        return {
            key: jnp.concatenate([jnp.ravel(ls[i]) for i in idxs])
            for key, idxs in order.items()
        }

    flats = {k: np.asarray(v) for k, v in pack(leaves).items()}

    out: list = [None] * len(leaves)
    offsets = {k: 0 for k in flats}
    for key, idxs in order.items():
        for i in idxs:
            size = int(np.prod(leaves[i].shape)) if leaves[i].shape else 1
            off = offsets[key]
            out[i] = flats[key][off : off + size].reshape(leaves[i].shape)
            offsets[key] = off + size
    return jax.tree_util.tree_unflatten(treedef, out)
