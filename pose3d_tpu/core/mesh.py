"""Device mesh and sharding helpers.

The reference is single-device (SURVEY.md §2.2: no torch.distributed anywhere);
this framework is mesh-native from the start. The primary axis is ``data``
(batch sharding, gradient all-reduce over ICI); an optional ``model`` axis is
reserved for tensor-parallel sharding of the ViT MLP/attention.

Everything here is plain jax.sharding — XLA GSPMD inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX (single-controller SPMD). No-op when the
    job is single-process. The reference has no distributed backend at all
    (SURVEY.md §2.2); this is the TPU-native replacement: XLA collectives
    over ICI/DCN, host-sharded input via jax.process_index()."""
    if num_processes is None and coordinator_address is None:
        return  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_info() -> tuple:
    """(shard_id, num_shards) for host-side data sharding."""
    return jax.process_index(), jax.process_count()


def warmup_collectives() -> float:
    """Establish the cross-host collectives context with one tiny
    all-reduce over every device, and return its result (= global device
    count, a cheap cluster sanity check). No-op result on single-process.

    Why: the communication backend initializes its peer connections
    LAZILY at the first dispatched collective, under a short handshake
    deadline (XLA:CPU's Gloo transport: ~30 s). In a real job the first
    collective sits behind minutes of per-host compilation whose duration
    can skew between hosts — observed on the 2-process CPU test: worker A
    reached the first metrics all-reduce while worker B was still
    compiling, Gloo's GetKeyValue timed out at 30 s and BOTH workers died
    ("Gloo context initialization failed"). Dispatching this trivial
    program right after jax.distributed.initialize — while the processes
    are still in lockstep from the init barrier — brings the context up
    in seconds; later collectives reuse it and can skew freely. Also
    fails FAST (seconds, with a clear error) on a misconfigured cluster
    instead of minutes into the first compiled step."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) == 1 and jax.process_count() == 1:
        return 1.0
    mesh = Mesh(np.asarray(devs), ("all",))
    local = np.ones(len(jax.local_devices()), np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("all")), local, (len(devs),)
    )
    total = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(x)
    return float(np.asarray(total))


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a device mesh.

    ``shape`` may contain a single ``-1`` which absorbs all remaining devices
    (like a reshape). Defaults to a 1-D all-devices data-parallel mesh.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) if len(shape) > 1 else 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def make_data_mesh_for_batch(batch_size: int,
                             devices: Optional[Sequence[jax.Device]] = None
                             ) -> Mesh:
    """1-D data mesh whose size divides ``batch_size`` (largest such device
    count). With 8 devices and batch 2 this yields a 2-device mesh rather
    than an uneven-sharding error; logs when devices go unused."""
    import logging
    import math

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    d = math.gcd(batch_size, n)
    while n % d and d > 1:  # d divides batch; ensure it also divides n
        d -= 1
    if d < n:
        logging.getLogger("pose3d_tpu.mesh").warning(
            "batch %d not divisible by %d devices; using %d-device data mesh",
            batch_size, n, d,
        )
    return make_mesh((d,), ("data",), devices=devices[:d])


def make_hybrid_mesh(
    ici_shape: Sequence[int] = (-1,),
    ici_axes: Sequence[str] = ("data",),
    dcn_axis: str = "replica",
    devices: Optional[Sequence[jax.Device]] = None,
    slice_key=None,
) -> Mesh:
    """Multi-slice mesh: leading ``dcn_axis`` enumerates TPU slices (linked
    by DCN), inner ``ici_axes`` span each slice's ICI torus.

    This is the scaling-book multi-slice recipe: keep the bandwidth-hungry
    axes (FSDP all-gathers, TP collectives) *within* a slice on ICI, and
    put only pure data parallelism — whose sole collective is one gradient
    all-reduce per step — across the slow DCN links. Batch specs then
    shard over ``(dcn_axis, "data")`` jointly (see ``batch_spec_entry``),
    while param/moment specs keep using ``"data"``/``"model"`` so their
    collectives never leave the slice.

    Devices are grouped by ``slice_key`` (default: ``d.slice_index`` on
    real multi-slice TPU, falling back to ``d.process_index`` — which also
    lets CPU tests model "slices" as processes) and ordered within each
    group by device id. All groups must be the same size. With one group
    this degenerates to a ``(1, *ici_shape)`` mesh, which GSPMD treats
    identically to a plain ICI mesh.

    The reference has no distributed backend at all (SURVEY.md §2.2); this
    supplies the DCN tier its single-GPU design never reaches.
    """
    if devices is None:
        devices = jax.devices()
    if slice_key is None:
        def slice_key(d):
            s = getattr(d, "slice_index", None)
            return s if s is not None else d.process_index
    groups: dict = {}
    for d in devices:
        groups.setdefault(slice_key(d), []).append(d)
    sizes = {len(g) for g in groups.values()}
    if len(sizes) != 1:
        raise ValueError(
            "slices are unequal (devices per slice): "
            f"{ {k: len(v) for k, v in groups.items()} }"
        )
    per_slice = sizes.pop()
    ici_shape = list(ici_shape)
    if -1 in ici_shape:
        known = int(np.prod([s for s in ici_shape if s != -1]))
        ici_shape[ici_shape.index(-1)] = per_slice // max(known, 1)
    if int(np.prod(ici_shape)) != per_slice:
        raise ValueError(
            f"ici_shape {ici_shape} does not cover the {per_slice} devices "
            f"of each slice"
        )
    ordered = [
        sorted(groups[k], key=lambda d: d.id) for k in sorted(groups)
    ]
    dev_array = np.array(ordered).reshape([len(ordered)] + ici_shape)
    return Mesh(dev_array, (dcn_axis, *tuple(ici_axes)))


def batch_axes(mesh: Mesh) -> tuple:
    """The mesh axes the batch dimension shards over: ``data`` plus, on a
    hybrid multi-slice mesh, the cross-slice ``replica`` axis."""
    return tuple(a for a in ("replica", "data") if a in mesh.axis_names)


def batch_spec_entry(mesh: Mesh):
    """PartitionSpec entry for the batch dimension: ``"data"`` on a plain
    mesh, ``("replica", "data")`` on a hybrid multi-slice mesh (sharding
    over both axes jointly)."""
    axes = batch_axes(mesh)
    if not axes:
        return None
    return axes[0] if len(axes) == 1 else axes


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Sharding that splits dimension ``batch_axis`` over the mesh's batch
    axes (``data``, plus ``replica`` on hybrid meshes) and replicates the
    rest."""
    spec = [None] * ndim
    spec[batch_axis] = batch_spec_entry(mesh)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the leading axis sharded over
    the ``data`` mesh axis. This is the host→device boundary, replacing the
    reference's ``pin_memory`` + ``.to(device, non_blocking=True)``
    (reference src/train.py:76-79)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = 1
    for a in batch_axes(mesh):
        n *= mesh.shape.get(a, 1)
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by batch axes size {n}"
        )
    return global_batch // n
