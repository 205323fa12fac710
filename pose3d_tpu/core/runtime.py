"""Runtime/XLA environment workarounds.

Must be called before the first JAX computation (backend initialization
parses XLA_FLAGS then; importing jax alone is fine)."""

from __future__ import annotations

import os


def apply_tpu_workarounds() -> None:
    """Work around XLA TPU compiler issues observed with this model zoo.

    * ``space-to-batch-converter`` CHECK-fails
      (space_to_batch_converter.cc:543 ``halo_size - low_padding <=
      spatial_split_size``) when compiling the CNN's backward pass — the
      dilated 3×3 WASP convolutions at small spatial size with small batch
      trigger it. Disabling the pass costs nothing measurable for this
      workload.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "space-to-batch-converter" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_disable_hlo_passes=space-to-batch-converter"
        ).strip()
