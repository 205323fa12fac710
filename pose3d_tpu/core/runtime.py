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
    enable_persistent_compile_cache()


def enable_persistent_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a per-user directory.

    Every CLI invocation is a fresh process, and each train/eval/infer
    program costs ~40 s of remote compile through the TPU tunnel — the
    cache makes the second and later invocations of the same program
    (same shapes, same XLA flags) skip compilation entirely. Compiled
    executables are keyed by the full HLO + compile options, so
    ``apply_tpu_workarounds``'s pass changes hash separately and the
    cache never crosses numerics configurations.

    Control via ``POSE3D_COMPILE_CACHE``:
      * unset        → ``$XDG_CACHE_HOME|~/.cache``/pose3d_tpu/jax_cache
      * ``0``/``off``/empty → disabled
      * anything else → used as the cache directory
    A directory explicitly configured earlier in the process (e.g. the
    test conftest or bench.py) is left alone.

    CPU-only processes are excluded by default: XLA:CPU cache entries are
    AOT executables specialized to the *compiling* machine's ISA features,
    and a home-directory cache can outlive the machine (container images,
    shared homes) — loading them elsewhere risks SIGILL (cpu_aot_loader
    warns exactly this). TPU executables run device-side, so the expensive
    ~40 s tunnel compiles — the whole point of the cache — are safe to
    persist. An explicit ``POSE3D_COMPILE_CACHE=<dir>`` overrides the CPU
    gate (the caller owns the directory's lifetime then).
    """
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # already configured by the caller — respect it
    raw = os.environ.get("POSE3D_COMPILE_CACHE")
    if raw is not None and raw.strip().lower() in ("", "0", "off", "none"):
        return
    platforms = jax.config.jax_platforms
    if not raw and not (
        platforms and not set(platforms.split(",")) <= {"cpu"}
    ):
        # Not provably a non-CPU process: either jax_platforms is unset
        # (JAX may default to CPU) or it names only "cpu". Either way the
        # entries could be machine-specific XLA:CPU AOT executables — skip
        # the default home-dir cache rather than risk a cross-machine
        # SIGILL. Processes that want the cache either configure
        # jax_platforms (all CLIs do, via the axon plugin forcing it) or
        # set POSE3D_COMPILE_CACHE explicitly.
        return
    if raw:
        cache_dir = raw
    else:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        cache_dir = os.path.join(base, "pose3d_tpu", "jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return  # unwritable home (containers) — silently skip
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Only cache compiles that are actually expensive; tiny host-side
    # programs would otherwise flood the directory.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
