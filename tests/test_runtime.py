"""core/runtime: XLA workarounds + persistent compile cache wiring."""

import os

import jax
import pytest

from pose3d_tpu.core.runtime import (
    apply_tpu_workarounds,
    enable_persistent_compile_cache,
)


@pytest.fixture
def clean_cache_config(monkeypatch):
    """Blank the (conftest-set) cache config for the duration of a test."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", None)
    monkeypatch.delenv("POSE3D_COMPILE_CACHE", raising=False)
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_workarounds_disable_space_to_batch(monkeypatch):
    monkeypatch.setenv("XLA_FLAGS", "")
    apply_tpu_workarounds()
    assert "space-to-batch-converter" in os.environ["XLA_FLAGS"]
    # idempotent: calling again must not duplicate the flag
    before = os.environ["XLA_FLAGS"]
    apply_tpu_workarounds()
    assert os.environ["XLA_FLAGS"] == before


@pytest.fixture
def fake_tpu_platform():
    """Pretend the process targets TPU for the duration of a test — config
    read only; enable_persistent_compile_cache never touches devices."""
    prev = jax.config.jax_platforms
    jax.config.update("jax_platforms", "tpu")
    yield
    jax.config.update("jax_platforms", prev)


def test_compile_cache_default_dir(clean_cache_config, fake_tpu_platform,
                                   monkeypatch, tmp_path):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    enable_persistent_compile_cache()
    want = str(tmp_path / "pose3d_tpu" / "jax_cache")
    assert jax.config.jax_compilation_cache_dir == want
    assert os.path.isdir(want)
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 5.0


def test_compile_cache_gated_off_on_cpu(clean_cache_config, monkeypatch,
                                        tmp_path):
    # The test process IS cpu-only (conftest) — the default home-dir cache
    # must NOT engage: XLA:CPU entries are machine-specific AOT
    # executables and the home dir can outlive the machine.
    assert set(jax.config.jax_platforms.split(",")) <= {"cpu"}
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    enable_persistent_compile_cache()
    assert not jax.config.jax_compilation_cache_dir
    assert not (tmp_path / "pose3d_tpu").exists()


def test_compile_cache_env_override(clean_cache_config, monkeypatch, tmp_path):
    # explicit POSE3D_COMPILE_CACHE=<dir> wins even on CPU — the caller
    # owns the directory's lifetime then.
    cache = tmp_path / "explicit_cache"
    monkeypatch.setenv("POSE3D_COMPILE_CACHE", str(cache))
    enable_persistent_compile_cache()
    assert jax.config.jax_compilation_cache_dir == str(cache)
    assert cache.is_dir()


@pytest.mark.parametrize("value", ["0", "off", "", "none", "OFF"])
def test_compile_cache_disabled(clean_cache_config, monkeypatch, value):
    monkeypatch.setenv("POSE3D_COMPILE_CACHE", value)
    enable_persistent_compile_cache()
    assert not jax.config.jax_compilation_cache_dir


def test_compile_cache_respects_existing_config(monkeypatch, tmp_path):
    # conftest already points the cache at /tmp/jax_cache_tests — the CLI
    # hook must NOT override a directory configured earlier in-process.
    monkeypatch.setenv("POSE3D_COMPILE_CACHE", str(tmp_path / "other"))
    before = jax.config.jax_compilation_cache_dir
    assert before  # set by tests/conftest.py
    enable_persistent_compile_cache()
    assert jax.config.jax_compilation_cache_dir == before
