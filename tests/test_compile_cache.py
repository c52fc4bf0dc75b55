"""Persistent compilation cache utility (mia_tpu.utils.compile_cache)."""

import jax

from mia_tpu.utils.compile_cache import (
    enable_compilation_cache,
    maybe_enable_compilation_cache,
)


def test_disabled_without_config(monkeypatch):
    monkeypatch.delenv("MIA_COMPILATION_CACHE", raising=False)
    assert maybe_enable_compilation_cache() is False


def test_enable_points_jax_at_dir(tmp_path, monkeypatch):
    target = tmp_path / "xla-cache"
    assert enable_compilation_cache(target) is True
    assert jax.config.jax_compilation_cache_dir == str(target)
    assert target.is_dir()
    # idempotent
    assert enable_compilation_cache(target) is True

    # env-var path
    other = tmp_path / "env-cache"
    monkeypatch.setenv("MIA_COMPILATION_CACHE", str(other))
    assert maybe_enable_compilation_cache() is True
    assert jax.config.jax_compilation_cache_dir == str(other)
