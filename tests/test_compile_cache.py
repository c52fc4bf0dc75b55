"""Persistent compilation cache utility (mia_tpu.utils.compile_cache)."""

import jax

from mia_tpu.utils.compile_cache import (
    enable_compilation_cache,
    maybe_enable_compilation_cache,
)


def test_default_on_tpu_only_and_empty_env_opt_out(monkeypatch):
    import mia_tpu.utils.compile_cache as cc

    # unset env → default user-cache dir, but ONLY on the TPU backend
    monkeypatch.delenv("MIA_COMPILATION_CACHE", raising=False)
    on_tpu = jax.default_backend() == "tpu"
    assert maybe_enable_compilation_cache() is on_tpu
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert maybe_enable_compilation_cache() is True
    assert jax.config.jax_compilation_cache_dir.endswith("mia_tpu/xla_cache")
    # explicit empty env → disabled even on TPU
    monkeypatch.setenv("MIA_COMPILATION_CACHE", "")
    assert maybe_enable_compilation_cache() is False
    # reset the module-level idempotence marker for other tests
    monkeypatch.setattr(cc, "_enabled_dir", None)


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
