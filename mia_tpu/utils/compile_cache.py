"""Persistent XLA compilation cache.

TPU-native quality-of-life with no reference counterpart (torch has no
ahead-of-time compile step to cache): the flagship programs (AL train step,
eval buckets, CPC-SAM phase programs) take minutes to compile on a real
chip, and every restart / AL-round resume would otherwise pay that again.
``enable_compilation_cache`` points JAX's persistent cache at a directory so
recompiles of unchanged programs are disk hits.

Default-ON at ``~/.cache/mia_tpu/xla_cache`` (the cache is keyed by HLO +
compiler version, so staleness cannot mis-hit); override the directory with
``Config(compilation_cache_dir=...)`` on the trainers or the
``MIA_COMPILATION_CACHE`` environment variable, or disable entirely with
``MIA_COMPILATION_CACHE=""``. Trainers call
:func:`maybe_enable_compilation_cache` during ``initialize``.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_ENV_VAR = "MIA_COMPILATION_CACHE"
_enabled_dir: str | None = None


def enable_compilation_cache(cache_dir: str | Path) -> bool:
    """Enable JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; returns True when the cache is active. Safe to call before
    or after the backend is initialized (uses the supported jax.config
    knobs, min compile-time threshold 0 so even small eval programs cache).
    """
    global _enabled_dir
    cache_dir = str(Path(cache_dir).expanduser())
    if _enabled_dir == cache_dir:
        return True
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program (default threshold skips sub-second compiles,
        # but the AL eval path compiles one program per shape bucket and the
        # fleet of small ones adds up on restart)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled_dir = cache_dir
        logger.info("persistent compilation cache at %s", cache_dir)
        return True
    except Exception as exc:  # pragma: no cover - config knob drift
        logger.warning("compilation cache unavailable: %s", exc)
        return False


_DEFAULT_DIR = "~/.cache/mia_tpu/xla_cache"


def maybe_enable_compilation_cache(explicit_dir: str | None = None) -> bool:
    """Enable the cache from an explicit config value, ``MIA_COMPILATION_CACHE``,
    or (on TPU) the default user-cache directory.

    Precedence: ``explicit_dir`` > env var > default. An EMPTY env var
    (``MIA_COMPILATION_CACHE=""``) disables the cache. The default-ON path
    applies only to the TPU backend: TPU programs take minutes to compile,
    while XLA:CPU caches AOT machine code whose CPU-feature stamp can
    mismatch across hosts sharing a home directory (load-time SIGILL
    warnings). Returns False when disabled or unavailable.
    """
    target = explicit_dir
    if not target:
        target = os.environ.get(_ENV_VAR)
        if target is None:  # unset → default-ON on TPU only
            try:
                import jax

                backend = jax.default_backend()
            except Exception:  # pragma: no cover
                backend = ""
            target = _DEFAULT_DIR if backend == "tpu" else None
    if not target:  # MIA_COMPILATION_CACHE="" (or non-TPU default) → off
        return False
    return enable_compilation_cache(target)
