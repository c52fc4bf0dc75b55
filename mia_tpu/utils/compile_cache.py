"""Persistent XLA compilation cache.

TPU-native quality-of-life with no reference counterpart (torch has no
ahead-of-time compile step to cache): the flagship programs (AL train step,
eval buckets, CPC-SAM phase programs) take minutes to compile on a real
chip, and every restart / AL-round resume would otherwise pay that again.
``enable_compilation_cache`` points JAX's persistent cache at a directory so
recompiles of unchanged programs are disk hits.

Opt-in via ``Config(compilation_cache_dir=...)`` on the trainers or the
``MIA_COMPILATION_CACHE`` environment variable; trainers call
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


def maybe_enable_compilation_cache(explicit_dir: str | None = None) -> bool:
    """Enable the cache from an explicit config value or ``MIA_COMPILATION_CACHE``.

    Returns False (and does nothing) when neither is set.
    """
    target = explicit_dir or os.environ.get(_ENV_VAR)
    if not target:
        return False
    return enable_compilation_cache(target)
