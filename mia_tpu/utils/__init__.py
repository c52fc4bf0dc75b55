from .common import dummy_context, draw_mask, get_path
from .compile_cache import enable_compilation_cache, maybe_enable_compilation_cache
from .logging import setup_logger

__all__ = ["get_path", "dummy_context", "draw_mask", "setup_logger"]
