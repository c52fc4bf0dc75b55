from .common import dummy_context, draw_mask, get_path
from .logging import setup_logger

__all__ = ["get_path", "dummy_context", "draw_mask", "setup_logger"]
