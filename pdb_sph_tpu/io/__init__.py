from . import checkpoint, frames

__all__ = ["checkpoint", "frames"]
