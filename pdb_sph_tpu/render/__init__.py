from . import renderer

__all__ = ["renderer"]
