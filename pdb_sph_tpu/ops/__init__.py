from . import collide, dense, integrate, smoothing

__all__ = ["collide", "dense", "integrate", "smoothing"]
