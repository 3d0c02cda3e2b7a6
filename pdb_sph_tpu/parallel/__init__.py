from .sharded import (
    ParallelConfig,
    collect,
    distribute,
    make_mesh,
    make_sharded_step,
)

__all__ = [
    "ParallelConfig",
    "collect",
    "distribute",
    "make_mesh",
    "make_sharded_step",
]
