"""pdb_sph_tpu — a TPU-native Position Based Fluids engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CUDA
reference `jakymiws/pdb-sph` (Macklin & Muller, "Position Based Fluids",
SIGGRAPH 2013): spatial-hash neighbor search, Jacobi density-constraint
solver with CFM relaxation, box collisions, and the Standard / DamBreak /
Blowup scenes — designed TPU-first (counting-sort cell list via lax.sort,
fused Pallas neighbor kernels, whole step resident on device as one jitted
program, sub-row zx-key domain decomposition over a device mesh).
"""

from .config import SimConfig, default_config, blowup_config, SCENES
from .geometry import KernelGeometry, geometry_from_env
from .state import SimState, StepDiagnostics, make_state
from .models.scenes import spawn
from .core.step import make_step, make_rollout, diagnostics_fn

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "KernelGeometry",
    "geometry_from_env",
    "SimState",
    "StepDiagnostics",
    "SCENES",
    "default_config",
    "blowup_config",
    "make_state",
    "spawn",
    "make_step",
    "make_rollout",
    "diagnostics_fn",
]
