from .step import make_step, make_rollout, step_fn, diagnostics_fn

__all__ = ["make_step", "make_rollout", "step_fn", "diagnostics_fn"]
