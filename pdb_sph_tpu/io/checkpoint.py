"""Checkpoint / resume.

The reference has no checkpointing at all — its state lives in device
buffers and an OpenGL VBO (src/FluidSimulator.h:29-44) and dies with the
process. Here the state is one pytree, so save/restore is a handful of
arrays; atomic rename makes partially-written files invisible.
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..geometry import KernelGeometry
from ..state import SimState

_FORMAT_VERSION = 1


def save(path: str, cfg: SimConfig, state: SimState) -> None:
    """Atomically write state + config to an .npz file."""
    payload = {
        "x": np.asarray(state.x),
        "v": np.asarray(state.v),
        "ids": np.asarray(state.ids),
        "step": np.asarray(state.step),
        "format_version": np.int32(_FORMAT_VERSION),
        # asdict recurses into the nested KernelGeometry so the whole
        # config (physics AND kernel geometry) round-trips as JSON
        "config_json": np.bytes_(json.dumps(dataclasses.asdict(cfg)).encode()),
    }
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load(path: str) -> tuple[SimConfig, SimState]:
    with np.load(path, allow_pickle=False) as z:
        version = int(z["format_version"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        cfg_dict = json.loads(bytes(z["config_json"]).decode())
        if isinstance(cfg_dict.get("geom"), dict):
            cfg_dict["geom"] = KernelGeometry(**cfg_dict["geom"])
        cfg = SimConfig(**cfg_dict)
        state = SimState(
            x=jnp.asarray(z["x"]),
            v=jnp.asarray(z["v"]),
            ids=jnp.asarray(z["ids"]),
            step=jnp.asarray(z["step"]),
        )
    cfg.validate()
    if state.x.shape != (cfg.n, 3):
        raise ValueError(
            f"checkpoint shape {state.x.shape} inconsistent with n={cfg.n}"
        )
    return cfg, state
