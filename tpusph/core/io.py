"""Checkpoint / resume — state save/load to .npz.

The reference has no checkpointing (SURVEY.md §5: state lives only in device
memory for the process lifetime); this is the small TPU-era extension the
survey calls for. Config is embedded so a checkpoint is self-describing.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from tpusph.core.config import SimConfig
from tpusph.core.state import FluidState


def save_state(path: str, state: FluidState, cfg: SimConfig) -> None:
    arrays = {f: np.asarray(jax.device_get(getattr(state, f))) for f in state._fields}
    arrays["__config__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> tuple[FluidState, SimConfig]:
    with np.load(path) as data:
        cfg = SimConfig(**json.loads(bytes(data["__config__"]).decode()))
        state = FluidState(
            **{f: jnp.asarray(data[f]) for f in FluidState._fields}
        )
    return state, cfg
