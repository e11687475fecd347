"""Checkpoint / resume of the simulation state.

The reference has no sim-state persistence (SURVEY.md section 5.4); with a
functional state pytree this is trivial, so it ships as a capability upgrade:
save/load the full FluidState (velocity, color, pressure) as an .npz archive.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from fluidx12_tpu.core.state import FluidState


def _to_numpy(x) -> np.ndarray:
    """bf16 (ml_dtypes) has no stable .npz round-trip; widen losslessly."""
    a = np.asarray(x)
    if a.dtype == jnp.bfloat16:
        return a.astype(np.float32)
    return a


def save_state(path: str, state: FluidState) -> None:
    np.savez_compressed(
        path,
        velocity=_to_numpy(state.velocity),
        color=_to_numpy(state.color),
        pressure=_to_numpy(state.pressure),
        store_dtype=np.str_(str(state.velocity.dtype)),
    )


def load_state(path: str, expected_zyx=None) -> FluidState:
    """Load a checkpoint; optionally validate the grid shape up front so a
    mismatched restore fails with a clear message instead of a jit shape error."""
    with np.load(path) as data:
        store = jnp.dtype(str(data["store_dtype"])) if "store_dtype" in data \
            else data["velocity"].dtype
        state = FluidState.from_parts(
            velocity=jnp.asarray(data["velocity"], dtype=store),
            color=jnp.asarray(data["color"], dtype=store),
            pressure=jnp.asarray(data["pressure"]),
        )
    if expected_zyx is not None and tuple(state.pressure.shape) != tuple(expected_zyx):
        raise ValueError(
            f"checkpoint grid {tuple(state.pressure.shape)} (Z, Y, X) does not "
            f"match configured grid {tuple(expected_zyx)}; pass a matching "
            f"--gridSize or a different --restore file"
        )
    return state
